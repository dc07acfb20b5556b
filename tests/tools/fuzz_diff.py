"""Differential fuzz harness: random BAM pairs x flag combos, byte-diff
our CLI (exact precision) against the reference oracle binary.

Usage: python tests/tools/fuzz_diff.py /tmp/ref/bam-somaticsniper \
           [n_seeds] [base_seed]

Builds on the same synthetic generator as the committed e2e fixtures
(utils/simulate), sweeping depth / read length / contig count / error
and indel rates / model flags.  Every case must match byte-for-byte
(``##fileDate``/``##reference`` headers excluded).  Run ad hoc whenever
the model, pileup, or formatter code changes; the committed e2e goldens
remain the no-oracle regression net.
"""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root
from gen_bam_fixtures import _write_fai  # noqa: E402

from somatic_sniper_tpu.utils.simulate import SimConfig, simulate_pair  # noqa: E402

FILTER = re.compile(rb"^##(fileDate|reference)=.*\n", re.M)

FLAGSETS = [
    ["-F", "vcf"],
    ["-F", "classic"],
    ["-F", "bed", "-Q", "0"],
    ["-F", "vcf", "-J", "-s", "0.01"],
    ["-F", "classic", "-J", "-s", "0.0001", "-Q", "0"],
    ["-F", "vcf", "-p"],
    ["-F", "vcf", "-L", "-G", "-Q", "0"],
    ["-F", "classic", "-q", "20", "-Q", "30"],
    ["-F", "vcf", "-T", "0.9", "-N", "4", "-r", "0.002", "-Q", "5"],
    ["-F", "classic", "-T", "0.6", "-N", "3", "-r", "0.01"],
]


def config_for(seed: int) -> SimConfig:
    import numpy as np

    rng = np.random.default_rng(seed)
    return SimConfig(
        n_contigs=int(rng.integers(1, 4)),
        contig_len=int(rng.integers(800, 4000)),
        read_len=int(rng.integers(40, 150)),
        mean_depth=float(rng.uniform(4, 90)),
        somatic_rate=float(rng.uniform(1e-3, 2e-2)),
        germline_rate=float(rng.uniform(1e-3, 1e-2)),
        indel_read_rate=float(rng.uniform(0, 0.2)),
        clip_read_rate=float(rng.uniform(0, 0.25)),
        skip_read_rate=float(rng.uniform(0, 0.06)),
        filtered_read_rate=float(rng.uniform(0, 0.08)),
        low_mapq_rate=float(rng.uniform(0, 0.15)),
        baseq_lo=int(rng.integers(2, 20)),
        baseq_hi=int(rng.integers(25, 45)),
        error_rate=float(rng.uniform(0, 0.02)),
        seed=seed,
    )


def main() -> int:
    oracle = sys.argv[1]
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    base_seed = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    base = Path("/tmp/sniper_fuzz")
    from somatic_sniper_tpu.cli.main import main as our_main

    failures = 0
    for i in range(n_seeds):
        seed = base_seed + i
        d = base / f"s{seed}"
        simulate_pair(d, config_for(seed))
        _write_fai(d / "ref.fa")
        for j, flags in enumerate(FLAGSETS):
            if (seed + j) % 3:  # sample combos; full sweep is slow
                continue
            ref_out = d / f"ref.{j}.out"
            our_out = d / f"our.{j}.out"
            subprocess.run(
                [oracle, *flags, "-f", str(d / "ref.fa"),
                 str(d / "tumor.bam"), str(d / "normal.bam"),
                 str(ref_out)],
                check=True, capture_output=True,
            )
            rc = our_main([*flags, "-f", str(d / "ref.fa"),
                           str(d / "tumor.bam"), str(d / "normal.bam"),
                           str(our_out)])
            assert rc in (0, None), rc
            a = FILTER.sub(b"", ref_out.read_bytes())
            b = FILTER.sub(b"", our_out.read_bytes())
            if a != b:
                failures += 1
                print(f"MISMATCH seed={seed} flags={' '.join(flags)} "
                      f"({ref_out} vs {our_out})")
            else:
                print(f"ok seed={seed} flags={' '.join(flags)} "
                      f"bytes={len(a)}")
    print(f"done: {failures} mismatches")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
