"""Generate synthetic BAM-pair fixtures + reference-binary golden outputs.

Usage: python tests/tools/gen_bam_fixtures.py /tmp/ref/bam-somaticsniper
(see README.md for building the reference oracle binary).
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

from somatic_sniper_tpu.utils.simulate import SimConfig, simulate_pair

DATA = Path(__file__).resolve().parent.parent / "data"

CASES = {
    "sim1": (SimConfig(seed=11), [
        ("vcf", ["-F", "vcf"]),
        ("classic", ["-F", "classic"]),
        ("bed", ["-F", "bed"]),
        ("joint.vcf", ["-F", "vcf", "-J", "-s", "0.001"]),
        ("q20.classic", ["-F", "classic", "-q", "20", "-Q", "30"]),
        ("nopriors.vcf", ["-F", "vcf", "-p"]),
        ("loh.vcf", ["-F", "vcf", "-L", "-G", "-Q", "0"]),
    ]),
    "sim2_deep": (SimConfig(seed=22, mean_depth=150.0, contig_len=1500,
                            n_contigs=1), [
        ("vcf", ["-F", "vcf"]),
        ("classic", ["-F", "classic"]),
    ]),
    "sim3_params": (SimConfig(seed=33, mean_depth=12.0), [
        ("T9.vcf", ["-F", "vcf", "-T", "0.9", "-r", "0.002", "-Q", "0"]),
        ("N4.classic", ["-F", "classic", "-N", "4", "-Q", "5"]),
    ]),
}


def main() -> None:
    oracle = sys.argv[1]
    for name, (cfg, runs) in CASES.items():
        d = DATA / "e2e" / name
        simulate_pair(d, cfg)
        # reference needs a .fai; build with the oracle-side samtools if
        # absent, else let the binary build it (it can't) — generate here:
        _write_fai(d / "ref.fa")
        for tag, args in runs:
            out = d / f"expected.{tag}"
            subprocess.run(
                [oracle, *args, "-f", str(d / "ref.fa"),
                 str(d / "tumor.bam"), str(d / "normal.bam"), str(out)],
                check=True, capture_output=True,
            )
            print(name, tag, out.stat().st_size)


def _write_fai(fa: Path) -> None:
    """samtools-compatible .fai for our simulator's fixed line geometry."""
    lines = []
    data = fa.read_bytes()
    pos = 0
    while pos < len(data):
        assert data[pos : pos + 1] == b">"
        eol = data.find(b"\n", pos)
        name = data[pos + 1 : eol].decode().split()[0]
        seq_off = eol + 1
        p = seq_off
        length = 0
        line_bases = line_width = 0
        while p < len(data) and data[p : p + 1] != b">":
            e2 = data.find(b"\n", p)
            if e2 == -1:
                e2 = len(data)
            lb = e2 - p
            if line_bases == 0 and lb:
                line_bases, line_width = lb, e2 - p + 1
            length += lb
            p = e2 + 1
        lines.append(f"{name}\t{length}\t{seq_off}\t{line_bases}\t{line_width}")
        pos = p
    Path(str(fa) + ".fai").write_text("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
