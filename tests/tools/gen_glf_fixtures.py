"""Generate randomized pileup-column fixtures + reference-oracle outputs.

Requires the reference oracle harness built from /root/reference sources
(see tests/tools/README.md).  The committed fixtures in tests/data were
produced by this script; tests only *read* them.

Usage: python tests/tools/gen_glf_fixtures.py /tmp/ref/glf_oracle
"""

from __future__ import annotations

import struct
import subprocess
import sys
from pathlib import Path

import numpy as np

OUT = Path(__file__).resolve().parent.parent / "data"


def gen_columns(rng: np.random.Generator, n_cols: int) -> list[tuple[int, np.ndarray]]:
    cols = []
    for _ in range(n_cols):
        scenario = rng.integers(0, 10)
        if scenario == 0:
            depth = int(rng.integers(0, 4))
        elif scenario < 6:
            depth = int(rng.integers(1, 40))
        elif scenario < 9:
            depth = int(rng.integers(40, 300))
        else:
            depth = int(rng.integers(300, 1200))  # deep pile, exercises c-rescale
        ref16 = int(rng.choice([1, 2, 4, 8, 15, 5, 0]))
        reads = np.zeros((depth, 5), dtype=np.uint8)
        if depth:
            ref_like = rng.random(depth) < 0.7
            alt = int(rng.choice([1, 2, 4, 8]))
            base = np.where(ref_like, ref16 if ref16 in (1, 2, 4, 8) else 1, alt)
            # sprinkle N(15), ambiguity codes, and '='(0)
            weird = rng.random(depth) < 0.05
            base = np.where(weird, rng.choice([15, 0, 3, 5], size=depth), base)
            reads[:, 0] = base
            # baseQ: mostly 0-63, some 64-93 to exercise the &0x3f masking
            reads[:, 1] = rng.choice(
                np.concatenate([rng.integers(0, 64, 50), rng.integers(64, 94, 6)]),
                size=depth,
            )
            # mapQ: full u8 incl >127 to exercise the &0x7f masking in rms
            reads[:, 2] = rng.choice(
                np.concatenate(
                    [rng.integers(0, 61, 40), rng.integers(61, 256, 8), [0, 1, 2, 3]]
                ),
                size=depth,
            )
            reads[:, 3] = rng.integers(0, 2, depth)  # strand
            reads[:, 4] = rng.random(depth) < 0.03   # is_del
        cols.append((ref16, reads))
    return cols


def write_columns(path: Path, cols) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack("<i", len(cols)))
        for ref16, reads in cols:
            f.write(struct.pack("<Bi", ref16, len(reads)))
            f.write(reads.tobytes())


def main() -> None:
    oracle = sys.argv[1]
    rng = np.random.default_rng(1234)
    cols = gen_columns(rng, 4000)
    inp = OUT / "glf_columns_in.bin"
    write_columns(inp, cols)
    for name, args in {
        "default": [],
        "theta99": ["0.99", "0.001", "2"],
        "nhap4": ["0.85", "0.002", "4"],
    }.items():
        out = OUT / f"glf_oracle_{name}.bin"
        subprocess.run([oracle, str(inp), str(out), *args], check=True)
        print(name, out.stat().st_size)


if __name__ == "__main__":
    main()
