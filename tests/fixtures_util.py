"""Helpers for reading the committed oracle fixtures."""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np


def read_columns(path: Path):
    """Read glf_columns_in.bin -> list of (ref16, reads[N,5] u8)."""
    cols = []
    with open(path, "rb") as f:
        (n_cols,) = struct.unpack("<i", f.read(4))
        for _ in range(n_cols):
            ref16, n = struct.unpack("<Bi", f.read(5))
            reads = np.frombuffer(f.read(5 * n), dtype=np.uint8).reshape(n, 5)
            cols.append((ref16, reads))
    return cols


def read_glf_oracle(path: Path):
    """Read glf_oracle_*.bin -> structured array per column."""
    rec = np.dtype(
        [
            ("lk", np.uint8, 10),
            ("min_lk", np.uint8),
            ("depth", "<u4"),
            ("rms", np.uint8),
            ("cns", "<u4"),
        ]
    )
    return np.fromfile(path, dtype=rec)


def columns_to_batch(cols, max_depth=None):
    """Pad a list of (ref16, reads) to dense [B, D] arrays."""
    depths = [len(r) for _, r in cols]
    D = max_depth or max(max(depths), 1)
    B = len(cols)
    out = {
        "base16": np.zeros((B, D), np.int32),
        "baseq": np.zeros((B, D), np.int32),
        "mapq": np.zeros((B, D), np.int32),
        "strand": np.zeros((B, D), np.int32),
        "is_del": np.zeros((B, D), bool),
        "valid": np.zeros((B, D), bool),
        "ref16": np.array([r for r, _ in cols], np.int32),
        "n_total": np.array(depths, np.int32),
    }
    for i, (_, reads) in enumerate(cols):
        n = len(reads)
        if n:
            out["base16"][i, :n] = reads[:, 0]
            out["baseq"][i, :n] = reads[:, 1]
            out["mapq"][i, :n] = reads[:, 2]
            out["strand"][i, :n] = reads[:, 3]
            out["is_del"][i, :n] = reads[:, 4].astype(bool)
            out["valid"][i, :n] = True
    return out
