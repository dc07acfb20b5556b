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
    """Pad a list of (ref16, reads) to a packed-slot [B, D] batch."""
    from somatic_sniper_tpu.models.glfgen import pack_slots_np

    depths = [len(r) for _, r in cols]
    D = max_depth or max(max(depths), 1)
    B = len(cols)
    slots = np.zeros((B, D), np.uint32)
    for i, (_, reads) in enumerate(cols):
        n = len(reads)
        if n:
            slots[i, :n] = pack_slots_np(
                reads[:, 0], reads[:, 1], reads[:, 2], reads[:, 3],
                reads[:, 4].astype(bool),
            )
    return {
        "slots": slots,
        "ref16": np.array([r for r, _ in cols], np.int32),
        "n_total": np.array(depths, np.int32),
    }
