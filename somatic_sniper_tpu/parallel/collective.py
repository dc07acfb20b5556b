"""Cross-process record merge over XLA collectives.

The file-based merge (scripts.merge_shards) assumes the per-shard
outputs land on a filesystem the merging host can read — true on a dev
box, not on a pod without shared storage.  This path ships the shard
bytes over the accelerator fabric instead (SURVEY §2.3's "allgather of
per-shard call records for deterministic merged output"): every process
all-gathers its shard's output bytes, padded to the global max length,
and process 0 reconstructs the shards in process order and writes the
merged file — byte-identical to the file-based merge of the same
shards.

Built on jax.experimental.multihost_utils.process_allgather, i.e. an
XLA all_gather over ICI/DCN; host gRPC is used only for coordination,
exactly the reference-free green-field design SURVEY §2.3 calls for.
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path

import numpy as np

from ..scripts.merge_shards import merge


def collective_merge(
    out_path: str, shard_path: str, process_id: int, num_processes: int
) -> None:
    """All-gather every process's shard file; process 0 writes the
    merged output.  Must be called by ALL processes (it is a
    collective); non-zero processes return after contributing."""
    from jax.experimental import multihost_utils as mhu

    data = np.frombuffer(Path(shard_path).read_bytes(), np.uint8)
    lens = np.asarray(
        mhu.process_allgather(np.array([len(data)], np.int64))
    ).reshape(-1)
    m = max(int(lens.max()), 1)
    padded = np.zeros(m, np.uint8)
    padded[: len(data)] = data
    blobs = np.asarray(mhu.process_allgather(padded))

    if process_id != 0:
        return
    with tempfile.TemporaryDirectory() as td:
        paths = []
        for i in range(num_processes):
            p = os.path.join(td, f"shard{i}")
            Path(p).write_bytes(blobs[i, : int(lens[i])].tobytes())
            paths.append(p)
        merge(out_path, paths)
