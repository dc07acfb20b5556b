"""Single-host calling driver: BAM pair -> batched kernel -> records.

This is the TPU-native inversion of the reference's main loop
(reference sniper_pileup.c:226-266 + somatic_sniper.c:109-273): instead of
one callback per reference position, whole windows of pileup columns are
columnarized on the host, scored as dense batches on the device, and only
emitted sites return to the host for exact dqstats + text formatting.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from .constants import NT16_TABLE
from .io.bam import BamHeader, BamReads, read_bam
from .io.fasta import FastaFile
from .models.glfgen import ColumnBatch
from .models.somatic import CallResult, call_batch
from .models.tables import ModelParams, ModelTables, build_tables
from .output.dqstats import get_dqstats
from .output.records import SampleData, SniperRecord
from .pileup.columnize import (
    ColumnarPileup,
    PairedBatch,
    columnize,
    paired_batches,
    split_key,
    unpack_slots,
)


@dataclass
class RefCache:
    """Per-tid reference fetch cache (reference somatic_sniper.c:112-117)."""

    fasta: FastaFile | None
    header: BamHeader

    def __post_init__(self):
        self._tid = -1
        self._seq: bytes | None = None

    def get(self, tid: int) -> bytes | None:
        if tid != self._tid:
            self._tid = tid
            name = self.header.ref_names[tid]
            self._seq = self.fasta.fetch(name) if self.fasta else None
        return self._seq


def _ref_arrays(batch: PairedBatch, refcache: RefCache):
    """Raw ref char + 4-bit code per column of a batch."""
    tids, poss = split_key(batch.keys)
    chars = np.full(len(tids), ord("N"), np.int32)
    for tid in np.unique(tids):
        seq = refcache.get(int(tid))
        m = tids == tid
        if seq is None:
            continue
        p = poss[m]
        ok = p < len(seq)
        arr = np.frombuffer(seq, dtype=np.uint8)
        vals = np.where(ok, arr[np.minimum(p, len(seq) - 1)], ord("N"))
        chars[m] = vals
    ref16 = NT16_TABLE[chars].astype(np.int32)
    return chars, ref16


class DeviceTables:
    """Model tables resident on device, converted once per precision.

    Re-sending the 32 MiB coef table with every batch dominates runtime
    (host->device transfer); device_put once and reuse.
    """

    def __init__(self, tabs: ModelTables, precision: str):
        f = jnp.float64 if precision == "exact" else jnp.float32
        self.fk = jax.device_put(jnp.asarray(tabs.fk, f))
        self.coef = jax.device_put(jnp.asarray(tabs.coef, f))
        self.lhet = jax.device_put(jnp.asarray(tabs.lhet, f))
        self.solo_prior = jax.device_put(jnp.asarray(tabs.solo_prior))
        self.joint_prior = jax.device_put(jnp.asarray(tabs.joint_prior))
        self.qadd = jax.device_put(jnp.asarray(tabs.qadd))
        self.q_r_int = tabs.q_r_int
        self.params = tabs.params


def _column_slice(pu: ColumnarPileup, key: int):
    i = int(np.searchsorted(pu.ukeys, key))
    s, e = int(pu.offsets[i]), int(pu.offsets[i + 1])
    return slice(s, e)


def _sample_data(pu, sl, rb4, wanted, gt, jgt, jcq, cnsq, vaq, score, status):
    base16, baseq, mapq, strand, is_del = unpack_slots(pu.slots[sl])
    dq = get_dqstats(base16, baseq, mapq, strand, is_del, rb4, wanted)
    return SampleData(
        genotype=gt,
        joint_genotype=jgt,
        joint_consensus_quality=jcq,
        consensus_quality=cnsq,
        variant_allele_quality=vaq,
        somatic_score=score,
        variant_status=status,
        dqstats=dq,
    )


def call_pair(
    tumor_bam: str,
    normal_bam: str,
    ref_fasta: str | None,
    params: ModelParams = ModelParams(),
    precision: str = "exact",
    max_batch: int = 65536,
) -> Iterator[SniperRecord]:
    """Run the full caller, yielding emitted records in coordinate order."""
    from .io import native_api

    if native_api.available():
        header_t, pu_t = native_api.load_and_columnize(
            tumor_bam, params.flag_mask, params.mapq_threshold
        )
        header_n, pu_n = native_api.load_and_columnize(
            normal_bam, params.flag_mask, params.mapq_threshold
        )
    else:
        header_t, reads_t = read_bam(tumor_bam)
        header_n, reads_n = read_bam(normal_bam)
        pu_t = columnize(reads_t, params.flag_mask, params.mapq_threshold)
        pu_n = columnize(reads_n, params.flag_mask, params.mapq_threshold)
    fasta = FastaFile(ref_fasta) if ref_fasta else None
    refcache = RefCache(fasta, header_t)
    tabs = build_tables(params)

    dtabs = DeviceTables(tabs, precision)
    # submit all batches first (async dispatch overlaps device compute and
    # transfers with host-side padding of later batches), collect after
    pending = []
    for batch in paired_batches(pu_t, pu_n, max_batch=max_batch):
        chars, ref16 = _ref_arrays(batch, refcache)
        dev_res, b0 = submit_call_batch(batch, ref16, chars, dtabs, precision)
        pending.append((batch, chars, ref16, dev_res, b0))

    records: list[tuple[int, SniperRecord]] = []
    for batch, chars, ref16, dev_res, b0 in pending:
        host = jax.device_get(dev_res)
        res = CallResult(*(v[:b0] for v in host))
        records.extend(
            emit_records(batch, res, chars, ref16, pu_t, pu_n,
                         refcache.header)
        )
    records.sort(key=lambda kv: kv[0])
    for _, rec in records:
        yield rec


def _pad_b(arr: np.ndarray, B: int):
    """Pad the leading (batch) axis to B with zeros."""
    if arr.shape[0] == B:
        return arr
    pad = [(0, B - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)


def _b_bucket(b: int, minimum: int = 256) -> int:
    B = minimum
    while B < b:
        B *= 2
    return B


def submit_call_batch(
    batch: PairedBatch,
    ref16: np.ndarray,
    chars: np.ndarray,
    dtabs: DeviceTables,
    precision: str,
) -> tuple[CallResult, int]:
    """Dispatch one padded batch to the device (async); returns the
    on-device CallResult and the unpadded column count."""
    # pad the batch axis to a power-of-two bucket so XLA compiles once per
    # (B, D) bucket instead of once per distinct column count
    b0 = len(batch.keys)
    B = _b_bucket(b0)
    p = dtabs.params
    # one stacked upload for the two big slot arrays, one for the depths
    # (per-array transfers pay interconnect latency each)
    stacked = jnp.asarray(
        np.stack([_pad_b(batch.tumor, B), _pad_b(batch.normal, B)])
    )
    depths = jnp.asarray(
        np.stack([_pad_b(batch.n_tumor, B), _pad_b(batch.n_normal, B)])
    )
    ref16_d = jnp.asarray(_pad_b(ref16, B))
    res = call_batch(
        ColumnBatch(slots=stacked[0], depth=depths[0], ref16=ref16_d),
        ColumnBatch(slots=stacked[1], depth=depths[1], ref16=ref16_d),
        dtabs.fk,
        dtabs.coef,
        dtabs.lhet,
        dtabs.solo_prior,
        dtabs.joint_prior,
        dtabs.qadd,
        dtabs.q_r_int,
        precision=precision,
        use_joint=p.use_joint_priors,
        min_somatic_qual=p.min_somatic_qual,
        include_loh=p.include_loh,
        include_gor=p.include_gor,
        cap_mapq=p.cap_mapq,
        theta=p.theta,
        eta=p.eta,
    )
    return res, b0


def run_call_batch(batch, ref16, chars, dtabs, precision) -> CallResult:
    """Synchronous convenience wrapper around submit_call_batch."""
    res, b0 = submit_call_batch(batch, ref16, chars, dtabs, precision)
    host = jax.device_get(res)  # one transfer for all result fields
    return CallResult(*(v[:b0] for v in host))


def emit_records(
    batch: PairedBatch,
    res: CallResult,
    chars: np.ndarray,
    ref16: np.ndarray,
    pu_t: ColumnarPileup,
    pu_n: ColumnarPileup,
    header: BamHeader,
) -> list[tuple[int, SniperRecord]]:
    emit = np.asarray(res.emit)
    idx = np.nonzero(emit)[0]
    out = []
    f = {k: np.asarray(v) for k, v in res._asdict().items()}
    for i in idx:
        key = int(batch.keys[i])
        tid = key >> 40
        pos = key & ((1 << 40) - 1)
        rb4 = int(ref16[i])
        wanted = rb4 | int(f["tumor_eff_gt"][i]) | int(f["normal_eff_gt"][i])
        sl_t = _column_slice(pu_t, key)
        sl_n = _column_slice(pu_n, key)
        tumor = _sample_data(
            pu_t, sl_t, rb4, wanted,
            int(f["tumor_gt"][i]), int(f["joint_tumor_gt"][i]),
            int(f["joint_cnsq"][i]), int(f["tumor_cnsq"][i]),
            int(f["tumor_vaq"][i]), int(f["somatic_score"][i]),
            int(f["tumor_status"][i]),
        )
        normal = _sample_data(
            pu_n, sl_n, rb4, wanted,
            int(f["normal_gt"][i]), int(f["joint_normal_gt"][i]),
            int(f["joint_cnsq"][i]), int(f["normal_cnsq"][i]),
            int(f["normal_vaq"][i]), -1,
            int(f["normal_status"][i]),
        )
        rec = SniperRecord(
            seq_name=header.ref_names[tid],
            pos=int(pos),
            ref_base=int(chars[i]),
            ref_base4=rb4,
            tumor=tumor,
            normal=normal,
        )
        out.append((key, rec))
    return out
