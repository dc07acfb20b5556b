"""slab_fill_pair equivalence: the fused native fill must write exactly
the raw kept-only slot lanes + packed metadata the device kernel
expects (models/somatic.py call_batch_packed raw32 layout)."""

import numpy as np

from somatic_sniper_tpu.io import native_api
from somatic_sniper_tpu.io.bam import read_bam_header
from somatic_sniper_tpu.io.fasta import FastaFile
from somatic_sniper_tpu.models.tables import ModelParams, build_tables
from somatic_sniper_tpu.pileup.prefilter import prefilter_tables
from somatic_sniper_tpu.runner import _ref_blob


def _expected_lanes(pu, ci, D):
    """Numpy oracle: per column, the non-deleted slot words (masked to
    the 21 packing bits), first D lanes, zero-padded, plus kept count."""
    out = np.zeros((len(ci), D), np.uint32)
    nk = np.zeros(len(ci), np.int32)
    for r, c in enumerate(np.asarray(ci)):
        w = np.asarray(
            pu.slots[pu.offsets[c]:pu.offsets[c + 1]], np.uint32
        )
        w = w[((w >> 21) & 1) == 0] & 0x1FFFFF
        nk[r] = len(w)
        out[r, : min(len(w), D)] = w[:D]
    return out, nk


def test_fused_fill_matches_raw_slots(data_dir):
    d = data_dir / "e2e" / "sim1"
    _, pu_t = native_api.load_and_columnize(str(d / "tumor.bam"))
    _, pu_n = native_api.load_and_columnize(str(d / "normal.bam"))
    tabs = build_tables(ModelParams())
    blob, off = _ref_blob(FastaFile(d / "ref.fa"),
                          read_bam_header(d / "tumor.bam"))
    gmin, margin = prefilter_tables(tabs)
    plan = native_api.paired_plan(
        pu_t, pu_n, blob, off, (16, 32, 64, 128), fk=tabs.fk,
        gmin=gmin, margin=margin, coef=tabs.coef, lhet=tabs.lhet,
        q_r_int=tabs.q_r_int, cns_mode="proof",
    )
    n = len(plan.keys)
    assert n > 8
    D, cap = 32, 60
    ref16 = np.ascontiguousarray(plan.ref16, np.int32)

    out_t = np.full((n, D), 0xABABABAB, np.uint32)  # junk: must overwrite
    out_n = np.full((n, D), 0xCDCDCDCD, np.uint32)
    m0 = np.zeros(n, np.int32)
    m1 = np.zeros(n, np.int32)
    m2 = np.zeros(n, np.int32)
    native_api.slab_fill_pair(
        pu_t, pu_n, plan.ti, plan.ni, ref16, plan.d_t, plan.d_n,
        D, cap, out_t, out_n, m0, m1, m2,
    )

    exp_t, nk_t = _expected_lanes(pu_t, plan.ti, D)
    exp_n, nk_n = _expected_lanes(pu_n, plan.ni, D)
    assert (out_t == exp_t).all()
    assert (out_n == exp_n).all()
    assert (m0 == ref16.astype(np.int32) << 24).all()
    assert (m1 == 0).all()
    exp2 = (
        plan.d_t.astype(np.uint32)
        | (plan.d_n.astype(np.uint32) << 8)
        | (nk_t.view(np.uint32).astype(np.uint32) << 16)
        | (nk_n.view(np.uint32).astype(np.uint32) << 24)
    ).view(np.int32)
    assert (m2 == exp2).all()
