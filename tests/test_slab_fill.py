"""slab_fill_pair equivalence: the fused native fill must reproduce the
two-pad + numpy metadata assembly it replaced, bit for bit."""

import numpy as np

from somatic_sniper_tpu.io import native_api
from somatic_sniper_tpu.models.tables import ModelParams, build_tables
from somatic_sniper_tpu.pileup.prefilter import prefilter_tables
from somatic_sniper_tpu.runner import _ref_blob
from somatic_sniper_tpu.io.fasta import FastaFile
from somatic_sniper_tpu.io.bam import read_bam_header


def test_fused_fill_matches_two_pass(data_dir):
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
    sel = np.arange(n, dtype=np.int64)
    ref16 = np.ascontiguousarray(plan.ref16, np.int32)

    # fused
    out_t = np.full((n, D), 0xAB, np.uint16)  # junk: fill must overwrite
    out_n = np.full((n, D), 0xCD, np.uint16)
    m0 = np.zeros(n, np.int32)
    m1 = np.zeros(n, np.int32)
    m2 = np.zeros(n, np.int32)
    native_api.slab_fill_pair(
        pu_t, pu_n, plan.ti, plan.ni, ref16, plan.d_t, plan.d_n,
        D, cap, out_t, out_n, m0, m1, m2,
    )

    # original two-pass path
    ref_t, nk_t, rms_t = pu_t.owner.pad16(plan.ti, ref16, D, cap)
    ref_n, nk_n, rms_n = pu_n.owner.pad16(plan.ni, ref16, D, cap)
    assert (out_t == ref_t).all()
    assert (out_n == ref_n).all()
    exp0 = rms_t | (ref16.astype(np.int32) << 24)
    exp2 = (
        plan.d_t.astype(np.uint32)
        | (plan.d_n.astype(np.uint32) << 8)
        | (nk_t.view(np.uint32) << 16)
        | (nk_n.view(np.uint32) << 24)
    ).view(np.int32)
    assert (m0 == exp0).all()
    assert (m1 == rms_n).all()
    assert (m2 == exp2).all()
