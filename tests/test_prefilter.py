"""Pure-ref column prefilter: safety + native/numpy parity.

The filter may only drop columns the caller could never emit
(reference somatic_sniper.c:156 SNP gate); these tests check that
(a) filtered and unfiltered runs produce identical records,
(b) the native C++ flag pass and the vectorized numpy fallback agree,
(c) every flagged column's exact consensus call is hom-ref.
"""

import numpy as np
import pytest

from somatic_sniper_tpu.io import native_api
from somatic_sniper_tpu.io.fasta import FastaFile
from somatic_sniper_tpu.models.tables import ModelParams, build_tables
from somatic_sniper_tpu.pileup.prefilter import (
    build_ref16,
    prefilter_tables,
    pure_flags,
    pure_flags_np,
)
from somatic_sniper_tpu.runner import call_pair


def _sim_dir(data_dir):
    return data_dir / "e2e" / "sim1"


def _load(data_dir, sample):
    d = _sim_dir(data_dir)
    return native_api.load_and_columnize(str(d / f"{sample}.bam"))


def _refblob(data_dir, header):
    fasta = FastaFile(str(_sim_dir(data_dir) / "ref.fa"))
    return build_ref16([fasta.fetch(n) for n in header.ref_names])


@pytest.fixture(scope="module")
def tabs():
    return build_tables(ModelParams())


def test_native_matches_numpy(data_dir, tabs):
    header, pu = _load(data_dir, "tumor")
    ref16, ref_off = _refblob(data_dir, header)
    gmin, margin = prefilter_tables(tabs)
    f_native = pure_flags(pu, ref16, ref_off, tabs.fk, gmin, margin)
    f_np = pure_flags_np(pu, ref16, ref_off, tabs.fk, gmin, margin)
    assert np.array_equal(f_native, f_np)
    # the filter must actually fire on clean simulated data
    assert f_native.mean() > 0.3


def test_flagged_columns_call_hom_ref(data_dir, tabs):
    """Exact-path consensus of every flagged column equals the ref set."""
    import jax.numpy as jnp

    from somatic_sniper_tpu.models.consensus import glf2cns_batch
    from somatic_sniper_tpu.models.glfgen import ColumnBatch, glfgen_batch

    header, pu = _load(data_dir, "tumor")
    ref16, ref_off = _refblob(data_dir, header)
    gmin, margin = prefilter_tables(tabs)
    flags = pure_flags(pu, ref16, ref_off, tabs.fk, gmin, margin)
    idx = np.nonzero(flags)[0][:512]
    assert len(idx) > 100
    depths = pu.depths[idx]
    D = int(depths.max())
    B = len(idx)
    slots = np.zeros((B, D), np.uint32)
    for b, ci in enumerate(idx):
        s, e = pu.offsets[ci], pu.offsets[ci + 1]
        slots[b, : e - s] = pu.slots[s:e]
    tid = (pu.ukeys[idx] >> 40).astype(np.int64)
    pos = (pu.ukeys[idx] & ((1 << 40) - 1)).astype(np.int64)
    rb4 = ref16[ref_off[tid] + pos].astype(np.int32)
    cb = ColumnBatch(
        slots=jnp.asarray(slots),
        depth=jnp.asarray(depths.astype(np.int32)),
        ref16=jnp.asarray(rb4),
    )
    g = glfgen_batch(cb, tabs.fk, tabs.coef, tabs.lhet, precision="exact")
    cns = glf2cns_batch(g.lk, cb.depth, tabs.q_r_int)
    assert np.array_equal(np.asarray(cns.base1), rb4)


def test_prefilter_output_identical(data_dir):
    d = _sim_dir(data_dir)
    args = (str(d / "tumor.bam"), str(d / "normal.bam"), str(d / "ref.fa"))
    params = ModelParams(min_somatic_qual=0)
    on = list(call_pair(*args, params=params, prefilter=True))
    off = list(call_pair(*args, params=params, prefilter=False))
    assert len(on) == len(off) and len(on) > 0
    assert on == off


def test_prefilter_output_identical_joint(data_dir):
    d = _sim_dir(data_dir)
    args = (str(d / "tumor.bam"), str(d / "normal.bam"), str(d / "ref.fa"))
    params = ModelParams(use_joint_priors=True, include_loh=False,
                         include_gor=False, min_somatic_qual=0)
    on = list(call_pair(*args, params=params, prefilter=True))
    off = list(call_pair(*args, params=params, prefilter=False))
    assert on == off and len(on) > 0


def test_prefilter_disabled_for_extreme_het_rate():
    tabs = build_tables(ModelParams(het_rate=0.45))
    assert tabs.q_r_int < 1
    assert prefilter_tables(tabs) is None


def test_native_cns_matches_exact_path(data_dir, tabs):
    """The plan-time native consensus (glf_exact_cns) must equal the JAX
    exact path bit for bit — it decides which columns never reach the
    device, so any divergence silently changes output."""
    import jax.numpy as jnp

    from somatic_sniper_tpu.models.consensus import glf2cns_batch
    from somatic_sniper_tpu.models.glfgen import ColumnBatch, glfgen_batch

    header, pu = _load(data_dir, "tumor")
    ref16, ref_off = _refblob(data_dir, header)
    idx = np.arange(0, len(pu.ukeys), 7, dtype=np.int64)[:1024]
    tid = (pu.ukeys[idx] >> 40).astype(np.int64)
    pos = (pu.ukeys[idx] & ((1 << 40) - 1)).astype(np.int64)
    rb4 = ref16[ref_off[tid] + pos].astype(np.int32)
    cns_nat, keep_nat = native_api.glf_cns(
        pu, idx, rb4, tabs.coef, tabs.lhet, tabs.fk, tabs.q_r_int
    )
    depths = pu.depths[idx]
    D = int(depths.max())
    B = len(idx)
    slots = np.zeros((B, D), np.uint32)
    for b, ci in enumerate(idx):
        s, e = pu.offsets[ci], pu.offsets[ci + 1]
        slots[b, : e - s] = pu.slots[s:e]
    cb = ColumnBatch(
        slots=jnp.asarray(slots),
        depth=jnp.asarray(depths.astype(np.int32)),
        ref16=jnp.asarray(rb4),
    )
    g = glfgen_batch(cb, tabs.fk, tabs.coef, tabs.lhet, precision="exact")
    cns = glf2cns_batch(g.lk, cb.depth, tabs.q_r_int)
    assert np.array_equal(cns_nat, np.asarray(cns.base1))
    assert np.array_equal(keep_nat, np.asarray(g.depth))


def test_cns_filter_output_identical_fast(data_dir):
    """Fast-precision (planned/native) path: the exact dual-consensus
    plan filter must not change emitted records, including at the
    maximally permissive threshold where every consensus-differing
    column emits."""
    d = _sim_dir(data_dir)
    args = (str(d / "tumor.bam"), str(d / "normal.bam"), str(d / "ref.fa"))
    for params in (ModelParams(), ModelParams(min_somatic_qual=0),
                   ModelParams(use_joint_priors=True)):
        on = list(call_pair(*args, params=params, precision="fast",
                            prefilter=True))
        off = list(call_pair(*args, params=params, precision="fast",
                             prefilter=False))
        assert on == off
        assert len(on) > 0


def test_cns_filter_scores_only_near_emitted(data_dir, monkeypatch):
    """The filter should leave close to nothing un-emittable: on clean
    simulated data the full gate lands within 2x of the emitted-record
    count; fast mode's proof-only gate (which skips the expensive f64
    dual-consensus evals and lets the device decide) stays within 4x
    (regression canaries for filter strength)."""
    from somatic_sniper_tpu.utils.stats import STATS

    d = _sim_dir(data_dir)
    args = (str(d / "tumor.bam"), str(d / "normal.bam"), str(d / "ref.fa"))

    monkeypatch.setenv("SNIPER_PLAN_GATE", "full")
    STATS.reset()
    recs = list(call_pair(*args, precision="fast", prefilter=True))
    scored_full = STATS.counts.get("columns_scored", 0)
    assert scored_full <= max(2 * len(recs), 64)

    monkeypatch.setenv("SNIPER_PLAN_GATE", "proof")
    STATS.reset()
    recs_p = list(call_pair(*args, precision="fast", prefilter=True))
    scored_proof = STATS.counts.get("columns_scored", 0)
    assert recs_p == recs  # gate depth never changes output
    assert scored_proof <= max(4 * len(recs), 64)


def test_homref_proof_sound(data_dir, tabs):
    """Tier-2a near-pure shortcut soundness: every column the proof
    accepts must have exact consensus == ref code and the same keep
    count as glf_exact_cns — over ALL columns of both sim samples."""
    for sample in ("tumor", "normal"):
        header, pu = _load(data_dir, sample)
        ref16, ref_off = _refblob(data_dir, header)
        idx = np.arange(len(pu.ukeys), dtype=np.int64)
        tid = (pu.ukeys >> 40).astype(np.int64)
        pos = (pu.ukeys & ((1 << 40) - 1)).astype(np.int64)
        rb4 = ref16[ref_off[tid] + pos].astype(np.int32)
        proven, keep_p = native_api.glf_cns_proof(
            pu, idx, rb4, tabs.coef, tabs.lhet, tabs.fk, tabs.q_r_int
        )
        cns, keep_e = native_api.glf_cns(
            pu, idx, rb4, tabs.coef, tabs.lhet, tabs.fk, tabs.q_r_int
        )
        pm = proven.astype(bool)
        assert pm.any(), "proof never fires on sim data"
        np.testing.assert_array_equal(cns[pm], rb4[pm])
        np.testing.assert_array_equal(keep_p[pm], keep_e[pm])
        # proof must never fire on an ambiguous reference code
        assert not pm[~np.isin(rb4, (1, 2, 4, 8))].any()


def test_fused_flags_match_standalone(data_dir, tabs):
    """Flags computed inside the fused load's scatter pass must equal
    the standalone pileup_flags pass (same margin-bound semantics, same
    accumulation order)."""
    d = _sim_dir(data_dir)
    header, pu_plain = native_api.load_and_columnize(
        str(d / "tumor.bam")
    )
    ref16, ref_off = _refblob(data_dir, header)
    pt = prefilter_tables(tabs)
    assert pt is not None
    gmin, margin = pt
    standalone = pure_flags(pu_plain, ref16, ref_off, tabs.fk, gmin,
                            margin)
    _, pu_flagged = native_api.load_and_columnize(
        str(d / "tumor.bam"),
        flag_args=(ref16, ref_off, tabs.fk, gmin, margin),
    )
    fused = np.ctypeslib.as_array(
        pu_flagged.owner._ptr.contents.pure,
        shape=(len(pu_flagged.ukeys),),
    )
    np.testing.assert_array_equal(np.asarray(fused, np.uint8),
                                  np.asarray(standalone, np.uint8))
