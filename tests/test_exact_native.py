"""Native all-host exact scorer vs the JAX exact path.

exact_pair_rows (sniper_native.cpp) replicates consensus + posteriors/
joint scoring + gating downstream of glfgen; these tests pin it field-
for-field against models.somatic.call_batch on real sim columns, and
end-to-end against the pure-JAX exact pipeline.
"""

from __future__ import annotations

import numpy as np
import pytest

from somatic_sniper_tpu.io import native_api
from somatic_sniper_tpu.io.fasta import FastaFile
from somatic_sniper_tpu.models.somatic import COMPACT_FIELDS
from somatic_sniper_tpu.models.tables import ModelParams, build_tables
from somatic_sniper_tpu.pileup.prefilter import build_ref16

pytestmark = pytest.mark.skipif(
    not native_api.available(), reason="native toolchain unavailable"
)


def _setup(data_dir):
    d = data_dir / "e2e" / "sim1"
    h, pu_t = native_api.load_and_columnize(str(d / "tumor.bam"))
    _, pu_n = native_api.load_and_columnize(str(d / "normal.bam"))
    fasta = FastaFile(str(d / "ref.fa"))
    ref_blob, ref_off = build_ref16(
        [fasta.fetch(n) for n in h.ref_names]
    )
    common, it, inn = np.intersect1d(
        pu_t.ukeys, pu_n.ukeys, assume_unique=True, return_indices=True
    )
    tid = (common >> 40).astype(np.int64)
    pos = (common & ((1 << 40) - 1)).astype(np.int64)
    rb4 = ref_blob[ref_off[tid] + pos].astype(np.int32)
    return pu_t, pu_n, it.astype(np.int64), inn.astype(np.int64), rb4


@pytest.mark.parametrize("params", [
    ModelParams(min_somatic_qual=0),
    ModelParams(min_somatic_qual=0, use_joint_priors=True,
                somatic_mutation_rate=0.0001),
    ModelParams(min_somatic_qual=0, use_priors=False),
    ModelParams(min_somatic_qual=20, include_loh=False,
                include_gor=False),
])
def test_rows_match_jax_exact(data_dir, params):
    import jax.numpy as jnp

    from somatic_sniper_tpu.models.glfgen import ColumnBatch
    from somatic_sniper_tpu.models.somatic import call_batch

    pu_t, pu_n, it, inn, rb4 = _setup(data_dir)
    tabs = build_tables(params)
    rows = native_api.exact_pair_rows(
        pu_t, pu_n, it, inn, rb4, tabs, params.use_joint_priors,
        params.min_somatic_qual, params.include_loh, params.include_gor,
    )

    def batch_of(pu, idx):
        depths = pu.depths[idx]
        D = int(depths.max())
        B = len(idx)
        slots = np.zeros((B, D), np.uint32)
        for b, ci in enumerate(idx):
            s, e = pu.offsets[ci], pu.offsets[ci + 1]
            slots[b, : e - s] = pu.slots[s:e]
        return ColumnBatch(
            slots=jnp.asarray(slots),
            depth=jnp.asarray(depths.astype(np.int32)),
            ref16=jnp.asarray(rb4),
        )

    res = call_batch(
        batch_of(pu_t, it), batch_of(pu_n, inn), tabs.fk, tabs.coef,
        tabs.lhet, tabs.solo_prior, tabs.joint_prior, tabs.qadd,
        tabs.q_r_int, precision="exact",
        use_joint=params.use_joint_priors,
        min_somatic_qual=params.min_somatic_qual,
        include_loh=params.include_loh, include_gor=params.include_gor,
    )
    emit = np.asarray(res.emit)
    want_idx = np.flatnonzero(emit)
    np.testing.assert_array_equal(rows[:, 0], want_idx)
    for j, name in enumerate(COMPACT_FIELDS):
        np.testing.assert_array_equal(
            rows[:, 1 + j], np.asarray(getattr(res, name))[want_idx],
            err_msg=f"field {name}",
        )


def test_exact_e2e_native_matches_jax(data_dir, monkeypatch):
    """End-to-end: the all-host exact pipeline and the JAX exact pipeline
    emit identical records (the runner picks native automatically; force
    the JAX route by disabling the native gate)."""
    from somatic_sniper_tpu import runner
    from somatic_sniper_tpu.runner import call_pair

    d = data_dir / "e2e" / "sim1"
    args = (str(d / "tumor.bam"), str(d / "normal.bam"),
            str(d / "ref.fa"))
    for params in (ModelParams(), ModelParams(use_joint_priors=True)):
        native = list(call_pair(*args, params=params, precision="exact"))
        monkeypatch.setattr(runner, "can_exact_native",
                            lambda *a: False)
        via_jax = list(call_pair(*args, params=params, precision="exact"))
        monkeypatch.undo()
        assert native == via_jax
        assert len(native) > 0
