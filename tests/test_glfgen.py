"""glfgen + consensus-call parity vs. the reference column oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from somatic_sniper_tpu.models import tables as T
from somatic_sniper_tpu.models.consensus import glf2cns_batch
from somatic_sniper_tpu.models.glfgen import ColumnBatch, glfgen_batch

from .fixtures_util import columns_to_batch, read_columns, read_glf_oracle

CASES = {
    "default": dict(theta=0.85, het_rate=0.001, n_hap=2),
    "theta99": dict(theta=0.99, het_rate=0.001, n_hap=2),
    "nhap4": dict(theta=0.85, het_rate=0.002, n_hap=4),
}


def _run_batch(cols, params, precision, max_depth=None):
    tabs = T.build_tables(T.ModelParams(**params))
    batch = columns_to_batch(cols, max_depth=max_depth)
    cb = ColumnBatch(
        slots=jnp.asarray(batch["slots"]),
        depth=jnp.asarray(batch["n_total"]),
        ref16=jnp.asarray(batch["ref16"]),
    )
    g = glfgen_batch(cb, tabs.fk, tabs.coef, tabs.lhet, precision=precision)
    cns = glf2cns_batch(g.lk, jnp.asarray(batch["n_total"]), tabs.q_r_int)
    packed = (
        np.asarray(cns.base1).astype(np.uint32) << 28
        | np.asarray(cns.base2).astype(np.uint32) << 24
        | np.asarray(g.rms_mapq).astype(np.uint32) << 16
        | np.asarray(cns.score1).astype(np.uint32) << 8
        | np.asarray(cns.score2).astype(np.uint32)
    )
    return g, packed


def _depth_chunks(cols):
    """Two fixed depth buckets -> two compilations total per case."""
    depths = np.array([len(r) for _, r in cols])
    for lo, hi, pad in [(0, 64, 64), (64, 10**9, 1280)]:
        idx = np.nonzero((depths > lo) & (depths <= hi))[0] if lo else \
            np.nonzero(depths <= hi)[0]
        if len(idx):
            yield idx, pad


@pytest.mark.parametrize("case", list(CASES))
def test_glfgen_exact_matches_oracle(data_dir, case):
    cols = read_columns(data_dir / "glf_columns_in.bin")
    oracle = read_glf_oracle(data_dir / f"glf_oracle_{case}.bin")
    for chunk, pad in _depth_chunks(cols):
        sub = [cols[i] for i in chunk]
        osub = oracle[chunk]
        g, cns = _run_batch(sub, CASES[case], "exact", pad)
        np.testing.assert_array_equal(np.asarray(g.lk), osub["lk"])
        np.testing.assert_array_equal(np.asarray(g.min_lk), osub["min_lk"])
        np.testing.assert_array_equal(np.asarray(g.depth), osub["depth"])
        np.testing.assert_array_equal(np.asarray(g.rms_mapq), osub["rms"])
        np.testing.assert_array_equal(cns, osub["cns"])


def test_glfgen_fast_close_to_oracle(data_dir):
    """The f32 fast path must agree with the oracle on ~all columns."""
    cols = read_columns(data_dir / "glf_columns_in.bin")
    oracle = read_glf_oracle(data_dir / "glf_oracle_default.bin")
    n_mismatch = 0
    total = 0
    for chunk, pad in _depth_chunks(cols):
        sub = [cols[i] for i in chunk]
        osub = oracle[chunk]
        g, cns = _run_batch(sub, CASES["default"], "fast", pad)
        lk_diff = np.abs(
            np.asarray(g.lk).astype(int) - osub["lk"].astype(int)
        ).max(axis=1)
        n_mismatch += int((lk_diff > 1).sum())
        total += len(sub)
        np.testing.assert_array_equal(np.asarray(g.depth), osub["depth"])
    assert n_mismatch / total < 0.005, f"{n_mismatch}/{total} columns off"
