"""Per-site depth/quality stats (output/dqstats.py, reference
dqstats.c:6-53): scalar vs numpy-batch vs native-batch parity."""

from __future__ import annotations

import numpy as np
import pytest

from somatic_sniper_tpu.io import native_api
from somatic_sniper_tpu.output.dqstats import get_dqstats, get_dqstats_batch

pytestmark = pytest.mark.skipif(
    not native_api.available(), reason="native toolchain unavailable"
)


def _column_arrays(pu, c):
    s = pu.slots[pu.offsets[c]:pu.offsets[c + 1]].astype(np.uint32)
    return (
        (s >> 16) & 0xF,        # base16
        (s >> 8) & 0xFF,        # baseq
        s & 0xFF,               # mapq
        (s >> 20) & 1,          # strand
        ((s >> 21) & 1) != 0,   # is_del
    )


def test_native_batch_matches_scalar_and_numpy(data_dir):
    _, pu = native_api.load_and_columnize(
        str(data_dir / "e2e/sim1/tumor.bam")
    )
    assert pu.owner is not None and pu.owner._ptr is not None

    rng = np.random.default_rng(7)
    n_cols = len(pu.ukeys)
    col_idx = rng.choice(n_cols, size=min(200, n_cols), replace=False)
    col_idx = np.sort(col_idx).astype(np.int64)
    K = len(col_idx)
    # rb4 spans real ref codes plus the never-matching 15 ('N');
    # wanted spans the full 4-bit mask space including 0.
    rb4 = rng.choice([1, 2, 4, 8, 15], size=K).astype(np.int32)
    wanted = rng.integers(0, 16, size=K).astype(np.int32)

    native_rows = get_dqstats_batch(pu, col_idx, rb4, wanted)

    # numpy fallback: same pileup arrays, owner stripped
    pu_no_owner = pu._replace(owner=None)
    numpy_rows = get_dqstats_batch(pu_no_owner, col_idx, rb4, wanted)

    assert len(native_rows) == len(numpy_rows) == K
    for k in range(K):
        b16, bq, mq, st, dl = _column_arrays(pu, int(col_idx[k]))
        scalar = get_dqstats(b16, bq, mq, st, dl, int(rb4[k]),
                             int(wanted[k]))
        assert native_rows[k] == scalar, f"native!=scalar at k={k}"
        assert numpy_rows[k] == scalar, f"numpy!=scalar at k={k}"


def test_empty_and_eq_base_quirk(data_dir):
    """K=0 short-circuit, and '=' (code 0) counting in all four
    base_occ buckets (reference quirk, dqstats.c:23-33)."""
    _, pu = native_api.load_and_columnize(str(data_dir / "t-small.bam"))
    assert get_dqstats_batch(pu, [], [], []) == []

    d = get_dqstats(
        np.array([0, 1]), np.array([30, 20]), np.array([50, 40]),
        np.array([0, 1]), np.array([False, False]), 1, 0xF,
    )
    # '=' lands in every bucket; A bucket additionally holds base 1
    assert list(d.base_occ) == [2, 1, 1, 1]
    assert d.total_depth == 2
