"""Native bulk text emission (sniper_native.cpp emit_lines) is
byte-identical to the Python line builders (output.fast_emit).

fast_emit is itself byte-diffed against output.formatters (the readable
reference implementations of output_classic.c / output_vcf.c /
output_bed.c) by tests/test_fast_emit.py, and the e2e golden suite pins
the whole chain against the reference binary — this test pins the
native-vs-Python pair directly on adversarial synthetic inputs
(all 4-bit genotype codes incl. 0, joint/non-joint, masked-empty
mean-quality fields, multi-allele ALT strings, boundary field values)
so a renderer divergence fails here with a readable diff rather than
deep inside an e2e byte comparison.
"""

import numpy as np
import pytest

from somatic_sniper_tpu.io import native_api
from somatic_sniper_tpu.models.somatic import COMPACT_FIELDS
from somatic_sniper_tpu.output.fast_emit import LINE_BUILDERS

pytestmark = pytest.mark.skipif(
    not native_api.available(), reason="native library unavailable"
)

REF_NAMES = ["chr1", "contig_with_long_name_17", "c"]


def _random_case(rng, K):
    tids = rng.integers(0, len(REF_NAMES), K)
    poss = rng.integers(0, 1 << 33, K)
    chars = rng.choice([ord(c) for c in "ACGTN"], K)
    rb4 = np.asarray(
        [1, 2, 4, 8], np.int64
    )[rng.integers(0, 4, K)]
    f = {}
    # genotype codes: full 4-bit range including 0 and 15
    for k in ("tumor_gt", "normal_gt"):
        f[k] = rng.integers(0, 16, K)
    # joint genotypes: 0 (absent -> '.' JGQ) half the time
    for k in ("joint_tumor_gt", "joint_normal_gt"):
        f[k] = rng.integers(0, 16, K) * rng.integers(0, 2, K)
    for k in ("tumor_cnsq", "normal_cnsq", "tumor_vaq", "normal_vaq",
              "joint_cnsq", "somatic_score"):
        f[k] = rng.integers(0, 256, K)
    for k in ("tumor_status", "normal_status"):
        f[k] = rng.integers(0, 5, K)
    # boundary rows: zeros (masked-empty "0" fields) and large values
    rows_t = rng.integers(0, 256, (K, 18))
    rows_n = rng.integers(0, 256, (K, 18))
    rows_t[:: 7] = 0
    rows_n[:: 5] = 0
    rows_t[:: 11] = 99999  # multi-digit values
    return tids, poss, chars, rb4, f, rows_t, rows_n


@pytest.mark.parametrize("fmt", ["classic", "vcf", "bed"])
@pytest.mark.parametrize("seed", [0, 1])
def test_native_matches_python(fmt, seed):
    rng = np.random.default_rng(seed)
    K = 500
    tids, poss, chars, rb4, f, rows_t, rows_n = _random_case(rng, K)
    fields = np.stack(
        [np.asarray(f[k], np.int64) for k in COMPACT_FIELDS[:12]], axis=1
    )
    native = native_api.emit_lines(
        fmt, REF_NAMES, tids, poss, chars, rb4, fields, rows_t, rows_n
    )
    names_l = [REF_NAMES[t] for t in tids.tolist()]
    fl = {k: np.asarray(v).tolist() for k, v in f.items()}
    python = LINE_BUILDERS[fmt](
        names_l, poss.tolist(), chars.tolist(), rb4.tolist(), fl,
        rows_t.tolist(), rows_n.tolist(),
    )
    assert native == python


def test_empty_and_growth():
    # K=0 short-circuits
    empty = native_api.emit_lines(
        "vcf", REF_NAMES, np.zeros(0, np.int64), np.zeros(0, np.int64),
        np.zeros(0, np.int32), np.zeros(0, np.int64),
        np.zeros((0, 12), np.int64), np.zeros((0, 18), np.int64),
        np.zeros((0, 18), np.int64),
    )
    assert empty == []
    # a tiny initial cap drives the Python-side grow-retry loop (the
    # C side returns -1, native_api quadruples and retries): output
    # must equal the default-cap render byte for byte
    rng = np.random.default_rng(3)
    tids, poss, chars, rb4, f, rows_t, rows_n = _random_case(rng, 64)
    fields = np.stack(
        [np.asarray(f[k], np.int64) for k in COMPACT_FIELDS[:12]], axis=1
    )
    args = ("vcf", REF_NAMES, tids, poss, chars, rb4, fields,
            rows_t, rows_n)
    assert native_api.emit_lines(*args, initial_cap=64) == \
        native_api.emit_lines(*args)


def test_adversarial_max_values_fit_headroom():
    """int64-extreme field values and int32-max dqstats rows must not
    overrun the per-line headroom bound (ADVICE r4: the former 700-byte
    constant was not provable against adversarial widths)."""
    K = 8
    tids = np.zeros(K, np.int64)
    poss = np.full(K, (1 << 62), np.int64)
    chars = np.full(K, ord("A"), np.int32)
    rb4 = np.full(K, 1, np.int64)
    fields = np.full((K, 12), (1 << 62), np.int64)
    fields[:, 0] = fields[:, 1] = 15       # gt codes stay 4-bit
    fields[:, 7] = fields[:, 8] = 15
    fields[:, 10] = fields[:, 11] = 4      # status codes
    rows = np.full((K, 18), 2**31 - 1, np.int64)
    for fmt in ("classic", "vcf", "bed"):
        native = native_api.emit_lines(
            fmt, REF_NAMES, tids, poss, chars, rb4, fields, rows, rows
        )
        names_l = [REF_NAMES[t] for t in tids.tolist()]
        fl = {k: fields[:, i].tolist()
              for i, k in enumerate(COMPACT_FIELDS[:12])}
        python = LINE_BUILDERS[fmt](
            names_l, poss.tolist(), chars.tolist(), rb4.tolist(), fl,
            rows.tolist(), rows.tolist(),
        )
        assert native == python
