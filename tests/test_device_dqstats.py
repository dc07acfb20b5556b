"""On-device dqstats (models.somatic._device_dqstats) vs the host
reference implementation (output.dqstats, itself the replication of
reference dqstats.c:6-53).

The device computes the 18 per-sample fields for slab columns from raw
u32 lanes; every field is contract-exact (no ±1 tolerance), so the
integer-predicate rounding of _mean_499 is tested both exhaustively
against the C semantics and end-to-end against the per-column oracle.
"""

import jax.numpy as jnp
import numpy as np

from somatic_sniper_tpu.models.somatic import _device_dqstats, _mean_499
from somatic_sniper_tpu.output.dqstats import get_dqstats


def test_mean_499_exhaustive_small():
    """All (sum, occ) with occ <= 48 and per-entry values <= 255:
    _mean_499 must equal the C ``(int)(sum/occ + .499)`` computed in
    f64 (the reference's arithmetic) — including every boundary."""
    occ = np.arange(1, 49, dtype=np.int32)
    sums = np.arange(0, 256 * 48, 97, dtype=np.int32)  # stride keeps it fast
    O, S = np.meshgrid(occ, sums)
    O, S = O.ravel(), S.ravel()
    keep = S <= O * 255
    O, S = O[keep], S[keep]
    want = (S / O.astype(np.float64) + 0.499).astype(np.int64)
    got = np.asarray(_mean_499(jnp.asarray(S), jnp.asarray(O)))
    np.testing.assert_array_equal(got, want)
    # adversarial exact-boundary neighborhoods: sums where sum/occ is
    # just above/below k + 0.501 for some k
    occ2 = np.repeat(np.arange(1, 49, dtype=np.int64), 3)
    k = 7
    base = (k * 1000 + 501) * occ2 // 1000
    S2 = np.concatenate([base - 1, base, base + 1]).astype(np.int32)
    O2 = np.concatenate([occ2, occ2, occ2]).astype(np.int32)
    keep = (S2 >= 0) & (S2 <= O2 * 255)
    S2, O2 = S2[keep], O2[keep]
    want2 = (S2 / O2.astype(np.float64) + 0.499).astype(np.int64)
    got2 = np.asarray(_mean_499(jnp.asarray(S2), jnp.asarray(O2)))
    np.testing.assert_array_equal(got2, want2)


def _random_raw(B, D, seed):
    rng = np.random.default_rng(seed)
    nk = rng.integers(0, D + 1, B).astype(np.int32)
    base = rng.choice([1, 2, 4, 8, 15, 5, 0], size=(B, D),
                      p=[.3, .25, .2, .13, .04, .04, .04]).astype(np.uint32)
    baseq = rng.integers(0, 94, (B, D)).astype(np.uint32)
    mapq = rng.integers(0, 256, (B, D)).astype(np.uint32)
    strand = rng.integers(0, 2, (B, D)).astype(np.uint32)
    slots = mapq | (baseq << 8) | (base << 16) | (strand << 20)
    mask = np.arange(D)[None, :] < nk[:, None]
    slots = np.where(mask, slots, 0).astype(np.uint32)
    rb4 = rng.choice([1, 2, 4, 8, 15], size=B).astype(np.int32)
    wanted = (rb4 | rng.integers(0, 16, B)).astype(np.int32)
    return slots, nk, rb4, wanted, (base, baseq, mapq, strand)


def test_device_dqstats_matches_host_oracle():
    B, D = 128, 48
    slots, nk, rb4, wanted, (base, baseq, mapq, strand) = \
        _random_raw(B, D, seed=5)
    dev = np.asarray(_device_dqstats(
        jnp.asarray(slots), jnp.asarray(nk), jnp.asarray(rb4),
        jnp.asarray(wanted),
    ))
    for b in range(B):
        k = int(nk[b])
        d = get_dqstats(
            base[b, :k].astype(np.int64), baseq[b, :k].astype(np.int64),
            mapq[b, :k].astype(np.int64), strand[b, :k].astype(np.int64),
            np.zeros(k, bool), int(rb4[b]), int(wanted[b]),
        )
        want = list(d.mean_baseq) + list(d.mean_mapq) + \
            list(d.base_occ) + list(d.dp4) + \
            [d.total_depth, d.total_mean_mapq]
        assert dev[b].tolist() == want, f"column {b}: {dev[b]} vs {want}"
