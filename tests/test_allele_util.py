"""Genotype set-algebra truth tables.

Pytest port of the reference's exhaustive gtest suite
(reference test/lib/sniper/TestAlleleUtil.cpp:23-196): the complete
14x14 genotype-pair table for is_loh plus the property invariants for
the LOH and gain-of-reference filters.  Run both scalar (python ints)
and vectorized (numpy arrays) to pin the elementwise forms.
"""

from __future__ import annotations

import numpy as np
import pytest

from somatic_sniper_tpu.models.allele_util import (
    count_alleles,
    genotype_set_difference,
    is_loh,
    should_filter_as_gor,
    should_filter_as_loh,
)

A, C, G, T = 1, 2, 4, 8


def test_count_alleles():
    expected = {
        0: 0, A: 1, C: 1, A | C: 2, G: 1, A | G: 2, C | G: 2,
        A | C | G: 3, T: 1, A | T: 2, C | T: 2, A | C | T: 3,
        G | T: 2, A | G | T: 3, A | C | G | T: 4,
    }
    for gt, n in expected.items():
        assert count_alleles(gt) == n
    gts = np.array(sorted(expected))
    np.testing.assert_array_equal(
        count_alleles(gts), [expected[g] for g in sorted(expected)]
    )


def test_genotype_set_difference():
    assert genotype_set_difference(A | C, C) == A
    assert genotype_set_difference(A | C | G, C) == (A | G)
    assert genotype_set_difference(A | C, A | C) == 0
    assert genotype_set_difference(A, A | C) == 0


# All (mutant, original) pairs where LOH happens with 2/3-allele sets
# (reference TestAlleleUtil.cpp:58-105).
LOH_PAIRS = {
    (A, A | C), (C, A | C),
    (A, A | G), (G, A | G),
    (A, A | T), (T, A | T),
    (C, C | G), (G, C | G),
    (C, C | T), (T, C | T),
    (G, G | T), (T, G | T),
    (A, A | C | G), (C, A | C | G), (G, A | C | G),
    (A | C, A | C | G), (A | G, A | C | G), (C | G, A | C | G),
    (A, A | C | T), (C, A | C | T), (T, A | C | T),
    (A | C, A | C | T), (A | T, A | C | T), (C | T, A | C | T),
    (A, A | G | T), (G, A | G | T), (T, A | G | T),
    (A | G, A | G | T), (A | T, A | G | T), (G | T, A | G | T),
    (C, C | G | T), (G, C | G | T), (T, C | G | T),
    (C | G, C | G | T), (C | T, C | G | T), (G | T, C | G | T),
}


def test_is_loh_exhaustive():
    # single-allele originals can't lose heterozygosity
    for j in range(4):
        value = 1 << j
        for i in range(1, 9):
            assert not is_loh(i, value)
    # the full 14x14 table against the enumerated positives
    for orig in range(1, 15):
        for mut in range(1, 15):
            expected = (mut, orig) in LOH_PAIRS
            assert bool(is_loh(mut, orig)) == expected, (mut, orig)
    # every proper genotype is an LOH of the full set
    for i in range(1, 15):
        assert is_loh(i, A | C | G | T)


def test_is_loh_vectorized_matches_scalar():
    mut, orig = np.meshgrid(np.arange(1, 15), np.arange(1, 15))
    got = is_loh(mut, orig)
    want = np.array(
        [[(m, o) in LOH_PAIRS for m in range(1, 15)] for o in range(1, 15)]
    )
    np.testing.assert_array_equal(got, want)


def test_should_filter_as_loh():
    rb = A
    assert should_filter_as_loh(rb, A, A | G)
    assert should_filter_as_loh(rb, G, A | G)
    assert should_filter_as_loh(rb, G, C | G)
    assert should_filter_as_loh(rb, C, C | G)
    assert not is_loh(A | G, G)
    assert is_loh(G, A | G)
    # tumor picks up the reference allele at a hom snp site in the normal
    assert not should_filter_as_loh(rb, A | G, G)

    for i in range(1, 15):
        # hom-ref normal: never filtered as LOH
        assert not should_filter_as_loh(A, i, A)
        # identical genotypes: never filtered as LOH
        assert not should_filter_as_loh(A, i, i)

    # het snp normal, tumor picks up a new allele: not filtered
    assert not should_filter_as_loh(A, A | C | G, A | C)
    assert not should_filter_as_loh(A, A | T, A | C)
    assert not should_filter_as_loh(A, T, A | C)
    # new non-ref allele in the tumor: not filtered
    assert not should_filter_as_loh(A, T | G, G)
    assert not should_filter_as_loh(A, C | G, G)
    assert not should_filter_as_loh(A, A | G, G)  # picked up ref → GOR
    # going back to hom ref from hom snp is not LOH-filtered
    assert not should_filter_as_loh(A, A, G)


def test_should_filter_as_gor():
    rb = A
    assert should_filter_as_gor(rb, A, G)
    assert should_filter_as_gor(rb, A | G, G)
    assert should_filter_as_gor(rb, A | G, C | G)
    assert should_filter_as_gor(rb, T | A, T | G)
    # going back to hom ref from hom snp IS gor-filtered
    assert should_filter_as_gor(A, A, G)

    for i in range(1, 15):
        assert not should_filter_as_gor(A, i, A)
        assert not should_filter_as_gor(A, i, i)

    # het snp normal, new non-reference allele: not filtered
    assert not should_filter_as_gor(A, A | C | G, A | C)
    assert not should_filter_as_gor(A, A | T, A | C)
    assert not should_filter_as_gor(A, T, A | C)
    # het snp normal, new reference allele: filtered
    assert should_filter_as_gor(A, A | T | C, T | C)
    assert not should_filter_as_gor(A, T | G, G)
    assert not should_filter_as_gor(A, C | G, G)


def test_filters_vectorized():
    """The array forms agree with the scalar forms on the full cube."""
    rbs, tums, norms = np.meshgrid(
        np.array([A, C, G, T]), np.arange(1, 15), np.arange(1, 15),
        indexing="ij",
    )
    v_loh = should_filter_as_loh(rbs, tums, norms)
    v_gor = should_filter_as_gor(rbs, tums, norms)
    for idx in np.ndindex(rbs.shape):
        r, t, n = int(rbs[idx]), int(tums[idx]), int(norms[idx])
        assert bool(v_loh[idx]) == bool(should_filter_as_loh(r, t, n))
        assert bool(v_gor[idx]) == bool(should_filter_as_gor(r, t, n))


def test_jax_compatible():
    """Predicates trace under jit on int32 arrays."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda r, t, n: (should_filter_as_loh(r, t, n),
                                 should_filter_as_gor(r, t, n),
                                 count_alleles(t)))
    loh, gor, cnt = f(jnp.int32(A), jnp.int32(A), jnp.int32(A | G))
    assert bool(loh) and not bool(gor) and int(cnt) == 1
