"""Table precompute vs. reference-oracle fixtures (bit-exact)."""

import numpy as np

from somatic_sniper_tpu.models import tables as T


def test_tables_match_reference_dump(data_dir):
    fix = np.load(data_dir / "ref_tables_default.npz")
    fk, _ = T.compute_fk(0.85, 0.03)
    assert np.array_equal(fk, fix["fk"])

    lhet, qr = T.compute_lhet(0.001, 2)
    assert np.array_equal(lhet, fix["lhet"])
    assert np.float32(qr) == fix["qr"][0]

    coef = T.compute_coef(0.85, 0.03)
    got = coef[fix["coef_q"], fix["coef_n"], fix["coef_k"]]
    assert np.array_equal(got, fix["coef_v"])


def test_priors_and_qadd():
    solo = T.compute_solo_prior()
    # ref A (1): AA prior 0, AC (het w/ ref) logPhred(0.001)=30,
    # CC hom mutant logPhred(0.0005)=33, CG double logPhred(1e-6)=60
    assert solo[1, 0] == 0
    assert solo[1, 1] == 30
    assert solo[1, 4] == 33
    assert solo[1, 5] == 60

    qadd = T.compute_qadd_table()
    assert qadd.shape == (1024,)
    assert (qadd[1000:] == 0).all()
    # qAdd(x, x): i=512 -> logPhred(1+exp(0)) = (int)(-0.5-4.343*log(2)) = -3
    assert qadd[512] == -3


def test_q_r_int_default():
    t = T.build_tables()
    assert t.q_r_int == 27


def test_arithmetic_qadd_matches_table():
    """The closed-form qAdd must equal x + table[512+y-x] (with the same
    index clip) for every index the table covers."""
    import jax.numpy as jnp

    from somatic_sniper_tpu.models.consensus import make_qadd

    table = T.compute_qadd_table()
    qadd = make_qadd()
    x = np.zeros(1024, dtype=np.int32) + 300
    y = x + np.arange(1024) - 512  # delta spans the full table
    got = np.asarray(qadd(jnp.asarray(x), jnp.asarray(y)))
    idx = np.clip(512 + y - x, 0, 1023)
    want = x + table[idx]
    np.testing.assert_array_equal(got, want)


def test_joint_prior_index_quirk():
    """The reference tests isHet[j]/isHom[j] with the genotype INDEX j
    (0..9) into 16-entry base-code tables (somatic_sniper.c:66-68), so
    tumor genotypes AA (j=0) and GG (j=7) always pay the somatic_rate^2
    penalty even when sharing an allele with the normal genotype.
    Values below are the reference binary's jointprior[ref=C] for
    -s 0.0001 (dumped with tests/tools oracle tooling)."""
    jp = T.compute_joint_prior(0.0001)[2]
    expected = np.array([
        [33, 73, 73, 73, 113, 113, 113, 113, 113, 113],
        [110, 30, 70, 70, 70, 70, 70, 110, 110, 110],
        [140, 100, 60, 100, 140, 100, 140, 140, 100, 140],
        [140, 100, 100, 60, 140, 140, 100, 140, 100, 100],
        [80, 40, 80, 80, 0, 40, 40, 80, 80, 80],
        [110, 70, 70, 110, 70, 30, 70, 110, 70, 110],
        [110, 70, 110, 70, 70, 70, 30, 110, 70, 70],
        [113, 113, 73, 113, 113, 73, 113, 33, 73, 113],
        [140, 140, 100, 100, 140, 100, 100, 140, 60, 100],
        [113, 113, 113, 73, 113, 113, 73, 113, 73, 33],
    ])
    np.testing.assert_array_equal(jp, expected)
    # the quirk's observable signature: AC->AA shares an allele but
    # still pays the squared penalty (110 = 30 + 2*logPhred(1e-4))
    assert jp[1, 0] == 110 and jp[1, 2] == 70
