"""Consensus calling and somatic scoring — exact integer phred arithmetic.

Everything downstream of glfgen in the reference is integer math:

* ``sniper_glf2cns``       (reference sniper_maqcns.c:250-273)
* ``calculatePosteriors``  (reference somatic_sniper.c:79-99)
* solo / joint somatic score (reference somatic_sniper.c:109-273)

These are replicated here as batched int32 JAX ops, including the
reference's exact tie-breaking scan orders and its stale-``i`` quirk in the
joint-mode consensus-quality loop (somatic_sniper.c:193-199, where ``i`` is
always 10 after the marginal loop so the guard reduces to
``j != max_jointlk_tumor_index``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import GLF_BASE

I32 = jnp.int32


class ConsensusCall(NamedTuple):
    """Unpacked fields of the reference's packed consensus word
    (cns<<28 | cns2<<24 | mapQ<<16 | cnsQ<<8 | cnsQ2,
    reference sniper_maqcns.h:28)."""

    base1: jax.Array   # [B] best genotype, 4-bit allele set
    base2: jax.Array   # [B] second-best genotype
    score1: jax.Array  # [B] consensus quality (min2 - min)
    score2: jax.Array  # [B] second consensus quality (min3 - min2)


def glf2cns_batch(lk, n_total, q_r_int) -> ConsensusCall:
    """Batched sniper_glf2cns + the n==0 guard of sniper_maqcns_call.

    lk: [B, 10] int32, n_total: [B] total pileup depth (including deleted
    bases; reference passes the raw column count n).  Returns unpacked
    int32 fields — the reference's u32 bit-packing is a C artifact, not
    part of the model.
    """
    B = lk.shape[0]
    # tmp[i<<2|j] for i<=j = lk[idx] + (i==j ? 0 : q_r); others -1.
    # The reference scans linear indices 0..15 with strict < comparisons
    # (first minimum wins).  We unroll the same scan.
    big = jnp.int32(10000)
    mn = jnp.full((B,), big, I32)
    mn2 = jnp.full((B,), big, I32)
    mn3 = jnp.full((B,), big, I32)
    min_g = jnp.full((B,), -1, I32)
    min_g2 = jnp.full((B,), -1, I32)

    # linear index i*4+j maps to lk slot via upper-triangular order
    tri_index = {}
    c = 0
    for i in range(4):
        for j in range(i, 4):
            tri_index[(i, j)] = c
            c += 1

    for lin in range(16):
        i, j = lin >> 2, lin & 3
        if i > j:
            continue  # tmp = -1, skipped by the reference's `< 0` guard
        t = lk[:, tri_index[(i, j)]] + (0 if i == j else q_r_int)
        lt1 = t < mn
        lt2 = (~lt1) & (t < mn2)
        lt3 = (~lt1) & (~lt2) & (t < mn3)
        mn3 = jnp.where(lt1, mn2, jnp.where(lt2, mn2, jnp.where(lt3, t, mn3)))
        mn2 = jnp.where(lt1, mn, jnp.where(lt2, t, mn2))
        min_g2 = jnp.where(lt1, min_g, jnp.where(lt2, lin, min_g2))
        mn = jnp.where(lt1, t, mn)
        min_g = jnp.where(lt1, lin, min_g)

    def gt_bits(g):
        return (1 << ((g >> 2) & 3)) | (1 << (g & 3))

    cns1 = jnp.where(min_g >= 0, gt_bits(min_g), 0xF)
    cns2 = jnp.where(min_g2 >= 0, gt_bits(min_g2), 0xF)
    q1 = jnp.where(mn2 < big, jnp.minimum(mn2 - mn, 255), 0xFF)
    q2 = jnp.where((mn2 < big) & (mn3 < big), jnp.minimum(mn3 - mn2, 255), 0xFF)

    # reference sniper_maqcns.c:275-282: n == 0 -> 0xf<<28 | 0xf<<24
    nz = n_total > 0
    return ConsensusCall(
        base1=jnp.where(nz, cns1, 0xF).astype(I32),
        base2=jnp.where(nz, cns2, 0xF).astype(I32),
        score1=jnp.where(nz, q1, 0).astype(I32),
        score2=jnp.where(nz, q2, 0).astype(I32),
    )


def make_qadd(qadd_table):
    """Return the batched qAdd op (reference somatic_sniper.c:13-18).

    qAdd(x, y) = x + qAddTable[512 + y - x].  Indices stay within the
    1024-entry table for all reachable values (entries 1000..1023 are zero
    as in the reference's static array); we clip for memory safety.
    """
    table = jnp.asarray(qadd_table, dtype=I32)

    def qadd(x, y):
        idx = jnp.clip(512 + y - x, 0, 1023)
        return x + table[idx]

    return qadd


def posteriors_batch(lk, ref16, solo_prior, qadd):
    """Batched calculatePosteriors (reference somatic_sniper.c:79-99).

    lk: [B,10] i32, ref16: [B] i32.  Returns lkResult [B,10] i32.
    """
    prior = jnp.asarray(solo_prior, dtype=I32)[ref16]  # [B,10]
    x = lk + prior
    qsum = jnp.full(x.shape[:1], 255, I32)
    for j in range(10):
        qsum = qadd(x[:, j], qsum)  # qAdd(x, qSum): note argument order
    res = jnp.minimum(x - qsum[:, None], 255)
    return res


class SomaticScore(NamedTuple):
    q_posterior_sum: jax.Array   # [B] somatic score
    joint_tumor_gt: jax.Array    # [B] 4-bit set, 0 unless joint mode
    joint_normal_gt: jax.Array   # [B]
    joint_consensus_quality: jax.Array  # [B]


def somatic_score_batch(
    lk_tumor,
    lk_normal,
    ref16,
    solo_prior,
    joint_prior,
    qadd,
    use_joint: bool,
):
    """The somatic-score core (reference somatic_sniper.c:166-214)."""
    B = lk_tumor.shape[0]
    glf_base = jnp.asarray(GLF_BASE, dtype=I32)

    if use_joint:
        jp = jnp.asarray(joint_prior, dtype=I32)[ref16]       # [B,10,10]
        joint_lk = jnp.minimum(
            lk_normal[:, :, None] + lk_tumor[:, None, :] + jp, 255
        )  # [B,10,10], i = normal, j = tumor
        flat = joint_lk.reshape(B, 100)

        # marginal + argmin with the reference's row-major strict-< scan
        marginal = jnp.full((B,), 255, I32)
        best = jnp.full((B,), 1000, I32)
        best_idx = jnp.full((B,), -1, I32)

        def mstep(t, carry):
            marginal, best, best_idx = carry
            v = flat[:, t]
            lt = v < best
            best = jnp.where(lt, v, best)
            best_idx = jnp.where(lt, t, best_idx)
            marginal = qadd(marginal, v)  # qAdd(marginal, joint_lk)
            return marginal, best, best_idx

        marginal, best, best_idx = jax.lax.fori_loop(
            0, 100, mstep, (marginal, best, best_idx)
        )
        ni = best_idx // 10
        tj = best_idx % 10

        qps = jnp.full((B,), 255, I32)
        jcq = jnp.full((B,), 255, I32)
        for j in range(10):
            lkv = joint_lk[:, j, j] - marginal
            qps = qadd(qps, lkv)
            # stale-i quirk: guard is effectively only j != tumor argmin
            upd = j != tj
            jcq = jnp.where(upd, qadd(jcq, lkv), jcq)
        jcq = jnp.minimum(jcq, 255)
        return SomaticScore(
            q_posterior_sum=qps,
            joint_tumor_gt=glf_base[tj],
            joint_normal_gt=glf_base[ni],
            joint_consensus_quality=jcq,
        )
    else:
        lk_t_post = posteriors_batch(lk_tumor, ref16, solo_prior, qadd)
        lk_n_post = posteriors_batch(lk_normal, ref16, solo_prior, qadd)
        qps = jnp.full((B,), 255, I32)
        for j in range(10):
            qps = qadd(qps, lk_t_post[:, j] + lk_n_post[:, j])
        zero = jnp.zeros((B,), I32)
        return SomaticScore(
            q_posterior_sum=qps,
            joint_tumor_gt=zero,
            joint_normal_gt=zero,
            joint_consensus_quality=jnp.full((B,), 255, I32),
        )
