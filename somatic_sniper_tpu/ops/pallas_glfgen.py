"""Pallas TPU kernel for the glfgen per-column accumulation.

The depth-axis reduction of the MAQ likelihood model (reference
sniper_maqcns.c:144-182) is the hot op of the caller: per pileup column
it needs each read's fk rank *within its (base, strand) class by
descending effective quality*, then class-wise weighted sums.  The XLA
fast path realizes the ranks with a [B, D] sort plus one-hot einsum
contractions — several HBM round trips of [B, D]-sized intermediates.

This kernel fuses the whole reduction into one VMEM-resident pass per
[TB, D] block: field decode from the packed u32 slots, rank computation
by pairwise comparison (a D-step loop of [TB, D] VPU ops — for the
depth buckets that dominate 30x data, D <= 128, this beats a sort), fk
weights in-register, and masked class sums.  Outputs are the same
(esum, fsum, c, rms, n) the XLA path produces; the 10-genotype assembly
(table lookups, quantization) stays outside — its coef table (16 MiB)
cannot live in VMEM.

Rank semantics replicated exactly (see glfgen.pack_info):
  rank(i) = #{j : class_j == class_i, upd_j,
              (subkey_j, -j) > (subkey_i, -i)}
with subkey = effq<<17 | valid<<16 | baseQ<<8 | mapQ — the within-class
projection of the reference's descending u32 visit order.  Ties in
subkey are resolved by index; tied reads have identical contributions,
so any strict total order matches the reference sums.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
F32 = jnp.float32

# Kernel tracing inside an already-deep jit stack (runner -> call_batch ->
# glfgen -> pallas) can exceed CPython's default recursion limit.
import sys as _sys

if _sys.getrecursionlimit() < 50000:
    _sys.setrecursionlimit(50000)
# Mosaic's recursive lowering also needs real C-stack headroom beyond
# the interpreter's frame budget; 50k python frames fit comfortably in
# the default 8 MiB thread stack for these shallow helper frames.

TB = 256  # batch-axis block rows per grid step


def _kernel(slots_ref, meta_ref, esum_ref, fsum_ref, c_ref, aux_ref, *,
            D, theta32, eta32, log_theta, cap_mapq):
    s = slots_ref[:].astype(I32)          # [TB, LD] (packed bits < 2^22)
    depth = meta_ref[:, 0:1]              # [TB, 1] int32
    ref16 = meta_ref[:, 1:2]              # [TB, 1] int32

    LD = D  # lane-aligned by the wrapper; padding columns are unoccupied
    j_idx = jax.lax.broadcasted_iota(I32, (TB, LD), 1)
    occupied = j_idx < depth

    mapq = s & 0xFF
    q = (s >> 8) & 0xFF
    b16 = (s >> 16) & 0xF
    strand = (s >> 20) & 1
    isdel = (s >> 21) & 1
    keep = occupied & (isdel == 0)

    # nt16 -> nt4 ('=' resolves to the reference base)
    code = jnp.where(b16 != 0, b16, ref16)
    base2 = jnp.full((TB, LD), 4, I32)
    for c16, c4 in ((1, 0), (2, 1), (4, 2), (8, 3)):
        base2 = jnp.where(code == c16, c4, base2)
    has_base = base2 < 4
    k4 = jnp.where(has_base, base2, 0)
    k8 = strand * 4 + k4

    eff = jnp.minimum(q, mapq)
    eff = jnp.where((eff < 4) & ((q & 0x3F) != 0), 4, eff)
    upd = keep & (eff > 0)

    ones = jnp.ones((TB, LD), I32)
    zeros = jnp.zeros((TB, LD), I32)
    fzeros = jnp.zeros((TB, LD), F32)
    ck = (eff << 17) | (jnp.where(has_base, ones, zeros) << 16) | \
        (q << 8) | mapq
    # mask non-participants out of the comparison universe
    k8m = jnp.where(upd, k8, jnp.full_like(k8, -1))

    # rank(j) = #{j' != j in same class, upd, with (ck, -index) greater}.
    # Enumerate all ordered pairs via rotations: at step t, column j is
    # compared against j' = (j - t) mod D; j' < j iff j >= t.  A fori_loop
    # of dynamic lane rotations keeps VMEM liveness at O(1) blocks (a
    # fully unrolled version exhausts scoped VMEM), and needs no sort or
    # dynamic slicing.  Typed selects replace bool->int astypes (Mosaic's
    # convert lowering recursion is deep enough to overflow the host
    # stack in nested-jit contexts).
    def body(t, carry):
        rank, tvec = carry
        ck_r = pltpu.roll(ck, t, 1)
        k8_r = pltpu.roll(k8m, t, 1)
        higher = (ck_r > ck) | ((ck_r == ck) & (j_idx >= tvec))
        return (rank + jnp.where((k8_r == k8) & higher, ones, zeros),
                tvec + ones)

    rank, _ = jax.lax.fori_loop(
        jnp.int32(1), jnp.int32(LD), body,
        (jnp.zeros((TB, LD), I32), ones),
    )

    r = jnp.minimum(rank, jnp.full_like(rank, 255)).astype(F32)
    fkw = jnp.where(
        upd,
        jnp.exp(r * log_theta) * (F32(1.0) - eta32) + eta32,
        fzeros,
    )
    eterm = fkw * eff.astype(F32)

    esum_ref[:] = jnp.stack(
        [jnp.where(k4 == k, eterm, fzeros).sum(axis=1) for k in range(4)],
        axis=1,
    )
    fsum_ref[:] = jnp.stack(
        [jnp.where(k4 == k, fkw, fzeros).sum(axis=1) for k in range(4)],
        axis=1,
    )
    c_ref[:] = jnp.stack(
        [jnp.where(upd & (k4 == k), ones, zeros).sum(axis=1)
         for k in range(4)],
        axis=1,
    )
    mq7 = jnp.minimum(mapq & 0x7F, jnp.full_like(mapq, cap_mapq))
    rms = jnp.where(keep, mq7 * mq7, zeros).sum(axis=1)
    n = jnp.where(keep, ones, zeros).sum(axis=1)
    aux_ref[:] = jnp.stack([rms, n], axis=1)


def _kernel16(slots_ref, meta_ref, esum_ref, fsum_ref, c_ref, *,
              SD, n_seg, theta32, eta32, log_theta):
    """Compact-u16 variant: slots are ``effq | base2<<8 | strand<<10``
    with only non-deleted entries present (first n_keep per row); rms/n
    are host-computed.  Rank order within a class reduces to
    (effq desc, index) — equal-effq reads are interchangeable.

    Lane packing: each 128-lane row holds ``n_seg`` independent columns
    of depth ``SD`` (SD * n_seg == 128).  Shallow depth buckets would
    otherwise waste 4-8x lanes on padding AND run the full 127-step
    rank loop; packing cuts both the row count (x n_seg) and the loop
    trip count (within-segment lane offsets only span
    [1, SD) ∪ [128-SD+1, 128)).  Cross-segment pairs are rejected by
    the segment-tagged class key."""
    s = slots_ref[:]  # i32 (widened outside: Mosaic's i16 convert loops)

    LD = SD * n_seg  # == 128
    j_idx = jax.lax.broadcasted_iota(I32, (TB, LD), 1)
    seg = j_idx // SD  # lane's segment id (static SD)
    # per-lane n_keep of the lane's segment
    nk_lane = jnp.zeros((TB, LD), I32)
    for si in range(n_seg):
        nk_lane = jnp.where(seg == si, meta_ref[:, si : si + 1], nk_lane)
    occupied = (j_idx - seg * SD) < nk_lane

    eff = s & 0xFF
    base2 = (s >> 8) & 3
    strand = (s >> 10) & 1
    k4 = base2
    k8 = (strand * 4 + base2) + seg * 8  # segment-tagged class
    upd = occupied & (eff > 0)
    k8m = jnp.where(upd, k8, jnp.full_like(k8, -1))

    # Mosaic lowers each convert_element_type through a deeply recursive
    # helper chain; with the loop body and the reductions below this can
    # blow the host recursion limit, so the kernel uses typed selects
    # instead of bool->int/float astypes throughout.
    ones = jnp.ones((TB, LD), I32)
    zeros = jnp.zeros((TB, LD), I32)
    fzeros = jnp.zeros((TB, LD), F32)

    def body(t, carry):
        rank, tvec = carry
        eff_r = pltpu.roll(eff, t, 1)
        k8_r = pltpu.roll(k8m, t, 1)
        # tvec is a vector copy of t (scalar-vs-vector compares trip
        # Mosaic's recursive broadcast-convert lowering)
        higher = (eff_r > eff) | ((eff_r == eff) & (j_idx >= tvec))
        return (rank + jnp.where((k8_r == k8) & higher, ones, zeros),
                tvec + ones)

    init = (jnp.zeros((TB, LD), I32), ones)
    if n_seg == 1:
        rank, _ = jax.lax.fori_loop(
            jnp.int32(1), jnp.int32(LD), body, init)
    else:
        # within-segment pairs only occur at these rotation offsets; the
        # middle [SD, 128-SD] range can never match a class
        carry = jax.lax.fori_loop(jnp.int32(1), jnp.int32(SD), body, init)
        rank_mid, tvec_mid = carry
        carry = (rank_mid, tvec_mid + jnp.full((TB, LD), LD - 2 * SD + 1,
                                               I32))
        rank, _ = jax.lax.fori_loop(
            jnp.int32(LD - SD + 1), jnp.int32(LD), body, carry)

    r = jnp.minimum(rank, jnp.full_like(rank, 255)).astype(F32)
    fkw = jnp.where(
        upd,
        jnp.exp(r * log_theta) * (F32(1.0) - eta32) + eta32,
        fzeros,
    )
    eterm = fkw * eff.astype(F32)

    # per-(segment, base) sums, seg-major so the [Bp/n_seg, n_seg*4]
    # output reshapes straight back to [Bp, 4]
    esum_ref[:] = jnp.stack(
        [jnp.where((seg == si) & (k4 == k), eterm, fzeros).sum(axis=1)
         for si in range(n_seg) for k in range(4)],
        axis=1,
    )
    fsum_ref[:] = jnp.stack(
        [jnp.where((seg == si) & (k4 == k), fkw, fzeros).sum(axis=1)
         for si in range(n_seg) for k in range(4)],
        axis=1,
    )
    c_ref[:] = jnp.stack(
        [jnp.where(upd & (seg == si) & (k4 == k), ones, zeros).sum(axis=1)
         for si in range(n_seg) for k in range(4)],
        axis=1,
    )


def _kernel32(slots_ref, meta_ref, esum_ref, fsum_ref, c_ref, rms_ref, *,
              SD, n_seg, theta32, eta32, log_theta, cap_mapq):
    """Raw kept-only u32 variant of :func:`_kernel16` (production slab
    lanes): slots are full slot words ``mapQ | baseQ<<8 | base16<<16 |
    strand<<20`` with deletions pre-filtered by the host fill, so the
    kernel derives eff-quality (incl. the floor-4 quirk), base classes
    ('=' resolves to the per-segment reference code, ambiguity codes go
    to class A — reference sniper_maqcns.c:150-153) and the rms-mapQ
    sum itself.

    Rank semantics: the reference visits reads in descending RAW-eff
    subkey order within a class — a raw-0 read floored to 4 still
    ranks below a raw-3 read (their floored effs differ, so eff-only
    ranking would swap their fk weights).  The pairwise O(D²) rank loop
    of the earlier kernels is replaced by a 128-lane bitonic sort on
    ``cls<<17 | ~(raw_eff<<9 | valid<<8 | baseQ)`` (28 compare-exchange
    substages vs 126 rotation trips): after the sort, rank = lane
    index − class start (a 7-step prefix-max), and floored eff / class
    / segment are all re-derived from the sorted key itself.  mapQ is
    dropped from the subkey — reads tying on (eff, valid, baseQ) have
    identical floored eff and are interchangeable under the fk
    weighting."""
    s = slots_ref[:]  # i32 raw slot words (packed bits < 2^21)

    LD = SD * n_seg  # == 128
    j_idx = jax.lax.broadcasted_iota(I32, (TB, LD), 1)
    seg = j_idx // SD
    nk_lane = jnp.zeros((TB, LD), I32)
    ref_lane = jnp.zeros((TB, LD), I32)
    for si in range(n_seg):
        nk_lane = jnp.where(seg == si, meta_ref[:, si : si + 1], nk_lane)
        ref_lane = jnp.where(
            seg == si, meta_ref[:, n_seg + si : n_seg + si + 1], ref_lane
        )
    occupied = (j_idx - seg * SD) < nk_lane

    mapq = s & 0xFF
    q = (s >> 8) & 0xFF
    b16 = (s >> 16) & 0xF
    strand = (s >> 20) & 1
    code = jnp.where(b16 != 0, b16, ref_lane)
    base2 = jnp.zeros((TB, LD), I32)  # default class A (ambiguity codes)
    has_base = jnp.zeros((TB, LD), I32)
    for c16, c4 in ((1, 0), (2, 1), (4, 2), (8, 3)):
        is_c = code == c16
        base2 = jnp.where(is_c, jnp.full((TB, LD), c4, I32), base2)
        has_base = jnp.where(is_c, jnp.ones((TB, LD), I32), has_base)
    eff_raw0 = jnp.minimum(q, mapq)
    eff0 = jnp.where((eff_raw0 < 4) & ((q & 0x3F) != 0),
                     jnp.full((TB, LD), 4, I32), eff_raw0)
    k8 = (strand * 4 + base2) + seg * 8
    upd = occupied & (eff0 > 0)

    ones = jnp.ones((TB, LD), I32)
    zeros = jnp.zeros((TB, LD), I32)
    fzeros = jnp.zeros((TB, LD), F32)

    # rms from the UNSORTED lanes (independent of visit order)
    mq7 = jnp.minimum(mapq & 0x7F, jnp.full((TB, LD), cap_mapq, I32))
    rms_lane = jnp.where(occupied, mq7 * mq7, zeros)
    rms_ref[:] = jnp.stack(
        [jnp.where(seg == si, rms_lane, zeros).sum(axis=1)
         for si in range(n_seg)],
        axis=1,
    )

    # composite ascending sort key: class-major, subkey-descending;
    # non-participating lanes get a PAST-THE-END class so they sort
    # last (64: real classes span [0, 8*n_seg) <= 64 exclusive)
    SUB = (1 << 17) - 1
    TAILC = 64
    sub = (eff_raw0 << 9) | (has_base << 8) | q
    key = jnp.where(
        upd,
        (k8 << 17) | (SUB - sub),
        jnp.full((TB, LD), (TAILC << 17) | SUB, I32),
    )

    # 128-lane bitonic sort (ascending).  Partner exchange i <-> i^d is
    # expressed with two rotations; all-lane min/max + role select.
    def cex(x, d, ksize):
        fwd = pltpu.roll(x, LD - d, 1)   # [i] = x[i + d]
        bwd = pltpu.roll(x, d, 1)        # [i] = x[i - d]
        lower = (j_idx & d) == 0         # lane holds the pair's low index
        px = jnp.where(lower, fwd, bwd)
        up = (j_idx & ksize) == 0        # ascending block?
        keep_min = lower == up
        return jnp.where(keep_min, jnp.minimum(x, px),
                         jnp.maximum(x, px))

    ksize = 2
    while ksize <= LD:
        d = ksize // 2
        while d >= 1:
            key = cex(key, d, ksize)
            d //= 2
        ksize *= 2

    cls = key >> 17
    valid = cls != TAILC
    sub_s = SUB - (key & SUB)
    eff_raw = sub_s >> 9
    q_s = sub_s & 0xFF
    eff = jnp.where((eff_raw < 4) & ((q_s & 0x3F) != 0),
                    jnp.full((TB, LD), 4, I32), eff_raw)
    seg_s = cls >> 3
    k4_s = cls & 3

    # rank = lane index - class start; class start via 7-step
    # prefix-max over (boundary ? index : 0)
    cls_prev = pltpu.roll(cls, 1, 1)
    boundary = (j_idx == 0) | (cls != cls_prev)
    start = jnp.where(boundary, j_idx, zeros)
    d = 1
    while d < LD:
        shifted = pltpu.roll(start, d, 1)
        start = jnp.maximum(
            start, jnp.where(j_idx >= d, shifted, zeros)
        )
        d *= 2
    rank = j_idx - start

    r = jnp.minimum(rank, jnp.full_like(rank, 255)).astype(F32)
    fkw = jnp.where(
        valid,
        jnp.exp(r * log_theta) * (F32(1.0) - eta32) + eta32,
        fzeros,
    )
    eterm = fkw * eff.astype(F32)

    esum_ref[:] = jnp.stack(
        [jnp.where((seg_s == si) & (k4_s == k) & valid, eterm,
                   fzeros).sum(axis=1)
         for si in range(n_seg) for k in range(4)],
        axis=1,
    )
    fsum_ref[:] = jnp.stack(
        [jnp.where((seg_s == si) & (k4_s == k) & valid, fkw,
                   fzeros).sum(axis=1)
         for si in range(n_seg) for k in range(4)],
        axis=1,
    )
    c_ref[:] = jnp.stack(
        [jnp.where(valid & (seg_s == si) & (k4_s == k), ones,
                   zeros).sum(axis=1)
         for si in range(n_seg) for k in range(4)],
        axis=1,
    )


ASM_TB = 128  # assembly block rows (VMEM: the [TB, 60*NK] R tile)


def _kernel_asm(es_ref, fs_ref, c_ref, n_ref, ct_ref, lhet_ref,
                out_ref, *, NK, F, Fp, LFp):
    """Fused 10-genotype likelihood assembly (reference
    sniper_maqcns.c:184-244), one VMEM-resident pass per [ASM_TB]
    column block.

    The XLA fast path materializes R[b,e,k] = coef[e+4, c_tot[b], k]
    in HBM and evaluates the ten terms as batched einsums whose tiny
    term axis (10) tiles the MXU at ~2% utilization — likelihood
    assembly was ~74% of the measured slab time.  Here the whole block
    R tile is built by ONE well-shaped MXU matmul (one_hot(c_tot) @
    coefT, both VMEM-resident) and each term's coef value is selected
    by a flat-index lane reduction; lhet, the p-matrix, the fix-p[k,k]
    adjustment and the u8 quantization all stay in-register.  Every
    arithmetic step replicates the XLA fast path's f32 op order, so
    the outputs are bit-identical (tests assert equality).

    Outputs: out[:, 0:10] = lk, out[:, 10] = min_lk (i32).
    """
    TB2 = es_ref.shape[0]
    HI = jax.lax.Precision.HIGHEST
    es = es_ref[:]                    # [TB, 4] f32
    fs = fs_ref[:]
    cc = c_ref[:]                     # [TB, 4] i32
    n = n_ref[:]                      # [TB, 1] i32

    c_tot = cc[:, 0:1] + cc[:, 1:2] + cc[:, 2:3] + cc[:, 3:4]  # [TB,1]

    # R tile: one MXU matmul against the [128, Fp] transposed coef
    # subtable (rows m = c_tot values; columns f = (e-4)*NK + k)
    iota_k = jax.lax.broadcasted_iota(I32, (TB2, 128), 1)
    oh_ct = jnp.where(iota_k == c_tot, jnp.full((TB2, 128), 1.0, F32),
                      jnp.zeros((TB2, 128), F32))
    R = jax.lax.dot_general(
        oh_ct, ct_ref[:], (((1,), (0,)), ((), ())),
        precision=HI, preferred_element_type=F32,
    )  # [TB, Fp]

    iota_f = jax.lax.broadcasted_iota(I32, (TB2, Fp), 1)
    iota_lf = jax.lax.broadcasted_iota(I32, (TB2, LFp), 1)
    lhet_row = lhet_ref[:]            # [1, LFp] flattened lhet_sub
    fzero1 = jnp.zeros((TB2, 1), F32)

    def others_f(v, excl):
        t = fzero1
        for q in range(4):
            if q in excl:
                continue
            t = t + v[:, q:q + 1]
        return t

    def others_i(v, excl):
        t = jnp.zeros((TB2, 1), I32)
        for q in range(4):
            if q in excl:
                continue
            t = t + v[:, q:q + 1]
        return t

    triu = [(j, k) for j in range(4) for k in range(j, 4)]
    cols = []
    for j, k in triu:
        excl = (j,) if j == k else (j, k)
        tmp1 = others_f(es, excl)
        tmp3 = others_f(fs, excl)
        tmp2 = others_i(cc, excl)
        ratio = jnp.where(
            tmp2 > 0,
            tmp1 / jnp.where(tmp3 == 0.0, jnp.full_like(tmp3, 1.0), tmp3),
            fzero1,
        )
        bar = jnp.clip(jnp.floor(ratio + 0.5).astype(I32), 4, 63)
        fi = (bar - 4) * NK + tmp2
        cf = jnp.where(iota_f == fi, R, jnp.zeros((TB2, Fp), F32)).sum(
            axis=1, keepdims=True
        )
        if j == k:
            cols.append(jnp.where(tmp2 > 0, tmp1 + cf, fzero1))
        else:
            li = cc[:, j:j + 1] * NK + cc[:, k:k + 1]
            lv = jnp.where(
                iota_lf == li,
                jnp.broadcast_to(lhet_row, (TB2, LFp)),
                jnp.zeros((TB2, LFp), F32),
            ).sum(axis=1, keepdims=True)
            lh = F32(-4.343) * lv
            cols.append(jnp.where(tmp2 > 0, (lh + tmp1) + cf, lh))
    cols = [jnp.maximum(col, fzero1) for col in cols]

    # fix p[k,k] (reference sniper_maqcns.c:216-233): C scan tie
    # semantics — strict comparisons, first index wins
    max1 = jnp.full((TB2, 1), -1.0, F32)
    max2 = jnp.full((TB2, 1), -1.0, F32)
    max_k = jnp.full((TB2, 1), -1, I32)
    for q in range(4):
        e_k = es[:, q:q + 1]
        gt1 = e_k > max1
        gt2 = (~gt1) & (e_k > max2)
        max2 = jnp.where(gt1, max1, jnp.where(gt2, e_k, max2))
        max1 = jnp.where(gt1, e_k, max1)
        max_k = jnp.where(gt1, jnp.full((TB2, 1), q, I32), max_k)
    diag_t = [t for t, (j, k) in enumerate(triu) if j == k]
    min1 = jnp.full((TB2, 1), 1e30, F32)
    min2 = jnp.full((TB2, 1), 1e30, F32)
    min_k = jnp.full((TB2, 1), -1, I32)
    for q in range(4):
        d_k = cols[diag_t[q]]
        lt1 = d_k < min1
        lt2 = (~lt1) & (d_k < min2)
        min2 = jnp.where(lt1, min1, jnp.where(lt2, d_k, min2))
        min1 = jnp.where(lt1, d_k, min1)
        min_k = jnp.where(lt1, jnp.full((TB2, 1), q, I32), min_k)
    fix = (max1 > max2) & ((min_k != max_k) | (min1 + 1.0 > min2))
    fixed_val = jnp.where(min1 > 1.0, min1 - 1.0, fzero1)
    for q in range(4):
        t = diag_t[q]
        sel = fix & (max_k == q)
        cols[t] = jnp.where(sel, fixed_val, cols[t])

    # quantization to glf1_t (reference sniper_maqcns.c:236-244)
    min_p = cols[0]
    for col in cols[1:]:
        min_p = jnp.minimum(min_p, col)
    min_lk = jnp.where(
        min_p > 255.0, jnp.full((TB2, 1), 255, I32),
        jnp.floor(min_p + 0.5).astype(I32),
    )
    nz = n > 0
    out = []
    for col in cols:
        dlk = col - min_p
        lk = jnp.where(
            dlk > 255.0, jnp.full((TB2, 1), 255, I32),
            jnp.floor(dlk + 0.5).astype(I32),
        )
        out.append(jnp.where(nz, lk, jnp.zeros((TB2, 1), I32)))
    out.append(jnp.where(nz, min_lk, jnp.zeros((TB2, 1), I32)))
    out_ref[:, 0:11] = jnp.concatenate(out, axis=1)
    out_ref[:, 11:] = jnp.zeros((TB2, out_ref.shape[1] - 11), I32)


def assembly10(esum, fsum, c, n, coef_sub, lhet_sub,
               interpret: bool = False):
    """(lk i32[B,10], min_lk i32[B]) — fused likelihood assembly.

    ``coef_sub`` is coef[4:64, :NK, :NK] f32, ``lhet_sub`` lhet[:NK,:NK]
    f32.  Valid for NK <= 65 (slab depths <= 64 — deeper buckets keep
    the XLA assembly).  Bit-identical to the XLA fast path."""
    B = esum.shape[0]
    NK = coef_sub.shape[1]
    assert NK <= 65, "fused assembly supports NK <= 65"
    F = 60 * NK
    Fp = ((F + 127) // 128) * 128
    LFp = ((NK * NK + 127) // 128) * 128
    # coefT[m, (e-4)*NK + k] = coef_sub[e-4, m, k], padded to [128, Fp]
    ct = jnp.transpose(coef_sub, (1, 0, 2)).reshape(NK, F)
    ct = jnp.pad(ct, ((0, 128 - NK), (0, Fp - F)))
    lf = jnp.pad(lhet_sub.reshape(1, NK * NK),
                 ((0, 0), (0, LFp - NK * NK)))

    Bp = ((B + ASM_TB - 1) // ASM_TB) * ASM_TB
    if Bp != B:
        esum = jnp.pad(esum, ((0, Bp - B), (0, 0)))
        fsum = jnp.pad(fsum, ((0, Bp - B), (0, 0)))
        c = jnp.pad(c, ((0, Bp - B), (0, 0)))
        n = jnp.pad(n, (0, Bp - B))
    kern = functools.partial(_kernel_asm, NK=NK, F=F, Fp=Fp, LFp=LFp)
    out = pl.pallas_call(
        kern,
        grid=(Bp // ASM_TB,),
        in_specs=[
            pl.BlockSpec((ASM_TB, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ASM_TB, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ASM_TB, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ASM_TB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, Fp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LFp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ASM_TB, 16), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 16), I32),
        interpret=interpret,
    )(esum.astype(F32), fsum.astype(F32), c.astype(I32),
      n.astype(I32).reshape(Bp, 1), ct.astype(F32), lf.astype(F32))
    return out[:B, 0:10], out[:B, 10]


def accumulate32(slots, n_keep, ref16, theta: float = 0.85,
                 eta: float = 0.03, cap_mapq: int = 60,
                 interpret: bool = False):
    """(esum f32[B,4], fsum f32[B,4], c i32[B,4], rms i32[B]) over the
    raw kept-only u32 slab encoding — drop-in replacement for the
    glfgen raw-u32 XLA fast path, lane-packed like accumulate16."""
    B, D = slots.shape
    SD = 16
    while SD < D:
        SD *= 2
    SD = min(SD, 128)
    n_seg = 128 // SD
    Bp = ((B + TB * n_seg - 1) // (TB * n_seg)) * (TB * n_seg)
    if Bp != B or SD != D:
        slots = jnp.pad(slots, ((0, Bp - B), (0, SD - D)))
        n_keep = jnp.pad(n_keep, (0, Bp - B))
        ref16 = jnp.pad(ref16, (0, Bp - B))
    rows = Bp // n_seg
    si_ = jax.lax.bitcast_convert_type(slots, jnp.int32).reshape(
        rows, n_seg * SD
    )
    meta = jnp.concatenate(
        [
            n_keep.astype(I32).reshape(rows, n_seg),
            ref16.astype(I32).reshape(rows, n_seg),
        ],
        axis=1,
    )

    theta32 = np.float32(theta)
    eta32 = np.float32(eta)
    log_theta = (
        np.float32(np.log(np.float64(theta32)))
        if theta32 > 0 else np.float32(-1e30)
    )
    kern = functools.partial(
        _kernel32, SD=SD, n_seg=n_seg, theta32=theta32, eta32=eta32,
        log_theta=log_theta, cap_mapq=int(cap_mapq),
    )
    esum, fsum, c, rms = pl.pallas_call(
        kern,
        grid=(rows // TB,),
        in_specs=[
            pl.BlockSpec((TB, n_seg * SD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, n_seg * 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, n_seg * 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, n_seg * 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, n_seg * 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, n_seg), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, n_seg * 4), F32),
            jax.ShapeDtypeStruct((rows, n_seg * 4), F32),
            jax.ShapeDtypeStruct((rows, n_seg * 4), I32),
            jax.ShapeDtypeStruct((rows, n_seg), I32),
        ],
        interpret=interpret,
    )(si_, meta)
    return (
        esum.reshape(Bp, 4)[:B],
        fsum.reshape(Bp, 4)[:B],
        c.reshape(Bp, 4)[:B],
        rms.reshape(Bp)[:B],
    )


def accumulate16(slots16, n_keep, theta: float = 0.85, eta: float = 0.03,
                 interpret: bool = False):
    """(esum f32[B,4], fsum f32[B,4], c i32[B,4]) over the compact u16
    encoding — drop-in replacement for glfgen._fast_accumulate16.

    Shallow depth buckets are lane-packed: n_seg = 128/SD independent
    columns share each 128-lane row (see _kernel16)."""
    B, D = slots16.shape
    SD = 16
    while SD < D:
        SD *= 2
    SD = min(SD, 128)
    n_seg = 128 // SD
    # pad the batch to a multiple of TB * n_seg and the depth to SD
    Bp = ((B + TB * n_seg - 1) // (TB * n_seg)) * (TB * n_seg)
    if Bp != B or SD != D:
        slots16 = jnp.pad(slots16, ((0, Bp - B), (0, SD - D)))
        n_keep = jnp.pad(n_keep, (0, Bp - B))
    rows = Bp // n_seg
    # widen on-device before the kernel: the accelerator-link transfer
    # stays u16; Mosaic's own int16->int32 convert lowering recurses
    si = slots16.astype(jnp.int32).reshape(rows, n_seg * SD)
    meta = n_keep.astype(I32).reshape(rows, n_seg)

    theta32 = np.float32(theta)
    eta32 = np.float32(eta)
    log_theta = (
        np.float32(np.log(np.float64(theta32)))
        if theta32 > 0 else np.float32(-1e30)
    )
    kern = functools.partial(
        _kernel16, SD=SD, n_seg=n_seg, theta32=theta32, eta32=eta32,
        log_theta=log_theta,
    )
    esum, fsum, c = pl.pallas_call(
        kern,
        grid=(rows // TB,),
        in_specs=[
            pl.BlockSpec((TB, n_seg * SD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, n_seg), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, n_seg * 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, n_seg * 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, n_seg * 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, n_seg * 4), F32),
            jax.ShapeDtypeStruct((rows, n_seg * 4), F32),
            jax.ShapeDtypeStruct((rows, n_seg * 4), I32),
        ],
        interpret=interpret,
    )(si, meta)
    return (
        esum.reshape(Bp, 4)[:B],
        fsum.reshape(Bp, 4)[:B],
        c.reshape(Bp, 4)[:B],
    )


def accumulate(slots, depth, ref16, theta: float = 0.85, eta: float = 0.03,
               cap_mapq: int = 60, interpret: bool = False):
    """(esum f32[B,4], fsum f32[B,4], c i32[B,4], rms i32[B], n i32[B])
    — drop-in replacement for the XLA fast-path accumulation."""
    B, D = slots.shape
    Bp = ((B + TB - 1) // TB) * TB
    Dp = max(D, 128)  # dynamic lane rotations need 128-aligned lanes
    if Bp != B or Dp != D:
        slots = jnp.pad(slots, ((0, Bp - B), (0, Dp - D)))
        depth = jnp.pad(depth, (0, Bp - B))
        ref16 = jnp.pad(ref16, (0, Bp - B))
    si = jax.lax.bitcast_convert_type(slots, jnp.int32)
    meta = jnp.stack(
        [depth.astype(I32), ref16.astype(I32)], axis=1
    )  # [Bp, 2]

    theta32 = np.float32(theta)
    eta32 = np.float32(eta)
    log_theta = (
        np.float32(np.log(np.float64(theta32)))
        if theta32 > 0 else np.float32(-1e30)
    )
    kern = functools.partial(
        _kernel, D=Dp, theta32=theta32, eta32=eta32,
        log_theta=log_theta, cap_mapq=int(cap_mapq),
    )
    grid = (Bp // TB,)
    esum, fsum, c, aux = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, Dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, 4), F32),
            jax.ShapeDtypeStruct((Bp, 4), F32),
            jax.ShapeDtypeStruct((Bp, 4), I32),
            jax.ShapeDtypeStruct((Bp, 2), I32),
        ],
        interpret=interpret,
    )(si, meta)
    return (
        esum[:B], fsum[:B], c[:B], aux[:B, 0], aux[:B, 1]
    )
