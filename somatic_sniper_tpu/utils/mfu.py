"""Kernel microbenchmark + FLOP/byte model: honest utilization numbers.

SURVEY.md §6 demands produced-not-quoted baselines; this module produces
the single-chip utilization story for the fast-path scoring kernel
(models.somatic.call_batch_packed — glfgen + consensus + somatic score
over one (2, B, D) u16 slab):

* ``kernel_cols_per_sec`` — measured on-device rate, free of link
  latency: a ``lax.fori_loop`` chain whose per-iteration input depends
  on the previous iteration's result (a data dependency, so XLA cannot
  hoist the loop body — CLAUDE.md documents the LICM trap), with a
  dynamic trip count so ONE executable serves every iteration count
  (each distinct static shape costs a per-process executable load on
  tunneled links).  Rate = B * (iters_hi - iters_lo) / (t_hi - t_lo):
  differencing two trip counts cancels dispatch/fetch constants.
* ``flops_per_pair_column(D)`` — analytic FLOP count of the kernel
  (derivation below), making the rate convertible to FLOP/s.
* ``est_mfu`` — FLOP/s divided by the chip's peak; and a roofline
  verdict comparing the measured step time against the compute bound
  and the HBM bound.

FLOP model (per tumor/normal pair column, depth-padded to D; NK = D+1):

The fast path (models/glfgen.py:443-597, fast branch) does, per sample:

* rank accumulation: the Pallas kernel ranks by pairwise lane
  rotations, ~2 ops per ordered pair -> 2*D^2; plus ~32*D elementwise
  (fk exponent, masked class sums for esum/fsum/c).
* likelihood assembly via one-hot MXU contractions (glfgen.py fast
  branch, exact-in-f32 lookups because TPU vector gathers serialize):
  - R = einsum(one_hot(c_tot), coef[4:64,:NK,:NK]): 2*60*NK^2
  - coef terms, all 10 (4 hom + 6 het) batched into ONE einsum over the
    term axis (round 4: the ten separate contractions re-read the
    ~0.5 GB R intermediate ten times and were HBM-bound; batching
    raised the measured (32768, 64) rate 1.71M -> 2.29M pair-cols/s):
    10 * (2*60*NK + 2*NK)
  - lhet terms x6 (same batching): 6 * (2*NK^2 + 2*NK)
  - scalar tails (others_sum, fix-p[k,k], quantization): ~300
* consensus + somatic score (solo + joint 10x10 phred pipeline,
  models/{consensus,somatic}.py): ~800 per pair.

Peak numbers (TPU v5e / "v5 lite", public spec): 197 TFLOP/s bf16,
819 GB/s HBM.  The one-hot contractions run f32 at HIGHEST precision
(bit-exactness), which the MXU executes as multi-pass bf16 at a
fraction of bf16 peak — est_mfu is reported against the bf16 peak, i.e.
it is a lower bound on how well the kernel uses the chip it runs on.
"""

from __future__ import annotations

import time
from typing import NamedTuple

import numpy as np

V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9


def flops_per_pair_column(D: int) -> float:
    """Analytic FLOPs of call_batch_packed per column pair at depth D."""
    NK = min(D, 255) + 1
    acc = 2.0 * D * D + 32.0 * D
    assembly = (
        2.0 * 60 * NK * NK          # R one-hot contraction
        + 10.0 * (2 * 60 * NK + 2 * NK)  # coef_at (4 hom + 6 het)
        + 6.0 * (2 * NK * NK + 2 * NK)   # lhet_at
        + 300.0
    )
    score = 800.0
    return 2.0 * (acc + assembly) + score


def hbm_bytes_per_pair_column(D: int) -> float:
    """Minimum HBM traffic per column pair: the u16 slot stack + packed
    metadata in, one compact row out (intermediates assumed fused/tiled
    by XLA — the measured rate, not this bound, decides the verdict)."""
    return 2.0 * D * 2 + 12.0 + 17 * 4


class KernelBench(NamedTuple):
    cols_per_sec: float
    flops_per_col: float
    tflops: float
    est_mfu: float
    bound_compute_s: float   # per-slab lower bound at peak FLOP/s
    bound_hbm_s: float       # per-slab lower bound at peak HBM BW
    measured_slab_s: float
    verdict: str
    B: int
    D: int


def bench_kernel(B: int = 32768, D: int = 64, iters: int = 16,
                 use_joint: bool = False) -> KernelBench:
    """Measure the on-device rate of the production scoring kernel.

    One executable total: the iteration count is a runtime scalar
    (fori_loop lowers to while_loop), and the chained carry makes each
    iteration's input depend on the previous result.
    """
    import jax
    import jax.numpy as jnp
    from functools import partial

    from ..models.somatic import call_batch_packed
    from ..models.tables import ModelParams
    from ..runner import get_device_tables

    dtabs = get_device_tables(ModelParams(), "fast")
    p = dtabs.params

    rng = np.random.default_rng(7)
    depths = rng.integers(max(1, D // 2), D + 1, B).astype(np.int32)
    # raw u32 kept-only lanes (the round-5 production slab encoding):
    # mapq | baseq<<8 | base16<<16 | strand<<20
    mapq = rng.integers(1, 61, (B, D)).astype(np.uint32)
    baseq = rng.integers(1, 41, (B, D)).astype(np.uint32)
    base16 = np.asarray([1, 2, 4, 8], np.uint32)[
        rng.integers(0, 4, (B, D))
    ]
    strand = rng.integers(0, 2, (B, D)).astype(np.uint32)
    slots = mapq | (baseq << 8) | (base16 << 16) | (strand << 20)
    mask = np.arange(D)[None, :] < depths[:, None]
    stacked_h = np.where(mask[None], np.stack([slots, slots ^ 0x100]), 0)
    stacked_h = stacked_h.astype(np.uint32)
    ref16 = rng.choice([1, 2, 4, 8], size=B).astype(np.int32)
    cap = p.cap_mapq
    meta_h = np.zeros((3, B), np.int32)
    meta_h[0] = ref16 << 24
    mv = meta_h.view(np.uint32)
    mv[2] = (
        depths.astype(np.uint32)
        | (depths.astype(np.uint32) << 8)
        | (depths.astype(np.uint32) << 16)
        | (depths.astype(np.uint32) << 24)
    )

    core = partial(
        call_batch_packed,
        fk64=dtabs.fk, coef64=dtabs.coef, lhet64=dtabs.lhet,
        solo_prior=dtabs.solo_prior, joint_prior=dtabs.joint_prior,
        qadd_table=dtabs.qadd, q_r_int=dtabs.q_r_int,
        use_joint=use_joint, min_somatic_qual=p.min_somatic_qual,
        include_loh=p.include_loh, include_gor=p.include_gor,
        cap_mapq=cap, theta=p.theta, eta=p.eta, max_emit=B, mesh=None,
    )

    @jax.jit
    def chain(stacked, meta, n):
        def body(i, carry):
            acc, prev = carry
            # data-dependent perturbation: flips the low effq bit of
            # every slot based on the previous result — a real serial
            # dependency, so LICM cannot hoist the body
            s2 = stacked ^ (prev & 1).astype(jnp.uint32)
            res = core(s2, meta)
            return acc + res.count, res.count
        acc, _ = jax.lax.fori_loop(
            0, n, body, (jnp.int32(0), jnp.int32(0))
        )
        return acc

    stacked = jnp.asarray(stacked_h)
    meta = jnp.asarray(meta_h)
    # warm (compile + first-execution executable load)
    int(chain(stacked, meta, jnp.int32(1)))

    def timed(n):
        t0 = time.perf_counter()
        int(chain(stacked, meta, jnp.int32(n)))  # fetch forces the wait
        return time.perf_counter() - t0

    lo, hi = max(2, iters // 4), iters
    t_lo = min(timed(lo) for _ in range(2))
    t_hi = min(timed(hi) for _ in range(2))
    dt = max(t_hi - t_lo, 1e-9)
    cols_per_sec = B * (hi - lo) / dt
    slab_s = dt / (hi - lo)

    f_col = flops_per_pair_column(D)
    tflops = cols_per_sec * f_col / 1e12
    est_mfu = tflops * 1e12 / V5E_PEAK_BF16_FLOPS
    bound_c = B * f_col / V5E_PEAK_BF16_FLOPS
    bound_h = B * hbm_bytes_per_pair_column(D) / V5E_HBM_BYTES_PER_S
    # Which wall is closer?  Measured slab time sits far above both
    # ideal bounds because the dominant work (f32 HIGHEST one-hot
    # contractions, VPU sort/rank, 8-bit unpacking) does not run at
    # bf16-matmul peak; the ratio test still says which resource the
    # kernel is spending.  (Measured: slab time scales ~4x from D=32 to
    # D=64, tracking the FLOP model — compute-side, not launch
    # overhead.)
    if bound_c >= bound_h:
        verdict = (
            f"compute-bound at ~{est_mfu:.1%} of bf16 peak "
            "(f32-HIGHEST one-hot contractions + VPU rank/sort; "
            "not MXU-saturating by design — bit-exact table lookups)"
        )
    else:
        verdict = "HBM-bound"
    return KernelBench(
        cols_per_sec=cols_per_sec, flops_per_col=f_col, tflops=tflops,
        est_mfu=est_mfu, bound_compute_s=bound_c, bound_hbm_s=bound_h,
        measured_slab_s=slab_s, verdict=verdict, B=B, D=D,
    )
