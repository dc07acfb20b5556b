"""Pallas glfgen-accumulate kernel vs the XLA fast path.

Runs the kernel in interpreter mode on CPU (the driver's TPU bench runs
it compiled); both paths must produce identical esum/fsum/c/rms/n and,
through glfgen_batch, identical quantized likelihoods.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from somatic_sniper_tpu.models import tables as T
from somatic_sniper_tpu.models.glfgen import (
    ColumnBatch,
    glfgen_batch,
    pack_slots_np,
)
from somatic_sniper_tpu.ops.pallas_glfgen import accumulate


def _random_batch(B, D, seed, p_del=0.05, p_ambig=0.05, p_q0=0.05):
    rng = np.random.default_rng(seed)
    depths = rng.integers(0, D + 1, B).astype(np.int32)
    base = rng.choice([1, 2, 4, 8, 15, 5, 0], size=(B, D),
                      p=[.3, .25, .2, .13, .04, .04, .04])
    baseq = np.where(rng.random((B, D)) < p_q0, 0,
                     rng.integers(0, 94, (B, D)))
    mapq = rng.integers(0, 256, (B, D))
    strand = rng.integers(0, 2, (B, D))
    is_del = rng.random((B, D)) < p_del
    slots = pack_slots_np(base, baseq, mapq, strand, is_del)
    mask = np.arange(D)[None, :] < depths[:, None]
    slots = np.where(mask, slots, 0).astype(np.uint32)
    ref16 = rng.choice([1, 2, 4, 8, 15], size=B).astype(np.int32)
    return ColumnBatch(
        slots=jnp.asarray(slots),
        depth=jnp.asarray(depths),
        ref16=jnp.asarray(ref16),
    )


@pytest.mark.parametrize("B,D,seed", [(64, 16, 0), (128, 32, 1), (96, 64, 2)])
def test_accumulate_matches_xla_fast(B, D, seed):
    from somatic_sniper_tpu.models.glfgen import _fast_accumulate, pack_info

    cb = _random_batch(B, D, seed)
    info, n = pack_info(cb)
    e_x, f_x, c_x, r_x = _fast_accumulate(info, n, 0.85, 0.03, 60)
    e_p, f_p, c_p, r_p, n_p = accumulate(
        cb.slots, cb.depth, cb.ref16, theta=0.85, eta=0.03, cap_mapq=60,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n))
    np.testing.assert_array_equal(np.asarray(c_p), np.asarray(c_x))
    np.testing.assert_array_equal(np.asarray(r_p), np.asarray(r_x))
    np.testing.assert_allclose(np.asarray(e_p), np.asarray(e_x),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_x),
                               rtol=1e-6, atol=1e-6)


def _to_packed16(cb: ColumnBatch, cap_mapq=60) -> ColumnBatch:
    """Reference conversion u32 -> compact u16 ColumnBatch (numpy)."""
    s = np.asarray(cb.slots)
    depth = np.asarray(cb.depth)
    ref16 = np.asarray(cb.ref16)
    B, D = s.shape
    out = np.zeros((B, D), np.uint16)
    nk = np.zeros(B, np.int32)
    rms = np.zeros(B, np.int32)
    for b in range(B):
        k = 0
        for j in range(int(depth[b])):
            w = int(s[b, j])
            if (w >> 21) & 1:
                continue
            mq, q = w & 0xFF, (w >> 8) & 0xFF
            b16 = (w >> 16) & 0xF
            code = b16 if b16 else int(ref16[b])
            base2 = {1: 0, 2: 1, 4: 2, 8: 3}.get(code, 0)
            eff = min(q, mq)
            if eff < 4 and (q & 0x3F) != 0:
                eff = 4
            out[b, k] = eff | (base2 << 8) | (((w >> 20) & 1) << 10)
            k += 1
            rms[b] += min(mq & 0x7F, cap_mapq) ** 2
        nk[b] = k
    return ColumnBatch(
        slots=jnp.asarray(out), depth=cb.depth, ref16=cb.ref16,
        n_keep=jnp.asarray(nk), rms_sum=jnp.asarray(rms),
    )


@pytest.mark.parametrize("backend", ["xla", "pallas_interpret"])
def test_glfgen_packed16_matches_u32(backend):
    """The compact u16 encoding must reproduce the u32 fast path: equal
    (class, effq) reads are interchangeable, everything else is exact."""
    tabs = T.build_tables(T.ModelParams())
    cb = _random_batch(128, 24, 11)
    cb16 = _to_packed16(cb)
    g_u32 = glfgen_batch(cb, tabs.fk, tabs.coef, tabs.lhet,
                         precision="fast", backend="xla")
    g_u16 = glfgen_batch(cb16, tabs.fk, tabs.coef, tabs.lhet,
                         precision="fast", backend=backend)
    np.testing.assert_array_equal(np.asarray(g_u16.depth),
                                  np.asarray(g_u32.depth))
    np.testing.assert_array_equal(np.asarray(g_u16.rms_mapq),
                                  np.asarray(g_u32.rms_mapq))
    diff = np.abs(np.asarray(g_u16.lk).astype(int)
                  - np.asarray(g_u32.lk).astype(int))
    assert diff.max() <= 1  # f32 sum-order noise at quantization edges
    assert (diff == 0).all(axis=1).mean() > 0.99


def _to_raw32(cb: ColumnBatch) -> ColumnBatch:
    """Reference conversion u32 -> raw kept-only slab lanes (numpy):
    drop deletion entries, mask to the 21 packing bits, left-pack."""
    s = np.asarray(cb.slots)
    depth = np.asarray(cb.depth)
    B, D = s.shape
    out = np.zeros((B, D), np.uint32)
    nk = np.zeros(B, np.int32)
    for b in range(B):
        k = 0
        for j in range(int(depth[b])):
            w = int(s[b, j])
            if (w >> 21) & 1:
                continue
            out[b, k] = w & 0x1FFFFF
            k += 1
        nk[b] = k
    return ColumnBatch(
        slots=jnp.asarray(out), depth=cb.depth, ref16=cb.ref16,
        n_keep=jnp.asarray(nk),
    )


@pytest.mark.parametrize("B,D,seed", [(64, 16, 3), (128, 48, 4),
                                      (96, 64, 5)])
def test_accumulate32_matches_xla_raw(B, D, seed):
    """The lane-packed raw-u32 kernel vs the raw32 XLA path: c/rms
    exact, weighted sums equal up to f32 summation order."""
    from somatic_sniper_tpu.models.glfgen import _fast_accumulate, pack_info
    from somatic_sniper_tpu.ops.pallas_glfgen import accumulate32

    cb = _to_raw32(_random_batch(B, D, seed))
    view = ColumnBatch(slots=cb.slots, depth=cb.n_keep, ref16=cb.ref16)
    info, n = pack_info(view)
    e_x, f_x, c_x, r_x = _fast_accumulate(info, cb.n_keep, 0.85, 0.03, 60)
    e_p, f_p, c_p, r_p = accumulate32(
        cb.slots, cb.n_keep, cb.ref16, theta=0.85, eta=0.03, cap_mapq=60,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(c_p), np.asarray(c_x))
    np.testing.assert_array_equal(np.asarray(r_p), np.asarray(r_x))
    np.testing.assert_allclose(np.asarray(e_p), np.asarray(e_x),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_x),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("backend", ["xla", "pallas_interpret"])
def test_glfgen_raw32_matches_u32(backend):
    """The raw kept-only slab encoding must reproduce the plain u32
    fast path (the fill only drops deletion entries, which never reach
    the accumulators)."""
    tabs = T.build_tables(T.ModelParams())
    cb = _random_batch(128, 24, 13)
    cb32 = _to_raw32(cb)
    g_u32 = glfgen_batch(cb, tabs.fk, tabs.coef, tabs.lhet,
                         precision="fast", backend="xla")
    g_raw = glfgen_batch(cb32, tabs.fk, tabs.coef, tabs.lhet,
                         precision="fast", backend=backend)
    np.testing.assert_array_equal(np.asarray(g_raw.depth),
                                  np.asarray(g_u32.depth))
    np.testing.assert_array_equal(np.asarray(g_raw.rms_mapq),
                                  np.asarray(g_u32.rms_mapq))
    diff = np.abs(np.asarray(g_raw.lk).astype(int)
                  - np.asarray(g_u32.lk).astype(int))
    assert diff.max() <= 1  # f32 sum-order noise at quantization edges
    assert (diff == 0).all(axis=1).mean() > 0.99


def test_fused_assembly_bit_identical(monkeypatch):
    """The fused Pallas likelihood assembly must reproduce the XLA
    assembly EXACTLY (not ±1): same accumulate backend, only the
    assembly differs, so any lk/min_lk deviation is a kernel bug.
    jax.clear_caches() busts the jit cache between the two traces
    (SNIPER_FUSED_ASSEMBLY is read at trace time)."""
    import jax

    tabs = T.build_tables(T.ModelParams())
    cb = _to_raw32(_random_batch(256, 48, 17))
    monkeypatch.delenv("SNIPER_FUSED_ASSEMBLY", raising=False)
    jax.clear_caches()
    g_fused = glfgen_batch(cb, tabs.fk, tabs.coef, tabs.lhet,
                           precision="fast", backend="pallas_interpret")
    lk_f = np.asarray(g_fused.lk).copy()
    mlk_f = np.asarray(g_fused.min_lk).copy()
    monkeypatch.setenv("SNIPER_FUSED_ASSEMBLY", "0")
    jax.clear_caches()
    g_xla = glfgen_batch(cb, tabs.fk, tabs.coef, tabs.lhet,
                         precision="fast", backend="pallas_interpret")
    np.testing.assert_array_equal(lk_f, np.asarray(g_xla.lk))
    np.testing.assert_array_equal(mlk_f, np.asarray(g_xla.min_lk))
    np.testing.assert_array_equal(np.asarray(g_fused.rms_mapq),
                                  np.asarray(g_xla.rms_mapq))
    jax.clear_caches()


def test_pad16_native_matches_numpy(data_dir):
    from somatic_sniper_tpu.io import native_api
    from somatic_sniper_tpu.pileup.columnize import (
        ColumnarPileup, _pad_columns16,
    )

    f = str(data_dir / "e2e/sim1/tumor.bam")
    _, pu = native_api.load_and_columnize(f)
    rng = np.random.default_rng(3)
    idx = np.sort(rng.choice(len(pu.ukeys), 2000, replace=False))
    ref16 = rng.choice([1, 2, 4, 8, 15], size=len(idx)).astype(np.int32)
    D = int(pu.depths[idx].max())
    nat = _pad_columns16(pu, idx, ref16, D, 60)
    pu_py = ColumnarPileup(keys=None, slots=np.asarray(pu.slots).copy(),
                           ukeys=np.asarray(pu.ukeys).copy(),
                           offsets=np.asarray(pu.offsets).copy())
    pyt = _pad_columns16(pu_py, idx, ref16, D, 60)
    for a, b in zip(nat, pyt):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_glfgen_pallas_backend_matches_xla():
    tabs = T.build_tables(T.ModelParams())
    cb = _random_batch(256, 32, 7)
    g_x = glfgen_batch(cb, tabs.fk, tabs.coef, tabs.lhet,
                       precision="fast", backend="xla")
    g_p = glfgen_batch(cb, tabs.fk, tabs.coef, tabs.lhet,
                       precision="fast", backend="pallas_interpret")
    # quantized u8 likelihoods absorb the tiny f32 sum-order differences
    assert (np.abs(np.asarray(g_p.lk).astype(int)
                   - np.asarray(g_x.lk).astype(int)) <= 1).all()
    same = (np.asarray(g_p.lk) == np.asarray(g_x.lk)).all(axis=1)
    assert same.mean() > 0.99
    np.testing.assert_array_equal(np.asarray(g_p.depth),
                                  np.asarray(g_x.depth))
    np.testing.assert_array_equal(np.asarray(g_p.rms_mapq),
                                  np.asarray(g_x.rms_mapq))


def _mesh8():
    import jax
    from somatic_sniper_tpu.parallel.sharding import make_mesh

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_glfgen_pallas_shard_map_matches_single_device():
    """With a mesh, the Pallas accumulate runs under shard_map (one
    kernel per device slab) and must reproduce the single-device kernel
    bit-for-bit — padding is per-slab but pad rows are unoccupied."""
    mesh = _mesh8()
    tabs = T.build_tables(T.ModelParams())
    cb = _random_batch(256, 32, 13)
    g_one = glfgen_batch(cb, tabs.fk, tabs.coef, tabs.lhet,
                         precision="fast", backend="pallas_interpret")
    g_mesh = glfgen_batch(cb, tabs.fk, tabs.coef, tabs.lhet,
                          precision="fast", backend="pallas_interpret",
                          mesh=mesh)
    for a, b in zip(g_mesh, g_one):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_glfgen_pallas_shard_map_packed16_matches_single_device():
    mesh = _mesh8()
    tabs = T.build_tables(T.ModelParams())
    cb16 = _to_packed16(_random_batch(128, 24, 17))
    g_one = glfgen_batch(cb16, tabs.fk, tabs.coef, tabs.lhet,
                         precision="fast", backend="pallas_interpret")
    g_mesh = glfgen_batch(cb16, tabs.fk, tabs.coef, tabs.lhet,
                          precision="fast", backend="pallas_interpret",
                          mesh=mesh)
    for a, b in zip(g_mesh, g_one):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_call_batch_pallas_matches_xla():
    """The production mesh dispatch no longer pins the XLA accumulate:
    the Pallas (interpret) backend must run under the mesh and produce
    the same calls."""
    from somatic_sniper_tpu.parallel.sharding import sharded_call_batch

    mesh = _mesh8()
    tabs = T.build_tables(T.ModelParams())
    tb = _random_batch(128, 32, 19)
    nb = _random_batch(128, 32, 23)
    targs = (tabs.fk.astype(np.float32), tabs.coef.astype(np.float32),
             tabs.lhet.astype(np.float32), tabs.solo_prior,
             tabs.joint_prior, tabs.qadd, tabs.q_r_int)
    r_x = sharded_call_batch(mesh, tb, nb, targs, precision="fast",
                             use_joint=True, glf_backend="xla")
    r_p = sharded_call_batch(mesh, tb, nb, targs, precision="fast",
                             use_joint=True,
                             glf_backend="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(r_p.emit),
                                  np.asarray(r_x.emit))
    np.testing.assert_array_equal(np.asarray(r_p.tumor_gt),
                                  np.asarray(r_x.tumor_gt))
    np.testing.assert_array_equal(np.asarray(r_p.normal_gt),
                                  np.asarray(r_x.normal_gt))
    d = np.abs(np.asarray(r_p.somatic_score).astype(int)
               - np.asarray(r_x.somatic_score).astype(int))
    assert d.max() <= 1
