"""Stage-level cost attribution of the PRODUCTION fused kNN+interp call
(_grid_interp_single at the sampler's 90k x 30k geometry, library defaults).

Complements profile_grid_knn.py (which profiles the kNN path at an older
layout): this times the exact call the sampler's hot loop makes, split as

  build      — _build_struct (skip_z_sort, as the entry point now builds)
  vals_pad   — pad + values[order_r] gather
  querypass  — _query_pass minus the Pallas kernel (stubbed, same shapes):
               cell assignment, padded layout, slot tables, margins, unsort
  kernel     — grid_interp_resident alone on captured real inputs
  interp     — full _grid_interp_single (includes the fallback lax.switch)

Chained x10 inside one jit to cancel the ~28 ms relay latency; forced with
a host transfer (block_until_ready returns early on axon — PERF_NOTES).
"""

import functools
import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_style_transfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

G = importlib.import_module("pointcloud_style_transfer_tpu.ops.grid_knn")
GF = importlib.import_module(
    "pointcloud_style_transfer_tpu.ops.pallas.grid_fused")

CHAIN = 10
NQ, M, K = 90000, 30000, 3
GS = tuple(int(v) for v in
           os.environ.get("PCST_PROF_GRID", "16,12,8").split(","))
TQ = int(os.environ.get("PCST_PROF_TQ", "128"))
CAP = int(os.environ.get("PCST_PROF_SLOT_CAP", "384"))
FB = int(os.environ.get("PCST_PROF_FALLBACK_CAP", "4096"))


def _force(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])[..., :1]
    return x


def timeit(fn, *args, reps=3):
    _force(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / CHAIN * 1e3


def main():
    kq, kr, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (NQ, 3), jnp.float32) * 0.9
    r = jax.random.normal(kr, (M, 3), jnp.float32) * 0.9
    v = jax.random.normal(kv, (M, 3), jnp.float32)
    fz = G._full_z_ok(M, GS, CAP)
    print(f"device={jax.devices()[0]}  Nq={NQ} M={M} k={K} grid={GS} "
          f"tq={TQ} slot_cap={CAP} fallback_cap={FB} full_z={fz}")

    def chain_build(r):
        s = G._build_struct(r, GS, skip_z_sort=fz)
        for _ in range(CHAIN - 1):
            s = G._build_struct(r + s[0][:1, :1] * 0.0, GS, skip_z_sort=fz)
        return s[0]
    print(f"build (skip_z={fz})      {timeit(jax.jit(chain_build), r):7.2f} ms")

    # eager build: keeps the trailing (M, M_pad) static ints static
    struct = G._build_struct(r, GS, skip_z_sort=fz)
    pad_n = struct[10] - struct[9]

    def chain_vals(v):
        out = v
        for _ in range(CHAIN):
            vp = jnp.pad(out[struct[1]], ((0, pad_n), (0, 0)))
            out = v + vp[:1] * 0.0
        return out
    print(f"vals_pad gather+pad      {timeit(jax.jit(chain_vals), v):7.2f} ms")

    vals_pad = jnp.pad(v[struct[1]], ((0, pad_n), (0, 0)))

    def chain_qp(q):
        out = q
        for _ in range(CHAIN):
            vv, unsafe = G._query_pass(
                struct, out, K, GS, TQ, CAP, False, 2, 1, v, 1e-8,
                vals_pad=vals_pad, full_z=True if fz else None)
            out = q + vv[:1, :1] * 0.0
        return out
    t_qp = timeit(jax.jit(chain_qp), q)
    print(f"query pass (w/ kernel)   {t_qp:7.2f} ms")

    # stub the kernel: same shapes, trivially cheap
    real = GF.grid_interp_resident

    def stub(q_pad, refs_sorted, vals_sorted, stb, st, en, k, tq=128,
             blocks_per_slot=2, eps=1e-8, interpret=False):
        NP = q_pad.shape[0]
        C = vals_sorted.shape[1]
        z = (jnp.sum(q_pad[:1]) + jnp.float32(jnp.sum(st[:1] + en[:1]
                                                      + stb[:1])))
        return (jnp.zeros((NP, C), jnp.float32) + z * 0.0,
                jnp.zeros((NP, k), jnp.float32) + z * 0.0)

    GF.grid_interp_resident = stub
    G2 = importlib.reload(G)
    t_qps = timeit(jax.jit(
        lambda q: _chain_qp_mod(G2, struct, q, v, vals_pad, fz)), q)
    print(f"query pass (stubbed)     {t_qps:7.2f} ms   "
          f"-> kernel ~{t_qp - t_qps:5.2f} ms")
    GF.grid_interp_resident = real
    G3 = importlib.reload(G)

    interp = functools.partial(G3._grid_interp_single, k=K, grid_shape=GS,
                               tq=TQ, slot_cap=CAP, fallback_cap=FB,
                               interpret=False, z_halo=2, eps=1e-8)

    def chain_full(q, r, v):
        out = q
        for _ in range(CHAIN):
            vv = interp(out, r, v)
            out = q + vv[:1, :1] * 0.0
        return out
    t_full = timeit(jax.jit(chain_full), q, r, v)
    print(f"full interp (w/ tiers)   {t_full:7.2f} ms   "
          f"-> fallback+build ~{t_full - t_qp:5.2f} ms")
    uu = jax.jit(lambda q: G3._query_pass(
        struct, q, K, GS, TQ, CAP, False, 2, 1, v, 1e-8,
        vals_pad=vals_pad, full_z=True if fz else None)[1])(q)
    print(f"unsafe rows: {int(jnp.sum(uu))} / {NQ}")


def _chain_qp_mod(Gm, struct, q, v, vals_pad, fz):
    out = q
    for _ in range(CHAIN):
        vv, unsafe = Gm._query_pass(
            struct, out, K, GS, TQ, CAP, False, 2, 1, v, 1e-8,
            vals_pad=vals_pad, full_z=True if fz else None)
        out = q + vv[:1, :1] * 0.0
    return out


if __name__ == "__main__":
    main()
