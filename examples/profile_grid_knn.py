"""Stage-level profiling of the grid kNN on the current backend (scratch).

Attributes the per-call cost across:
  plumbing  — structure build (3 variadic sorts) + query layout + slot
              tables + unsort scatters, measured by stubbing out the Pallas
              kernel (same shapes, zero outputs)
  kernel    — grid_topk_resident alone, on inputs captured from a real call
  full/core — the assembled paths, incl. the lax.cond brute fallback

Timing is chained (CHAIN dependent calls in one jit) to cancel the ~28 ms
relay latency; forced with a host transfer (block_until_ready returns early
on axon — docs/PERF_NOTES.md).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_style_transfer_tpu.utils.cache import enable_compilation_cache
import importlib

G = importlib.import_module("pointcloud_style_transfer_tpu.ops.grid_knn")
GF = importlib.import_module(
    "pointcloud_style_transfer_tpu.ops.pallas.grid_fused")

enable_compilation_cache()

CHAIN = 10


def _force(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0][..., :1])
    return x


def timeit(fn, *args, reps=3):
    _force(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / CHAIN


def chain(call, q, r):
    d, i, *rest = call(q, r)
    for _ in range(CHAIN - 1):
        d, i, *rest = call(q + d[:, :1] * 0.0, r)
    return d


def main():
    nq, m, k = 90112, 30000, 3
    kq, kr = jax.random.split(jax.random.PRNGKey(0))
    q = jax.random.normal(kq, (nq, 3), jnp.float32) * 0.9
    r = jax.random.normal(kr, (m, 3), jnp.float32) * 0.9
    # defaults track the production grid config (ops/grid_knn.py entry
    # points); override via PCST_PROF_GRID / PCST_PROF_TQ / PCST_PROF_SLOT_CAP
    gs = tuple(int(v) for v in
               os.environ.get("PCST_PROF_GRID", "16,12,8").split(","))
    tq = int(os.environ.get("PCST_PROF_TQ", "128"))
    cap = int(os.environ.get("PCST_PROF_SLOT_CAP", "384"))
    print(f"device={jax.devices()[0]}  Nq={nq} M={m} k={k} "
          f"grid={gs} tq={tq} slot_cap={cap}")

    core = functools.partial(G._grid_knn_core, k=k, grid_shape=gs, tq=tq,
                             slot_cap=cap, interpret=False, exact=True)
    full = functools.partial(G._grid_knn_single, k=k, grid_shape=gs, tq=tq,
                             slot_cap=cap, fallback_cap=4096,
                             interpret=False, exact=True)

    t = timeit(jax.jit(functools.partial(chain, core)), q, r)
    print(f"core (kernel + plumbing)   {t * 1e3:8.2f} ms")
    d, i, u = jax.jit(core)(q, r)
    print(f"  unsafe rows: {int(jnp.sum(u))} / {nq}")

    # sub-stages of the plumbing
    def chain_build(q, r):
        out = G._build_ref_structure(r, gs)
        for _ in range(CHAIN - 1):
            out = G._build_ref_structure(r + out[0][:1, :1] * 0.0, gs)
        return out[0]

    t = timeit(jax.jit(chain_build), q, r)
    print(f"  ref structure (3 sorts)  {t * 1e3:8.2f} ms")

    refs_s, order_r, xb, yb, zb, CS_np = jax.jit(
        functools.partial(G._build_ref_structure, grid_shape=gs))(r)

    if hasattr(G, "_layout_queries"):
        def chain_layout(q, xb, yb, zb):
            qp, op, pr = G._layout_queries(q, xb, yb, zb, *gs, tq)
            for _ in range(CHAIN - 1):
                qp, op, pr = G._layout_queries(q + qp[:1, :1] * 0.0,
                                               xb, yb, zb, *gs, tq)
            return qp, op

        t = timeit(jax.jit(chain_layout), q, xb, yb, zb)
        print(f"  query layout (sort+scat) {t * 1e3:8.2f} ms")

    def chain_unsort(op, ds):
        o = op
        for _ in range(CHAIN):
            d_out = jnp.zeros((nq, 3), jnp.float32).at[o].set(
                ds, mode="drop")
            o = o + (d_out[:1, :1] * 0.0).astype(jnp.int32)[0, 0]
        return d_out

    NP = (nq // tq + 145) * tq  # rough; only for a standalone scatter probe
    op_probe = jnp.arange(NP, dtype=jnp.int32) % nq
    ds_probe = jnp.zeros((NP, 3), jnp.float32)
    t = timeit(jax.jit(chain_unsort), op_probe, ds_probe)
    print(f"  one unsort scatter       {t * 1e3:8.2f} ms")

    def chain_order(order_r, gi):
        g = gi
        for _ in range(CHAIN):
            ridx = order_r[jnp.clip(g, 0, m - 1)]
            g = g + ridx * 0
        return ridx

    gi_probe = jnp.zeros((NP, 3), jnp.int32)
    t = timeit(jax.jit(chain_order), order_r, gi_probe)
    print(f"  order_r gather           {t * 1e3:8.2f} ms")

    # stub the kernel: same shapes, no pallas_call
    real = GF.grid_topk_resident

    def stub(q_pad, refs_sorted, stb, st, en, k, tq=128, blocks_per_slot=2,
             interpret=False):
        NP = q_pad.shape[0]
        z = jnp.sum(q_pad) + jnp.float32(jnp.sum(st + en + stb))
        return (jnp.zeros((NP, k), jnp.float32) + z * 0.0,
                jnp.zeros((NP, k), jnp.int32))

    GF.grid_topk_resident = stub
    importlib.reload(G)
    core_stub = functools.partial(G._grid_knn_core, k=k, grid_shape=gs,
                                  tq=tq, slot_cap=cap, interpret=False,
                                  exact=True)
    t_plumb = timeit(jax.jit(functools.partial(chain, core_stub)), q, r)
    print(f"plumbing only (kernel stubbed) {t_plumb * 1e3:6.2f} ms")
    GF.grid_topk_resident = real
    importlib.reload(G)

    t = timeit(jax.jit(functools.partial(chain, full)), q, r)
    print(f"full (with fallback cond)  {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
