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
    gs, tq, cap = (12, 12, 20), 128, 256
    print(f"device={jax.devices()[0]}  Nq={nq} M={m} k={k} "
          f"grid={gs} tq={tq} slot_cap={cap}")

    core = functools.partial(G._grid_knn_core, k=k, grid_shape=gs, tq=tq,
                             slot_cap=cap, interpret=False, exact=True)
    full = functools.partial(G._grid_knn_single, k=k, grid_shape=gs, tq=tq,
                             slot_cap=cap, fallback_cap=8192,
                             interpret=False, exact=True)

    t = timeit(jax.jit(functools.partial(chain, core)), q, r)
    print(f"core (kernel + plumbing)   {t * 1e3:8.2f} ms")
    d, i, u = jax.jit(core)(q, r)
    print(f"  unsafe rows: {int(jnp.sum(u))} / {nq}")

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
