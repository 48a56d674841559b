"""Isolated A/B of the batched fused kNN+interp at the sampler geometry:
flat-batched (one kernel pass over all clouds) vs lax.map (B serial
per-cloud passes), plus stage variants, chained inside one jit.

Usage: python examples/profile_batched_interp.py [B ...] [--chain C]
Variants per B:
  flat      grid_knn_interpolate (flat-batched path)
  laxmap    same entry point with the flat-batch predicate disabled
  flat_nofb flat-batched with the fallback ladder skipped (kernel+layout
            only — isolates the shared-tier fallback's cost)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_style_transfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import importlib
import functools

G = importlib.import_module("pointcloud_style_transfer_tpu.ops.grid_knn")

NQ, M, K = 90112, 30000, 3
CHAIN = 10


def _force(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)
    return x


def _time(fn, *args):
    jfn = jax.jit(fn)
    _force(jfn(*args))
    t0 = time.perf_counter()
    _force(jfn(*args))
    dt = time.perf_counter() - t0
    return dt / CHAIN


def chained(call):
    def fn(q, r, v):
        out = jnp.zeros((), jnp.float32)
        for i in range(CHAIN):
            # scalar dependency defeats CSE/reordering; vary q per round
            res = call(q + out * 1e-20 + i * 1e-7, r, v)
            leaf = res[0] if isinstance(res, tuple) else res
            out = out + jnp.sum(leaf[..., 0, :])
        return out
    return fn


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batches = [int(a) for a in args] or [1, 4]
    print(f"device={jax.devices()[0]} Nq={NQ} M={M} chain={CHAIN}")
    for B in batches:
        kq, kr, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (B, NQ, 3), jnp.float32) * 0.9
        r = jax.random.normal(kr, (B, M, 3), jnp.float32) * 0.9
        v = jax.random.normal(kv, (B, M, 3), jnp.float32)

        res = {}
        res["flat"] = _time(chained(
            lambda q, r, v: G.grid_knn_interpolate(q, r, v, K)), q, r, v)
        if B > 1:
            fn_single = functools.partial(
                G._grid_interp_single, k=K, grid_shape=(16, 12, 8), tq=128,
                slot_cap=384, fallback_cap=4096, interpret=False, z_halo=2,
                eps=1e-8)
            res["laxmap"] = _time(chained(
                lambda q, r, v: jax.lax.map(
                    lambda a: fn_single(a[0], a[1], a[2]), (q, r, v))),
                q, r, v)

            def flat_nofb(q, r, v):
                # structure + layout + kernel pass only (INEXACT on unsafe
                # rows): isolates the shared-tier fallback ladder's cost
                gs = (16, 12, 8)
                structb = G._build_struct_batched(
                    r.astype(jnp.float32), gs)
                order_g, Mv, M_pad = structb[1], structb[6], structb[7]
                Bv = v.shape[0]
                vals_pad = jnp.pad(
                    v.astype(jnp.float32).reshape(Bv * Mv, -1)[order_g]
                    .reshape(Bv, Mv, -1),
                    ((0, 0), (0, M_pad - Mv), (0, 0))).reshape(
                        Bv * M_pad, -1)
                v_out, _, _, _ = G._query_pass_batched(
                    structb, q, K, gs, 128, 384, False, 1, v, 1e-8,
                    vals_pad)
                return v_out
            res["flat_nofb"] = _time(chained(flat_nofb), q, r, v)
        for name, dt in res.items():
            print(f"B={B} {name}: {dt * 1000:.2f} ms/call "
                  f"({dt / B * 1000:.2f} ms/cloud)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
