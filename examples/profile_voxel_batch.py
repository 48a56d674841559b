"""Voxel-downsample batch scaling on REAL hardware: is the flat
composite-key sort path (_downsample_batched) actually linear in B at the
sampler geometry (120k -> 30k, with_coords)?

Round-1 blamed sublinear train-step B-scaling on vmap-serialised sorts and
built the flat path; the flat path's own B-scaling at full size was never
measured (round-4 verdict item #5). Chained calls inside one jit.

Usage: python examples/profile_voxel_batch.py [B ...]
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

from pointcloud_style_transfer_tpu.ops import voxel_downsample_partition

N, M, CHAIN = 120000, 30000, 10


def _force(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)
    return x


def main():
    batches = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    print(f"device={jax.devices()[0]} N={N} M={M} chain={CHAIN}")
    base = None
    for B in batches:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(1), CHAIN)

        def fn(x):
            out = jnp.zeros((), jnp.float32)
            for i in range(CHAIN):
                sel, idx, comp, cxyz = voxel_downsample_partition(
                    x + out * 1e-20, M, keys[i])
                out = out + jnp.sum(sel[:, 0, :]) + jnp.sum(cxyz[:, 0, :])
            return out

        jfn = jax.jit(fn)
        _force(jfn(x))
        t0 = time.perf_counter()
        _force(jfn(x))
        dt = (time.perf_counter() - t0) / CHAIN
        if base is None:
            base = dt
        print(f"B={B}: {dt * 1000:.2f} ms/call ({dt / B * 1000:.2f} "
              f"ms/cloud, {dt / base:.2f}x vs B=1)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
