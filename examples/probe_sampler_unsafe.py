"""Per-step grid-kNN unsafe counts along a REAL sampling trajectory.

Replicates guided_sample_loop's hierarchical body (models/samplers.py) one
step at a time on the host so each step can report the number of
margin-check failures the grid backend would send to its brute fallback.
This is the number that decides the fallback tier (ops/grid_knn.py) and
therefore the in-sampler cost of the grid backend; synthetic probes (pure
noise, clean surfaces) bracket it but the mid-trajectory mixture is what
the sampler actually pays for.

Usage: python examples/probe_sampler_unsafe.py [steps] [Sx Sy Sz] [z_halo]
       [slot_cap]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib
import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_style_transfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from pointcloud_style_transfer_tpu.config import Config
from pointcloud_style_transfer_tpu.models import (PointCloudDiffusionModel,
                                                  make_schedule)
from pointcloud_style_transfer_tpu.models.diffusion import ddim_step
from pointcloud_style_transfer_tpu.models.samplers import _step_schedule
from pointcloud_style_transfer_tpu.ops import (complement_indices,
                                               index_points, voxel_downsample)

G = importlib.import_module("pointcloud_style_transfer_tpu.ops.grid_knn")


def main():
    args = sys.argv[1:]
    steps = int(args[0]) if args else 50
    gs = tuple(int(a) for a in args[1:4]) if len(args) >= 4 else (16, 16, 8)
    halo = int(args[4]) if len(args) >= 5 else 2
    slot_cap = int(args[5]) if len(args) >= 6 else 256
    config = Config()
    N, M = config.total_points, config.global_points
    model = PointCloudDiffusionModel(config)
    schedule = make_schedule(config)
    variables = model.init(jax.random.PRNGKey(0), example_points=4096)

    src = jax.random.normal(jax.random.PRNGKey(1), (1, N, 3), jnp.float32) * 0.9
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, N, 3), jnp.float32) * 0.9

    k_cond, k_style, k_init, k_steps = jax.random.split(jax.random.PRNGKey(3), 4)
    cond_ds, _ = voxel_downsample(cond, M, k_cond)
    style, _ = model.encode_style(variables, cond_ds, key=k_style, train=False)
    style_in = jnp.concatenate([style, jnp.zeros_like(style)], axis=0)
    x = jax.random.normal(k_init, src.shape, jnp.float32)
    ts, t_prev = _step_schedule(schedule.num_timesteps, steps)
    step_keys = jax.random.split(k_steps, steps)

    @jax.jit
    def step(x, t, tp, k):
        t_in = jnp.full((2,), t, jnp.int32)
        x_coarse, x_idx = voxel_downsample(x, M, k)
        x2 = jnp.concatenate([x_coarse, x_coarse], axis=0)
        nc = model.predict_noise(variables, x2, t_in, style_in, train=False)
        nc_c, nc_u = jnp.split(nc.astype(jnp.float32), 2)
        guided = nc_u + config.guidance_scale * (nc_c - nc_u)
        unknown = complement_indices(x_idx, N)
        q = index_points(x, unknown)[0]
        r = index_points(x, x_idx)[0]
        d, i, unsafe = G._grid_knn_core(q, r, 3, gs, 128, slot_cap, False,
                                        True, halo)
        # exact interpolation using the (possibly-unsafe) grid answer is fine
        # for a trajectory probe: unsafe rows are rare and the probe only
        # needs representative geometry, not bit-exact parity
        dist = jnp.sqrt(jnp.maximum(d, 0.0))
        w = 1.0 / (dist + 1e-8)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        vals = jnp.sum(guided[0][i] * w[..., None], axis=1)[None]
        noise = jnp.zeros((1, N, 3), jnp.float32)
        noise = noise.at[0, unknown[0]].set(vals[0], mode="drop")
        noise = noise.at[0, jnp.clip(x_idx[0], 0, N - 1)].set(
            guided[0], mode="drop")
        x_next = ddim_step(schedule, x, noise, t, tp, source_points=src,
                           content_anchor=config.content_anchor,
                           target_range=config.target_range)
        d3 = jnp.sqrt(jnp.maximum(d[:, -1], 0.0))
        d3_unsafe = jnp.median(jnp.where(unsafe, d3, jnp.nan))
        d3_safe = jnp.median(jnp.where(unsafe, jnp.nan, d3))
        return x_next, (jnp.sum(unsafe),
                        jnp.nanmedian(jnp.where(unsafe, d3, jnp.nan)),
                        jnp.nanmedian(jnp.where(unsafe, jnp.nan, d3)))

    counts = []
    for s in range(steps):
        x, (n_unsafe, d3u, d3s) = step(x, ts[s], t_prev[s], step_keys[s])
        counts.append(int(n_unsafe))
        print(f"step {s:3d} t={int(ts[s]):4d} unsafe={counts[-1]} "
              f"d3_unsafe_med={float(d3u):.4f} d3_safe_med={float(d3s):.4f}",
              flush=True)
    c = np.array(counts)
    print(f"\ngrid={gs} z_halo={halo} slot_cap={slot_cap}  "
          f"min={c.min()} median={int(np.median(c))} "
          f"mean={c.mean():.0f} max={c.max()}")
    for cap in (4096, 8192, 16384, 32768, 65536):
        print(f"  steps over {cap}: {(c > cap).sum()}/{steps}")


if __name__ == "__main__":
    main()
