"""Attribute grid-kNN unsafe rows to their BINDING margin term along a real
sampling trajectory — which face of the covered region do the fallback rows'
kNN balls poke through?

The union-region margin (ops/grid_knn.py::_query_pass) is the min of three
squared budgets: the ±H x-slab strip (msq_x), the per-slab y-band
(msq_slab), and the per-(slab,row)-pair z-run (msq_pair). Knowing which one
binds for real unsafe rows decides the next widening lever (±2 slabs in x
vs ±2 rows in y vs more z coverage) WITHOUT paying a sweep of end-to-end
benchmarks per direction. For each term the probe reports a rescue upper
bound: rows currently unsafe whose d_k fits the min of the OTHER terms —
i.e. what an (infinitely) wider coverage in that one direction could save.

Usage: python examples/probe_margin_binding.py [steps]
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

GS = tuple(int(v) for v in os.environ.get("PCST_PROF_GRID", "16,12,8").split(","))
TQ, SLOT_CAP, Z_HALO = 128, int(os.environ.get("PCST_PROF_SLOT_CAP", "384")), 2


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    config = Config()
    N, M = config.total_points, config.global_points
    model = PointCloudDiffusionModel(config)
    schedule = make_schedule(config)
    variables = model.init(jax.random.PRNGKey(0), example_points=4096)

    src = jax.random.normal(jax.random.PRNGKey(1), (1, N, 3), jnp.float32) * 0.9
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, N, 3), jnp.float32) * 0.9

    k_cond, k_style, k_init, k_steps = jax.random.split(
        jax.random.PRNGKey(3), 4)
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
        struct = G._build_struct(r.astype(jnp.float32), GS)
        d, i, unsafe, dg = G._query_pass(struct, q, 3, GS, TQ, SLOT_CAP,
                                         False, Z_HALO, 1, diag=True)
        dk = dg["d_last"]
        sentinel = dk >= 1e29
        window = ~dg["tile_ok"]
        margin_only = unsafe & ~sentinel & ~window
        mx, ms, mp = dg["msq_x"], dg["msq_slab"], dg["msq_pair"]
        binds_x = margin_only & (mx <= ms) & (mx <= mp)
        binds_s = margin_only & ~binds_x & (ms <= mp)
        binds_p = margin_only & ~binds_x & ~binds_s
        resc_x = margin_only & (dk <= jnp.minimum(ms, mp))
        resc_s = margin_only & (dk <= jnp.minimum(mx, mp))
        # rescue_pair doubles as the full-column-z rescue bound: whole-column
        # coverage makes the pair budget infinite (ops/grid_knn.py full_z)
        resc_p = margin_only & (dk <= jnp.minimum(mx, ms))
        stats = jnp.stack([jnp.sum(unsafe), jnp.sum(sentinel),
                           jnp.sum(window & ~sentinel),
                           jnp.sum(binds_x), jnp.sum(binds_s),
                           jnp.sum(binds_p),
                           jnp.sum(resc_x), jnp.sum(resc_s),
                           jnp.sum(resc_p)])
        # exact interpolation of the (possibly-unsafe) grid answer is fine
        # for a trajectory probe (representative geometry, not parity)
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
        return x_next, stats

    names = ("unsafe", "sentinel", "window", "binds_x", "binds_slab",
             "binds_pair", "rescue_x", "rescue_slab", "rescue_pair")
    acc = []
    for s in range(steps):
        x, st = step(x, ts[s], t_prev[s], step_keys[s])
        st = np.asarray(st)
        acc.append(st)
        print(f"step {s:3d} t={int(ts[s]):4d} "
              + " ".join(f"{n}={int(v)}" for n, v in zip(names, st)),
              flush=True)
    a = np.stack(acc)
    print(f"\ngrid={GS} z_halo={Z_HALO} slot_cap={SLOT_CAP} "
          f"steps={steps}  (totals / per-step mean)")
    for j, n in enumerate(names):
        print(f"  {n:12s} total={a[:, j].sum():8d}  mean={a[:, j].mean():8.0f}")


if __name__ == "__main__":
    main()
