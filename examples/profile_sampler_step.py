"""Per-component cost attribution of the hierarchical sampling step.

Runs a 10-step scan replicating guided_sample_loop's hierarchical body
(models/samplers.py) with individual components stubbed out, on the real
backend. The difference between the full step and each stubbed variant is
that component's marginal cost in context (fusion and scheduling effects
included), which microbenchmarks of the isolated ops do not capture.

Usage: python examples/profile_sampler_step.py [variant ...]
Variants: full, noknn, nofallback, nodenoise, novoxel, noassembly, noddim
(default: all). noassembly drops the final 120k noise-field scatter
(replaced by a cheap reduction so the interp values stay live); noddim
replaces ddim_step's anchor+tanh+alpha math with a single axpy pass.
Env knobs (grid experiment sweeps): PCST_PROF_SLOT_CAP, PCST_PROF_Z_HALO,
PCST_PROF_GRID (e.g. "16,8,8"), PCST_PROF_FALLBACK_CAP, PCST_PROF_TQ,
PCST_PROF_XY_HALO (int or "Hx,Hy"). Defaults track the production grid
config (ops/grid_knn.py entry-point defaults).
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

from pointcloud_style_transfer_tpu.config import Config
from pointcloud_style_transfer_tpu.models import (PointCloudDiffusionModel,
                                                  make_schedule)
from pointcloud_style_transfer_tpu.models.diffusion import ddim_step
from pointcloud_style_transfer_tpu.models.samplers import _step_schedule
from pointcloud_style_transfer_tpu.ops import voxel_downsample_partition
import importlib

_G = importlib.import_module("pointcloud_style_transfer_tpu.ops.grid_knn")
grid_knn_interpolate = _G.grid_knn_interpolate
_BRUTE_INTERP_REAL = _G._brute_interp

STEPS = 10

SLOT_CAP = int(os.environ.get("PCST_PROF_SLOT_CAP", "384"))
Z_HALO = int(os.environ.get("PCST_PROF_Z_HALO", "2"))
GRID = tuple(int(v) for v in
             os.environ.get("PCST_PROF_GRID", "16,12,8").split(","))
FALLBACK_CAP = int(os.environ.get("PCST_PROF_FALLBACK_CAP", "4096"))
TQ = int(os.environ.get("PCST_PROF_TQ", "128"))
# int ("1") or asymmetric "Hx,Hy" (e.g. "1,2" widens the y row band only)
_xh = os.environ.get("PCST_PROF_XY_HALO", "1")
XY_HALO = (int(_xh) if "," not in _xh
           else tuple(int(v) for v in _xh.split(",")))


def _force(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)
    return x


def main():
    variants = sys.argv[1:] or ["full", "noknn", "nofallback", "nodenoise",
                                "novoxel", "noassembly", "noddim"]
    config = Config()
    N, M = config.total_points, config.global_points
    model = PointCloudDiffusionModel(config)
    schedule = make_schedule(config)
    variables = model.init(jax.random.PRNGKey(0), example_points=4096)
    src = jax.random.normal(jax.random.PRNGKey(1), (1, N, 3), jnp.float32) * 0.9
    style_in = jnp.zeros((2, config.feature_dim), jnp.float32)
    ts, t_prev = _step_schedule(schedule.num_timesteps, STEPS)
    keys = jax.random.split(jax.random.PRNGKey(3), STEPS)

    def make_loop(variant):
        if variant == "nopatchbrute":
            # fallback machinery intact (nonzero/gather/scatter/switch) but
            # the patch's brute kNN+interp stubbed: isolates the brute
            # kernel's share of the fallback marginal
            _G._brute_interp = lambda q, r, v, k, eps, i: q * jnp.float32(0.1)
        else:
            _G._brute_interp = _BRUTE_INTERP_REAL
        # _grid_interp_single is a module-level jit: drop traces made with a
        # previously monkeypatched _brute_interp
        _G._grid_interp_single.clear_cache()

        def body(x, step):
            t, tp, k = step
            t_in = jnp.full((2,), t, jnp.int32)
            if variant == "bare":
                # scan + carry + transfer floor: every component stubbed
                return x - 0.05 * jnp.tanh(x * (1.0 + t.astype(jnp.float32)
                                                * 1e-6)), None
            if variant == "novoxel":
                x_coarse, x_idx = x[:, :M], jnp.arange(M, dtype=jnp.int32)[None]
                unknown = jnp.arange(M, N, dtype=jnp.int32)[None]
                unk_xyz = x[:, M:]
            else:
                x_coarse, x_idx, unknown, unk_xyz = voxel_downsample_partition(
                    x, M, k)
            if variant == "nodenoise":
                guided = x_coarse * 0.1
            else:
                x2 = jnp.concatenate([x_coarse, x_coarse], axis=0)
                nc = model.predict_noise(variables, x2, t_in, style_in,
                                         train=False)
                nc_c, nc_u = jnp.split(nc.astype(jnp.float32), 2)
                guided = nc_u + config.guidance_scale * (nc_c - nc_u)
            q = unk_xyz
            r = x_coarse
            if variant == "noknn":
                vals = q * 0.1
            elif variant == "nofallback":
                # grid core only, unsafe rows left as-is (INEXACT — timing
                # probe for the tier-patch machinery's marginal cost)
                v, _ = _G._grid_knn_core(q[0], r[0], 3, GRID, TQ,
                                         SLOT_CAP, False, True, Z_HALO,
                                         values=guided[0],
                                         xy_halo=XY_HALO)
                vals = v[None]
            else:
                vals = grid_knn_interpolate(
                    q, r, guided, 3, grid_shape=GRID, tq=TQ,
                    slot_cap=SLOT_CAP, xy_halo=XY_HALO,
                    z_halo=Z_HALO, fallback_cap=FALLBACK_CAP)

            if variant == "noassembly":
                # skip the 120k permutation scatter; keep vals live via a
                # cheap mean broadcast so nothing upstream is DCE'd
                noise = jnp.broadcast_to(
                    jnp.mean(vals, axis=1, keepdims=True) * 0.1
                    + jnp.mean(guided, axis=1, keepdims=True),
                    (1, N, 3))
            else:
                perm = jnp.concatenate(
                    [jnp.clip(x_idx, 0, N - 1), unknown], axis=1)
                vals_all = jnp.concatenate([guided, vals], axis=1)

                def unpermute_one(p, v):
                    _, inv = jax.lax.sort(
                        (p, jnp.arange(N, dtype=jnp.int32)), num_keys=1)
                    return v[inv]
                noise = jax.vmap(unpermute_one)(perm, vals_all)
            if variant == "noddim":
                x_next = x - 0.05 * noise
            else:
                x_next = ddim_step(schedule, x, noise, t, tp,
                                   source_points=src,
                                   content_anchor=config.content_anchor,
                                   target_range=config.target_range)
            return x_next, None

        @jax.jit
        def loop(x0):
            xf, _ = jax.lax.scan(body, x0, (ts, t_prev, keys))
            return xf
        return loop

    x0 = jax.random.normal(jax.random.PRNGKey(2), src.shape, jnp.float32)
    print(f"device={jax.devices()[0]}  N={N} M={M} steps={STEPS}")
    base = None
    for v in variants:
        loop = make_loop(v)
        _force(loop(x0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _force(loop(x0))
            best = min(best, time.perf_counter() - t0)
        per = best / STEPS * 1e3
        note = ""
        if v == "full":
            base = per
        elif base is not None:
            note = f"  (component ~{base - per:+.2f} ms)"
        print(f"{v:10s} {per:7.2f} ms/step{note}", flush=True)


if __name__ == "__main__":
    main()
