"""In-context per-component attribution of the BATCHED sampling step.

Same stub methodology as profile_sampler_step.py (the B=1 tool), but the
body is the PRODUCTION guided-loop step including the round-5 flat-batched
upsample path (`models.samplers._upsample_unknown`), so B>1 marginals are
measured in the fusion context that isolated microbenches miss.

Usage: python examples/profile_sampler_step_batched.py [B ...] [variants...]
Variants: full, noup (skip upsample+assembly), novoxel, nodenoise, noddim.
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
from pointcloud_style_transfer_tpu.models.samplers import (_step_schedule,
                                                           _upsample_unknown)
from pointcloud_style_transfer_tpu.ops import voxel_downsample_partition

STEPS = 10
VARIANTS = ("full", "noup", "novoxel", "nodenoise", "noddim")


def _force(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)
    return x


def main():
    args = sys.argv[1:]
    batches = [int(a) for a in args if a.isdigit()] or [1, 4]
    variants = [a for a in args if not a.isdigit()] or list(VARIANTS)
    config = Config()
    N, M = config.total_points, config.global_points
    model = PointCloudDiffusionModel(config)
    schedule = make_schedule(config)
    variables = model.init(jax.random.PRNGKey(0), example_points=4096)
    ts, t_prev = _step_schedule(schedule.num_timesteps, STEPS)
    keys = jax.random.split(jax.random.PRNGKey(3), STEPS)
    print(f"device={jax.devices()[0]} N={N} M={M} steps={STEPS}")

    for B in batches:
        src = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3),
                                jnp.float32) * 0.9
        style_in = jnp.zeros((2 * B, config.feature_dim), jnp.float32)
        res = {}
        for variant in variants:
            def body(x, step, variant=variant):
                t, tp, k = step
                t_in = jnp.full((2 * B,), t, jnp.int32)
                if variant == "novoxel":
                    x_coarse = x[:, :M]
                    x_idx = jnp.broadcast_to(
                        jnp.arange(M, dtype=jnp.int32), (B, M))
                    unknown = jnp.broadcast_to(
                        jnp.arange(M, N, dtype=jnp.int32), (B, N - M))
                    unk_xyz = x[:, M:]
                else:
                    x_coarse, x_idx, unknown, unk_xyz = \
                        voxel_downsample_partition(x, M, k)
                if variant == "nodenoise":
                    guided = x_coarse * 0.1
                else:
                    x2 = jnp.concatenate([x_coarse, x_coarse], axis=0)
                    nc = model.predict_noise(variables, x2, t_in, style_in,
                                             train=False)
                    nc_c, nc_u = jnp.split(nc.astype(jnp.float32), 2)
                    guided = nc_u + config.guidance_scale * (nc_c - nc_u)
                if variant == "noup":
                    noise = jnp.broadcast_to(
                        jnp.mean(guided, axis=1, keepdims=True)
                        + 0.1 * jnp.mean(unk_xyz, axis=1, keepdims=True),
                        (B, N, 3))
                else:
                    noise = _upsample_unknown(x, x_idx, guided, "grid",
                                              unknown=unknown,
                                              ref_xyz=x_coarse,
                                              unknown_xyz=unk_xyz)
                if variant == "noddim":
                    x_next = x - 0.05 * noise
                else:
                    x_next = ddim_step(schedule, x, noise, t, tp,
                                       source_points=src,
                                       content_anchor=config.content_anchor,
                                       target_range=config.target_range)
                return x_next, None

            @jax.jit
            def loop(x0, body=body):
                xf, _ = jax.lax.scan(body, x0, (ts, t_prev, keys))
                return xf

            x0 = jax.random.normal(jax.random.PRNGKey(2), (B, N, 3),
                                   jnp.float32)
            _force(loop(x0))
            t0 = time.perf_counter()
            for _ in range(3):
                _force(loop(x0))
            dt = (time.perf_counter() - t0) / 3 / STEPS
            res[variant] = dt
            line = (f"B={B} {variant}: {dt * 1000:.2f} ms/step "
                    f"({dt / B * 1000:.2f} ms/cloud-step)")
            if variant != "full" and "full" in res:
                line += (f"  marginal {((res['full'] - dt) * 1000):+.2f} "
                         f"ms/step")
            print(line, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
