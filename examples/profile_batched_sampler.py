"""Batched-sampling throughput on REAL hardware: points/s/chip at B in
{1, 2, 4, 8} for the reference-parity 50-step CFG DDIM sampler.

Round-4 verdict item: the B>1 grid path was `lax.map` — B serial passes per
step — so batched inference throughput was unmeasured and below what the
flat-batched layout (round 5, ops/grid_knn.py::_grid_interp_batched_layout)
delivers. This probe measures both paths: PCST_FORCE_LAXMAP=1 disables the
flat-batch predicate for the A/B.

Usage: python examples/profile_batched_sampler.py [steps] [B ...]
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


def _force(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)
    return x


def main():
    args = sys.argv[1:]
    steps = int(args[0]) if args else 50
    batches = [int(a) for a in args[1:]] or [1, 2, 4, 8]
    if os.environ.get("PCST_FORCE_LAXMAP"):
        import importlib
        G = importlib.import_module(
            "pointcloud_style_transfer_tpu.ops.grid_knn")
        G.grid_batched_defaults_ok = lambda *a, **k: False
        G._batched_grid_ok = lambda *a, **k: False
        print("flat-batch DISABLED (lax.map A/B)")

    from pointcloud_style_transfer_tpu.config import Config
    from pointcloud_style_transfer_tpu.models import (
        PointCloudDiffusionModel, guided_sample_loop, make_schedule)

    config = Config()
    n = config.total_points
    model = PointCloudDiffusionModel(config)
    schedule = make_schedule(config)
    variables = model.init(jax.random.PRNGKey(0), example_points=4096)
    print(f"device={jax.devices()[0]} steps={steps} N={n}")

    results = {}
    for B in batches:
        src = jax.random.normal(jax.random.PRNGKey(1), (B, n, 3),
                                jnp.float32) * 0.9
        cond = jax.random.normal(jax.random.PRNGKey(2), (B, n, 3),
                                 jnp.float32) * 0.9

        def run(k):
            return guided_sample_loop(model, schedule, variables, src, cond,
                                      k, num_inference_steps=steps,
                                      guidance_scale=config.guidance_scale)

        t0 = time.perf_counter()
        _force(run(jax.random.PRNGKey(3)))
        t_compile = time.perf_counter() - t0
        reps = 3
        t0 = time.perf_counter()
        for i in range(reps):
            _force(run(jax.random.PRNGKey(4 + i)))
        dt = (time.perf_counter() - t0) / reps
        pts = B * n / dt
        results[B] = (dt, pts)
        print(f"B={B}: {dt:.4f} s/batch = {dt / B:.4f} s/cloud, "
              f"{pts:,.0f} points/s/chip "
              f"(compile+warm {t_compile:.1f}s)")
    if 1 in results and len(results) > 1:
        for B, (dt, pts) in results.items():
            if B != 1:
                print(f"B={B} throughput vs B=1: "
                      f"{pts / results[1][1]:.3f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
