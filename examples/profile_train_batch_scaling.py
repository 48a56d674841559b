"""Full-train-step batch scaling on REAL hardware: B in {1, 2, 4} at 120k
points (fwd incl. hierarchical voxel path + CFG drop, loss with Chamfer
term, grads, optimizer, EMA — the production jitted step).

Round-1 measured SUBLINEAR scaling (82/128/221 ms for B=1/2/4) caused by
vmap-serialised sorts; ops/voxel.py::_downsample_batched (flat composite-key
sort) was built to fix exactly that, but no post-fix hardware number existed
(round-4 verdict item #5). This probe supersedes the round-1 table.

Usage: python examples/profile_train_batch_scaling.py [B ...]
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
    batches = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    from pointcloud_style_transfer_tpu.config import Config
    from pointcloud_style_transfer_tpu.models import (
        PointCloudDiffusionModel, make_schedule)
    from pointcloud_style_transfer_tpu.training.trainer import (
        make_optimizer, make_train_step_fn)

    config = Config()
    n = config.total_points
    model = PointCloudDiffusionModel(config)
    schedule = make_schedule(config)
    variables = model.init(jax.random.PRNGKey(0), example_points=4096)
    tx = make_optimizer(config)
    print(f"device={jax.devices()[0]} N={n}")

    results = {}
    for B in batches:
        state = {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
            "opt_state": tx.init(variables["params"]),
            "ema_params": jax.tree_util.tree_map(lambda p: p,
                                                 variables["params"]),
        }
        step = jax.jit(make_train_step_fn(model, schedule, tx, config))
        src = jax.random.normal(jax.random.PRNGKey(1), (B, n, 3),
                                jnp.float32) * 0.9
        cond = jax.random.normal(jax.random.PRNGKey(2), (B, n, 3),
                                 jnp.float32) * 0.9
        lr = jnp.float32(config.learning_rate)

        state, _ = step(state, src, cond, jax.random.PRNGKey(3), lr)
        _force(state)
        reps = 10
        t0 = time.perf_counter()
        for i in range(reps):
            state, _ = step(state, src, cond, jax.random.PRNGKey(4 + i), lr)
        _force(state)
        dt = (time.perf_counter() - t0) / reps
        results[B] = dt
        print(f"B={B}: {dt * 1000:.1f} ms/step = {dt / B * 1000:.1f} "
              f"ms/cloud, {B * n / dt:,.0f} points/s/chip")
    if 1 in results:
        for B, dt in results.items():
            if B != 1:
                print(f"B={B} step-time vs B=1: {dt / results[1]:.2f}x "
                      f"(linear would be {B}.00x-free = 1.00x/cloud; "
                      f"per-cloud ratio {dt / B / results[1]:.2f}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
