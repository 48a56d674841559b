"""Hardware proof of the PRODUCTION multi-chip sampler configuration.

The virtual 8-device CPU mesh tests (tests/test_sharding.py) prove the
sharding math of ``guided_sample_loop_sharded`` but run the Pallas grid
kernel in interpret mode — and interpret mode does not reproduce TPU float
semantics (the denormal-flush lesson, docs/PERF_NOTES.md round-2 addenda).
Pallas x shard_map composition is exactly the kind of claim that breaks on
real hardware, so this script runs the documented production config — the
equal-count grid kernel INSIDE shard_map — on the real chip(s), over a mesh
of whatever devices exist (1 on the single-chip CI), and checks the result
against the single-device reference-parity sampler with identical keys.

Expected agreement: kNN selection is exact in both paths; the sharded loop
interpolates via an XLA gather+weighted-sum while the single-device loop
uses the fused in-kernel reduction, so values differ only by float-level
reduction order (~1e-6 relative on unit-scale clouds).

Usage: python examples/verify_sharded_tpu.py [N] [steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from pointcloud_style_transfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from pointcloud_style_transfer_tpu.config import Config
from pointcloud_style_transfer_tpu.models import (PointCloudDiffusionModel,
                                                  make_schedule)
from pointcloud_style_transfer_tpu.models.samplers import guided_sample_loop
from pointcloud_style_transfer_tpu.parallel.mesh import POINTS_AXIS
from pointcloud_style_transfer_tpu.parallel.sharded_sampler import (
    guided_sample_loop_sharded)


def main():
    args = sys.argv[1:]
    n = int(args[0]) if len(args) > 0 else 120000
    steps = int(args[1]) if len(args) > 1 else 10

    devices = jax.devices()
    mesh = Mesh(np.array(devices), (POINTS_AXIS,))
    print(f"devices={devices}  mesh={mesh.shape}  N={n} steps={steps}")

    config = Config()
    model = PointCloudDiffusionModel(config)
    schedule = make_schedule(config)
    variables = model.init(jax.random.PRNGKey(0), example_points=4096)

    kd = jax.random.split(jax.random.PRNGKey(11), 3)
    src = jax.random.normal(kd[0], (1, n, 3), jnp.float32) * 0.9
    cond = jax.random.normal(kd[1], (1, n, 3), jnp.float32) * 0.9
    key = kd[2]

    out_sh = guided_sample_loop_sharded(
        model, schedule, variables, src, cond, key, mesh,
        num_inference_steps=steps, knn_backend="grid")
    out_sh = np.asarray(out_sh)
    print("sharded(grid) sampler ran:", out_sh.shape,
          "finite:", bool(np.isfinite(out_sh).all()))

    out_1d = np.asarray(guided_sample_loop(
        model, schedule, variables, src, cond, key,
        num_inference_steps=steps))

    err = np.abs(out_sh - out_1d).max()
    print(f"max |sharded - single| = {err}")
    ok = bool(np.isfinite(out_sh).all()) and err < 1e-4
    print("SHARD_MAP x GRID-PALLAS (hardware):", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
