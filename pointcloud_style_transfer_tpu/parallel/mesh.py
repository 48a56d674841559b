"""Device mesh + sharding helpers — the communication layer of the framework.

The reference is strictly single-GPU (no torch.distributed anywhere; see
SURVEY §2.5). The TPU-native equivalent is a first-class mesh module:

* ``data`` axis — batch data parallelism: params replicated, batch sharded,
  gradients psum'd by GSPMD under jit;
* ``points`` axis — point-cloud "sequence" parallelism: the NoisePredictor is
  pointwise (no cross-point ops, reference models/diffusion_model.py:54-61),
  so its forward/backward shards over points with zero communication; only
  cross-point primitives (voxel sort, kNN, Chamfer) induce collectives, which
  XLA inserts from the sharding annotations.

Collectives ride ICI inside a slice; nothing here assumes a fixed topology.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
POINTS_AXIS = "points"


def make_mesh(shape: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a mesh over the available devices.

    Args:
        shape: e.g. {"data": 4, "points": 2}. Defaults to all devices on one
            ``data`` axis. Axis sizes must multiply to the device count used.
    """
    devices = list(devices if devices is not None else jax.devices())
    if not shape:
        shape = {DATA_AXIS: len(devices)}
    names = tuple(shape.keys())
    sizes = tuple(shape.values())
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(dev_array, names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, shard_points: bool = False) -> NamedSharding:
    """Sharding for [B, N, 3] batches: batch over `data`, optionally the point
    axis over `points`."""
    pts = POINTS_AXIS if (shard_points and POINTS_AXIS in mesh.axis_names) \
        else None
    return NamedSharding(mesh, P(DATA_AXIS, pts, None))


def shard_batch(x, mesh: Mesh, shard_points: bool = False):
    return jax.device_put(x, batch_sharding(mesh, shard_points))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
