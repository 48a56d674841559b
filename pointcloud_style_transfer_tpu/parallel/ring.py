"""Ring collectives for point-sharded distance computations.

When the point axis is sharded across devices, cross-point primitives
(Chamfer, kNN) need every query shard to see every reference shard. The
TPU-native pattern is a ring rotation — structurally identical to ring
attention: each step computes distances between the local query shard and the
currently-resident reference shard, updates the running row-min/top-k, and
`ppermute`s the reference shard to the next device. Per-step compute overlaps
with the ICI transfer; no device ever holds more than one remote shard.

Built on `shard_map` so the same code runs on the 8-device virtual CPU mesh
in tests and on a real TPU slice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.distance import min_sq_dist_jnp
from .mesh import POINTS_AXIS


def _ring_min_local(q, r, axis_name: str):
    """Per-shard body: q [B, n_local, 3], r [B, m_local, 3] (both local
    shards). Rotates r around the ring, keeping a running row-min."""
    n_dev = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def step(carry, _):
        best, r_cur = carry
        d = min_sq_dist_jnp(q, r_cur, chunk_size=4096)
        best = jnp.minimum(best, d)
        r_nxt = jax.lax.ppermute(r_cur, axis_name, perm)
        return (best, r_nxt), None

    best0 = jnp.full(q.shape[:2], jnp.inf, jnp.float32)
    # mark the carry as device-varying over the ring axis (shard_map vma)
    best0 = jax.lax.pcast(best0, (axis_name,), to="varying")
    (best, _), _ = jax.lax.scan(step, (best0, r), None, length=n_dev)
    return best


def ring_min_sq_dist(query: jnp.ndarray, ref: jnp.ndarray, mesh: Mesh,
                     axis_name: str = POINTS_AXIS) -> jnp.ndarray:
    """[B, N] min squared distance with both point axes sharded over
    ``axis_name``. Output is sharded like the query's point axis."""
    spec = P(None, axis_name, None)
    fn = jax.shard_map(
        partial(_ring_min_local, axis_name=axis_name),
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=P(None, axis_name),
    )
    return fn(query, ref)


def ring_chamfer_distance(pred: jnp.ndarray, target: jnp.ndarray, mesh: Mesh,
                          axis_name: str = POINTS_AXIS) -> jnp.ndarray:
    """Bidirectional squared Chamfer [B] over point-sharded clouds (same
    definition as the single-device training loss, ops/distance.py)."""
    d_pt = ring_min_sq_dist(pred, target, mesh, axis_name)
    d_tp = ring_min_sq_dist(target, pred, mesh, axis_name)
    return jnp.mean(d_pt, axis=1) + jnp.mean(d_tp, axis=1)
