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
from jax.sharding import Mesh, PartitionSpec as P

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


def _ring_knn_local(q, r, k: int, axis_name: str):
    """Per-shard body: running top-k across rotating reference shards.

    Global ref indices assume the ref point axis is sharded contiguously
    (shard s holds global indices [s*m_local, (s+1)*m_local)).
    """
    from ..ops.distance import knn_jnp

    n_dev = jax.lax.axis_size(axis_name)
    m_local = r.shape[1]
    me = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def step(carry, i):
        best_d, best_i, r_cur = carry
        d, idx = knn_jnp(q, r_cur, k, chunk_size=4096)
        src = jnp.mod(me - i, n_dev)  # origin shard of r_cur after i hops
        idx_global = idx + src * m_local
        dd = jnp.concatenate([best_d, d], axis=-1)
        ii = jnp.concatenate([best_i, idx_global], axis=-1)
        neg, sel = jax.lax.top_k(-dd, k)  # tiny: 2k lanes
        best_d = -neg
        best_i = jnp.take_along_axis(ii, sel, axis=-1)
        r_nxt = jax.lax.ppermute(r_cur, axis_name, perm)
        return (best_d, best_i, r_nxt), None

    B, n_loc, _ = q.shape
    init_d = jax.lax.pcast(
        jnp.full((B, n_loc, k), jnp.inf, jnp.float32), (axis_name,),
        to="varying")
    init_i = jax.lax.pcast(
        jnp.zeros((B, n_loc, k), jnp.int32), (axis_name,), to="varying")
    (best_d, best_i, _), _ = jax.lax.scan(
        step, (init_d, init_i, r), jnp.arange(n_dev))
    return best_d, best_i


def ring_knn(query: jnp.ndarray, ref: jnp.ndarray, k: int, mesh: Mesh,
             axis_name: str = POINTS_AXIS):
    """k nearest refs with BOTH point axes sharded over ``axis_name``:
    rotate ref shards around the ring, merging running top-k per query.
    Returns (sq_dists [B, N, k], global indices [B, N, k]), query-sharded."""
    spec = P(None, axis_name, None)
    fn = jax.shard_map(
        partial(_ring_knn_local, k=k, axis_name=axis_name),
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec),
    )
    return fn(query, ref)


def ring_chamfer_distance(pred: jnp.ndarray, target: jnp.ndarray, mesh: Mesh,
                          axis_name: str = POINTS_AXIS) -> jnp.ndarray:
    """Bidirectional squared Chamfer [B] over point-sharded clouds (same
    definition as the single-device training loss, ops/distance.py)."""
    d_pt = ring_min_sq_dist(pred, target, mesh, axis_name)
    d_tp = ring_min_sq_dist(target, pred, mesh, axis_name)
    return jnp.mean(d_pt, axis=1) + jnp.mean(d_tp, axis=1)


def ring_chamfer_distance_l2(pred: jnp.ndarray, target: jnp.ndarray,
                             mesh: Mesh,
                             axis_name: str = POINTS_AXIS) -> jnp.ndarray:
    """Eval-flavoured *unsquared* L2 Chamfer [B] (evaluation/metrics.py
    semantics: cdist p=2, averaged over both directions, halved) over
    point-sharded clouds. This is the production call-site for the ring
    kernels: the test CLI's full-resolution eval Chamfer
    (reference scripts/test.py:125-133) at 120k x 120k, sharded over the
    ``points`` mesh axis."""
    d_pt = jnp.sqrt(jnp.maximum(
        ring_min_sq_dist(pred, target, mesh, axis_name), 0.0))
    d_tp = jnp.sqrt(jnp.maximum(
        ring_min_sq_dist(target, pred, mesh, axis_name), 0.0))
    return (jnp.mean(d_pt, axis=1) + jnp.mean(d_tp, axis=1)) / 2.0
