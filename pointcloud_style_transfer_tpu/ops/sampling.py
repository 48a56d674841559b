"""Point sampling / grouping primitives: gather, FPS, ball query.

Semantics match the reference PointNet++ primitives
(reference: models/pointnet2_encoder.py:17-59) but are built TPU-first:

* FPS is a `lax.scan` over the (inherently sequential) selection steps with a
  fully vectorised distance update per step — no Python loop, one compiled
  program (reference uses a Python `for` over npoint iterations,
  pointnet2_encoder.py:38-44).
* Ball query uses `lax.top_k` over masked *indices* instead of a full sort of
  the S x N matrix (reference sorts the whole row, pointnet2_encoder.py:55).
  The reference semantics are load-bearing and subtle: within the radius it
  keeps the `nsample` *lowest-index* points (not the nearest!), backfilling
  out-of-radius slots with the first in-radius index.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .distance import square_distance


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched gather: points [B, N, C], idx [B, ...] -> [B, ..., C].

    Indices are clamped into range like the reference
    (models/pointnet2_encoder.py:26).
    """
    B, N, C = points.shape
    idx = jnp.clip(idx, 0, N - 1)
    flat = idx.reshape(B, -1)  # [B, K]
    out = jnp.take_along_axis(points, flat[..., None], axis=1)  # [B, K, C]
    return out.reshape(*idx.shape, C)


@partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample_jnp(xyz: jnp.ndarray, npoint: int,
                              key: jax.Array,
                              start: jnp.ndarray | None = None) -> jnp.ndarray:
    """Iterative farthest point sampling.

    Maintains a per-point min distance to the selected set; each step selects
    the argmax and stores it (reference: models/pointnet2_encoder.py:30-45,
    including the random start point).

    Args:
        xyz: [B, N, 3]; key: PRNG key for the random start.
    Returns:
        centroids: [B, npoint] int32 indices; centroids[:, 0] is the random
        start, matching the reference's store-then-update ordering.
    """
    # Output is integer indices: no gradient can flow, but without an explicit
    # stop_gradient JAX still builds (and stores residuals for) the VJP of the
    # npoint-step scan — a large useless graph. Severing AD here is free.
    xyz = jax.lax.stop_gradient(xyz.astype(jnp.float32))
    B, N, _ = xyz.shape
    if start is None:
        start = jax.random.randint(key, (B,), 0, N)

    def step(carry, _):
        distance, farthest = carry
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)  # [B,1,3]
        dist = jnp.sum((xyz - centroid) ** 2, axis=-1)  # [B, N]
        distance = jnp.minimum(distance, dist)
        nxt = jnp.argmax(distance, axis=-1)
        return (distance, nxt), farthest

    init = (jnp.full((B, N), 1e10, dtype=jnp.float32), start)
    _, selected = jax.lax.scan(step, init, None, length=npoint)  # [npoint, B]
    return jnp.transpose(selected).astype(jnp.int32)


@partial(jax.jit, static_argnames=("radius", "nsample"))
def query_ball_point_jnp(radius: float, nsample: int, xyz: jnp.ndarray,
                         new_xyz: jnp.ndarray) -> jnp.ndarray:
    """Fixed-radius neighbourhood query.

    For each query center, returns the `nsample` lowest-index points within
    `radius`; slots with fewer than `nsample` in-radius points are filled with
    the first in-radius index (reference: models/pointnet2_encoder.py:47-59).

    Args:
        xyz: [B, N, 3] all points; new_xyz: [B, S, 3] query centers.
    Returns:
        group_idx: [B, S, nsample] int32.
    """
    B, N, _ = xyz.shape
    # integer-indices output: sever AD (see farthest_point_sample)
    sqrdists = jax.lax.stop_gradient(square_distance(new_xyz, xyz))
    ids = jnp.arange(N, dtype=jnp.int32)
    masked = jnp.where(sqrdists > radius**2, N, ids[None, None, :])
    # nsample smallest masked indices == reference's sort-then-truncate
    neg_top, _ = jax.lax.top_k(-masked, nsample)
    group_idx = (-neg_top).astype(jnp.int32)  # ascending index order
    first = group_idx[..., :1]
    group_idx = jnp.where(group_idx == N, first, group_idx)
    return group_idx


@partial(jax.jit, static_argnames=("n",))
def complement_indices(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """Indices NOT present in ``idx``, per batch row, in ascending order.

    idx: [B, M] unique indices into [0, n). Returns [B, n-M] int32. Used to
    restrict kNN upsampling to the points that actually need interpolation
    (the coarse points' values are overwritten exactly).
    """
    B, M = idx.shape
    mask = jnp.ones((B, n), bool)
    mask = jax.vmap(lambda m, i: m.at[jnp.clip(i, 0, n - 1)].set(False))(
        mask, idx)
    rank = jnp.cumsum(mask, axis=1)  # 1-based rank among the complement
    K = n - M
    pos = jnp.where(mask, rank - 1, K)  # out-of-range rows dropped
    ar = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (B, n))
    out = jnp.zeros((B, K), jnp.int32)
    return jax.vmap(lambda o, p, a: o.at[p].set(a, mode="drop"))(out, pos, ar)


def query_ball_point(radius: float, nsample: int, xyz: jnp.ndarray,
                     new_xyz: jnp.ndarray,
                     backend: str | None = None) -> jnp.ndarray:
    """Ball query; Pallas kernel on TPU (the jnp path's lax.top_k over the
    point axis costs ~16 ms at 512x30k on v5e — the kernel ~2 ms), chunked
    jnp elsewhere. Identical semantics (lowest in-radius indices, backfill
    with the first)."""
    from .distance import use_pallas_default
    if backend is None:
        backend = "pallas" if use_pallas_default() else "jnp"
    if backend == "pallas":
        from .pallas.distance_topk import pallas_ball_query
        return pallas_ball_query(radius, nsample, xyz, new_xyz)
    return query_ball_point_jnp(radius, nsample, xyz, new_xyz)


def farthest_point_sample(xyz: jnp.ndarray, npoint: int, key: jax.Array,
                          backend: str | None = None,
                          start: jnp.ndarray | None = None) -> jnp.ndarray:
    """FPS; single-kernel Pallas implementation on TPU (the whole sequential
    loop runs on-chip with the min-distance state in VMEM — ~5x faster than
    the lax.scan version at 30k->512), scan elsewhere. Exact index parity."""
    from .distance import use_pallas_default
    if backend is None:
        backend = "pallas" if use_pallas_default() else "jnp"
    if backend == "pallas":
        from .pallas.fps import pallas_farthest_point_sample
        return pallas_farthest_point_sample(xyz, npoint, key, start=start)
    return farthest_point_sample_jnp(xyz, npoint, key, start=start)
