"""Voxel-grid downsampling with an exact (static) output count, fully on device.

The reference has two variants with different representative-point rules:

* the runtime/torch variant picks, per occupied voxel, the *truncated mean of
  the point indices* in that voxel (reference: models/diffusion_model.py:69-122,
  note the scatter-add of arange over inverse indices at :96-97), then randomly
  drops/tops-up to exactly ``target_size``;
* the offline/numpy variant picks the point *closest to the voxel center*
  (reference: data/preprocessing.py:45-104).

Both are reproduced here (``mode="mean_index"`` / ``mode="center"``) as one
sort-based, shape-static jittable computation — no per-batch Python loop, no
`torch.unique` dynamic shapes:

1. hash voxel coords with the reference's primes (int32 wraparound matches
   torch's ``.int()`` arithmetic),
2. sort points by (hash[, center-distance]) — stable sort gives contiguous
   voxel segments; leaders (first of each segment) mark unique voxels,
3. compute the representative index per voxel with segment ops,
4. exact-count selection: every point gets a priority — representatives get
   ``uniform(0,1)``, the rest ``1 + uniform(0,1)`` — and the ``target_size``
   lowest priorities win. This reproduces the reference's random drop (when
   #voxels > target) and random top-up (when #voxels < target) in one static
   top-k-style select.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Same spatial-hash primes as the reference (models/diffusion_model.py:90).
_PRIMES = (73856093, 19349663, 83492791)


def _voxel_geometry(pts: jnp.ndarray, target_size: int):
    """Voxel size estimation (reference: models/diffusion_model.py:80-88 and
    data/preprocessing.py:54-65 — identical math in both variants)."""
    xyz_min = jnp.min(pts, axis=0)
    xyz_max = jnp.max(pts, axis=0)
    rng = xyz_max - xyz_min
    rng = jnp.where(rng < 1e-6, 1.0, rng)
    voxel_size = jnp.cbrt(jnp.prod(rng) / target_size) * 1.2
    voxel_size = jnp.where(voxel_size < 1e-6, 1e-3, voxel_size)
    return xyz_min, voxel_size


def _hash_voxels(pts: jnp.ndarray, xyz_min: jnp.ndarray,
                 voxel_size: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    vox = jnp.floor((pts - xyz_min) / voxel_size).astype(jnp.int32)
    h = ((vox[:, 0] * _PRIMES[0]) ^ (vox[:, 1] * _PRIMES[1])
         ^ (vox[:, 2] * _PRIMES[2]))
    return h, vox


def _downsample_single(pts: jnp.ndarray, key: jax.Array, target_size: int,
                       mode: str,
                       with_complement: bool = False,
                       with_coords: bool = False) -> jnp.ndarray:
    """Select exactly ``target_size`` indices from one cloud [N, 3].
    ``with_complement`` additionally returns the N-target_size UNSELECTED
    indices — the tail of the same priority sort, i.e. free (the sampler's
    hot loop otherwise recomputes them with a mask+cumsum+scatter pass over
    N, ops/sampling.py::complement_indices). ``with_coords`` (implies
    complement) carries the xyz columns through the final sort as extra
    operands and returns (idx, comp, sel_xyz, comp_xyz) — the caller skips
    both post-hoc gathers (the [M,3] take_along_axis and the [N-M,3]
    unknown-query gather of the sampler hot loop)."""
    N = pts.shape[0]
    pts = pts.astype(jnp.float32)
    xyz_min, voxel_size = _voxel_geometry(pts, target_size)
    h, vox = _hash_voxels(pts, xyz_min, voxel_size)
    iq = jnp.arange(N, dtype=jnp.int32)

    if mode == "center":
        # Sort by (hash, distance-to-voxel-center): the first point of each
        # hash segment is the closest-to-center representative
        # (reference rule: data/preprocessing.py:78-85).
        center = xyz_min + (vox.astype(jnp.float32) + 0.5) * voxel_size
        center_dist = jnp.sum((pts - center) ** 2, axis=-1)
        hs, _, order = jax.lax.sort((h, center_dist, iq), num_keys=2)
        is_leader = jnp.concatenate(
            [jnp.ones((1,), bool), hs[1:] != hs[:-1]])
        rep_scatter = jnp.where(is_leader, order, N)
    elif mode == "mean_index":
        # one variadic sort carries the permutation as an operand — an
        # argsort + h[order] gather costs a separate 120k gather pass
        hs, order = jax.lax.sort((h, iq), num_keys=1)
        is_leader = jnp.concatenate(
            [jnp.ones((1,), bool), hs[1:] != hs[:-1]])
        seg = jnp.cumsum(is_leader) - 1  # [N] voxel id per sorted position
        # Truncated mean of original indices per voxel (float32 division then
        # truncation, matching torch's int-div-to-float then .long() at
        # models/diffusion_model.py:96-97). segment_sum measured FASTER than
        # a cumsum-differencing formulation on v5e (4.0 vs 4.5 ms at 120k —
        # the associative cummax for segment starts dominates).
        idx_f = order.astype(jnp.float32)
        # one 2-channel scatter-add instead of two scalar ones (sum, count)
        both = jax.ops.segment_sum(
            jnp.stack([idx_f, jnp.ones_like(idx_f)], axis=1), seg,
            num_segments=N, indices_are_sorted=True)
        sums, counts = both[:, 0], both[:, 1]
        rep = (sums / jnp.maximum(counts, 1.0)).astype(jnp.int32)
        # one rep per OCCUPIED segment: segment ids with count > 0 are
        # exactly the leaders' segments, so the segment-indexed rep array
        # feeds the mask scatter directly — no rep[seg] gather back to
        # point positions (a 120k-from-120k gather, ~1 ms on v5e)
        rep_scatter = jnp.where(counts > 0, rep, N)
    else:
        raise ValueError(f"unknown voxel downsample mode: {mode}")

    # Scatter representative indices into a mask over original point ids.
    rep_mask = jnp.zeros((N,), bool).at[rep_scatter].set(
        True, mode="drop", indices_are_sorted=False, unique_indices=False)

    # Exact-count random select: reps first (random order), then random top-up.
    u = jax.random.uniform(key, (N,))
    priority = jnp.where(rep_mask, u, 1.0 + u)
    if with_coords:
        _, px, py, pz, perm = jax.lax.sort(
            (priority, pts[:, 0], pts[:, 1], pts[:, 2], iq), num_keys=1)
        xyz = jnp.stack([px, py, pz], axis=1)
        return (perm[:target_size], perm[target_size:],
                xyz[:target_size], xyz[target_size:])
    perm = jnp.argsort(priority).astype(jnp.int32)
    if with_complement:
        return perm[:target_size], perm[target_size:]
    return perm[:target_size]


# flat-sort element budget per group: the batched path's widest sort (6
# operands in with_coords mode) falls off a VMEM cliff past ~2x120k rows —
# measured 5.94/4.68/10.87 ms/cloud at B=1/2/4 on v5e (the B=4 480k-row
# sort spills to a multi-pass HBM merge, 7.3x the B=1 call). Chunking the
# batch into <=_FLAT_SORT_ELEMS groups keeps every sort on the fast side:
# each group still flat-sorts (no vmap serialisation), groups run as
# separate ops in one program.
_FLAT_SORT_ELEMS = 262144


def _downsample_batched(pts: jnp.ndarray, keys: jax.Array, target_size: int,
                        mode: str, with_complement: bool = False,
                        with_coords: bool = False):
    """Batched selection via ONE flat sort over [B*N] with (batch, key)
    composite sort keys, instead of vmapping `_downsample_single` — batched
    sorts/scatters serialise under vmap on TPU (train-step batch scaling was
    sublinear for exactly this reason, docs/PERF_NOTES.md round-1 addenda).
    Batches whose flat size exceeds the sort's VMEM-cliff budget are chunked
    into groups (see _FLAT_SORT_ELEMS). Semantics per element match
    `_downsample_single` (same per-element PRNG stream, same representative
    rules)."""
    B, N, _ = pts.shape
    group = max(1, _FLAT_SORT_ELEMS // N)
    if B > group:
        def one(s, e):
            if e - s == 1:
                r = _downsample_single(pts[s], keys[s], target_size, mode,
                                       with_complement, with_coords)
                return (tuple(a[None] for a in r) if isinstance(r, tuple)
                        else r[None])
            return _downsample_batched(pts[s:e], keys[s:e], target_size,
                                       mode, with_complement, with_coords)
        parts = [one(s, min(s + group, B)) for s in range(0, B, group)]
        if isinstance(parts[0], tuple):
            return tuple(jnp.concatenate([p[i] for p in parts], axis=0)
                         for i in range(len(parts[0])))
        return jnp.concatenate(parts, axis=0)
    B, N, _ = pts.shape
    BN = B * N
    pts = pts.astype(jnp.float32)
    xyz_min, voxel_size = jax.vmap(
        lambda p: _voxel_geometry(p, target_size))(pts)  # [B,3], [B]
    h, vox = jax.vmap(_hash_voxels)(pts, xyz_min, voxel_size)  # [B,N] each
    bid = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None],
                           (B, N)).reshape(-1)
    hf = h.reshape(-1)
    gidx = jnp.arange(BN, dtype=jnp.int32)  # global flat index; // N = batch

    if mode == "center":
        center = (xyz_min[:, None, :]
                  + (vox.astype(jnp.float32) + 0.5)
                  * voxel_size[:, None, None])
        center_dist = jnp.sum((pts - center) ** 2, axis=-1).reshape(-1)
        bs, hs, _, order = jax.lax.sort((bid, hf, center_dist, gidx),
                                        num_keys=3)
        is_leader = jnp.concatenate(
            [jnp.ones((1,), bool), (hs[1:] != hs[:-1]) | (bs[1:] != bs[:-1])])
        rep_scatter = jnp.where(is_leader, order, BN)
    elif mode == "mean_index":
        bs, hs, order = jax.lax.sort((bid, hf, gidx), num_keys=2)
        is_leader = jnp.concatenate(
            [jnp.ones((1,), bool), (hs[1:] != hs[:-1]) | (bs[1:] != bs[:-1])])
        seg = jnp.cumsum(is_leader) - 1  # segments never cross batch bounds
        within_f = (order % N).astype(jnp.float32)
        # 3 channels: within-batch index sum, count, batch-id sum. The
        # truncated mean must be of WITHIN-batch indices (f32 sums of global
        # indices would lose integer precision at large B*count); the
        # segment's batch comes back exactly as sum_b / count.
        acc = jax.ops.segment_sum(
            jnp.stack([within_f, jnp.ones_like(within_f),
                       bs.astype(jnp.float32)], axis=1),
            seg, num_segments=BN, indices_are_sorted=True)
        counts = acc[:, 1]
        rep_w = (acc[:, 0] / jnp.maximum(counts, 1.0)).astype(jnp.int32)
        b_seg = jnp.round(acc[:, 2] / jnp.maximum(counts, 1.0)).astype(
            jnp.int32)
        rep_scatter = jnp.where(counts > 0, b_seg * N + rep_w, BN)
    else:
        raise ValueError(f"unknown voxel downsample mode: {mode}")

    rep_mask = jnp.zeros((BN,), bool).at[rep_scatter].set(
        True, mode="drop", indices_are_sorted=False, unique_indices=False)

    # identical per-element PRNG stream as the single path
    u = jax.vmap(lambda k: jax.random.uniform(k, (N,)))(keys).reshape(-1)
    priority = jnp.where(rep_mask, u, 1.0 + u)
    bid2 = gidx // N
    boff = jnp.arange(B, dtype=jnp.int32)[:, None] * N
    if with_coords:
        flat = pts.reshape(BN, 3)
        _, _, px, py, pz, perm_g = jax.lax.sort(
            (bid2, priority, flat[:, 0], flat[:, 1], flat[:, 2], gidx),
            num_keys=2)
        xyz = jnp.stack([px, py, pz], axis=1).reshape(B, N, 3)
        perm = perm_g.reshape(B, N) - boff
        return (perm[:, :target_size], perm[:, target_size:],
                xyz[:, :target_size], xyz[:, target_size:])
    _, _, perm_g = jax.lax.sort((bid2, priority, gidx), num_keys=2)
    perm = perm_g.reshape(B, N) - boff
    if with_complement:
        return perm[:, :target_size], perm[:, target_size:]
    return perm[:, :target_size]


@partial(jax.jit, static_argnames=("target_size", "mode"))
def voxel_downsample(points: jnp.ndarray, target_size: int, key: jax.Array,
                     mode: str = "mean_index") -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched voxel-grid downsample to exactly ``target_size`` points.

    Args:
        points: [B, N, 3].
        target_size: static output point count M.
        key: PRNG key (split per batch element).
        mode: "mean_index" (runtime/torch rule) or "center" (offline rule).
    Returns:
        (downsampled [B, M, 3], indices [B, M] int32). If N <= target_size the
        identity indices are returned (reference guard:
        models/diffusion_model.py:70-72).
    """
    B, N, _ = points.shape
    if N <= target_size:
        idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
        return points, idx
    keys = jax.random.split(key, B)
    # index selection is discrete: sever AD so the sort/segment graph is not
    # differentiated (gradients still flow through the subsequent gather)
    pts_ng = jax.lax.stop_gradient(points)
    if B == 1:
        # bypass vmap: batched sorts/scatters lower measurably worse (~2.5 ms
        # extra at 120k on v5e) and B=1 is the common sampling case
        idx = _downsample_single(pts_ng[0], keys[0], target_size, mode)[None]
    else:
        idx = _downsample_batched(pts_ng, keys, target_size, mode)
    ds = jnp.take_along_axis(points, idx[..., None], axis=1)
    return ds, idx


@partial(jax.jit, static_argnames=("target_size", "mode"))
def voxel_downsample_with_complement(
        points: jnp.ndarray, target_size: int, key: jax.Array,
        mode: str = "mean_index"
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``voxel_downsample`` that also returns the UNSELECTED indices.

    Returns (downsampled [B, M, 3], indices [B, M], complement [B, N-M]).
    The complement is the tail of the same priority argsort that picks the
    representatives — i.e. free, where the sampler's hot loop otherwise pays
    a separate mask+cumsum+scatter pass over all N points per step
    (``ops.sampling.complement_indices``). Complement order is arbitrary
    (priority order, not ascending). N <= target_size returns an empty
    complement alongside identity indices."""
    B, N, _ = points.shape
    if N <= target_size:
        idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
        return points, idx, jnp.zeros((B, 0), jnp.int32)
    keys = jax.random.split(key, B)
    pts_ng = jax.lax.stop_gradient(points)
    if B == 1:
        idx, comp = _downsample_single(pts_ng[0], keys[0], target_size, mode,
                                       with_complement=True)
        idx, comp = idx[None], comp[None]
    else:
        idx, comp = _downsample_batched(pts_ng, keys, target_size, mode,
                                        with_complement=True)
    ds = jnp.take_along_axis(points, idx[..., None], axis=1)
    return ds, idx, comp


@partial(jax.jit, static_argnames=("target_size", "mode"))
def voxel_downsample_partition(
        points: jnp.ndarray, target_size: int, key: jax.Array,
        mode: str = "mean_index"
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``voxel_downsample`` for the sampler hot loop: the xyz columns ride
    the final priority sort as extra operands, so BOTH point sets come back
    with their coordinates and no gather runs at all.

    Returns (selected [B, M, 3], indices [B, M], complement [B, N-M],
    complement_xyz [B, N-M, 3]). The coordinates pass through
    ``stop_gradient`` (index selection is discrete anyway) — use
    ``voxel_downsample`` where gradients must flow into the gathered points
    (the train step). N <= target_size returns identity indices and empty
    complements, like the other entry points."""
    B, N, _ = points.shape
    if N <= target_size:
        idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
        return (points, idx, jnp.zeros((B, 0), jnp.int32),
                jnp.zeros((B, 0, 3), points.dtype))
    keys = jax.random.split(key, B)
    pts_ng = jax.lax.stop_gradient(points.astype(jnp.float32))
    if B == 1:
        idx, comp, sel_xyz, comp_xyz = _downsample_single(
            pts_ng[0], keys[0], target_size, mode, with_coords=True)
        idx, comp = idx[None], comp[None]
        sel_xyz, comp_xyz = sel_xyz[None], comp_xyz[None]
    else:
        idx, comp, sel_xyz, comp_xyz = _downsample_batched(
            pts_ng, keys, target_size, mode, with_coords=True)
    return sel_xyz, idx, comp, comp_xyz
