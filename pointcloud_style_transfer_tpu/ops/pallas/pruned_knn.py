"""Exact pruned kNN: Morton-ordered tiles + bound-based tile skipping.

The brute-force kernel (distance_topk.py) evaluates all N x M pairs. This
variant cuts the work ~5-10x while remaining EXACT:

1. sort queries and refs by Morton code — tiles become spatially coherent;
2. pass 1: run top-k against a small *window* of ref tiles around each query
   tile's proportional position (spatially nearby thanks to Morton order).
   This yields a sound per-query upper bound on the k-th neighbour distance;
3. compute per-tile bounding boxes and a skip matrix: ref tile j can be
   skipped for query tile i iff the bbox-to-bbox lower-bound distance exceeds
   the tile's worst k-th-best upper bound — a sound prune, so the final
   result equals the brute-force answer exactly;
4. pass 2: the same kernel sweeps all ref tiles, initialised from pass 1's
   running state, skipping pruned tiles via a per-program SMEM scalar.

Both passes share one kernel. All sorting/bbox/bookkeeping is cheap jnp
(argsort of 120k ~0.15 ms on v5e); the heavy distance work only touches
unpruned tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of x so there are 2 zero bits between each."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_codes(pts: jnp.ndarray, lo: jnp.ndarray,
                 inv_extent: jnp.ndarray) -> jnp.ndarray:
    """30-bit Morton codes for [N, 3] points given shared bounds."""
    q = jnp.clip(((pts - lo) * inv_extent * 1023.0), 0, 1023).astype(jnp.int32)
    return (_part1by2(q[:, 0]) | (_part1by2(q[:, 1]) << 1)
            | (_part1by2(q[:, 2]) << 2))


def _tile_bboxes(pts: jnp.ndarray, tile: int):
    """[T, 3] mins and maxes of each tile of ``tile`` consecutive points."""
    T = pts.shape[0] // tile
    r = pts.reshape(T, tile, 3)
    return r.min(axis=1), r.max(axis=1)


def _bbox_sq_dist(amin, amax, bmin, bmax):
    """[Ta, Tb] squared distance between two sets of boxes (0 if overlap)."""
    d = jnp.maximum(amin[:, None, :] - bmax[None, :, :], 0.0) \
        + jnp.maximum(bmin[None, :, :] - amax[:, None, :], 0.0)
    return jnp.sum(d * d, axis=-1)


def _pruned_topk_kernel(skip_ref, q_ref, r_ref, d_init_ref, i_init_ref,
                        d_out, i_out, d_scr, i_scr, *, k: int, tq: int,
                        tr: int):
    """Shared kernel for both passes: running top-k with per-program skip.

    skip_ref: scalar-prefetch int32[nq*nr] in SMEM — nonzero at [qi*nr + j]
    means this (query, ref) tile pair is pruned (bound test or already
    covered by pass 1).
    """
    qi = pl.program_id(0)
    j = pl.program_id(1)
    nr = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        d_scr[:] = d_init_ref[:]
        i_scr[:] = i_init_ref[:]

    @pl.when(skip_ref[qi * nr + j] == 0)
    def _():
        dx = q_ref[:, 0:1] - r_ref[0:1, :]
        dy = q_ref[:, 1:2] - r_ref[1:2, :]
        dz = q_ref[:, 2:3] - r_ref[2:3, :]
        dist = dx * dx + dy * dy + dz * dz
        col = jax.lax.broadcasted_iota(jnp.int32, (tq, tr), 1) + j * tr

        D = [d_scr[:, t:t + 1] for t in range(k)]
        I = [i_scr[:, t:t + 1] for t in range(k)]
        cur = dist
        for _ in range(k):
            m = jnp.min(cur, axis=1, keepdims=True)
            midx = jnp.min(jnp.where(cur == m, col, jnp.int32(2**30)),
                           axis=1, keepdims=True)
            cur = jnp.where(col == midx, _BIG, cur)
            better = m < D[k - 1]
            D[k - 1] = jnp.where(better, m, D[k - 1])
            I[k - 1] = jnp.where(better, midx, I[k - 1])
            for t in range(k - 1, 0, -1):
                swap = D[t] < D[t - 1]
                D[t - 1], D[t] = (jnp.where(swap, D[t], D[t - 1]),
                                  jnp.where(swap, D[t - 1], D[t]))
                I[t - 1], I[t] = (jnp.where(swap, I[t], I[t - 1]),
                                  jnp.where(swap, I[t - 1], I[t]))
        d_scr[:] = jnp.concatenate(D, axis=1)
        i_scr[:] = jnp.concatenate(I, axis=1)

    @pl.when(j == nr - 1)
    def _():
        d_out[:] = d_scr[:]
        i_out[:] = i_scr[:]


def _run_pass(qs, rt, skip, d_init, i_init, k, tq, tr, interpret):
    nq = qs.shape[0] // tq
    nr = rt.shape[1] // tr
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # the flat skip matrix, in SMEM
        grid=(nq, nr),
        in_specs=[
            pl.BlockSpec((tq, 3), lambda qi, ri, *_: (qi, 0)),
            pl.BlockSpec((3, tr), lambda qi, ri, *_: (0, ri)),
            pl.BlockSpec((tq, k), lambda qi, ri, *_: (qi, 0)),
            pl.BlockSpec((tq, k), lambda qi, ri, *_: (qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tq, k), lambda qi, ri, *_: (qi, 0)),
            pl.BlockSpec((tq, k), lambda qi, ri, *_: (qi, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, k), jnp.float32),
            pltpu.VMEM((tq, k), jnp.int32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_pruned_topk_kernel, k=k, tq=tq, tr=tr),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qs.shape[0], k), jnp.float32),
            jax.ShapeDtypeStruct((qs.shape[0], k), jnp.int32),
        ],
        interpret=interpret,
    )(skip.reshape(-1), qs, rt, d_init, i_init)


@functools.partial(jax.jit, static_argnames=("k", "tq", "tr", "window",
                                             "interpret"))
def _pruned_knn_single(query: jnp.ndarray, ref: jnp.ndarray, k: int,
                       tq: int = 512, tr: int = 2048, window: int = 2,
                       interpret: bool = False):
    """Unbatched exact pruned kNN: query [N, 3], ref [M, 3]."""
    N, M = query.shape[0], ref.shape[0]
    query = query.astype(jnp.float32)
    ref = ref.astype(jnp.float32)

    # shared Morton bounds over both clouds
    lo = jnp.minimum(query.min(axis=0), ref.min(axis=0))
    hi = jnp.maximum(query.max(axis=0), ref.max(axis=0))
    inv_extent = 1.0 / jnp.maximum(hi - lo, 1e-6)

    q_perm = jnp.argsort(morton_codes(query, lo, inv_extent))
    r_perm = jnp.argsort(morton_codes(ref, lo, inv_extent))
    qs = query[q_perm]
    rs = ref[r_perm]

    n_pad = (-N) % tq
    m_pad = (-M) % tr
    if n_pad:  # padded queries duplicate the last point (results discarded)
        qs = jnp.concatenate([qs, jnp.tile(qs[-1:], (n_pad, 1))])
    if m_pad:
        # padded refs must sit far away (never selectable); the last ref
        # tile's bbox then spans to 1e15, so it is simply never pruned
        rs = jnp.concatenate(
            [rs, jnp.full((m_pad, 3), 1e15, jnp.float32)])
    nq = qs.shape[0] // tq
    nr = rs.shape[0] // tr
    rt = rs.T

    # pass 1: window of ref tiles around the proportional position
    qi = jnp.arange(nq)
    center = jnp.clip(((qi + 0.5) * (nr / nq)).astype(jnp.int32)
                      - window // 2, 0, max(nr - window, 0))
    in_window = (jnp.arange(nr)[None, :] >= center[:, None]) & \
        (jnp.arange(nr)[None, :] < center[:, None] + window)
    skip1 = (~in_window).astype(jnp.int32)

    d0 = jnp.full((qs.shape[0], k), _BIG, jnp.float32)
    i0 = jnp.zeros((qs.shape[0], k), jnp.int32)
    d1, i1 = _run_pass(qs, rt, skip1, d0, i0, k, tq, tr, interpret)

    # sound prune: tile-level upper bound vs bbox lower bound
    ub = d1[:, k - 1].reshape(nq, tq).max(axis=1)  # [nq]
    qmin, qmax = _tile_bboxes(qs, tq)
    rmin, rmax = _tile_bboxes(rs, tr)
    lb = _bbox_sq_dist(qmin, qmax, rmin, rmax)  # [nq, nr]
    skip2 = ((lb > ub[:, None]) | in_window).astype(jnp.int32)

    d2, i2 = _run_pass(qs, rt, skip2, d1, i1, k, tq, tr, interpret)

    # padded refs duplicate the last real sorted ref: clamp into range, then
    # map back to original ref order and un-sort the queries
    i_sorted = jnp.minimum(i2, M - 1)
    i_orig = r_perm[i_sorted]
    d_un = jnp.zeros((N, k), jnp.float32).at[q_perm].set(d2[:N])
    i_un = jnp.zeros((N, k), jnp.int32).at[q_perm].set(i_orig[:N])
    return jnp.maximum(d_un, 0.0), i_un


def pallas_knn_pruned(query: jnp.ndarray, ref: jnp.ndarray, k: int,
                      interpret: bool = False):
    """Batched exact pruned kNN (Morton tiles + bound skipping)."""
    fn = functools.partial(_pruned_knn_single, k=k, interpret=interpret)
    return jax.vmap(fn)(query, ref)
