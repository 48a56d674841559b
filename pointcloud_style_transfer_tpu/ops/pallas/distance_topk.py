"""Pallas TPU kernel: tiled pairwise distance + running top-k row minima.

THE hot kernel of the framework. One kernel serves:
* k=1 — Chamfer / coverage / Hausdorff row minima (reference's chunked
  matmul-expansion loss, models/losses.py:8-63);
* k=3 — the kNN inverse-distance upsample inside every sampling step
  (reference does this on CPU with sklearn, models/diffusion_model.py:146).

Why a kernel: the jnp path materialises [chunk, M] distance blocks in HBM and
`lax.top_k` over M=30k lanes costs seconds on TPU (measured 4.3 s per 120k x
30k kNN call). Here each ref tile lives in VMEM, each query tile is read once
from HBM, distances are computed on the VPU in squared-difference form
(better numerics than the matmul expansion — no cancellation), and a running
sorted top-k per query is maintained in VMEM scratch. Measured on v5e
(net of host-tunnel latency): k=1 row-min ~7 ms, k=3 ~30 ms for 120k x 30k
(vs 80 ms / 4300 ms for the jnp paths). Variants that were measured and
REJECTED on hardware: packed int32 keys (37 ms — int reductions don't pay),
bf16 extraction (Mosaic relayout miscompile), 1-D grid with an internal ref
loop (38 ms — the 2-D pipelined grid wins).

The grid iterates (ref_tile, query_tile) with the ref tile as the MINOR axis,
so consecutive programs reuse the same resident query block while walking ref
tiles; running state lives in VMEM scratch, output is written on the last ref
tile. Distances are exact f32; ties resolve to the lowest ref index (matching
argmin first-occurrence semantics of the jnp oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30  # plain float: jnp constants would be captured as tracer consts


def _topk_kernel(q_ref, r_ref, d_out, i_out, d_scr, i_scr, *, k: int,
                 tq: int, tr: int):
    """Grid = (num_q_tiles, num_r_tiles); r is the minor (fastest) axis.

    q_ref: [tq, 3] query tile (resident across the inner r loop)
    r_ref: [3, tr] ref tile (transposed coords)
    d_out/i_out: [tq, k] written on the last r step
    d_scr/i_scr: [tq, k] running state in VMEM scratch
    """
    j = pl.program_id(1)
    nr = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        d_scr[:] = jnp.full((tq, k), _BIG, jnp.float32)
        i_scr[:] = jnp.zeros((tq, k), jnp.int32)

    qx = q_ref[:, 0:1]  # [tq, 1]
    qy = q_ref[:, 1:2]
    qz = q_ref[:, 2:3]
    rx = r_ref[0:1, :]  # [1, tr]
    ry = r_ref[1:2, :]
    rz = r_ref[2:3, :]

    dx = qx - rx
    dy = qy - ry
    dz = qz - rz
    dist = dx * dx + dy * dy + dz * dz  # [tq, tr] f32 on the VPU

    col = jax.lax.broadcasted_iota(jnp.int32, (tq, tr), 1) + j * tr

    # Current running top-k as per-slot columns.
    D = [d_scr[:, t:t + 1] for t in range(k)]
    I = [i_scr[:, t:t + 1] for t in range(k)]

    cur = dist
    for _ in range(k):
        m = jnp.min(cur, axis=1, keepdims=True)  # [tq, 1]
        # lowest index achieving the min (first-occurrence tie-break)
        midx = jnp.min(jnp.where(cur == m, col, jnp.int32(2**30)),
                       axis=1, keepdims=True)
        cur = jnp.where(col == midx, _BIG, cur)

        # insert (m, midx) into the sorted running list
        better = m < D[k - 1]
        D[k - 1] = jnp.where(better, m, D[k - 1])
        I[k - 1] = jnp.where(better, midx, I[k - 1])
        for t in range(k - 1, 0, -1):  # bubble up
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


def _topk_packed_kernel(q_ref, r_ref, k_out, k_scr, *, k: int, tq: int,
                        tr: int, idx_bits: int):
    """Packed-key top-k: (distance, index) packed into ONE int32 per pair.

    For non-negative f32, the bit pattern is monotonic in the value, so the
    top 16 bits of bitcast(dist) order distances with ~0.8% relative
    resolution; the low ``idx_bits`` carry the global ref index. One
    min-reduction + one mask pass per candidate (vs two reductions + two
    masks for the exact kernel). Selection can differ from exact only for
    neighbours within ~0.8% relative distance; callers recompute exact
    distances for the selected indices, so only such near-ties are affected.
    """
    j = pl.program_id(1)
    nr = pl.num_programs(1)
    imax = 2 ** 30

    @pl.when(j == 0)
    def _():
        k_scr[:] = jnp.full((tq, k), imax, jnp.int32)

    dx = q_ref[:, 0:1] - r_ref[0:1, :]
    dy = q_ref[:, 1:2] - r_ref[1:2, :]
    dz = q_ref[:, 2:3] - r_ref[2:3, :]
    dist = dx * dx + dy * dy + dz * dz

    col = jax.lax.broadcasted_iota(jnp.int32, (tq, tr), 1) + j * tr
    hi = jax.lax.shift_right_logical(
        jax.lax.bitcast_convert_type(dist, jnp.int32), 16)
    keys = jax.lax.shift_left(hi, idx_bits) | col

    K = [k_scr[:, t:t + 1] for t in range(k)]
    cur = keys
    for _ in range(k):
        m = jnp.min(cur, axis=1, keepdims=True)
        cur = jnp.where(cur == m, imax, cur)
        better = m < K[k - 1]
        K[k - 1] = jnp.where(better, m, K[k - 1])
        for t in range(k - 1, 0, -1):
            swap = K[t] < K[t - 1]
            K[t - 1], K[t] = (jnp.where(swap, K[t], K[t - 1]),
                              jnp.where(swap, K[t - 1], K[t]))

    k_scr[:] = jnp.concatenate(K, axis=1)

    @pl.when(j == nr - 1)
    def _():
        k_out[:] = k_scr[:]


def _rowmin_kernel(q_ref, r_ref, d_out, d_scr, *, tq: int, tr: int):
    """k=1 fast path: running row-min only, no index tracking (Chamfer,
    coverage, Hausdorff). One reduction per tile."""
    j = pl.program_id(1)
    nr = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        d_scr[:] = jnp.full((tq, 1), _BIG, jnp.float32)

    dx = q_ref[:, 0:1] - r_ref[0:1, :]
    dy = q_ref[:, 1:2] - r_ref[1:2, :]
    dz = q_ref[:, 2:3] - r_ref[2:3, :]
    dist = dx * dx + dy * dy + dz * dz
    d_scr[:] = jnp.minimum(d_scr[:], jnp.min(dist, axis=1, keepdims=True))

    @pl.when(j == nr - 1)
    def _():
        d_out[:] = d_scr[:]


@functools.partial(jax.jit, static_argnames=("tq", "tr", "interpret"))
def _rowmin_single(query: jnp.ndarray, ref: jnp.ndarray,
                   tq: int = 1024, tr: int = 4096,
                   interpret: bool = False) -> jnp.ndarray:
    """Unbatched row-min: query [N, 3], ref [M, 3] -> [N]."""
    N = query.shape[0]
    M = ref.shape[0]
    query = query.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    n_pad = (-N) % tq
    m_pad = (-M) % tr
    if n_pad:
        query = jnp.pad(query, ((0, n_pad), (0, 0)))
    if m_pad:
        ref = jnp.pad(ref, ((0, m_pad), (0, 0)), constant_values=1e15)
    rt = ref.T
    grid = (query.shape[0] // tq, rt.shape[1] // tr)
    d = pl.pallas_call(
        functools.partial(_rowmin_kernel, tq=tq, tr=tr),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, 3), lambda qi, ri: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tr), lambda qi, ri: (0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, 1), lambda qi, ri: (qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((query.shape[0], 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tq, 1), jnp.float32)],
        interpret=interpret,
    )(query, rt)
    return jnp.maximum(d[:N, 0], 0.0)


@functools.partial(jax.jit, static_argnames=("k", "tq", "tr", "interpret"))
def _knn_single(query: jnp.ndarray, ref: jnp.ndarray, k: int,
                tq: int = 256, tr: int = 4096, interpret: bool = False):
    """Unbatched top-k: query [N, 3], ref [M, 3] -> ([N, k], [N, k])."""
    N = query.shape[0]
    M = ref.shape[0]
    query = query.astype(jnp.float32)
    ref = ref.astype(jnp.float32)

    n_pad = (-N) % tq
    m_pad = (-M) % tr
    if n_pad:
        query = jnp.pad(query, ((0, n_pad), (0, 0)))
    if m_pad:
        # padded refs sit at +1e15: never selected over any real point
        ref = jnp.pad(ref, ((0, m_pad), (0, 0)), constant_values=1e15)
    rt = ref.T  # [3, M_pad]

    grid = (query.shape[0] // tq, rt.shape[1] // tr)
    d, i = pl.pallas_call(
        functools.partial(_topk_kernel, k=k, tq=tq, tr=tr),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, 3), lambda qi, ri: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tr), lambda qi, ri: (0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, k), lambda qi, ri: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, k), lambda qi, ri: (qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((query.shape[0], k), jnp.float32),
            jax.ShapeDtypeStruct((query.shape[0], k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, k), jnp.float32),
            pltpu.VMEM((tq, k), jnp.int32),
        ],
        interpret=interpret,
    )(query, rt)
    return d[:N], jnp.clip(i[:N], 0, M - 1)


@functools.partial(jax.jit, static_argnames=("k", "tq", "tr", "interpret"))
def _knn_packed_single(query: jnp.ndarray, ref: jnp.ndarray, k: int,
                       tq: int = 512, tr: int = 2048,
                       interpret: bool = False):
    """Packed-key top-k + exact distance recompute for the selected refs."""
    N = query.shape[0]
    M = ref.shape[0]
    query = query.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    n_pad = (-N) % tq
    m_pad = (-M) % tr
    qp = jnp.pad(query, ((0, n_pad), (0, 0))) if n_pad else query
    rp = jnp.pad(ref, ((0, m_pad), (0, 0)), constant_values=1e15) \
        if m_pad else ref
    m_total = rp.shape[0]
    idx_bits = max(1, (m_total - 1)).bit_length()
    if idx_bits > 15:
        raise ValueError(f"packed kNN supports at most 2^15 refs, got "
                         f"{m_total}")
    rt = rp.T
    grid = (qp.shape[0] // tq, m_total // tr)
    keys = pl.pallas_call(
        functools.partial(_topk_packed_kernel, k=k, tq=tq, tr=tr,
                          idx_bits=idx_bits),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, 3), lambda qi, ri: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tr), lambda qi, ri: (0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, k), lambda qi, ri: (qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp.shape[0], k), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tq, k), jnp.int32)],
        interpret=interpret,
    )(qp, rt)
    idx = jnp.clip(keys[:N] & ((1 << idx_bits) - 1), 0, M - 1)
    # exact distances for the selected neighbours
    sel = ref[idx]  # [N, k, 3]
    d = jnp.sum((query[:, None, :] - sel) ** 2, axis=-1)
    # packed selection can locally violate ascending order at near-ties;
    # restore it with a tiny k-element sort
    order = jnp.argsort(d, axis=1)
    return (jnp.take_along_axis(d, order, axis=1),
            jnp.take_along_axis(idx, order, axis=1))


def pallas_knn(query: jnp.ndarray, ref: jnp.ndarray, k: int,
               interpret: bool = False, exact: bool = True):
    """Batched k-nearest refs: query [B, N, 3], ref [B, M, 3] ->
    (sq_dists [B, N, k], indices [B, N, k]), ascending.

    The exact two-reduction kernel is the default (bit-exact selection parity
    with the jnp oracle; also measured FASTER than the packed-key variant on
    v5e — int32 min-reductions don't pay for the saved passes). The packed
    kernel remains available via ``exact=False`` for experimentation.

    Large N*k outputs are processed in query chunks: XLA's value-placement
    pass otherwise puts the whole [N, k] output tuple in scoped VMEM and
    overflows it (observed at N=120k, k=9)."""
    if not exact and ref.shape[1] <= (1 << 15):
        fn = functools.partial(_knn_packed_single, k=k, interpret=interpret)
        return jax.vmap(fn)(query, ref)
    # large k keeps several [tq, tr] temporaries (dist/col/cur) live in
    # VMEM; shrink tiles so the kernel stays under the 16 MB scoped limit
    tile_kw = {"tq": 256, "tr": 2048} if k > 4 else {}
    fn = functools.partial(_knn_single, k=k, interpret=interpret, **tile_kw)
    N = query.shape[1]
    if N * k > 400_000:
        chunk = max(512, (400_000 // k) // 512 * 512)
        outs = [jax.vmap(fn)(query[:, s:s + chunk], ref)
                for s in range(0, N, chunk)]
        return (jnp.concatenate([o[0] for o in outs], axis=1),
                jnp.concatenate([o[1] for o in outs], axis=1))
    return jax.vmap(fn)(query, ref)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_min_sq_dist(query: jnp.ndarray, ref: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Row minima: [B, N] min squared distance to any ref point.

    Differentiable (custom VJP): the primal uses the fast index-free row-min
    kernel; the backward pass re-runs the k=1 top-k kernel to get argmin
    indices and applies the analytic gradient
    d/dq min_j |q-r_j|^2 = 2 (q - r_j*), with the matching scatter-add into
    the refs. This is what lets the Chamfer training loss backprop through
    the Pallas kernel (the jnp oracle path differentiates natively).
    """
    fn = functools.partial(_rowmin_single, interpret=interpret)
    return jax.vmap(fn)(query, ref)


def _min_sq_dist_fwd(query, ref, interpret=False):
    fn = functools.partial(_knn_single, k=1, interpret=interpret)
    d, idx = jax.vmap(fn)(query, ref)
    return jnp.maximum(d[..., 0], 0.0), (query, ref, idx[..., 0])


def _min_sq_dist_bwd(interpret, res, g):
    query, ref, idx = res
    sel = jnp.take_along_axis(ref, idx[..., None], axis=1)  # [B, N, 3]
    diff = (query.astype(jnp.float32) - sel.astype(jnp.float32))
    dq = 2.0 * diff * g[..., None]

    def scatter_one(r_like, i, v):
        return jnp.zeros_like(r_like).at[i].add(v)

    dr = jax.vmap(scatter_one)(ref.astype(jnp.float32), idx, -dq)
    return dq.astype(query.dtype), dr.astype(ref.dtype)


pallas_min_sq_dist.defvjp(_min_sq_dist_fwd, _min_sq_dist_bwd)


def _ballquery_kernel(q_ref, r_ref, i_out, i_scr, *, nsample: int, tq: int,
                      tr: int, radius_sq: float, n_total: int):
    """Ball query: the nsample smallest ref indices within radius of each
    query (reference semantics, models/pointnet2_encoder.py:47-59).

    The extraction key IS the index (masked to a sentinel when out of
    radius), so each output slot costs one min-reduction + one mask pass —
    no separate index-extraction reduction like the kNN kernel. Scanning ref
    tiles in ascending index order means a slot, once filled (< sentinel),
    can never improve; slots fill strictly in order.
    """
    j = pl.program_id(1)
    nr = pl.num_programs(1)
    sentinel = n_total  # matches the reference's "N" fill value

    @pl.when(j == 0)
    def _():
        i_scr[:] = jnp.full((tq, nsample), sentinel, jnp.int32)

    dx = q_ref[:, 0:1] - r_ref[0:1, :]
    dy = q_ref[:, 1:2] - r_ref[1:2, :]
    dz = q_ref[:, 2:3] - r_ref[2:3, :]
    dist = dx * dx + dy * dy + dz * dz
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, tr), 1) + j * tr
    keys = jnp.where(dist <= radius_sq, col, jnp.int32(2**30))

    # extract this tile's nsample smallest in-radius indices, ascending
    cur = keys
    C = []
    for _ in range(nsample):
        m = jnp.min(cur, axis=1, keepdims=True)  # [tq, 1]
        cur = jnp.where(cur == m, jnp.int32(2**30), cur)
        C.append(jnp.where(m < 2**30, m, sentinel))

    # merge: running slots hold strictly smaller indices (earlier tiles), so
    # tile candidate t lands at slot (filled_count + t); done with nsample
    # cheap selects on [tq, nsample] instead of a per-row gather
    slots = i_scr[:]
    k_f = jnp.sum((slots < sentinel).astype(jnp.int32), axis=1,
                  keepdims=True)  # [tq, 1]
    sidx = jax.lax.broadcasted_iota(jnp.int32, (tq, nsample), 1)
    for t in range(nsample):
        slots = jnp.where(sidx == k_f + t, C[t], slots)
    i_scr[:] = slots

    @pl.when(j == nr - 1)
    def _():
        i_out[:] = i_scr[:]


@functools.partial(jax.jit, static_argnames=("nsample", "radius", "tq", "tr",
                                             "interpret"))
def _ballquery_single(new_xyz: jnp.ndarray, xyz: jnp.ndarray, radius: float,
                      nsample: int, tq: int = 512, tr: int = 2048,
                      interpret: bool = False) -> jnp.ndarray:
    """Unbatched ball query: centers [S, 3], points [N, 3] -> [S, nsample]."""
    S = new_xyz.shape[0]
    N = xyz.shape[0]
    q = new_xyz.astype(jnp.float32)
    r = xyz.astype(jnp.float32)
    s_pad = (-S) % tq
    n_pad = (-N) % tr
    if s_pad:
        q = jnp.pad(q, ((0, s_pad), (0, 0)))
    if n_pad:
        r = jnp.pad(r, ((0, n_pad), (0, 0)), constant_values=1e15)
    rt = r.T
    grid = (q.shape[0] // tq, rt.shape[1] // tr)
    idx = pl.pallas_call(
        functools.partial(_ballquery_kernel, nsample=nsample, tq=tq, tr=tr,
                          radius_sq=float(radius) ** 2, n_total=N),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, 3), lambda qi, ri: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tr), lambda qi, ri: (0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, nsample), lambda qi, ri: (qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q.shape[0], nsample), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tq, nsample), jnp.int32)],
        interpret=interpret,
    )(q, rt)
    idx = idx[:S]
    # reference backfill: empty slots take the first in-radius index
    first = idx[:, :1]
    return jnp.where(idx >= N, first, idx)


def pallas_ball_query(radius: float, nsample: int, xyz: jnp.ndarray,
                      new_xyz: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """Batched ball query matching ops.sampling.query_ball_point semantics.
    Tiles shrink with nsample to stay inside the 16 MB scoped-VMEM limit
    (the unrolled per-slot extraction keeps several tile temporaries live)."""
    if nsample <= 32:
        tq, tr = 512, 2048
    else:
        tq, tr = 256, 1024
    fn = functools.partial(_ballquery_single, radius=radius, nsample=nsample,
                           tq=tq, tr=tr, interpret=interpret)
    return jax.vmap(fn)(new_xyz, xyz)


def _topk_f32packed_kernel(q_ref, r_ref, k_out, k_scr, *, k: int, tq: int,
                           tr: int):
    """f32-packed top-k: ref index packed into the low 15 mantissa bits of
    the (non-negative) f32 distance, which keeps the bit pattern monotonic.

    One f32 min-reduction + one mask pass per candidate (the exact kernel
    needs two reductions + two masks), with f32 reductions throughout — the
    combination that measured fastest on v5e (16.0 ms vs 20.3 ms exact for
    90k x 30k k=3). Clobbering 15 mantissa bits leaves 8 (~0.4% relative
    distance resolution): selection can differ from exact only at near-ties
    within that, and callers recompute exact distances for the selected
    indices. Requires at most 2^15 (padded) refs.
    """
    j = pl.program_id(1)
    nr = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        k_scr[:] = jnp.full((tq, k), _BIG, jnp.float32)

    dx = q_ref[:, 0:1] - r_ref[0:1, :]
    dy = q_ref[:, 1:2] - r_ref[1:2, :]
    dz = q_ref[:, 2:3] - r_ref[2:3, :]
    dist = dx * dx + dy * dy + dz * dz
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, tr), 1) + j * tr
    # +0x00800000 biases every key out of the denormal range: a zero distance
    # (exact duplicate points — preprocessing repeat-upsamples with
    # replacement) would otherwise pack to a denormal float whose index bits
    # the TPU's flush-to-zero min/compare can silently collapse to index 0.
    # An int32 add preserves the monotonic f32<->int32 bit-order for
    # non-negative floats, so ordering is unchanged.
    ikeys = ((jax.lax.bitcast_convert_type(dist, jnp.int32)
              + jnp.int32(0x00800000))
             & jnp.int32(~0x7FFF)) | col
    keys = jax.lax.bitcast_convert_type(ikeys, jnp.float32)

    K = [k_scr[:, t:t + 1] for t in range(k)]
    cur = keys
    for _ in range(k):
        m = jnp.min(cur, axis=1, keepdims=True)
        cur = jnp.where(cur == m, _BIG, cur)
        better = m < K[k - 1]
        K[k - 1] = jnp.where(better, m, K[k - 1])
        for t in range(k - 1, 0, -1):
            swap = K[t] < K[t - 1]
            K[t - 1], K[t] = (jnp.where(swap, K[t], K[t - 1]),
                              jnp.where(swap, K[t - 1], K[t]))
    k_scr[:] = jnp.concatenate(K, axis=1)

    @pl.when(j == nr - 1)
    def _():
        k_out[:] = k_scr[:]


@functools.partial(jax.jit, static_argnames=("k", "tq", "tr", "interpret"))
def _knn_f32packed_single(query: jnp.ndarray, ref: jnp.ndarray, k: int,
                          tq: int = 256, tr: int = 4096,
                          interpret: bool = False):
    """f32-packed top-k + exact distance recompute for the selected refs."""
    N = query.shape[0]
    M = ref.shape[0]
    query = query.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    qp = jnp.pad(query, ((0, (-N) % tq), (0, 0))) if N % tq else query
    rp = jnp.pad(ref, ((0, (-M) % tr), (0, 0)), constant_values=1e15) \
        if M % tr else ref
    if rp.shape[0] > (1 << 15):
        raise ValueError(f"f32-packed kNN supports at most 2^15 refs, got "
                         f"{rp.shape[0]}")
    rt = rp.T
    grid = (qp.shape[0] // tq, rt.shape[1] // tr)
    keys = pl.pallas_call(
        functools.partial(_topk_f32packed_kernel, k=k, tq=tq, tr=tr),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, 3), lambda qi, ri: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tr), lambda qi, ri: (0, ri),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, k), lambda qi, ri: (qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((qp.shape[0], k), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tq, k), jnp.float32)],
        interpret=interpret,
    )(qp, rt)
    ikeys = jax.lax.bitcast_convert_type(keys[:N], jnp.int32)
    idx = jnp.clip(ikeys & 0x7FFF, 0, M - 1)
    sel = ref[idx]  # exact distances for the chosen neighbours
    d = jnp.sum((query[:, None, :] - sel) ** 2, axis=-1)
    order = jnp.argsort(d, axis=1)
    return (jnp.take_along_axis(d, order, axis=1),
            jnp.take_along_axis(idx, order, axis=1))


def pallas_knn_f32packed(query: jnp.ndarray, ref: jnp.ndarray, k: int,
                         interpret: bool = False):
    """Batched f32-packed kNN (near-tie-approximate selection, exact
    recomputed distances). Falls back to the exact kernel when the ref count
    exceeds 2^15."""
    padded = -(-ref.shape[1] // 4096) * 4096  # tr=4096 tile padding
    if padded > (1 << 15):  # 15 index bits
        return pallas_knn(query, ref, k, interpret=interpret)
    fn = functools.partial(_knn_f32packed_single, k=k, interpret=interpret)
    return jax.vmap(fn)(query, ref)
