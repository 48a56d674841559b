"""Point-sharded CFG sampler: multi-chip scaling of the hot kNN path.

Cost structure of one reference-parity sampling step at 120k points (v5e,
round-3 single-chip numbers, docs/PERF_NOTES.md): kNN+interp ~12 ms >>
voxel downsample ~4 ms > denoiser ~1.8 ms. The kNN is embarrassingly
parallel over QUERY points with a tiny replicated reference set
(30k x 3 f32 = 360 KB), so the multi-chip strategy is:

* replicate the cheap steps (voxel downsample, coarse denoiser, DDIM update)
  — identical PRNG keys make them bitwise-consistent across devices with no
  communication;
* shard the kNN queries over the ``points`` mesh axis (each chip computes
  U/d query rows against the replicated coarse refs);
* all-gather the interpolated noise values (~1 MB per step over ICI —
  negligible next to the kNN work saved per chip).

This mirrors the single-chip hot path optimization-for-optimization
(models/samplers.py:173-204, the round-3 state that measured 0.968 s/cloud):

* only the UNKNOWN points (the complement of the voxel selection, U = N - M
  = 75% of N at 120k/30k) are kNN-interpolated — the coarse slots take
  their exact predictions (``voxel_downsample_partition`` returns the
  complement and both coordinate sets with no extra gathers);
* CFG combines at COARSE resolution before the upsample (interpolation is
  linear, so combine-then-upsample == upsample-then-combine — one kNN value
  pass instead of the reference's two, diffusion_model.py:246-249);
* with the grid backend the value gather rides the kernel's VMEM-resident
  ref array (fused ``grid_knn_interpolate``);
* the full noise field is assembled by inverse-permutation-via-sort
  (``_unpermute_assemble``) instead of a [N,3] scatter (a scatter costs ~5x
  a row gather on v5e).

The kNN backend defaults to the SAME resolution rule as the single-chip
sampler (``_resolve_sampler_knn_backend``): the equal-count kd-grid kernel
on TPU, chunked jnp on CPU (the virtual test mesh). A production pod run
therefore gets the fast kernel with no extra kwarg; pass
``knn_backend="jnp"`` explicitly to force the portable path.

**The Amdahl ceiling, honestly (round-5 numbers, docs/PERF_NOTES.md).**
At the round-4 defaults one step costs ~12.4 ms on one v5e chip:
kNN+interp ~7.0 (sharded d-ways here), denoiser ~1.1 (sharded d-ways here
when M divides the axis), voxel downsample ~3.4 and DDIM/assembly ~0.9
(replicated — a 120k-point exact-semantics voxel select is four global
sorts; distributing a sort across chips costs more in all-to-alls than the
3.4 ms it saves at this size). Projected per-step cost on d chips is
therefore ~(4.3 + 8.1/d) ms + ICI gathers (~1.7 MB/step):

| d | projected s/cloud | speedup | points/s/CHIP |
|---|---|---|---|
| 1 | 0.62 | 1.0x | 193k |
| 2 | 0.42 | 1.5x | 143k |
| 4 | 0.32 | 1.9x | 94k |
| 8 | 0.27 | 2.3x | 56k |

Latency floors at ~0.22 s/cloud (the replicated 4.3 ms/step); per-chip
THROUGHPUT monotonically DROPS under point sharding. For throughput, shard
clouds instead: ``guided_sample_loop_dp`` below is embarrassingly parallel
over the batch axis (zero cross-chip communication, perfect scaling —
8 clouds on a v5e-8 in one B=1-equivalent wall time); at local B > 1 each
device runs the lax.map per-cloud grid path (the measured e2e default —
models/samplers.py::_SAMPLER_FLAT_BATCH).

Verified equal to the single-device sampler on the virtual CPU mesh
(tests/test_sharding.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.diffusion import DiffusionSchedule, ddim_step
from ..models.model import PointCloudDiffusionModel
from ..models.samplers import (_resolve_sampler_knn_backend, _step_schedule,
                               _unpermute_assemble)
from ..ops import voxel_downsample, voxel_downsample_partition
from ..ops.distance import knn
from ..ops.sampling import index_points
from .mesh import DATA_AXIS, POINTS_AXIS

from jax.sharding import Mesh, PartitionSpec as P

# Test-only fault-injection hook: tests monkeypatch this to a nonzero value
# to prove their sharded-vs-single equivalence assertions catch a
# wrong-shard bug (tests/test_sharding.py). Not a function parameter: a
# caller can't accidentally pass it.
_TEST_SHARD_OFFSET = 0


def guided_sample_loop_sharded(model: PointCloudDiffusionModel,
                               schedule: DiffusionSchedule,
                               variables,
                               source_points: jnp.ndarray,
                               condition_points: jnp.ndarray,
                               key: jax.Array,
                               mesh: Mesh,
                               num_inference_steps: int = 50,
                               guidance_scale: float = 7.5,
                               axis_name: str = POINTS_AXIS,
                               knn_backend: Optional[str] = None
                               ) -> jnp.ndarray:
    """Reference-parity guided sampling with the kNN sharded over ``points``.

    Inputs/outputs are replicated [B, N, 3]; the unknown count N - M must be
    divisible by the axis size (120k - 30k = 90k is, for any power-of-two
    pod). Matches guided_sample_loop numerically (same keys)."""
    cfg = model.config
    B, N, _ = source_points.shape
    M = cfg.global_points
    n_dev = mesh.shape[axis_name]
    use_hierarchical = N > M
    if use_hierarchical and (N - M) % n_dev:
        raise ValueError(
            f"unknown count N-M={N - M} not divisible by points axis "
            f"({n_dev})")
    u_loc = (N - M) // n_dev if use_hierarchical else 0
    if knn_backend is None:
        knn_backend = _resolve_sampler_knn_backend(cfg)
    k_nn = min(3, M)
    # the coarse denoiser is pointwise (per-point MLP, zero cross-point
    # ops — reference models/diffusion_model.py:54-61), so its rows shard
    # over the same axis for free: predict M/d rows per chip, all-gather
    # [2B, M, 3] (~720 KB) — ~1.1 ms/step replicated -> ~1.1/d + gather
    m_loc = M // n_dev if (use_hierarchical and M % n_dev == 0) else 0

    def body_fn(src, cond, k_all):
        me = jnp.mod(jax.lax.axis_index(axis_name) + _TEST_SHARD_OFFSET,
                     n_dev)
        k_cond, k_style, k_init, k_steps = jax.random.split(k_all, 4)

        cond_ds, _ = voxel_downsample(cond, M, k_cond)
        style, _ = model.encode_style(variables, cond_ds, key=k_style,
                                      train=False)
        style_in = jnp.concatenate([style, jnp.zeros_like(style)], axis=0)

        x0 = jax.random.normal(k_init, src.shape, jnp.float32)
        ts, t_prev = _step_schedule(schedule.num_timesteps,
                                    num_inference_steps)
        step_keys = jax.random.split(k_steps, num_inference_steps)

        def step(x, s):
            t, tp, kk = s
            t_in = jnp.full((2 * B,), t, jnp.int32)
            if use_hierarchical:
                # replicated coarse work (identical on every chip: same key)
                x_coarse, x_idx, x_unk, x_unk_xyz = \
                    voxel_downsample_partition(x, M, kk)
                x2 = jnp.concatenate([x_coarse, x_coarse], axis=0)
                if m_loc:
                    x2_loc = jax.lax.dynamic_slice_in_dim(
                        x2, me * m_loc, m_loc, axis=1)
                    nc_loc = model.predict_noise(variables, x2_loc, t_in,
                                                 style_in, train=False)
                    noise_coarse = jax.lax.all_gather(
                        nc_loc, axis_name, axis=1, tiled=True)
                else:
                    noise_coarse = model.predict_noise(variables, x2, t_in,
                                                       style_in, train=False)
                nc_cond, nc_unc = jnp.split(
                    noise_coarse.astype(jnp.float32), 2)
                guided_coarse = nc_unc + guidance_scale * (nc_cond - nc_unc)

                # sharded kNN+interp: local slice of the UNKNOWN queries vs
                # the replicated coarse refs
                q_local = jax.lax.dynamic_slice_in_dim(
                    x_unk_xyz, me * u_loc, u_loc, axis=1)
                if knn_backend == "grid":
                    from ..ops.grid_knn import grid_knn_interpolate
                    vals_local = grid_knn_interpolate(
                        q_local, x_coarse, guided_coarse, k_nn)
                else:
                    sq_d, nbr = knn(q_local, x_coarse, k_nn,
                                    chunk_size=4096, backend=knn_backend)
                    dist = jnp.sqrt(jnp.maximum(sq_d, 0.0))
                    w = 1.0 / (dist + 1e-8)
                    w = w / jnp.sum(w, axis=-1, keepdims=True)
                    vals_local = jnp.sum(index_points(guided_coarse, nbr)
                                         * w[..., None], axis=2)

                vals = jax.lax.all_gather(vals_local, axis_name, axis=1,
                                          tiled=True)  # [B, N-M, 3]
                final_noise = _unpermute_assemble(x_idx, x_unk,
                                                  guided_coarse, vals, N)
            else:
                x2 = jnp.concatenate([x, x], axis=0)
                pred = model.predict_noise(variables, x2, t_in, style_in,
                                           train=False)
                nc, nu = jnp.split(pred.astype(jnp.float32), 2)
                final_noise = nu + guidance_scale * (nc - nu)

            x_next = ddim_step(schedule, x, final_noise, t, tp,
                               source_points=src,
                               content_anchor=cfg.content_anchor,
                               target_range=cfg.target_range)
            return x_next, None

        x_final, _ = jax.lax.scan(step, x0, (ts, t_prev, step_keys))
        return x_final

    fn = jax.shard_map(
        body_fn, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(),
        check_vma=False,  # replicated carries + local slices by design
    )
    return fn(source_points, condition_points, key)


def guided_sample_loop_dp(model: PointCloudDiffusionModel,
                          schedule: DiffusionSchedule,
                          variables,
                          source_points: jnp.ndarray,
                          condition_points: jnp.ndarray,
                          key: jax.Array,
                          mesh: Mesh,
                          num_inference_steps: int = 50,
                          guidance_scale: float = 7.5,
                          axis_name: str = DATA_AXIS) -> jnp.ndarray:
    """Data-parallel batched sampling: shard CLOUDS over ``axis_name``.

    Each device runs the full single-device ``guided_sample_loop`` on its
    local group of B/d clouds with its own key (``fold_in(key, device)``) —
    ZERO cross-chip communication, so scaling is perfect (no Amdahl term,
    unlike the point-sharded latency sampler above): a v5e-8 styles 8
    clouds in one B=1-equivalent wall time; at local B > 1 each device runs
    the lax.map per-cloud grid path (the measured e2e default,
    models/samplers.py::_SAMPLER_FLAT_BATCH — the flat-batched layout wins
    isolated interp A/Bs but loses the full step to scheduling overlap).
    This is the production-serving configuration;
    use ``guided_sample_loop_sharded`` only to cut SINGLE-cloud latency.

    Semantics: cloud group g (the g-th contiguous B/d slice) is sampled
    exactly as ``guided_sample_loop(..., key=fold_in(key, g))`` would
    sample it on one device — device-count-reproducible per group."""
    from ..models.samplers import guided_sample_loop

    B = source_points.shape[0]
    n_dev = mesh.shape[axis_name]
    if B % n_dev:
        raise ValueError(f"batch {B} not divisible by {axis_name} axis "
                         f"({n_dev})")

    def body(src, cond):
        k_local = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        return guided_sample_loop(
            model, schedule, variables, src, cond, k_local,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,  # closed-over replicated params + key by design
    )
    return fn(source_points, condition_points)
