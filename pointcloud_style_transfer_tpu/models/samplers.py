"""DDIM samplers as single compiled `lax.scan` loops.

Two sampling paths, mirroring the reference:

* ``guided_sample_loop`` — the primary CFG inference path
  (reference: models/diffusion_model.py:224-261): style encoded ONCE outside
  the loop from the downsampled condition cloud; each step runs the denoiser
  on cond+uncond in one doubled batch, combines with the guidance scale,
  applies the 0.1 content anchor toward the source cloud and the tanh
  geometric constraint, then a deterministic DDIM update.
* ``ddim_sample_loop`` — unconditional-style sampling
  (reference: models/diffusion_model.py:263-293): style re-encoded every step
  through the full model forward, no CFG, no content anchor.

TPU-first differences from the reference:
* the ENTIRE loop is one jitted `lax.scan` — the reference's per-step
  CPU sklearn kNN round trip (diffusion_model.py:246) becomes an on-device
  chunked kNN;
* the voxel downsample of the current state runs once per step on the B-sized
  batch and its kNN weights are shared by the cond/uncond halves (the
  reference downsamples the doubled batch, doing the dominant N x M distance
  work twice for identical geometry);
* the hierarchical path is taken only when the cloud is actually larger than
  ``global_points`` — fixing the reference bug where ``guided_sample_loop``
  computes ``use_hierarchical`` but unconditionally takes the hierarchical
  path (diffusion_model.py:236 vs :244-246).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (complement_indices, index_points, knn, voxel_downsample,
                   voxel_downsample_partition)
from ..ops.interpolate import apply_interpolation, knn_interpolate_weights
from .diffusion import DiffusionSchedule, ddim_step, ddim_timesteps
from .model import PointCloudDiffusionModel


# B>1 upsample path selection. The flat-batched grid layout
# (ops/grid_knn.py::grid_knn_interpolate_layout_batched) wins ISOLATED
# interp A/Bs (6.94 vs 7.45 ms/cloud at B=8, docs/PERF_NOTES.md round-5
# addenda) but LOSES the end-to-end 50-step sampler to the lax.map
# per-cloud path once the batched voxel chunking fix is in (B=4: 0.684 vs
# 0.653 s/cloud; B=8: 0.707 vs 0.640 — the serial per-cloud passes overlap
# better with the rest of the step under XLA's scheduler). lax.map is
# therefore the default; set PCST_SAMPLER_FLAT_BATCH=1 to re-enable the
# flat path (exactness-gated on hardware, examples/verify_grid_tpu.py).
_SAMPLER_FLAT_BATCH = __import__("os").environ.get(
    "PCST_SAMPLER_FLAT_BATCH", "0") == "1"


def _resolve_sampler_knn_backend(cfg):
    """'auto' resolves to the equal-count kd-grid backend ("grid",
    ops/grid_knn.py) on TPU for the sampler's upsampling kNN: 13.4 ms vs
    22.3 ms brute f32-packed at the sampler's 90k x 30k geometry
    (docs/PERF_NOTES.md round-2 addenda), and exact — unlike f32-packed,
    whose neighbour choice deviates at near-ties within ~0.4% relative
    distance. Brute kernels remain selectable via cfg.knn_backend.
    ``cfg.use_pallas=False`` forces the chunked-jnp path (kernels off), same
    as the PCST_DISABLE_PALLAS env var."""
    import os

    from ..ops.distance import use_pallas_default
    if not cfg.use_pallas:
        return "jnp"
    if cfg.knn_backend != "auto":
        return cfg.knn_backend
    env = os.environ.get("PCST_SAMPLER_KNN_BACKEND")
    if env:  # experiment hook: A/B sampler backends without code edits.
        # Only consulted when the config doesn't pin a backend, and validated:
        # a typo'd env var must not silently route to a slow fallthrough.
        known = ("grid", "jnp", "pallas", "pallas_f32packed", "pallas_pruned")
        if env not in known:
            raise ValueError(
                f"PCST_SAMPLER_KNN_BACKEND={env!r} is not one of {known}")
        return env
    return "grid" if use_pallas_default() else None


def _upsample_unknown(x: jnp.ndarray, idx: jnp.ndarray,
                      coarse_vals: jnp.ndarray, knn_backend,
                      unknown: Optional[jnp.ndarray] = None,
                      ref_xyz: Optional[jnp.ndarray] = None,
                      unknown_xyz: Optional[jnp.ndarray] = None):
    """Scatter exact coarse values to their slots and kNN-interpolate ONLY
    the remaining (unknown) points — the coarse slots' kNN results would be
    discarded, so skipping them saves M/N (25% at 120k/30k) of the dominant
    kNN work. With the grid backend the value gather rides the kernel's
    VMEM-resident ref array (fused interpolation). Returns [B, N, 3].

    ``unknown`` (the complement of ``idx``, any order), ``ref_xyz``
    (= x at ``idx``) and ``unknown_xyz`` (= x at ``unknown``) are recomputed
    when not supplied; callers that already hold them (the guided loop gets
    all three free from ``voxel_downsample_partition``) should pass them in
    — the recomputations are a mask+cumsum+scatter pass and two gathers
    over N."""
    B, N, _ = x.shape
    if unknown is None:
        unknown = complement_indices(idx, N)  # [B, N-M]
    q_unknown = (index_points(x, unknown) if unknown_xyz is None
                 else unknown_xyz)
    if ref_xyz is None:
        ref_xyz = index_points(x, idx)
    # clamp k to the coarse set size (degenerate configs with
    # global_points < 3, same grace the knn_interpolate_weights path had)
    k = min(3, idx.shape[1])
    if unknown.shape[1] == 0:
        # N == M with hierarchical forced: idx is a full permutation and the
        # coarse values ARE the field — no interpolation target exists. The
        # grid branch below would otherwise gather from a zero-length
        # ``unknown`` (XLA out-of-bounds behavior on empty operands is
        # implementation-defined; advisor round-4 finding).
        empty = jnp.zeros((B, 0) + coarse_vals.shape[2:], coarse_vals.dtype)
        return _unpermute_assemble(idx, unknown, coarse_vals, empty, N)
    if knn_backend == "grid" and B == 1:
        # Composed un-permutation (B=1, the sampling case): the layout
        # variant returns values in the grid's padded-layout order plus the
        # original-id map, and the assembly folds that permutation into the
        # SAME inverse-permutation sort it runs anyway — one 2-operand sort
        # over ~N+pad instead of the interp's internal [NP] unsort sort +
        # [Nq, 3] gather AND the assembly's [N] sort.
        from ..ops.grid_knn import grid_knn_interpolate_layout
        v_lay, qpos = grid_knn_interpolate_layout(
            q_unknown[0], ref_xyz[0], coarse_vals[0], k)
        unk = unknown[0]
        Nu = unk.shape[0]
        # layout row j interpolates unknown[qpos[j]]; pads (qpos == Nu) map
        # to the sentinel N, sorted last and dropped
        unk_ids = jnp.where(qpos < Nu,
                            unk[jnp.clip(qpos, 0, Nu - 1)],
                            jnp.int32(N))
        keys = jnp.concatenate([jnp.clip(idx[0], 0, N - 1), unk_ids])
        vals_all = jnp.concatenate([coarse_vals[0], v_lay], axis=0)
        _, inv = jax.lax.sort(
            (keys, jnp.arange(keys.shape[0], dtype=jnp.int32)), num_keys=1)
        return vals_all[inv[:N]][None]
    if knn_backend == "grid" and B > 1 and _SAMPLER_FLAT_BATCH:
        from ..ops.grid_knn import (grid_batched_defaults_ok,
                                    grid_knn_interpolate_layout_batched)
        Nu = unknown.shape[1]
        if grid_batched_defaults_ok(B, Nu, idx.shape[1], k):
            # Flat-batched composed un-permutation: ONE kernel pass over all
            # clouds' tiles (vs lax.map's B serial passes) and ONE flat
            # inverse-permutation sort with composite (cloud, point) keys —
            # also bypassing _unpermute_assemble's vmapped per-cloud sorts,
            # which serialise on TPU (docs/PERF_NOTES.md round-1 addenda).
            v_lay, qposg = grid_knn_interpolate_layout_batched(
                q_unknown, ref_xyz, coarse_vals, k)
            Ngu = B * Nu
            # layout row j interpolates cloud (qposg//Nu)'s unknown
            # [qposg%Nu]; the flattened [B*Nu] unknown table is indexed by
            # the global id directly. Pads map past every real key.
            unk_flat = unknown.reshape(-1)
            unk_ids = jnp.where(
                qposg < Ngu,
                (qposg // Nu) * (N + 1)
                + unk_flat[jnp.clip(qposg, 0, Ngu - 1)],
                jnp.int32(B * (N + 1)))
            coarse_keys = (jnp.arange(B, dtype=jnp.int32)[:, None] * (N + 1)
                           + jnp.clip(idx, 0, N - 1)).reshape(-1)
            keys = jnp.concatenate([coarse_keys, unk_ids])
            C = coarse_vals.shape[-1]
            vals_all = jnp.concatenate(
                [coarse_vals.reshape(-1, C), v_lay], axis=0)
            _, inv = jax.lax.sort(
                (keys, jnp.arange(keys.shape[0], dtype=jnp.int32)),
                num_keys=1)
            return vals_all[inv[:B * N]].reshape(B, N, C)
    if knn_backend == "grid":
        from ..ops.grid_knn import grid_knn_interpolate
        vals = grid_knn_interpolate(q_unknown, ref_xyz, coarse_vals, k)
    else:
        sq_d, nbr = knn(q_unknown, ref_xyz, k, backend=knn_backend)
        dist = jnp.sqrt(jnp.maximum(sq_d, 0.0))
        w = 1.0 / (dist + 1e-8)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        vals = jnp.sum(index_points(coarse_vals, nbr)
                       * w[..., None], axis=2)  # [B, N-M, 3]

    return _unpermute_assemble(idx, unknown, coarse_vals, vals, N)


def _unpermute_assemble(idx: jnp.ndarray, unknown: jnp.ndarray,
                        coarse_vals: jnp.ndarray, vals: jnp.ndarray,
                        N: int) -> jnp.ndarray:
    """idx and unknown partition 0..N-1 (voxel selection + its complement),
    so [coarse_vals; vals] is the noise field in permuted order and the
    assembly is a pure un-permutation. The inverse permutation comes from
    one cheap 2-operand sort (keys = the permutation, payload =
    positions) followed by a row gather — a [120k,3] scatter costs ~5x
    that on v5e (examples/microbench_primitives.py). NOTE: per-element
    sorts serialise under vmap (PERF_NOTES); B=1 is the sampling case."""
    perm = jnp.concatenate([jnp.clip(idx, 0, N - 1), unknown], axis=1)
    vals_all = jnp.concatenate([coarse_vals, vals], axis=1)

    def unpermute_one(p, v):
        _, inv = jax.lax.sort((p, jnp.arange(N, dtype=jnp.int32)),
                              num_keys=1)
        return v[inv]
    return jax.vmap(unpermute_one)(perm, vals_all)


def _step_schedule(num_timesteps: int, num_inference_steps: int):
    ts = ddim_timesteps(num_timesteps, num_inference_steps)
    t_prev = np.concatenate([ts[1:], [-1]])
    # reference: t_prev is -1 (alpha_prev = 1) whenever t == 0
    t_prev = np.where(ts > 0, t_prev, -1)
    return jnp.asarray(ts), jnp.asarray(t_prev)


@partial(jax.jit, static_argnames=("model", "num_inference_steps",
                                   "use_hierarchical"))
def guided_sample_loop(model: PointCloudDiffusionModel,
                       schedule: DiffusionSchedule,
                       variables,
                       source_points: jnp.ndarray,
                       condition_points: jnp.ndarray,
                       key: jax.Array,
                       num_inference_steps: int = 50,
                       guidance_scale: float = 7.5,
                       use_hierarchical: Optional[bool] = None,
                       x_init: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """CFG style transfer: denoise from pure noise toward the source cloud's
    content in the condition cloud's style. Returns [B, N, 3].

    ``x_init`` overrides the initial noise (reproducibility / cross-framework
    parity runs); by default it is drawn from ``key``."""
    cfg = model.config
    B, N, _ = source_points.shape
    M = cfg.global_points
    if use_hierarchical is None:
        use_hierarchical = N > M
    knn_backend = _resolve_sampler_knn_backend(cfg)

    k_cond, k_style, k_init, k_steps = jax.random.split(key, 4)

    # Style computed once from the (identity-if-small) downsampled condition
    # cloud (reference: diffusion_model.py:230-232).
    cond_ds, _ = voxel_downsample(condition_points, M, k_cond)
    style, _ = model.encode_style(variables, cond_ds, key=k_style, train=False)
    uncond_style = jnp.zeros_like(style)
    style_in = jnp.concatenate([style, uncond_style], axis=0)  # [2B, F]

    if x_init is None:
        x0 = jax.random.normal(k_init, source_points.shape, jnp.float32)
    else:
        x0 = x_init.astype(jnp.float32)
    ts, t_prev = _step_schedule(schedule.num_timesteps, num_inference_steps)
    step_keys = jax.random.split(k_steps, num_inference_steps)

    def body(x, step):
        t, tp, k = step
        t_in = jnp.full((2 * B,), t, jnp.int32)
        if use_hierarchical:
            x_coarse, x_idx, x_unk, x_unk_xyz = voxel_downsample_partition(
                x, M, k)
            x2 = jnp.concatenate([x_coarse, x_coarse], axis=0)
            noise_coarse = model.predict_noise(variables, x2, t_in, style_in,
                                               train=False)
            nc_cond, nc_unc = jnp.split(noise_coarse.astype(jnp.float32), 2)
            # CFG combine AT COARSE resolution: interpolation is linear, so
            # combine-then-upsample == upsample-then-combine (the reference
            # upsamples both halves, diffusion_model.py:246-249) — one kNN
            # value pass instead of two.
            guided_coarse = nc_unc + guidance_scale * (nc_cond - nc_unc)

            final_noise = _upsample_unknown(x, x_idx, guided_coarse,
                                            knn_backend, unknown=x_unk,
                                            ref_xyz=x_coarse,
                                            unknown_xyz=x_unk_xyz)
        else:
            x2 = jnp.concatenate([x, x], axis=0)
            pred = model.predict_noise(variables, x2, t_in, style_in,
                                       train=False)
            nc, nu = jnp.split(pred.astype(jnp.float32), 2)
            final_noise = nu + guidance_scale * (nc - nu)

        x_next = ddim_step(schedule, x, final_noise, t, tp,
                           source_points=source_points,
                           content_anchor=cfg.content_anchor,
                           target_range=cfg.target_range)
        return x_next, None

    x_final, _ = jax.lax.scan(body, x0, (ts, t_prev, step_keys))
    return x_final


@partial(jax.jit, static_argnames=("model", "num_inference_steps",
                                   "use_hierarchical"))
def guided_sample_loop_coarse(model: PointCloudDiffusionModel,
                              schedule: DiffusionSchedule,
                              variables,
                              source_points: jnp.ndarray,
                              condition_points: jnp.ndarray,
                              key: jax.Array,
                              num_inference_steps: int = 50,
                              guidance_scale: float = 7.5,
                              use_hierarchical: bool = True) -> jnp.ndarray:
    """Fast CFG sampling: the full DDIM trajectory runs at coarse resolution
    and the resulting *displacement field* is upsampled once at the end.

    TPU-native redesign (no reference equivalent): the reference pays a voxel
    downsample + kNN upsample of the noise field EVERY step
    (models/diffusion_model.py:244-246). But the denoiser only ever sees the
    coarse cloud, and at full resolution each point's trajectory is its own
    DDIM recursion driven by interpolated (smooth) noise + the content anchor
    pulling toward its own source position. Running the recursion at coarse
    resolution and interpolating the final displacement x_final - x_source
    over the STATIC source geometry preserves that structure while removing
    49 of the 50 kNN passes and all per-step voxelisation. ~10x faster at
    120k points; quality parity is measured in tests/eval (displacement
    fields are far smoother than per-step noise fields, so the one-shot
    interpolation loses little).
    """
    cfg = model.config
    B, N, _ = source_points.shape
    M = cfg.global_points

    k_cond, k_style, k_src, k_init, k_steps = jax.random.split(key, 5)

    cond_ds, _ = voxel_downsample(condition_points, M, k_cond)
    style, _ = model.encode_style(variables, cond_ds, key=k_style, train=False)
    style_in = jnp.concatenate([style, jnp.zeros_like(style)], axis=0)

    knn_backend = _resolve_sampler_knn_backend(cfg)
    if use_hierarchical and N > M:
        src_coarse, src_idx = voxel_downsample(source_points, M, k_src)
    else:
        src_coarse, src_idx = source_points, None

    Mc = src_coarse.shape[1]
    x0 = jax.random.normal(k_init, (B, Mc, 3), jnp.float32)
    ts, t_prev = _step_schedule(schedule.num_timesteps, num_inference_steps)
    step_keys = jax.random.split(k_steps, num_inference_steps)

    def body(x, step):
        t, tp, _ = step
        t_in = jnp.full((2 * B,), t, jnp.int32)
        x2 = jnp.concatenate([x, x], axis=0)
        pred = model.predict_noise(variables, x2, t_in, style_in, train=False)
        nc, nu = jnp.split(pred.astype(jnp.float32), 2)
        final_noise = nu + guidance_scale * (nc - nu)
        x_next = ddim_step(schedule, x, final_noise, t, tp,
                           source_points=src_coarse,
                           content_anchor=cfg.content_anchor,
                           target_range=cfg.target_range)
        return x_next, None

    x_final, _ = jax.lax.scan(body, x0, (ts, t_prev, step_keys))

    if src_idx is None:
        return x_final
    # displacement field at coarse points, interpolated over the static
    # source geometry, applied to every full-res point
    disp = x_final - src_coarse  # [B, M, 3]
    nbr, w = knn_interpolate_weights(source_points, src_idx, k=3,
                                     backend=knn_backend)
    disp_full = apply_interpolation(disp, nbr, w, src_idx)  # [B, N, 3]
    return source_points + disp_full


@partial(jax.jit, static_argnames=("model", "num_inference_steps",
                                   "use_hierarchical"))
def ddim_sample_loop(model: PointCloudDiffusionModel,
                     schedule: DiffusionSchedule,
                     variables,
                     shape_like: jnp.ndarray,
                     condition_points: jnp.ndarray,
                     key: jax.Array,
                     num_inference_steps: int = 50,
                     use_hierarchical: Optional[bool] = None) -> jnp.ndarray:
    """Plain DDIM sampling (no CFG, no content anchor); style re-encoded every
    step through the full forward, as the reference does
    (models/diffusion_model.py:263-293). ``shape_like`` supplies the output
    shape [B, N, 3]."""
    cfg = model.config
    B, N, _ = shape_like.shape
    M = cfg.global_points
    if use_hierarchical is None:
        use_hierarchical = N > M

    k_init, k_steps = jax.random.split(key)
    x0 = jax.random.normal(k_init, (B, N, 3), jnp.float32)
    ts, t_prev = _step_schedule(schedule.num_timesteps, num_inference_steps)
    step_keys = jax.random.split(k_steps, num_inference_steps)
    knn_backend = _resolve_sampler_knn_backend(cfg)

    def body(x, step):
        t, tp, k = step
        t_in = jnp.full((B,), t, jnp.int32)
        k_fwd, k_up = jax.random.split(k)
        pred, idx, _ = model.forward(
            variables, x, t_in, condition_points, key=k_fwd,
            cond_drop_prob=0.0, use_hierarchical=use_hierarchical,
            train=False, mutable=False)
        if idx is not None:
            # unknown-only fused upsampling, same as the guided loop (the
            # coarse slots receive their exact predictions; interpolating
            # them too — as the reference does — is pure discarded work)
            predicted_noise = _upsample_unknown(
                x, idx, pred.astype(jnp.float32), knn_backend)
        else:
            predicted_noise = pred.astype(jnp.float32)
        x_next = ddim_step(schedule, x, predicted_noise, t, tp,
                           target_range=cfg.target_range)
        return x_next, None

    x_final, _ = jax.lax.scan(body, x0, (ts, t_prev, step_keys))
    return x_final
