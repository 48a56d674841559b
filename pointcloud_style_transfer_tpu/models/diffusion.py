"""Diffusion schedule and forward-process math.

Reproduces the reference DiffusionProcess schedule exactly
(reference: models/diffusion_model.py:193-222):

* cosine schedule — Nichol-Dhariwal form with the reference's quirk of a
  hardcoded 0.008 in the formula PLUS the configurable offset added on top
  (models/diffusion_model.py:207), betas clipped to [1e-4, 0.9999];
* linear schedule — linspace(1e-4, 0.02);
* q_sample forward noising;
* the tanh geometric soft-constraint to +-target_range.

All arrays are float32; the schedule is precomputed once and closed over by
jitted train/sample steps.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DiffusionSchedule:
    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    def tree_flatten(self):
        return ((self.betas, self.alphas, self.alphas_cumprod,
                 self.alphas_cumprod_prev, self.sqrt_alphas_cumprod,
                 self.sqrt_one_minus_alphas_cumprod), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def make_beta_schedule(schedule_name: str, num_timesteps: int,
                       offset: float = 0.0) -> np.ndarray:
    """Beta schedule (reference: models/diffusion_model.py:204-212)."""
    if schedule_name == "cosine":
        # Computed in float64 then cast: the betas come from a cancellation
        # (1 - ac[i+1]/ac[i]) that amplifies f32 rounding, so f64 is *more*
        # accurate than the reference's torch-f32 arithmetic; agreement with
        # the reference is within ~4e-5 absolute on betas and ~1e-6 on the
        # alphas_cumprod terms that actually enter training/sampling
        # (verified in tests/test_parity_reference.py).
        x = np.linspace(0, num_timesteps, num_timesteps + 1, dtype=np.float64)
        # NOTE: the reference hardcodes 0.008 and *adds* the config offset,
        # with the denominator fixed at 1.008 (diffusion_model.py:207). We
        # reproduce that exactly, bugs-for-compat included.
        ac = np.cos(((x / num_timesteps) + 0.008 + offset) / 1.008
                    * np.pi * 0.5) ** 2
        ac = ac / ac[0]
        betas = 1.0 - (ac[1:] / ac[:-1])
        return np.clip(betas, 0.0001, 0.9999).astype(np.float32)
    elif schedule_name == "linear":
        return np.linspace(0.0001, 0.02, num_timesteps, dtype=np.float32)
    raise NotImplementedError(f"unknown beta schedule: {schedule_name}")


def make_schedule(config: Config) -> DiffusionSchedule:
    betas = jnp.asarray(make_beta_schedule(
        config.beta_schedule, config.num_timesteps,
        config.noise_schedule_offset))
    alphas = 1.0 - betas
    ac = jnp.cumprod(alphas)
    ac_prev = jnp.concatenate([jnp.ones((1,), ac.dtype), ac[:-1]])
    return DiffusionSchedule(
        betas=betas,
        alphas=alphas,
        alphas_cumprod=ac,
        alphas_cumprod_prev=ac_prev,
        sqrt_alphas_cumprod=jnp.sqrt(ac),
        sqrt_one_minus_alphas_cumprod=jnp.sqrt(1.0 - ac),
    )


def q_sample(schedule: DiffusionSchedule, x_start: jnp.ndarray,
             t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """Forward noising x_t = sqrt(ac_t) x_0 + sqrt(1-ac_t) eps
    (reference: models/diffusion_model.py:214-219)."""
    t = jnp.clip(t, 0, schedule.num_timesteps - 1)
    a = schedule.sqrt_alphas_cumprod[t][:, None, None]
    b = schedule.sqrt_one_minus_alphas_cumprod[t][:, None, None]
    return a * x_start + b * noise


def geometric_constraint(points: jnp.ndarray,
                         target_range: float = 1.8) -> jnp.ndarray:
    """Soft clip to +-target_range (reference: models/diffusion_model.py:221-222)."""
    return jnp.tanh(points / target_range) * target_range


def ddim_timesteps(num_timesteps: int, num_inference_steps: int) -> np.ndarray:
    """Descending DDIM step schedule, matching torch.linspace(T-1, 0, n).long()
    (truncation, not rounding — reference: models/diffusion_model.py:235)."""
    return np.linspace(num_timesteps - 1, 0, num_inference_steps).astype(np.int64)


def ddim_step(schedule: DiffusionSchedule, x: jnp.ndarray,
              predicted_noise: jnp.ndarray, t: jnp.ndarray,
              t_prev: jnp.ndarray, *, source_points: jnp.ndarray | None = None,
              content_anchor: float = 0.0,
              target_range: float = 1.8) -> jnp.ndarray:
    """One deterministic (eta=0) DDIM update with the reference's extras:
    optional content anchor pull toward the source cloud
    (models/diffusion_model.py:256) and tanh geometric constraint (:257).

    t_prev < 0 means "final step" (alpha_prev = 1).
    """
    alpha_t = schedule.alphas_cumprod[jnp.clip(t, 0, None)]
    alpha_prev = jnp.where(
        t_prev >= 0, schedule.alphas_cumprod[jnp.clip(t_prev, 0, None)], 1.0)

    sqrt_one_minus = jnp.sqrt(1.0 - alpha_t)
    pred_x0 = (x - sqrt_one_minus * predicted_noise) / (jnp.sqrt(alpha_t) + 1e-8)
    if source_points is not None and content_anchor > 0:
        pred_x0 = pred_x0 + content_anchor * (source_points - pred_x0)
    pred_x0 = geometric_constraint(pred_x0, target_range)

    dir_xt = jnp.sqrt(1.0 - alpha_prev) * predicted_noise
    return jnp.sqrt(alpha_prev) * pred_x0 + dir_xt
