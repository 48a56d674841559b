import jax.numpy as jnp
import numpy as np

from pointcloud_style_transfer_tpu.config import Config
from pointcloud_style_transfer_tpu.models import (ddim_step, ddim_timesteps,
                                                  geometric_constraint,
                                                  make_beta_schedule,
                                                  make_schedule, q_sample)


def test_cosine_schedule_golden():
    """Golden-value check against the reference formula
    (models/diffusion_model.py:205-209) computed independently here."""
    T = 1000
    offset = 0.0008
    betas = make_beta_schedule("cosine", T, offset)
    x = np.linspace(0, T, T + 1)
    ac = np.cos(((x / T) + 0.008 + offset) / 1.008 * np.pi / 2) ** 2
    ac = ac / ac[0]
    want = np.clip(1 - ac[1:] / ac[:-1], 1e-4, 0.9999)
    np.testing.assert_allclose(betas, want, rtol=1e-5)
    assert betas.shape == (T,)
    assert betas[0] >= 1e-4 and betas[-1] <= 0.9999


def test_linear_schedule():
    betas = make_beta_schedule("linear", 100)
    np.testing.assert_allclose(betas, np.linspace(1e-4, 0.02, 100), rtol=1e-6)


def test_schedule_derived_arrays():
    cfg = Config(num_timesteps=50)
    s = make_schedule(cfg)
    alphas = 1 - np.asarray(s.betas)
    ac = np.cumprod(alphas)
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod), ac, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod_prev),
                               np.concatenate([[1.0], ac[:-1]]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s.sqrt_alphas_cumprod),
                               np.sqrt(ac), rtol=1e-5)


def test_q_sample_identity(rng):
    cfg = Config(num_timesteps=100)
    s = make_schedule(cfg)
    x0 = jnp.asarray(rng.standard_normal((2, 16, 3)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((2, 16, 3)).astype(np.float32))
    t = jnp.array([0, 99])
    xt = q_sample(s, x0, t, noise)
    ac = np.asarray(s.alphas_cumprod)
    for b, tt in enumerate([0, 99]):
        want = np.sqrt(ac[tt]) * np.asarray(x0)[b] + \
            np.sqrt(1 - ac[tt]) * np.asarray(noise)[b]
        np.testing.assert_allclose(np.asarray(xt)[b], want, atol=1e-5)


def test_q_sample_clamps_t(rng):
    cfg = Config(num_timesteps=10)
    s = make_schedule(cfg)
    x0 = jnp.ones((1, 4, 3))
    noise = jnp.zeros((1, 4, 3))
    a = q_sample(s, x0, jnp.array([999]), noise)
    b = q_sample(s, x0, jnp.array([9]), noise)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_geometric_constraint():
    pts = jnp.array([[[100.0, -100.0, 0.0]]])
    out = np.asarray(geometric_constraint(pts, 1.8))
    np.testing.assert_allclose(out, [[[1.8, -1.8, 0.0]]], atol=1e-3)


def test_ddim_timesteps_match_torch_linspace_long():
    """torch.linspace(T-1, 0, n).long() truncates; verify a couple of values."""
    ts = ddim_timesteps(1000, 50)
    want = np.linspace(999, 0, 50).astype(np.int64)
    np.testing.assert_array_equal(ts, want)
    assert ts[0] == 999 and ts[-1] == 0


def test_ddim_step_final_reaches_pred_x0(rng):
    """At the final step (t_prev = -1, alpha_prev = 1) the update returns
    pred_x0 exactly (reference: diffusion_model.py:253,259-260)."""
    cfg = Config(num_timesteps=100)
    s = make_schedule(cfg)
    x = jnp.asarray(rng.standard_normal((1, 8, 3)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((1, 8, 3)).astype(np.float32))
    t = jnp.array(0)
    out = ddim_step(s, x, eps, t, jnp.array(-1), target_range=1.8)
    ac0 = float(np.asarray(s.alphas_cumprod)[0])
    pred_x0 = (np.asarray(x) - np.sqrt(1 - ac0) * np.asarray(eps)) / \
        (np.sqrt(ac0) + 1e-8)
    want = np.tanh(pred_x0 / 1.8) * 1.8
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_ddim_step_content_anchor(rng):
    cfg = Config(num_timesteps=100)
    s = make_schedule(cfg)
    x = jnp.asarray(rng.standard_normal((1, 8, 3)).astype(np.float32))
    eps = jnp.zeros_like(x)
    src = jnp.asarray(rng.standard_normal((1, 8, 3)).astype(np.float32))
    t = jnp.array(0)
    out_anchor = ddim_step(s, x, eps, t, jnp.array(-1), source_points=src,
                           content_anchor=0.1, target_range=1.8)
    ac0 = float(np.asarray(s.alphas_cumprod)[0])
    p0 = np.asarray(x) / (np.sqrt(ac0) + 1e-8)
    p0 = p0 + 0.1 * (np.asarray(src) - p0)
    want = np.tanh(p0 / 1.8) * 1.8
    np.testing.assert_allclose(np.asarray(out_anchor), want, atol=1e-5)
