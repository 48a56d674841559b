import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_style_transfer_tpu.config import Config
from pointcloud_style_transfer_tpu.models import (PointCloudDiffusionModel,
                                                  time_embedding)


def count_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


def small_config(**kw):
    base = dict(total_points=256, global_points=128, feature_dim=32,
                time_embed_dim=16, num_timesteps=20, use_amp=False)
    base.update(kw)
    return Config(**base)


def test_time_embedding_formula():
    t = jnp.array([0.0, 5.0])
    emb = np.asarray(time_embedding(t, 128))
    assert emb.shape == (2, 128)
    half = 64
    freqs = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    want = np.concatenate([np.sin(5.0 * freqs), np.cos(5.0 * freqs)])
    np.testing.assert_allclose(emb[1], want, atol=1e-5)
    # t=0: sin=0, cos=1
    np.testing.assert_allclose(emb[0, :half], 0.0, atol=1e-7)
    np.testing.assert_allclose(emb[0, half:], 1.0, atol=1e-7)


@pytest.mark.slow
def test_param_count_parity(key):
    """Parameter-count parity with the reference model at default dims
    (measured from the PyTorch reference: style encoder 675,136; noise
    predictor 1,874,691; total 2,549,827)."""
    model = PointCloudDiffusionModel(Config(use_amp=False))
    variables = model.init(key, example_points=256)
    params = variables["params"]
    total = count_params(params)
    style = count_params(params["style_encoder"])
    noise = count_params(params["noise_predictor"])
    assert style == 675136
    assert noise == 1874691
    assert total == 2549827


def test_forward_direct_path(key):
    cfg = small_config()
    model = PointCloudDiffusionModel(cfg)
    variables = model.init(key, example_points=64)
    x = jax.random.normal(key, (2, 64, 3))
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 3))
    t = jnp.array([3, 7])
    pred, idx, _ = model.forward(variables, x, t, cond,
                                 key=jax.random.PRNGKey(2),
                                 use_hierarchical=True)
    assert idx is None  # 64 <= global_points -> direct path
    assert pred.shape == (2, 64, 3)
    assert np.isfinite(np.asarray(pred)).all()


def test_forward_hierarchical_path(key):
    cfg = small_config()
    model = PointCloudDiffusionModel(cfg)
    variables = model.init(key, example_points=64)
    x = jax.random.normal(key, (1, 256, 3))
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 3))
    t = jnp.array([3])
    pred, idx, _ = model.forward(variables, x, t, cond,
                                 key=jax.random.PRNGKey(2),
                                 use_hierarchical=True)
    assert idx is not None
    assert pred.shape == (1, 128, 3)
    assert idx.shape == (1, 128)


def test_cfg_drop_zeroes_style(key):
    """With cond_drop_prob=1.0 the style must be fully dropped: the forward
    must equal a forward with an all-zero condition encoding."""
    cfg = small_config()
    model = PointCloudDiffusionModel(cfg)
    variables = model.init(key, example_points=64)
    x = jax.random.normal(key, (2, 64, 3))
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 3))
    t = jnp.array([3, 7])
    k = jax.random.PRNGKey(2)
    pred_drop, _, _ = model.forward(variables, x, t, cond, key=k,
                                    cond_drop_prob=1.0)
    # manual: encode then zero then predict, using the same key splits
    k_vox_c, k_style, k_drop, k_vox_x, k_pred = jax.random.split(k, 5)
    style, _ = model.encode_style(variables, cond, key=k_style)
    pred_manual = model.predict_noise(variables, x, t,
                                      jnp.zeros_like(style))
    np.testing.assert_allclose(np.asarray(pred_drop),
                               np.asarray(pred_manual), atol=1e-5)


def test_forward_deterministic_given_key(key):
    cfg = small_config()
    model = PointCloudDiffusionModel(cfg)
    variables = model.init(key, example_points=64)
    x = jax.random.normal(key, (1, 64, 3))
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 3))
    t = jnp.array([5])
    k = jax.random.PRNGKey(3)
    p1, _, _ = model.forward(variables, x, t, cond, key=k)
    p2, _, _ = model.forward(variables, x, t, cond, key=k)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_batch_stats_update_in_train_mode(key):
    cfg = small_config()
    model = PointCloudDiffusionModel(cfg)
    variables = model.init(key, example_points=64)
    x = jax.random.normal(key, (1, 64, 3))
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 3))
    t = jnp.array([5])
    _, _, updates = model.forward(variables, x, t, cond,
                                  key=jax.random.PRNGKey(2), train=True,
                                  mutable=True)
    assert updates is not None and "batch_stats" in updates
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(np.asarray(b), np.asarray(a))
               for b, a in zip(before, after))
