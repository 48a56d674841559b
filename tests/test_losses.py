import jax.numpy as jnp
import numpy as np

from pointcloud_style_transfer_tpu.models import diffusion_loss


def test_l1_only(rng):
    a = rng.standard_normal((2, 16, 3)).astype(np.float32)
    b = rng.standard_normal((2, 16, 3)).astype(np.float32)
    total, d = diffusion_loss(jnp.asarray(a), jnp.asarray(b))
    want = np.abs(a - b).mean()
    np.testing.assert_allclose(float(total), want, rtol=1e-5)
    assert "chamfer_loss" not in d
    np.testing.assert_allclose(float(d["noise_loss"]), want, rtol=1e-5)


def test_with_chamfer_term(rng):
    a = rng.standard_normal((2, 16, 3)).astype(np.float32)
    b = rng.standard_normal((2, 16, 3)).astype(np.float32)
    p = rng.standard_normal((2, 24, 3)).astype(np.float32)
    q = rng.standard_normal((2, 24, 3)).astype(np.float32)
    total, d = diffusion_loss(jnp.asarray(a), jnp.asarray(b),
                              jnp.asarray(p), jnp.asarray(q),
                              chamfer_weight=0.1, chamfer_chunk=8)

    def cd(x, y):
        m = ((x[:, None] - y[None]) ** 2).sum(-1)
        return m.min(1).mean() + m.min(0).mean()

    want_cd = np.mean([cd(p[i], q[i]) for i in range(2)])
    want = np.abs(a - b).mean() + 0.1 * want_cd
    np.testing.assert_allclose(float(total), want, rtol=1e-4)
    np.testing.assert_allclose(float(d["chamfer_loss"]), want_cd, rtol=1e-4)
    np.testing.assert_allclose(float(d["total_loss"]), want, rtol=1e-4)


def test_chamfer_weight_zero_skips(rng):
    a = rng.standard_normal((1, 8, 3)).astype(np.float32)
    p = rng.standard_normal((1, 8, 3)).astype(np.float32)
    total, d = diffusion_loss(jnp.asarray(a), jnp.asarray(a),
                              jnp.asarray(p), jnp.asarray(p),
                              chamfer_weight=0.0)
    assert float(total) == 0.0
    assert "chamfer_loss" not in d
