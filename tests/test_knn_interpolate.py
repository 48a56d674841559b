import jax.numpy as jnp
import numpy as np

from pointcloud_style_transfer_tpu.ops import knn_interpolate


def naive_interpolate(coarse_vals, original, coarse_idx, k=3):
    """Numpy oracle reproducing the reference upsample
    (models/diffusion_model.py:127-153): exact values at known slots, k-NN
    inverse-distance interpolation for the rest, geometry = original points."""
    N = original.shape[0]
    M = coarse_vals.shape[0]
    k = min(k, M)
    result = np.zeros((N, coarse_vals.shape[1]), dtype=np.float64)
    result[coarse_idx] = coarse_vals
    unknown_mask = np.ones(N, bool)
    unknown_mask[coarse_idx] = False
    unknown = np.where(unknown_mask)[0]
    fit = original[coarse_idx]
    for u in unknown:
        d = np.linalg.norm(fit - original[u], axis=1)
        nbr = np.argsort(d)[:k]
        w = 1.0 / (d[nbr] + 1e-8)
        w = w / w.sum()
        result[u] = (coarse_vals[nbr] * w[:, None]).sum(0)
    return result


def test_knn_interpolate_matches_naive(rng):
    N, M = 60, 20
    original = rng.standard_normal((1, N, 3)).astype(np.float32)
    idx = rng.permutation(N)[:M].astype(np.int32)[None]
    vals = rng.standard_normal((1, M, 3)).astype(np.float32)
    got = np.asarray(knn_interpolate(jnp.asarray(vals), jnp.asarray(original),
                                     jnp.asarray(idx), k=3, chunk_size=16))
    want = naive_interpolate(vals[0], original[0], idx[0], k=3)
    np.testing.assert_allclose(got[0], want, atol=1e-4)


def test_known_points_exact(rng):
    N, M = 40, 10
    original = rng.standard_normal((2, N, 3)).astype(np.float32)
    idx = np.stack([rng.permutation(N)[:M] for _ in range(2)]).astype(np.int32)
    vals = rng.standard_normal((2, M, 3)).astype(np.float32)
    got = np.asarray(knn_interpolate(jnp.asarray(vals), jnp.asarray(original),
                                     jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_array_equal(got[b][idx[b]], vals[b])


def test_k_clamped_to_m(rng):
    # fewer coarse points than k must not crash (reference k=min(3, M))
    original = rng.standard_normal((1, 10, 3)).astype(np.float32)
    idx = np.array([[0, 5]], dtype=np.int32)
    vals = rng.standard_normal((1, 2, 3)).astype(np.float32)
    out = np.asarray(knn_interpolate(jnp.asarray(vals), jnp.asarray(original),
                                     jnp.asarray(idx), k=3))
    assert out.shape == (1, 10, 3)
    assert np.isfinite(out).all()
