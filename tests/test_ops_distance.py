import jax.numpy as jnp
import numpy as np

from pointcloud_style_transfer_tpu.ops import (chamfer_distance,
                                               chamfer_distance_l2, knn,
                                               min_sq_dist, square_distance)


def naive_sqdist(a, b):
    return ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)


def test_square_distance_matches_naive(rng):
    a = rng.standard_normal((2, 17, 3)).astype(np.float32)
    b = rng.standard_normal((2, 23, 3)).astype(np.float32)
    got = np.asarray(square_distance(jnp.asarray(a), jnp.asarray(b)))
    want = np.stack([naive_sqdist(a[i], b[i]) for i in range(2)])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_min_sq_dist_chunked_nondivisible(rng):
    # N not a multiple of chunk_size exercises the padding path
    a = rng.standard_normal((3, 101, 3)).astype(np.float32)
    b = rng.standard_normal((3, 57, 3)).astype(np.float32)
    got = np.asarray(min_sq_dist(jnp.asarray(a), jnp.asarray(b), chunk_size=32))
    want = np.stack([naive_sqdist(a[i], b[i]).min(-1) for i in range(3)])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_chamfer_distance_matches_naive(rng):
    a = rng.standard_normal((2, 40, 3)).astype(np.float32)
    b = rng.standard_normal((2, 64, 3)).astype(np.float32)
    got = np.asarray(chamfer_distance(jnp.asarray(a), jnp.asarray(b),
                                      chunk_size=16))
    want = []
    for i in range(2):
        d = naive_sqdist(a[i], b[i])
        want.append(d.min(1).mean() + d.min(0).mean())
    np.testing.assert_allclose(got, np.array(want), rtol=1e-4)


def test_chamfer_l2_eval_flavour(rng):
    # eval metric: unsquared L2, averaged over directions, /2
    a = rng.standard_normal((1, 30, 3)).astype(np.float32)
    b = rng.standard_normal((1, 50, 3)).astype(np.float32)
    got = float(chamfer_distance_l2(jnp.asarray(a), jnp.asarray(b))[0])
    d = np.sqrt(naive_sqdist(a[0], b[0]))
    want = (d.min(1).mean() + d.min(0).mean()) / 2
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_chamfer_zero_for_identical(rng):
    a = rng.standard_normal((2, 33, 3)).astype(np.float32)
    got = np.asarray(chamfer_distance(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(got, np.zeros(2), atol=1e-5)


def test_knn_matches_naive(rng):
    q = rng.standard_normal((2, 45, 3)).astype(np.float32)
    r = rng.standard_normal((2, 29, 3)).astype(np.float32)
    d, idx = knn(jnp.asarray(q), jnp.asarray(r), k=3, chunk_size=16)
    d, idx = np.asarray(d), np.asarray(idx)
    for b in range(2):
        full = naive_sqdist(q[b], r[b])
        want_idx = np.argsort(full, axis=1)[:, :3]
        want_d = np.take_along_axis(full, want_idx, axis=1)
        np.testing.assert_allclose(np.sort(d[b], -1), np.sort(want_d, -1),
                                   atol=1e-4)
        # indices give the same distances (ties can permute indices)
        np.testing.assert_allclose(
            np.take_along_axis(full, idx[b], axis=1), want_d, atol=1e-4)
