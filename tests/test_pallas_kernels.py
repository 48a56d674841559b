"""Pallas kernels vs their jnp oracles (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_style_transfer_tpu.ops import knn, min_sq_dist
from pointcloud_style_transfer_tpu.ops.pallas import (pallas_knn,
                                                      pallas_min_sq_dist)


@pytest.mark.parametrize("n,m", [(600, 300), (512, 2048), (1000, 100)])
def test_pallas_knn_matches_oracle(rng, n, m):
    q = rng.standard_normal((2, n, 3)).astype(np.float32) * 2
    r = rng.standard_normal((2, m, 3)).astype(np.float32) * 2
    d_p, i_p = pallas_knn(jnp.asarray(q), jnp.asarray(r), k=3, interpret=True,
                          exact=True)
    d_j, i_j = knn(jnp.asarray(q), jnp.asarray(r), k=3)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_j), atol=1e-3,
                               rtol=1e-4)
    # indices may differ only at (near-)ties: verify by distance equivalence
    d_p, i_p, i_j = np.asarray(d_p), np.asarray(i_p), np.asarray(i_j)
    for b in range(2):
        full = ((q[b][:, None, :] - r[b][None, :, :]) ** 2).sum(-1)
        got = np.take_along_axis(full, i_p[b], axis=1)
        want = np.take_along_axis(full, i_j[b], axis=1)
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


def test_pallas_knn_exact_tiny(rng):
    """On well-separated points indices must match exactly."""
    q = (rng.standard_normal((1, 64, 3)) * 10).astype(np.float32)
    r = (rng.standard_normal((1, 70, 3)) * 10).astype(np.float32)
    _, i_p = pallas_knn(jnp.asarray(q), jnp.asarray(r), k=3, interpret=True,
                        exact=True)
    _, i_j = knn(jnp.asarray(q), jnp.asarray(r), k=3)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_j))


def test_pallas_min_sq_dist_matches_oracle(rng):
    q = rng.standard_normal((1, 700, 3)).astype(np.float32)
    r = rng.standard_normal((1, 350, 3)).astype(np.float32)
    got = pallas_min_sq_dist(jnp.asarray(q), jnp.asarray(r), interpret=True)
    want = min_sq_dist(jnp.asarray(q), jnp.asarray(r))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4,
                               rtol=1e-4)


def test_pallas_knn_identity_self(rng):
    pts = (rng.standard_normal((1, 200, 3)) * 5).astype(np.float32)
    d, i = pallas_knn(jnp.asarray(pts), jnp.asarray(pts), k=1,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(d)[..., 0], 0.0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i)[0, :, 0], np.arange(200))


def test_pallas_knn_packed_matches_exact(rng):
    """Packed-key selection must agree with the exact kernel up to near-ties
    (distances within ~1% relative)."""
    q = rng.standard_normal((1, 700, 3)).astype(np.float32) * 3
    r = rng.standard_normal((1, 900, 3)).astype(np.float32) * 3
    d_p, i_p = pallas_knn(jnp.asarray(q), jnp.asarray(r), k=3,
                          interpret=True, exact=False)
    d_e, i_e = pallas_knn(jnp.asarray(q), jnp.asarray(r), k=3,
                          interpret=True, exact=True)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_e), rtol=0.01,
                               atol=1e-4)
    # ascending order
    d_p = np.asarray(d_p)
    assert (np.diff(d_p, axis=-1) >= -1e-6).all()


def test_pallas_knn_packed_well_separated_exact(rng):
    q = (rng.standard_normal((1, 64, 3)) * 10).astype(np.float32)
    r = (rng.standard_normal((1, 70, 3)) * 10).astype(np.float32)
    _, i_p = pallas_knn(jnp.asarray(q), jnp.asarray(r), k=3, interpret=True,
                        exact=False)
    from pointcloud_style_transfer_tpu.ops import knn
    _, i_j = knn(jnp.asarray(q), jnp.asarray(r), k=3)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_j))


def test_pallas_min_sq_dist_gradient_matches_jnp(rng):
    """Custom VJP through the Pallas row-min must match autodiff through the
    jnp oracle (Chamfer training gradient)."""
    import jax
    from pointcloud_style_transfer_tpu.ops.distance import min_sq_dist_jnp

    q = rng.standard_normal((2, 120, 3)).astype(np.float32)
    r = rng.standard_normal((2, 80, 3)).astype(np.float32)

    def loss_pallas(q, r):
        return jnp.mean(pallas_min_sq_dist(q, r, True))

    def loss_jnp(q, r):
        return jnp.mean(min_sq_dist_jnp(q, r))

    gq_p, gr_p = jax.grad(loss_pallas, argnums=(0, 1))(jnp.asarray(q),
                                                       jnp.asarray(r))
    gq_j, gr_j = jax.grad(loss_jnp, argnums=(0, 1))(jnp.asarray(q),
                                                    jnp.asarray(r))
    np.testing.assert_allclose(np.asarray(gq_p), np.asarray(gq_j), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gr_p), np.asarray(gr_j), atol=1e-4)


def test_pallas_min_sq_dist_value_unchanged_by_vjp(rng):
    q = rng.standard_normal((1, 200, 3)).astype(np.float32)
    r = rng.standard_normal((1, 90, 3)).astype(np.float32)
    got = pallas_min_sq_dist(jnp.asarray(q), jnp.asarray(r), True)
    from pointcloud_style_transfer_tpu.ops.distance import min_sq_dist_jnp
    want = min_sq_dist_jnp(jnp.asarray(q), jnp.asarray(r))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_pruned_knn_exact_vs_oracle(rng):
    """Bound-based pruning is sound: results must EXACTLY match brute force
    (up to index ties at exactly-equal distances)."""
    from pointcloud_style_transfer_tpu.ops.pallas.pruned_knn import \
        pallas_knn_pruned
    from pointcloud_style_transfer_tpu.ops import knn

    q = (rng.standard_normal((1, 1200, 3)) * 4).astype(np.float32)
    r = (rng.standard_normal((1, 900, 3)) * 4).astype(np.float32)
    d_p, i_p = pallas_knn_pruned(jnp.asarray(q), jnp.asarray(r), k=3,
                                 interpret=True)
    d_j, i_j = knn(jnp.asarray(q), jnp.asarray(r), k=3)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_j), atol=1e-4,
                               rtol=1e-5)
    # indices give the same distances (exact ties can permute)
    full = ((q[0][:, None, :] - r[0][None, :, :]) ** 2).sum(-1)
    got = np.take_along_axis(full, np.asarray(i_p)[0], axis=1)
    want = np.take_along_axis(full, np.asarray(i_j)[0], axis=1)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_pruned_knn_clustered_data(rng):
    """Clustered data (hard case for window-based bounds) stays exact."""
    from pointcloud_style_transfer_tpu.ops.pallas.pruned_knn import \
        pallas_knn_pruned
    from pointcloud_style_transfer_tpu.ops import knn

    centers = rng.uniform(-20, 20, (6, 3))
    q = np.concatenate([rng.normal(c, 0.5, (200, 3)) for c in centers])
    r = np.concatenate([rng.normal(c, 0.5, (120, 3)) for c in centers])
    q = q[None].astype(np.float32)
    r = r[None].astype(np.float32)
    d_p, _ = pallas_knn_pruned(jnp.asarray(q), jnp.asarray(r), k=3,
                               interpret=True)
    d_j, _ = knn(jnp.asarray(q), jnp.asarray(r), k=3)
    # atol reflects the ORACLE's matmul-expansion cancellation error at
    # offset clusters; the kernel's squared-difference form is more accurate
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_j), atol=5e-4,
                               rtol=1e-4)


def test_pallas_ball_query_matches_oracle(rng):
    from pointcloud_style_transfer_tpu.ops.pallas.distance_topk import \
        pallas_ball_query
    from pointcloud_style_transfer_tpu.ops.sampling import query_ball_point_jnp

    xyz = rng.standard_normal((2, 700, 3)).astype(np.float32)
    new_xyz = xyz[:, :50, :]
    got = np.asarray(pallas_ball_query(0.8, 8, jnp.asarray(xyz),
                                       jnp.asarray(new_xyz), interpret=True))
    want = np.asarray(query_ball_point_jnp(0.8, 8, jnp.asarray(xyz),
                                           jnp.asarray(new_xyz)))
    np.testing.assert_array_equal(got, want)


def test_pallas_ball_query_sparse_radius(rng):
    """Tiny radius: most slots backfill with the center's own index."""
    from pointcloud_style_transfer_tpu.ops.pallas.distance_topk import \
        pallas_ball_query
    from pointcloud_style_transfer_tpu.ops.sampling import query_ball_point_jnp

    xyz = (rng.standard_normal((1, 300, 3)) * 5).astype(np.float32)
    got = np.asarray(pallas_ball_query(0.05, 4, jnp.asarray(xyz),
                                       jnp.asarray(xyz), interpret=True))
    want = np.asarray(query_ball_point_jnp(0.05, 4, jnp.asarray(xyz),
                                           jnp.asarray(xyz)))
    np.testing.assert_array_equal(got, want)


def test_pallas_ball_query_multi_tile(rng):
    """Cross-tile merge: candidates from later ref tiles must append after
    earlier tiles' (smaller) indices, never displace or be dropped."""
    from pointcloud_style_transfer_tpu.ops.pallas.distance_topk import \
        _ballquery_single
    from pointcloud_style_transfer_tpu.ops.sampling import query_ball_point_jnp

    xyz = rng.standard_normal((700, 3)).astype(np.float32)
    new_xyz = xyz[:40]
    got = np.asarray(_ballquery_single(
        jnp.asarray(new_xyz), jnp.asarray(xyz), radius=0.9, nsample=8,
        tq=64, tr=128, interpret=True))
    want = np.asarray(query_ball_point_jnp(
        0.9, 8, jnp.asarray(xyz)[None], jnp.asarray(new_xyz)[None]))[0]
    np.testing.assert_array_equal(got, want)


def test_pallas_fps_matches_scan_oracle(rng):
    import jax
    from pointcloud_style_transfer_tpu.ops.pallas.fps import \
        pallas_farthest_point_sample
    from pointcloud_style_transfer_tpu.ops.sampling import \
        farthest_point_sample_jnp

    xyz = rng.standard_normal((2, 300, 3)).astype(np.float32)
    key = jax.random.PRNGKey(4)
    got = np.asarray(pallas_farthest_point_sample(jnp.asarray(xyz), 24, key,
                                                  interpret=True))
    want = np.asarray(farthest_point_sample_jnp(jnp.asarray(xyz), 24, key))
    np.testing.assert_array_equal(got, want)


def test_pallas_fps_unpadded_exact_multiple(rng):
    import jax
    from pointcloud_style_transfer_tpu.ops.pallas.fps import \
        pallas_farthest_point_sample
    from pointcloud_style_transfer_tpu.ops.sampling import \
        farthest_point_sample_jnp

    # N = 1024 = 8 * 128: no padding path
    xyz = rng.standard_normal((1, 1024, 3)).astype(np.float32)
    key = jax.random.PRNGKey(7)
    got = np.asarray(pallas_farthest_point_sample(jnp.asarray(xyz), 64, key,
                                                  interpret=True))
    want = np.asarray(farthest_point_sample_jnp(jnp.asarray(xyz), 64, key))
    np.testing.assert_array_equal(got, want)


def test_pallas_knn_f32packed_close_to_exact(rng):
    from pointcloud_style_transfer_tpu.ops.pallas.distance_topk import \
        pallas_knn_f32packed

    q = rng.standard_normal((1, 700, 3)).astype(np.float32) * 3
    r = rng.standard_normal((1, 600, 3)).astype(np.float32) * 3
    d_p, i_p = pallas_knn_f32packed(jnp.asarray(q), jnp.asarray(r), k=3,
                                    interpret=True)
    d_e, i_e = pallas_knn(jnp.asarray(q), jnp.asarray(r), k=3, interpret=True)
    d_p, d_e = np.asarray(d_p), np.asarray(d_e)
    rel = np.abs(d_p - d_e) / (np.abs(d_e) + 1e-6)
    assert (rel > 0.005).mean() < 0.01, (rel > 0.005).mean()
    assert (np.diff(d_p, axis=-1) >= -1e-6).all()  # ascending


def test_pallas_knn_f32packed_exact_duplicates(rng):
    """Zero-distance pairs (exact duplicates — preprocessing repeat-upsamples
    with replacement) must select the coincident ref: the packed key for
    dist=0 is biased out of the denormal range so TPU flush-to-zero cannot
    collapse its index bits."""
    from pointcloud_style_transfer_tpu.ops.pallas.distance_topk import \
        pallas_knn_f32packed

    r = (rng.standard_normal((1, 300, 3)) * 5).astype(np.float32)
    # queries 10..19 coincide exactly with refs 200..209
    q = (rng.standard_normal((1, 64, 3)) * 5).astype(np.float32)
    q[0, 10:20] = r[0, 200:210]
    d, i = pallas_knn_f32packed(jnp.asarray(q), jnp.asarray(r), k=3,
                                interpret=True)
    d, i = np.asarray(d), np.asarray(i)
    np.testing.assert_array_equal(i[0, 10:20, 0], np.arange(200, 210))
    np.testing.assert_allclose(d[0, 10:20, 0], 0.0, atol=0.0)
