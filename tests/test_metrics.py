import jax.numpy as jnp
import numpy as np

from pointcloud_style_transfer_tpu.evaluation import (
    chamfer_distance, coverage_score, earth_mover_distance,
    earth_mover_distance_greedy, fidelity_score, hausdorff_distance,
    precision_recall_f1, uniformity_score)


def naive_l2(a, b):
    return np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)


def test_chamfer_eval_definition(rng):
    a = rng.standard_normal((2, 30, 3)).astype(np.float32)
    b = rng.standard_normal((2, 40, 3)).astype(np.float32)
    got = np.asarray(chamfer_distance(jnp.asarray(a), jnp.asarray(b)))
    for i in range(2):
        d = naive_l2(a[i], b[i])
        want = (d.min(1).mean() + d.min(0).mean()) / 2
        np.testing.assert_allclose(got[i], want, rtol=1e-4)
    one_way = np.asarray(chamfer_distance(jnp.asarray(a), jnp.asarray(b),
                                          bidirectional=False))
    for i in range(2):
        np.testing.assert_allclose(one_way[i],
                                   naive_l2(a[i], b[i]).min(1).mean(),
                                   rtol=1e-4)


def test_hausdorff(rng):
    a = rng.standard_normal((1, 25, 3)).astype(np.float32)
    b = rng.standard_normal((1, 35, 3)).astype(np.float32)
    got = float(hausdorff_distance(jnp.asarray(a), jnp.asarray(b))[0])
    d = naive_l2(a[0], b[0])
    want = max(d.min(1).max(), d.min(0).max())
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_coverage(rng):
    a = rng.standard_normal((1, 50, 3)).astype(np.float32)
    got = float(coverage_score(jnp.asarray(a), jnp.asarray(a),
                               threshold=0.01))
    assert got == 1.0  # identical clouds fully covered
    far = a + 100.0
    got2 = float(coverage_score(jnp.asarray(a), jnp.asarray(far),
                                threshold=0.01))
    assert got2 == 0.0


def test_uniformity_grid_vs_clustered(rng):
    # regular grid is more uniform than a clustered cloud
    g = np.stack(np.meshgrid(np.arange(5), np.arange(5), np.arange(5)),
                 -1).reshape(1, -1, 3).astype(np.float32)
    clustered = np.concatenate([
        rng.normal(0, 0.01, (1, 62, 3)), rng.normal(5, 1.0, (1, 63, 3))],
        axis=1).astype(np.float32)
    u_grid = float(uniformity_score(jnp.asarray(g)))
    u_clus = float(uniformity_score(jnp.asarray(clustered)))
    assert u_grid > u_clus
    assert 0 <= u_clus <= u_grid <= 1.0


def test_fidelity(rng):
    a = rng.standard_normal((2, 40, 3)).astype(np.float32)
    assert fidelity_score(jnp.asarray(a), jnp.asarray(a)) > 0.999
    # a strongly shifted cloud has lower stat-feature similarity
    shifted = a + np.array([50.0, -50.0, 0.0], np.float32)
    assert fidelity_score(jnp.asarray(a), jnp.asarray(shifted)) < 0.5


def test_emd_greedy_identity(rng):
    a = rng.standard_normal((1, 20, 3)).astype(np.float32)
    np.testing.assert_allclose(earth_mover_distance_greedy(a, a), 0.0,
                               atol=1e-6)


def test_emd_sinkhorn_close_to_greedy_on_permutation(rng):
    """On a permuted copy the true EMD is 0; Sinkhorn should be near 0 and
    the greedy matcher exactly 0 for well-separated points."""
    a = (rng.standard_normal((1, 16, 3)) * 5).astype(np.float32)
    perm = rng.permutation(16)
    b = a[:, perm]
    greedy = earth_mover_distance_greedy(a, b)
    sink = np.asarray(earth_mover_distance(jnp.asarray(a), jnp.asarray(b),
                                           epsilon=0.005, num_iters=200))
    np.testing.assert_allclose(greedy, 0.0, atol=1e-5)
    assert sink[0] < 0.2  # entropic blur keeps it small but nonzero


def test_emd_sinkhorn_scales_with_offset(rng):
    a = rng.standard_normal((1, 32, 3)).astype(np.float32)
    b = a + np.array([1.0, 0, 0], np.float32)
    sink = float(earth_mover_distance(jnp.asarray(a), jnp.asarray(b),
                                      epsilon=0.01, num_iters=200)[0])
    # pure translation: EMD == 1.0
    np.testing.assert_allclose(sink, 1.0, rtol=0.1)


def test_precision_recall_f1(rng):
    a = rng.standard_normal((1, 40, 3)).astype(np.float32)
    p, r, f1 = precision_recall_f1(jnp.asarray(a), jnp.asarray(a),
                                   threshold=0.01)
    assert float(p) == 1.0 and float(r) == 1.0
    assert abs(float(f1) - 1.0) < 1e-5
    b = a + 100
    p, r, f1 = precision_recall_f1(jnp.asarray(a), jnp.asarray(b),
                                   threshold=0.2)
    assert float(f1) == 0.0


def test_emd_subsampling_guard(rng):
    """Clouds above max_points are subsampled (no dense 120k cost matrix)."""
    a = rng.standard_normal((1, 5000, 3)).astype(np.float32)
    b = (a + np.array([0.5, 0, 0], np.float32))
    v = float(earth_mover_distance(jnp.asarray(a), jnp.asarray(b),
                                   max_points=512, num_iters=100)[0])
    # translation by 0.5: subsampled Sinkhorn should land near 0.5
    assert 0.3 < v < 0.8, v
