import numpy as np

from pointcloud_style_transfer_tpu.data import augment_points


def test_augment_shapes_and_determinism(rng, key):
    pts = rng.standard_normal((2, 64, 3)).astype(np.float32)
    a1 = np.asarray(augment_points(pts, key))
    a2 = np.asarray(augment_points(pts, key))
    np.testing.assert_array_equal(a1, a2)
    assert a1.shape == (2, 64, 3)


def test_rotation_preserves_z_and_norms(rng, key):
    pts = rng.standard_normal((1, 128, 3)).astype(np.float32)
    out = np.asarray(augment_points(pts, key, jitter_std=0.0,
                                    scale_min=1.0, scale_max=1.0))
    # pure Z-rotation: z unchanged, xy norms preserved
    np.testing.assert_allclose(out[0, :, 2], pts[0, :, 2], atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(out[0, :, :2], axis=1),
                               np.linalg.norm(pts[0, :, :2], axis=1),
                               atol=1e-4)


def test_scale_bounds(rng, key):
    pts = np.ones((1, 16, 3), np.float32)
    out = np.asarray(augment_points(pts, key, rotation_range=0.0,
                                    jitter_std=0.0, scale_min=0.5,
                                    scale_max=0.6))
    ratio = out / pts
    assert (ratio >= 0.5 - 1e-5).all() and (ratio <= 0.6 + 1e-5).all()
    # isotropic: one scale per batch element
    assert np.allclose(ratio, ratio[0, 0, 0])


def test_shuffle_permutes(rng, key):
    pts = rng.standard_normal((1, 64, 3)).astype(np.float32)
    out = np.asarray(augment_points(pts, key, rotation_range=0.0,
                                    jitter_std=0.0, scale_min=1.0,
                                    scale_max=1.0, shuffle=True))
    assert not np.array_equal(out, pts)
    np.testing.assert_allclose(np.sort(out.ravel()), np.sort(pts.ravel()),
                               atol=1e-6)
