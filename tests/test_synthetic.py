"""Tests for the structured synthetic LiDAR scene generator."""

import numpy as np

from pointcloud_style_transfer_tpu.data.synthetic import (SENSOR_HEIGHT,
                                                          lidar_scene_pair)


def test_pair_shapes_and_determinism():
    sim1, real1 = lidar_scene_pair(np.random.default_rng(7), 5000)
    sim2, real2 = lidar_scene_pair(np.random.default_rng(7), 5000)
    assert sim1.shape == (5000, 3) and sim1.dtype == np.float32
    assert real1.shape[1] == 3 and real1.dtype == np.float32
    assert 0 < len(real1) <= 5000
    np.testing.assert_array_equal(sim1, sim2)
    np.testing.assert_array_equal(real1, real2)


def test_real_style_has_scan_line_structure():
    """The 'real' cloud must lie on discrete beam-elevation rings around the
    sensor (the LiDAR sweep style); the 'sim' cloud must not."""
    sim, real = lidar_scene_pair(np.random.default_rng(3), 8000)
    sensor = np.array([0.0, 0.0, SENSOR_HEIGHT], np.float32)

    def n_rings(pts):
        rel = pts - sensor
        elev = np.arcsin(rel[:, 2] / (np.linalg.norm(rel, axis=1) + 1e-9))
        return len(np.unique(np.round(elev, 3)))

    assert n_rings(real) <= 48  # beam count bound
    assert n_rings(sim) > 100  # continuous elevations


def test_pair_shares_scene_content():
    """Same scene layout in both styles: coarse occupancy must overlap far
    more within a pair than across independent pairs."""
    rng = np.random.default_rng(11)
    sim_a, real_a = lidar_scene_pair(rng, 8000)
    sim_b, _ = lidar_scene_pair(rng, 8000)

    def occ(pts):
        # above-ground structure only: the ground plane occupies every
        # coarse cell in every scene and would wash out the comparison
        pts = pts[pts[:, 2] > 0.8]
        cells = np.floor(pts[:, :2] / 4.0).astype(int)
        return set(map(tuple, cells))

    within = len(occ(sim_a) & occ(real_a)) / len(occ(sim_a) | occ(real_a))
    across = len(occ(sim_a) & occ(sim_b)) / len(occ(sim_a) | occ(sim_b))
    assert within > across
