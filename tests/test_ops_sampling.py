import jax.numpy as jnp
import numpy as np

from pointcloud_style_transfer_tpu.ops import (farthest_point_sample,
                                               index_points, query_ball_point)


def test_index_points_gather(rng):
    pts = rng.standard_normal((2, 10, 3)).astype(np.float32)
    idx = rng.integers(0, 10, size=(2, 4)).astype(np.int32)
    got = np.asarray(index_points(jnp.asarray(pts), jnp.asarray(idx)))
    want = np.stack([pts[b][idx[b]] for b in range(2)])
    np.testing.assert_array_equal(got, want)


def test_index_points_clamps_out_of_range(rng):
    pts = rng.standard_normal((1, 5, 3)).astype(np.float32)
    idx = np.array([[7, -2]], dtype=np.int32)
    got = np.asarray(index_points(jnp.asarray(pts), jnp.asarray(idx)))
    np.testing.assert_array_equal(got[0, 0], pts[0, 4])
    np.testing.assert_array_equal(got[0, 1], pts[0, 0])


def test_index_points_nested_idx(rng):
    pts = rng.standard_normal((2, 12, 4)).astype(np.float32)
    idx = rng.integers(0, 12, size=(2, 5, 3)).astype(np.int32)
    got = np.asarray(index_points(jnp.asarray(pts), jnp.asarray(idx)))
    assert got.shape == (2, 5, 3, 4)
    want = np.stack([pts[b][idx[b]] for b in range(2)])
    np.testing.assert_array_equal(got, want)


def naive_fps(xyz, npoint, start):
    N = xyz.shape[0]
    distance = np.full(N, 1e10)
    farthest = start
    out = []
    for _ in range(npoint):
        out.append(farthest)
        d = ((xyz - xyz[farthest]) ** 2).sum(-1)
        distance = np.minimum(distance, d)
        farthest = int(np.argmax(distance))
    return np.array(out)


def test_fps_matches_naive_given_same_start(rng, key):
    xyz = rng.standard_normal((2, 64, 3)).astype(np.float32)
    got = np.asarray(farthest_point_sample(jnp.asarray(xyz), 16, key))
    assert got.shape == (2, 16)
    for b in range(2):
        want = naive_fps(xyz[b], 16, int(got[b, 0]))
        np.testing.assert_array_equal(got[b], want)


def test_fps_indices_unique(rng, key):
    xyz = rng.standard_normal((1, 100, 3)).astype(np.float32)
    got = np.asarray(farthest_point_sample(jnp.asarray(xyz), 32, key))[0]
    assert len(set(got.tolist())) == 32


def naive_ball_query(radius, nsample, xyz, new_xyz):
    N = xyz.shape[0]
    S = new_xyz.shape[0]
    out = np.zeros((S, nsample), dtype=np.int64)
    for s in range(S):
        d = ((xyz - new_xyz[s]) ** 2).sum(-1)
        ids = np.where(d <= radius**2)[0]
        # reference keeps the nsample lowest-index in-radius points,
        # backfilling with the first in-radius index
        row = np.full(nsample, N, dtype=np.int64)
        take = ids[:nsample]
        row[:len(take)] = take
        if len(take) > 0:
            row[row == N] = take[0]
        out[s] = row
    return out


def test_ball_query_matches_reference_semantics(rng):
    xyz = rng.standard_normal((2, 50, 3)).astype(np.float32)
    new_xyz = xyz[:, :7, :]
    got = np.asarray(query_ball_point(0.8, 8, jnp.asarray(xyz),
                                      jnp.asarray(new_xyz)))
    for b in range(2):
        want = naive_ball_query(0.8, 8, xyz[b], new_xyz[b])
        np.testing.assert_array_equal(got[b], want)


def test_ball_query_self_always_included(rng):
    xyz = rng.standard_normal((1, 30, 3)).astype(np.float32)
    got = np.asarray(query_ball_point(0.1, 4, jnp.asarray(xyz),
                                      jnp.asarray(xyz)))
    # every center is within radius 0.1 of itself -> its own index must appear
    for s in range(30):
        assert s in got[0, s]


def test_complement_indices(rng):
    from pointcloud_style_transfer_tpu.ops import complement_indices
    idx = np.stack([rng.permutation(20)[:8] for _ in range(2)]).astype(np.int32)
    comp = np.asarray(complement_indices(jnp.asarray(idx), 20))
    assert comp.shape == (2, 12)
    for b in range(2):
        want = sorted(set(range(20)) - set(idx[b].tolist()))
        np.testing.assert_array_equal(comp[b], want)
