"""Grid kNN vs the brute-force jnp oracle (interpret-mode kernels on CPU).

The grid path must be *distance-exact* for every query: the covered-box
margin check (ball(q, sqrt(d_k)) inside the candidate-covered region) plus
the brute-force fallback guarantee it. Index choice may differ from the
oracle only at exactly-equal distances, so equivalence is asserted through
distances and index realization."""

import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_style_transfer_tpu.ops import knn
from pointcloud_style_transfer_tpu.ops.grid_knn import grid_knn


def _assert_knn_equiv(q, r, d_g, i_g, d_j, i_j):
    d_g, i_g = np.asarray(d_g), np.asarray(i_g)
    d_j = np.asarray(d_j)
    np.testing.assert_allclose(d_g, d_j, atol=1e-5, rtol=1e-5)
    # chosen indices must realise the reported (oracle-matching) distances
    for b in range(q.shape[0]):
        sel = r[b][i_g[b]]  # [N, k, 3]
        d_chk = ((q[b][:, None, :] - sel) ** 2).sum(-1)
        np.testing.assert_allclose(d_chk, d_g[b], atol=1e-5, rtol=1e-5)
    assert (np.diff(d_g, axis=-1) >= -1e-6).all(), "not ascending"


@pytest.mark.parametrize("nq,m", [(4096, 1024), (2000, 531), (300, 1000)])
def test_grid_knn_matches_oracle_gaussian(rng, nq, m):
    q = rng.standard_normal((1, nq, 3)).astype(np.float32) * 2
    r = rng.standard_normal((1, m, 3)).astype(np.float32) * 2
    d_g, i_g = grid_knn(jnp.asarray(q), jnp.asarray(r), k=3, interpret=True,
                        grid_shape=(4, 4, 5))
    d_j, i_j = knn(jnp.asarray(q), jnp.asarray(r), k=3)
    _assert_knn_equiv(q, r, d_g, i_g, d_j, i_j)


def test_grid_knn_surface_cloud(rng):
    """Surface-like geometry (sphere shell): occupancy is sparse and highly
    anisotropic — the regime where per-cell densities vary most."""
    v = rng.standard_normal((1, 6000, 3)).astype(np.float32)
    pts = v / np.linalg.norm(v, axis=-1, keepdims=True)
    pts += rng.standard_normal(pts.shape).astype(np.float32) * 0.01
    ridx = rng.choice(6000, 1500, replace=False)
    r = pts[:, ridx]
    d_g, i_g = grid_knn(jnp.asarray(pts), jnp.asarray(r), k=3, interpret=True,
                        grid_shape=(4, 4, 5))
    d_j, i_j = knn(jnp.asarray(pts), jnp.asarray(r), k=3)
    _assert_knn_equiv(pts, r, d_g, i_g, d_j, i_j)


def test_grid_knn_subset_refs_like_sampler(rng):
    """The sampler's exact shape of use: refs are a subset of the query cloud
    (voxel-downsample indices), queries include exact duplicates."""
    from pointcloud_style_transfer_tpu.ops import voxel_downsample
    import jax

    pts = rng.standard_normal((1, 8192, 3)).astype(np.float32)
    pts[0, 100:110] = pts[0, 50:60]  # exact duplicates
    _, idx = voxel_downsample(jnp.asarray(pts), 2048, jax.random.PRNGKey(0))
    r = np.asarray(jnp.take_along_axis(jnp.asarray(pts), np.asarray(idx)[..., None], axis=1))
    d_g, i_g = grid_knn(jnp.asarray(pts), jnp.asarray(r), k=3, interpret=True,
                        grid_shape=(4, 4, 5))
    d_j, i_j = knn(jnp.asarray(pts), jnp.asarray(r), k=3)
    _assert_knn_equiv(pts, r, d_g, i_g, d_j, i_j)


def test_grid_knn_queries_outside_ref_bbox(rng):
    q = rng.standard_normal((1, 1024, 3)).astype(np.float32) * 4  # wider
    r = rng.standard_normal((1, 512, 3)).astype(np.float32)  # narrower bbox
    d_g, i_g = grid_knn(jnp.asarray(q), jnp.asarray(r), k=3, interpret=True,
                        grid_shape=(4, 4, 5))
    d_j, i_j = knn(jnp.asarray(q), jnp.asarray(r), k=3)
    _assert_knn_equiv(q, r, d_g, i_g, d_j, i_j)


def test_grid_knn_clustered_fallback_path(rng):
    """Hot cells exceeding slot_cap force the unsafe-tile fallback; with a
    tiny fallback_cap the whole-call brute branch must also be exact."""
    # one tight cluster (overflows its cell) + uniform background
    cluster = rng.standard_normal((1, 800, 3)).astype(np.float32) * 0.01
    bg = rng.standard_normal((1, 800, 3)).astype(np.float32) * 3
    r = np.concatenate([cluster, bg], axis=1)
    q = np.concatenate([cluster + 0.001, bg], axis=1)
    for cap in (4096, 16):  # patched path, then all-brute path
        d_g, i_g = grid_knn(jnp.asarray(q), jnp.asarray(r), k=3,
                            fallback_cap=cap, slot_cap=128, interpret=True,
                            grid_shape=(4, 4, 5))
        d_j, i_j = knn(jnp.asarray(q), jnp.asarray(r), k=3)
        _assert_knn_equiv(q, r, d_g, i_g, d_j, i_j)


def test_grid_knn_batched(rng):
    q = rng.standard_normal((3, 1500, 3)).astype(np.float32)
    r = rng.standard_normal((3, 600, 3)).astype(np.float32)
    d_g, i_g = grid_knn(jnp.asarray(q), jnp.asarray(r), k=3, interpret=True,
                        grid_shape=(4, 4, 5))
    d_j, i_j = knn(jnp.asarray(q), jnp.asarray(r), k=3)
    assert d_g.shape == (3, 1500, 3)
    _assert_knn_equiv(q, r, d_g, i_g, d_j, i_j)


def test_grid_knn_tiny_ref_set(rng):
    q = rng.standard_normal((1, 200, 3)).astype(np.float32)
    r = rng.standard_normal((1, 5, 3)).astype(np.float32)
    d_g, i_g = grid_knn(jnp.asarray(q), jnp.asarray(r), k=3, interpret=True,
                        grid_shape=(4, 4, 5))
    d_j, i_j = knn(jnp.asarray(q), jnp.asarray(r), k=3)
    _assert_knn_equiv(q, r, d_g, i_g, d_j, i_j)


def test_grid_knn_default_grid_shape(rng):
    """Large enough ref set to engage the default (12,12,20) grid."""
    q = rng.standard_normal((1, 20000, 3)).astype(np.float32) * 2
    r = rng.standard_normal((1, 12000, 3)).astype(np.float32) * 2
    d_g, i_g = grid_knn(jnp.asarray(q), jnp.asarray(r), k=3, interpret=True)
    d_j, i_j = knn(jnp.asarray(q), jnp.asarray(r), k=3)
    _assert_knn_equiv(q, r, d_g, i_g, d_j, i_j)


def _oracle_interp(q, r, v, k=3, eps=1e-8):
    d_j, i_j = knn(jnp.asarray(q), jnp.asarray(r), k=k)
    d_j, i_j = np.asarray(d_j), np.asarray(i_j)
    w = 1.0 / (np.sqrt(np.maximum(d_j, 0.0)) + eps)
    w = w / w.sum(-1, keepdims=True)
    out = np.empty((q.shape[0], q.shape[1], v.shape[2]), np.float32)
    for b in range(q.shape[0]):
        out[b] = (v[b][i_j[b]] * w[b][..., None]).sum(1)
    return out


@pytest.mark.parametrize("nq,m", [(4096, 1024), (300, 1000)])
def test_grid_interpolate_matches_oracle(rng, nq, m):
    from pointcloud_style_transfer_tpu.ops.grid_knn import grid_knn_interpolate
    q = rng.standard_normal((1, nq, 3)).astype(np.float32) * 2
    r = rng.standard_normal((1, m, 3)).astype(np.float32) * 2
    v = rng.standard_normal((1, m, 3)).astype(np.float32)
    got = grid_knn_interpolate(jnp.asarray(q), jnp.asarray(r),
                               jnp.asarray(v), k=3, interpret=True,
                               grid_shape=(4, 4, 5))
    # selection is exact; the only deviation is float-level: the kernel's
    # cancellation-free squared-difference distances feed the weights,
    # the oracle's HIGHEST-precision einsum distances differ in the last
    # ulps, and near-equidistant neighbours amplify that into ~1e-4
    np.testing.assert_allclose(np.asarray(got), _oracle_interp(q, r, v),
                               atol=2e-4, rtol=2e-4)


def test_grid_interpolate_fallback_paths(rng):
    """Clustered queries force margin failures into every fallback tier."""
    from pointcloud_style_transfer_tpu.ops.grid_knn import grid_knn_interpolate
    r = rng.standard_normal((1, 800, 3)).astype(np.float32)
    cluster = rng.standard_normal((1, 1000, 3)).astype(np.float32) * 0.01
    bg = rng.standard_normal((1, 1048, 3)).astype(np.float32) * 3
    q = np.concatenate([cluster + 0.001, bg], axis=1)
    v = rng.standard_normal((1, 800, 3)).astype(np.float32)
    for cap in (2048, 16):  # patched tiers, then all-brute
        got = grid_knn_interpolate(jnp.asarray(q), jnp.asarray(r),
                                   jnp.asarray(v), k=3, fallback_cap=cap,
                                   interpret=True, grid_shape=(4, 4, 5))
        np.testing.assert_allclose(np.asarray(got), _oracle_interp(q, r, v),
                                   atol=2e-4, rtol=2e-4)


def test_grid_interpolate_layout_composes_exactly(rng):
    """The layout-order variant, re-permuted by its qid map, must be
    BIT-IDENTICAL to grid_knn_interpolate (same kernel pass, same fallback
    ladder; only the output order differs)."""
    from pointcloud_style_transfer_tpu.ops.grid_knn import (
        grid_knn_interpolate, grid_knn_interpolate_layout)
    for nq, m, cap in ((4096, 1024, 4096), (2048, 1024, 64)):
        q = rng.standard_normal((nq, 3)).astype(np.float32) * 2
        r = rng.standard_normal((m, 3)).astype(np.float32) * 2
        v = rng.standard_normal((m, 3)).astype(np.float32)
        ref_out = grid_knn_interpolate(
            jnp.asarray(q)[None], jnp.asarray(r)[None], jnp.asarray(v)[None],
            k=3, interpret=True, grid_shape=(4, 4, 5), fallback_cap=cap)[0]
        v_lay, qid = grid_knn_interpolate_layout(
            jnp.asarray(q), jnp.asarray(r), jnp.asarray(v),
            k=3, interpret=True, grid_shape=(4, 4, 5), fallback_cap=cap)
        v_lay, qid = np.asarray(v_lay), np.asarray(qid)
        # every real query id appears exactly once; pads carry Nq
        real = qid < nq
        assert np.sort(qid[real]).tolist() == list(range(nq))
        assembled = np.zeros((nq, 3), np.float32)
        assembled[qid[real]] = v_lay[real]
        np.testing.assert_array_equal(assembled, np.asarray(ref_out))


def test_grid_interpolate_layout_tiny_ref_fallback(rng):
    """Degenerate ref sizes route to brute with an identity qid map."""
    from pointcloud_style_transfer_tpu.ops.grid_knn import (
        grid_knn_interpolate, grid_knn_interpolate_layout)
    q = rng.standard_normal((200, 3)).astype(np.float32)
    r = rng.standard_normal((30, 3)).astype(np.float32)
    v = rng.standard_normal((30, 3)).astype(np.float32)
    v_lay, qid = grid_knn_interpolate_layout(
        jnp.asarray(q), jnp.asarray(r), jnp.asarray(v), k=3, interpret=True)
    assert np.asarray(qid).tolist() == list(range(200))
    ref_out = grid_knn_interpolate(jnp.asarray(q)[None], jnp.asarray(r)[None],
                                   jnp.asarray(v)[None], k=3, interpret=True)
    np.testing.assert_array_equal(np.asarray(v_lay), np.asarray(ref_out)[0])


def test_grid_interpolate_batched_and_tiny(rng):
    from pointcloud_style_transfer_tpu.ops.grid_knn import grid_knn_interpolate
    q = rng.standard_normal((2, 900, 3)).astype(np.float32)
    r = rng.standard_normal((2, 500, 3)).astype(np.float32)
    v = rng.standard_normal((2, 500, 5)).astype(np.float32)
    got = grid_knn_interpolate(jnp.asarray(q), jnp.asarray(r),
                               jnp.asarray(v), k=3, interpret=True,
                               grid_shape=(4, 4, 5))
    assert got.shape == (2, 900, 5)
    np.testing.assert_allclose(np.asarray(got), _oracle_interp(q, r, v),
                               atol=2e-4, rtol=2e-4)
    # tiny ref set -> brute-interp path
    r2 = rng.standard_normal((1, 6, 3)).astype(np.float32)
    v2 = rng.standard_normal((1, 6, 2)).astype(np.float32)
    q2 = rng.standard_normal((1, 100, 3)).astype(np.float32)
    got2 = grid_knn_interpolate(jnp.asarray(q2), jnp.asarray(r2),
                                jnp.asarray(v2), k=3, interpret=True,
                                grid_shape=(4, 4, 5))
    np.testing.assert_allclose(np.asarray(got2),
                               _oracle_interp(q2, r2, v2), atol=2e-5,
                               rtol=2e-5)


def test_query_pass_expanded_halo(rng):
    """_query_pass(xy_halo=2) is a library facility (not on the sampler's
    hot path — measured slower in context, see PERF_NOTES): its slot
    construction and widened margins must still give oracle-exact results
    with a much lower unsafe rate than xy_halo=1."""
    import importlib
    G = importlib.import_module("pointcloud_style_transfer_tpu.ops.grid_knn")
    import jax

    q = rng.standard_normal((3000, 3)).astype(np.float32) * 2
    r = rng.standard_normal((1200, 3)).astype(np.float32) * 2
    gs = (4, 4, 5)
    struct = jax.jit(lambda r: G._build_struct(r, gs))(jnp.asarray(r))
    out = {}
    # int = symmetric halo; tuples exercise the asymmetric (Hx, Hy) support
    # (round 4: y-only widening was the probe-suggested candidate)
    for halo in (1, 2, (1, 2), (2, 1)):
        d_g, i_g, unsafe = G._query_pass(struct, jnp.asarray(q), 3, gs, 64,
                                         256, True, 2, halo)
        out[halo] = int(np.asarray(unsafe).sum())
        d_j, i_j = knn(jnp.asarray(q)[None], jnp.asarray(r)[None], k=3)
        safe = ~np.asarray(unsafe)
        np.testing.assert_allclose(np.asarray(d_g)[safe],
                                   np.asarray(d_j)[0][safe],
                                   atol=1e-5, rtol=1e-5)
    assert out[2] < out[1], out
    # wider asymmetric windows can only shrink the unsafe set
    assert out[(1, 2)] <= out[1] and out[(2, 1)] <= out[1], out


def test_grid_knn_asymmetric_halo_entry_point(rng):
    """The public grid_knn/grid_knn_interpolate accept xy_halo=(Hx, Hy) and
    stay oracle-exact (the brute tiers backstop any margin failures)."""
    from pointcloud_style_transfer_tpu.ops.grid_knn import grid_knn_interpolate
    q = rng.standard_normal((1, 2000, 3)).astype(np.float32)
    r = rng.standard_normal((1, 900, 3)).astype(np.float32)
    v = rng.standard_normal((1, 900, 3)).astype(np.float32)
    d_g, i_g = grid_knn(jnp.asarray(q), jnp.asarray(r), k=3,
                        grid_shape=(4, 4, 5), tq=64, slot_cap=256,
                        fallback_cap=512, interpret=True, xy_halo=(1, 2))
    d_j, i_j = knn(jnp.asarray(q), jnp.asarray(r), k=3)
    np.testing.assert_allclose(np.asarray(d_g), np.asarray(d_j),
                               atol=1e-5, rtol=1e-5)
    got = grid_knn_interpolate(jnp.asarray(q), jnp.asarray(r),
                               jnp.asarray(v), k=3, grid_shape=(4, 4, 5),
                               tq=64, slot_cap=256, fallback_cap=512,
                               interpret=True, xy_halo=(2, 1))
    # looser tolerance than the symmetric-halo interp test: the wider halo
    # makes near-duplicate query/ref rows SAFE (kernel-resolved), and the
    # kernel's cancellation-free distance differs from the oracle's in the
    # last ulps — which 1/sqrt(d) IDW weights amplify to ~1e-4 when the
    # nearest distance is ~1e-5 (indices still match exactly; verified).
    np.testing.assert_allclose(np.asarray(got), _oracle_interp(q, r, v),
                               atol=3e-4, rtol=3e-4)


def test_strip_interp_patch_library(rng):
    """_strip_interp_patch (library facility): exact fused interp for a
    subset of rows against their ±1 x-slab strip, with ``fail`` soundly
    marking rows whose result is not provably exact."""
    from pointcloud_style_transfer_tpu.ops.grid_knn import (
        _build_struct, _strip_interp_patch)

    m, nq, cap = 1024, 700, 256
    grid_shape = (4, 4, 5)
    r = rng.standard_normal((m, 3)).astype(np.float32)
    q = rng.standard_normal((nq, 3)).astype(np.float32)
    v = rng.standard_normal((m, 3)).astype(np.float32)
    struct = _build_struct(jnp.asarray(r), grid_shape)
    vals_pad = jnp.pad(jnp.asarray(v)[struct[1]],
                       ((0, struct[10] - struct[9]), (0, 0)))
    ids = jnp.asarray(
        np.concatenate([rng.choice(nq, cap - 40, replace=False),
                        np.full(40, nq)]).astype(np.int32))
    ids_s, vals, fail = _strip_interp_patch(
        struct, grid_shape, jnp.asarray(q), ids, vals_pad, 3, 1e-8,
        interpret=True, strip_blocks=min(64, struct[10] // 128), tp=128)
    ids_s, vals, fail = (np.asarray(ids_s), np.asarray(vals),
                        np.asarray(fail))
    # padding rows are never marked fail
    assert not fail[ids_s >= nq].any()
    # non-failed real rows match the brute oracle interp
    oracle = _oracle_interp(q[None], r[None], v[None])[0]
    good = (ids_s < nq) & ~fail
    assert good.sum() > cap // 2  # the strip covers most rows
    np.testing.assert_allclose(vals[good], oracle[ids_s[good]],
                               atol=2e-4, rtol=2e-4)


def test_fallback_caps_ladder_invariants():
    """The tier ladder MUST be strictly increasing and bounded by Nq: a
    smaller cap after a larger one would route overflowing rows to an
    undersized patch buffer (silently inexact — see _grid_interp_single)."""
    from pointcloud_style_transfer_tpu.ops.grid_knn import _fallback_caps

    for fb in (1, 7, 4096, 8192, 100000):
        for nq in (1, 100, 8192, 90112, 500000):
            caps = _fallback_caps(fb, nq)
            assert caps, (fb, nq)
            assert all(0 < c for c in caps)
            assert all(c < nq for c in caps) or caps == [min(fb, nq)]
            assert all(b > a for a, b in zip(caps, caps[1:])), (fb, nq, caps)


def test_sorted_compaction_equals_nonzero():
    """The fallback tiers compact unsafe ids with one keys-only sort of
    where(unsafe, iota, Nq); that must equal nonzero(unsafe, size=cap,
    fill_value=Nq) for every cap — ascending unsafe ids, Nq-padded."""
    rng = np.random.default_rng(7)
    for nq in (17, 256, 1000):
        unsafe = jnp.asarray(rng.random(nq) < 0.13)
        ids_sorted = jnp.sort(jnp.where(
            unsafe, jnp.arange(nq, dtype=jnp.int32), nq))
        for cap in (1, 8, nq // 2, nq):
            expect = jnp.nonzero(unsafe, size=cap, fill_value=nq)[0]
            np.testing.assert_array_equal(np.asarray(ids_sorted[:cap]),
                                          np.asarray(expect))


def test_full_z_mode_engages_and_is_exact(rng):
    """Full-column z mode (whole (slab,row) columns as kernel slots): the
    sampler's 30k geometry satisfies the static condition
    (max row length + 127 <= slot_cap) at both the default (16,12,8)/384
    config and the former (16,16,8)/256; at a scaled-down full_z geometry
    the results must stay oracle-exact, the unsafe set must be a SUBSET of
    the windowed mode's (candidates are a superset, margins only grow),
    and forcing full_z where a column overflows the window must raise."""
    import importlib

    import inspect

    import jax
    G = importlib.import_module("pointcloud_style_transfer_tpu.ops.grid_knn")

    # the real sampler config (the library defaults) engages full_z
    sig = inspect.signature(G.grid_knn)
    gs_def = sig.parameters["grid_shape"].default
    cap_def = sig.parameters["slot_cap"].default
    _, RB, _, _, _ = G._partition_tables(30000, *gs_def)
    assert int(np.max(RB[:, 1:] - RB[:, :-1])) + 127 <= cap_def
    # ... as did the former (16,16,8)/256 config
    _, RB, _, _, _ = G._partition_tables(30000, 16, 16, 8)
    assert int(np.max(RB[:, 1:] - RB[:, :-1])) + 127 <= 256

    q = rng.standard_normal((3000, 3)).astype(np.float32) * 2
    r = rng.standard_normal((2000, 3)).astype(np.float32) * 2
    gs = (4, 4, 5)  # 16 rows x 125 refs: 125 + 127 <= 256 -> full_z ok
    struct = jax.jit(lambda r: G._build_struct(r, gs))(jnp.asarray(r))
    out = {}
    for fz in (True, False):
        d_g, i_g, unsafe = G._query_pass(struct, jnp.asarray(q), 3, gs, 64,
                                         256, True, 2, 1, full_z=fz)
        d_j, i_j = knn(jnp.asarray(q)[None], jnp.asarray(r)[None], k=3)
        safe = ~np.asarray(unsafe)
        np.testing.assert_allclose(np.asarray(d_g)[safe],
                                   np.asarray(d_j)[0][safe],
                                   atol=1e-5, rtol=1e-5)
        out[fz] = np.asarray(unsafe)
    assert not np.any(out[True] & ~out[False]), \
        "full_z made a windowed-safe row unsafe"
    assert out[True].sum() <= out[False].sum()

    with pytest.raises(ValueError, match="full_z requires"):
        G._query_pass(struct, jnp.asarray(q), 3, gs, 64, 128, True, 2, 1,
                      full_z=True)


def test_skip_z_sort_structure_equivalent(rng):
    """skip_z_sort structures (round 4: the third build sort is discarded
    work when every pass runs full_z) must produce bit-identical distances
    and the same unsafe set as the full build under full_z=True, and the
    public entry points — which now derive skip_z_sort from the same
    static predicate _query_pass auto-detects — must stay oracle-exact."""
    import importlib

    import jax
    G = importlib.import_module("pointcloud_style_transfer_tpu.ops.grid_knn")

    q = rng.standard_normal((3000, 3)).astype(np.float32) * 2
    r = rng.standard_normal((2000, 3)).astype(np.float32) * 2
    gs = (4, 4, 5)  # 16 rows x 125 refs: 125 + 127 <= 256 -> full_z ok
    assert G._full_z_ok(2000, gs, 256) and not G._full_z_ok(2000, gs, 128)
    s_full = jax.jit(lambda r: G._build_struct(r, gs))(jnp.asarray(r))
    s_skip = jax.jit(lambda r: G._build_struct(r, gs, skip_z_sort=True))(
        jnp.asarray(r))
    outs = {}
    for name, s in (("full", s_full), ("skip", s_skip)):
        d_g, i_g, unsafe = G._query_pass(s, jnp.asarray(q), 3, gs, 64,
                                         256, True, 2, 1, full_z=True)
        outs[name] = (np.asarray(d_g), np.asarray(i_g), np.asarray(unsafe))
    # full_z reads whole rows, so intra-row ref order cannot change the
    # candidate SET; distances and the unsafe flags must agree exactly
    np.testing.assert_array_equal(outs["full"][0], outs["skip"][0])
    np.testing.assert_array_equal(outs["full"][2], outs["skip"][2])
    # indices may tie-break differently (kernel scan order changed) but
    # must realise the same distances against the ORIGINAL ref array
    sel = r[outs["skip"][1]]
    d_chk = ((q[:, None, :] - sel) ** 2).sum(-1)
    np.testing.assert_allclose(d_chk, outs["skip"][0], atol=1e-5, rtol=1e-5)

    # public entry points at a full_z-engaging geometry (auto-skip builds)
    d_g, i_g = grid_knn(jnp.asarray(q)[None], jnp.asarray(r)[None], k=3,
                        grid_shape=gs, tq=64, slot_cap=256,
                        fallback_cap=512, interpret=True)
    d_j, i_j = knn(jnp.asarray(q)[None], jnp.asarray(r)[None], k=3)
    np.testing.assert_allclose(np.asarray(d_g), np.asarray(d_j),
                               atol=1e-5, rtol=1e-5)
    from pointcloud_style_transfer_tpu.ops.grid_knn import grid_knn_interpolate
    v = rng.standard_normal((1, 2000, 3)).astype(np.float32)
    got = grid_knn_interpolate(jnp.asarray(q)[None], jnp.asarray(r)[None],
                               jnp.asarray(v), k=3, grid_shape=gs, tq=64,
                               slot_cap=256, fallback_cap=512,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), _oracle_interp(
        q[None], r[None], v), atol=3e-4, rtol=3e-4)


def test_grid_interpolate_flat_batched_matches_per_cloud(rng):
    """The flat-batched path (one structure build + one kernel pass + one
    fallback ladder over all clouds) must match per-cloud single passes to
    float level and the oracle to selection exactness, with heterogeneous
    per-cloud distributions."""
    from pointcloud_style_transfer_tpu.ops.grid_knn import (
        _batched_grid_ok, grid_knn_interpolate)
    B, nq, m = 3, 1500, 700
    q = np.stack([rng.standard_normal((nq, 3)).astype(np.float32) * s
                  for s in (0.5, 2.0, 4.0)])
    r = np.stack([rng.standard_normal((m, 3)).astype(np.float32) * s
                  + o for s, o in ((0.5, 0.0), (2.0, 1.0), (4.0, -2.0))])
    v = rng.standard_normal((B, m, 4)).astype(np.float32)
    assert _batched_grid_ok(B, nq, m, (4, 4, 5), 384, 3)
    got = grid_knn_interpolate(jnp.asarray(q), jnp.asarray(r),
                               jnp.asarray(v), k=3, interpret=True,
                               grid_shape=(4, 4, 5))
    per_cloud = np.concatenate([
        np.asarray(grid_knn_interpolate(
            jnp.asarray(q[b:b + 1]), jnp.asarray(r[b:b + 1]),
            jnp.asarray(v[b:b + 1]), k=3, interpret=True,
            grid_shape=(4, 4, 5)))
        for b in range(B)])
    np.testing.assert_allclose(np.asarray(got), per_cloud,
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got), _oracle_interp(q, r, v),
                               atol=2e-4, rtol=2e-4)


def test_grid_interpolate_layout_batched_permutation(rng):
    """Layout-batched variant: qid is a permutation of the B*Nq global
    query ids over real rows; assembling by qid reproduces the plain
    batched entry point bit-exactly."""
    from pointcloud_style_transfer_tpu.ops.grid_knn import (
        grid_knn_interpolate, grid_knn_interpolate_layout_batched)
    B, nq, m = 2, 1100, 600
    q = rng.standard_normal((B, nq, 3)).astype(np.float32) * 2
    r = rng.standard_normal((B, m, 3)).astype(np.float32) * 2
    v = rng.standard_normal((B, m, 3)).astype(np.float32)
    v_lay, qid = grid_knn_interpolate_layout_batched(
        jnp.asarray(q), jnp.asarray(r), jnp.asarray(v), k=3,
        interpret=True, grid_shape=(4, 4, 5))
    v_lay, qid = np.asarray(v_lay), np.asarray(qid)
    real = qid < B * nq
    assert np.sort(qid[real]).tolist() == list(range(B * nq))
    assembled = np.zeros((B * nq, 3), np.float32)
    assembled[qid[real]] = v_lay[real]
    ref_out = np.asarray(grid_knn_interpolate(
        jnp.asarray(q), jnp.asarray(r), jnp.asarray(v), k=3,
        interpret=True, grid_shape=(4, 4, 5)))
    np.testing.assert_array_equal(assembled.reshape(B, nq, 3), ref_out)


def test_grid_interpolate_flat_batched_fallback_tiers(rng):
    """Per-cloud unsafe counts differ wildly (one clustered cloud, one
    smooth); the shared tier (max per-cloud count) + vmapped brute patch
    must stay oracle-exact through the patched tiers AND the all-brute
    last tier."""
    from pointcloud_style_transfer_tpu.ops.grid_knn import grid_knn_interpolate
    m = 640
    r = rng.standard_normal((2, m, 3)).astype(np.float32)
    cluster = np.concatenate(
        [rng.standard_normal((900, 3)).astype(np.float32) * 0.01 + 0.001,
         rng.standard_normal((1148, 3)).astype(np.float32) * 3], axis=0)
    smooth = rng.standard_normal((2048, 3)).astype(np.float32)
    q = np.stack([cluster, smooth])
    v = rng.standard_normal((2, m, 2)).astype(np.float32)
    for cap in (1024, 16):  # patched tiers, then all-brute
        got = grid_knn_interpolate(jnp.asarray(q), jnp.asarray(r),
                                   jnp.asarray(v), k=3, fallback_cap=cap,
                                   interpret=True, grid_shape=(4, 4, 5))
        np.testing.assert_allclose(np.asarray(got), _oracle_interp(q, r, v),
                                   atol=2e-4, rtol=2e-4)


def test_grid_interpolate_batched_group_chunking(rng, monkeypatch):
    """B above the VMEM group cap chunks into flat-batched groups."""
    import importlib
    gk = importlib.import_module("pointcloud_style_transfer_tpu.ops.grid_knn")
    monkeypatch.setattr(gk, "_BATCHED_MAX_GROUP", 2)
    B, nq, m = 5, 700, 520
    q = rng.standard_normal((B, nq, 3)).astype(np.float32) * 2
    r = rng.standard_normal((B, m, 3)).astype(np.float32) * 2
    v = rng.standard_normal((B, m, 3)).astype(np.float32)
    got = gk.grid_knn_interpolate(jnp.asarray(q), jnp.asarray(r),
                                  jnp.asarray(v), k=3, interpret=True,
                                  grid_shape=(4, 4, 5))
    np.testing.assert_allclose(np.asarray(got), _oracle_interp(q, r, v),
                               atol=2e-4, rtol=2e-4)


def test_grid_layout_batched_group_chunking(rng, monkeypatch):
    """Internal group chunking of the layout-batched entry point: global
    qid remap + unified padding sentinel must assemble identically to the
    unchunked call (incl. a trailing group of 1 through the single-cloud
    layout variant)."""
    import importlib
    gk = importlib.import_module("pointcloud_style_transfer_tpu.ops.grid_knn")
    B, nq, m = 5, 900, 520
    q = rng.standard_normal((B, nq, 3)).astype(np.float32) * 2
    r = rng.standard_normal((B, m, 3)).astype(np.float32) * 2
    v = rng.standard_normal((B, m, 3)).astype(np.float32)

    def assemble(v_lay, qid):
        v_lay, qid = np.asarray(v_lay), np.asarray(qid)
        real = qid < B * nq
        assert np.sort(qid[real]).tolist() == list(range(B * nq))
        out = np.zeros((B * nq, 3), np.float32)
        out[qid[real]] = v_lay[real]
        return out.reshape(B, nq, 3)

    monkeypatch.setattr(gk, "_BATCHED_MAX_GROUP", 8)
    want = assemble(*gk.grid_knn_interpolate_layout_batched(
        jnp.asarray(q), jnp.asarray(r), jnp.asarray(v), k=3,
        interpret=True, grid_shape=(4, 4, 5)))
    monkeypatch.setattr(gk, "_BATCHED_MAX_GROUP", 2)
    got = assemble(*gk.grid_knn_interpolate_layout_batched(
        jnp.asarray(q), jnp.asarray(r), jnp.asarray(v), k=3,
        interpret=True, grid_shape=(4, 4, 5)))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(got, _oracle_interp(q, r, v),
                               atol=2e-4, rtol=2e-4)
