"""Stage attribution of the StyleEncoder forward — the fused-SetAbstraction
kernel decision measurement (SURVEY C5 "TPU-native plan" cell).

The candidate kernel would fuse, per SetAbstraction stage, the neighbour
gather + centring + (Dense+BN+ReLU)xK + max-pool into one Pallas pass,
eliminating the [B, S, ns, C] grouped intermediate round-trips to HBM.
Whether that can matter is bounded by how much of the encoder the
grouping+MLP stages cost AT ALL (the FPS + ball-query kernels already
carry the selection work — docs/PERF_NOTES.md round-1 addenda).

Variants (chained x50 inside one jit, net-of-baseline like
microbench_primitives.py):

  full      — StyleEncoder.apply (everything)
  encoder   — PointNet2Encoder only (no MLP head)
  selection — FPS + ball-query + neighbour gather only, both SA stages
              (what a fused kernel CANNOT remove)
  head      — the grouped-MLP+pool work = encoder - selection (what a
              fused kernel could at best remove; its gather can ride the
              kernel, so selection's gather share is also in play)

Run on the real backend: python examples/profile_style_encoder.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointcloud_style_transfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_style_transfer_tpu.config import Config
from pointcloud_style_transfer_tpu.models.networks import StyleEncoder
from pointcloud_style_transfer_tpu.ops import (farthest_point_sample,
                                               index_points,
                                               query_ball_point)

REPS = 50


def _force(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]


def main():
    cfg = Config()
    M = cfg.global_points  # the sampler encodes the DOWNSAMPLED cond cloud
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (1, M, 3), jnp.float32)

    enc = StyleEncoder(cfg.feature_dim)
    variables = enc.init({"params": key, "sampling": key}, pts, train=False)

    def full_body(p, k):
        return enc.apply(variables, p, train=False, rngs={"sampling": k})

    # SA stage configs mirror PointNet2Encoder (models/networks.py:100-111)
    def selection_body(p, k):
        k1, k2 = jax.random.split(k)
        c1 = farthest_point_sample(p, 512, k1)
        xyz1 = index_points(p, c1)
        g1 = query_ball_point(0.2, 32, p, xyz1)
        grouped1 = index_points(p, g1) - xyz1[:, :, None, :]
        c2 = farthest_point_sample(xyz1, 128, k2)
        xyz2 = index_points(xyz1, c2)
        g2 = query_ball_point(0.4, 64, xyz1, xyz2)
        grouped2 = index_points(xyz1, g2) - xyz2[:, :, None, :]
        return (jnp.sum(grouped1) + jnp.sum(grouped2))

    from pointcloud_style_transfer_tpu.models.networks import PointNet2Encoder
    enc2 = PointNet2Encoder(cfg.feature_dim)
    vars2 = enc2.init({"params": key, "sampling": key}, pts, train=False)

    def encoder_body(p, k):
        return enc2.apply(vars2, p, train=False, rngs={"sampling": k})

    def chain(body):
        @jax.jit
        def run(p, k0):
            def step(carry, i):
                p_, k_ = carry
                k_, sub = jax.random.split(k_)
                out = body(p_, sub)
                # fold the output back so steps can't be elided
                bump = (jnp.sum(out) * 1e-20).astype(p_.dtype)
                return (p_ + bump, k_), None
            (pf, _), _ = jax.lax.scan(step, (p, k0), jnp.arange(REPS))
            return pf
        return run

    results = {}
    for name, body in [("full", full_body), ("encoder", encoder_body),
                       ("selection", selection_body)]:
        fn = chain(body)
        _force(fn(pts, key))  # compile+warm
        t0 = time.perf_counter()
        _force(fn(pts, key))
        dt = (time.perf_counter() - t0) / REPS * 1e3
        results[name] = dt
        print(f"{name:10s} {dt:7.3f} ms/call", flush=True)
    head = results["encoder"] - results["selection"]
    print(f"{'head':10s} {head:7.3f} ms/call  (grouped-MLP+pool upper bound "
          f"for a fused SA kernel)")
    print(f"{'mlp_head':10s} {results['full'] - results['encoder']:7.3f} "
          f"ms/call  (Dense 512->256 head, not SA)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
