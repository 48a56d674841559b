"""Microbenchmark: kNN backend shootout at the sampler's hot geometry.

The reference's per-diffusion-step hot loop is a CPU sklearn kNN
(/root/reference/models/diffusion_model.py:244-246); our sampler replaces it
with on-device kernels and this script measures them head-to-head on the
current backend. Timing is chained (10 dependent calls inside one jit-level
loop) to cancel the ~28 ms host-relay latency of this environment
(docs/PERF_NOTES.md), and forced with a host transfer because
block_until_ready can return early here.

Usage: python examples/bench_knn_backends.py [Nq] [M] [k] [backend ...]

Set PCST_BENCH_FRESH_REFS=1 to perturb the refs between chained calls:
with constant refs XLA hoists every ref-side computation (the grid
backend's build sorts, boundary tables, padded array) out of the chain,
underreporting per-call cost for backends with ref-side preprocessing.
The sampler's refs change every step, so fresh-refs is the honest number.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_style_transfer_tpu.utils.cache import enable_compilation_cache
from pointcloud_style_transfer_tpu.ops.distance import knn

enable_compilation_cache()

CHAIN = 10


def _force(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0][..., :1])
    return x


def bench(backend: str, nq: int, m: int, k: int, reps: int = 3) -> float:
    """Returns net per-call seconds for one [1, nq, 3] x [1, m, 3] kNN."""
    key = jax.random.PRNGKey(0)
    kq, kr = jax.random.split(key)
    # realistic sampler geometry: gaussian cloud, refs = a voxel-like subset
    q = jax.random.normal(kq, (1, nq, 3), jnp.float32) * 0.9
    r = jax.random.normal(kr, (1, m, 3), jnp.float32) * 0.9

    fresh_refs = os.environ.get("PCST_BENCH_FRESH_REFS") == "1"

    def chained(q, r):
        d, i = knn(q, r, k, backend=backend)
        for _ in range(CHAIN - 1):
            # feed outputs back in so calls serialize (no dead-code elim)
            q2 = q + (d[..., :1] * 0.0)
            if fresh_refs:
                # data-dependent ref perturbation defeats loop-invariant
                # hoisting of the ref-side build
                r = r + (d[..., :1, :1] * 1e-12)
            d, i = knn(q2, r, k, backend=backend)
        return d, i

    fn = jax.jit(chained)
    _force(fn(q, r))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(q, r))
        best = min(best, time.perf_counter() - t0)
    return best / CHAIN


def main():
    args = sys.argv[1:]
    nq = int(args[0]) if len(args) > 0 else 90112
    m = int(args[1]) if len(args) > 1 else 30000
    k = int(args[2]) if len(args) > 2 else 3
    backends = args[3:] or ["pallas", "pallas_f32packed", "grid"]
    print(f"device={jax.devices()[0]}  Nq={nq} M={m} k={k} chain={CHAIN}")
    for b in backends:
        try:
            t = bench(b, nq, m, k)
            print(f"{b:20s} {t * 1e3:8.2f} ms/call")
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{b:20s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
