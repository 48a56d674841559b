"""Microbenchmark of the data-movement primitives that dominate the
sampler's hot loop (sorts / scatters / gathers / segment ops) at the
production sizes, on the real backend.

Each primitive is chained CHAIN times inside one jit with a data dependency
(a scalar derived from the previous round feeds the next round's operand)
so per-dispatch relay latency amortises away (CLAUDE.md: single dispatches
carry ~28 ms relay latency) and rounds can neither be CSE'd (a distinct
static offset per round) nor reordered (the scalar dependency). Every
round's result is consumed by a FULL jnp.sum — point reads like ``out[0]``
let XLA collapse a gather into a one-element gather, silently benchmarking
nothing. The summed reduction adds ~one bandwidth pass per round, identical
across cases (calibrate against ``elementwise120k``).

Usage: python examples/microbench_primitives.py [case ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_style_transfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

CHAIN = int(os.environ.get("PCST_MB_CHAIN", "50"))
N = 120_000
M = 30_000
NQ = 90_112


def _force(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf if leaf.ndim == 0 else leaf[..., :1])
    return x


def _time(fn):
    c = jax.jit(fn)
    _force(c(jnp.float32(0.0)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _force(c(jnp.float32(0.0)))
        best = min(best, time.perf_counter() - t0)
    return best / CHAIN * 1e3


def main():
    key = jax.random.PRNGKey(0)
    kx, kp, ki = jax.random.split(key, 3)
    x = jax.random.normal(kx, (N, 4), jnp.float32)
    pr = jax.random.uniform(kp, (N,), jnp.float32)
    perm = jax.random.permutation(ki, N).astype(jnp.int32)
    h = jax.random.randint(ki, (N,), 0, 1 << 30, jnp.int32)
    hs_sorted = jnp.sort(h[:NQ])
    iq = jnp.arange(N, dtype=jnp.int32)
    seg = jnp.sort(jax.random.randint(kp, (N,), 0, M, jnp.int32))

    def chain(body):
        # body(i_static, dep): dep is a tiny f32 scalar from the previous
        # round — the dependency that serialises rounds; i_static breaks CSE
        def fn(v):
            dep = v
            for i in range(CHAIN):
                out = body(i, dep)
                dep = jnp.sum(out).astype(jnp.float32) * 1e-20
            return dep
        return fn

    def idep(i, dep):  # int32 per-round offset carrying the dependency
        return jnp.int32(i) + jnp.int32(dep)

    C = {}
    C["sort120k_k1_p1"] = chain(lambda i, dep: jax.lax.sort(
        (pr + dep + i, iq), num_keys=1)[1].astype(jnp.float32))
    C["sort120k_k1_p4"] = chain(lambda i, dep: sum(
        o for o in jax.lax.sort(
            (pr + dep + i, pr * 2, pr * 3, pr * 4, pr * 5), num_keys=1)[1:]))
    C["sort120k_i32_k1_p1"] = chain(lambda i, dep: jax.lax.sort(
        (h + idep(i, dep), iq), num_keys=1)[1].astype(jnp.float32))
    C["sort30k_k1_p1"] = chain(lambda i, dep: jax.lax.sort(
        (pr[:M] + dep + i, iq[:M]), num_keys=1)[1].astype(jnp.float32))
    C["sort30k_k2_p1"] = chain(lambda i, dep: jax.lax.sort(
        (h[:M] + idep(i, dep), pr[:M], iq[:M]), num_keys=2)[2]
        .astype(jnp.float32))
    C["sort90k_k1_p4"] = chain(lambda i, dep: sum(
        o for o in jax.lax.sort(
            (pr[:NQ] + dep + i, pr[:NQ] * 2, pr[:NQ] * 3, pr[:NQ] * 4,
             pr[:NQ] * 5), num_keys=1)[1:]))
    C["scatter120k_c4"] = chain(lambda i, dep: jnp.zeros(
        (N, 4), jnp.float32).at[perm].set(x + dep + i, mode="drop"))
    C["scatter120k_c3"] = chain(lambda i, dep: jnp.zeros(
        (N, 3), jnp.float32).at[perm].set(x[:, :3] + dep + i, mode="drop"))
    C["scatter120k_c1"] = chain(lambda i, dep: jnp.zeros(
        (N,), jnp.float32).at[perm].set(pr + dep + i, mode="drop"))
    C["scatteradd120k_c1"] = chain(lambda i, dep: jnp.zeros(
        (N,), jnp.float32).at[seg].add(pr + dep + i, mode="drop"))
    C["gather120k_c3"] = chain(lambda i, dep: (x[:, :3] + dep + i)[perm])
    C["gather120k_c1"] = chain(lambda i, dep: (pr + dep + i)[perm])
    C["gather30k_from120k_c3"] = chain(
        lambda i, dep: (x[:, :3] + dep + i)[perm[:M]])
    C["cumsum120k"] = chain(lambda i, dep: jnp.cumsum(pr + dep + i))
    C["segsum120k_c2"] = chain(lambda i, dep: jax.ops.segment_sum(
        jnp.stack([pr + dep + i, pr * 2], axis=1), seg, num_segments=N))
    C["concat_2x120k_c3"] = chain(lambda i, dep: jnp.concatenate(
        [x[:, :3] + dep + i, x[:, :3] * 2], axis=0))
    C["elementwise120k"] = chain(lambda i, dep: jnp.tanh(
        (x + dep + i) * 0.5 + jnp.sin(x) * (x - 0.1) + x * x))
    C["searchsorted_256_in90k"] = chain(lambda i, dep: jnp.searchsorted(
        hs_sorted + idep(i, dep),
        jnp.arange(256, dtype=jnp.int32)).astype(jnp.float32))
    C["uniform120k"] = chain(lambda i, dep: jax.random.uniform(
        jax.random.fold_in(key, idep(i, dep)), (N,)))
    C["topk120k_30k"] = chain(lambda i, dep: jax.lax.top_k(
        pr + dep + i, M)[0])
    # roofline cases (round 5): the voxel with_coords sort shape (key + 5
    # payload operands over [120k]) and the same shape at 2x/4x rows, to
    # place the measured VMEM sort cliff (ops/voxel.py::_FLAT_SORT_ELEMS)
    # on the primitive-cost map; plus the fallback brute patch's random
    # gather at its [cap, 3]-from-[30k, 3] geometry.
    C["sort120k_i32_k1_p5"] = chain(lambda i, dep: sum(
        o for o in jax.lax.sort(
            (h + idep(i, dep), pr, pr * 2, pr * 3, pr * 4, pr * 5),
            num_keys=1)[1:]))
    h2 = jnp.concatenate([h, h[::-1]])
    pr2 = jnp.concatenate([pr, pr[::-1]])
    C["sort240k_i32_k1_p5"] = chain(lambda i, dep: sum(
        o for o in jax.lax.sort(
            (h2 + idep(i, dep), pr2, pr2 * 2, pr2 * 3, pr2 * 4, pr2 * 5),
            num_keys=1)[1:]))
    h4 = jnp.concatenate([h2, h2[::-1]])
    pr4 = jnp.concatenate([pr2, pr2[::-1]])
    C["sort480k_i32_k1_p5"] = chain(lambda i, dep: sum(
        o for o in jax.lax.sort(
            (h4 + idep(i, dep), pr4, pr4 * 2, pr4 * 3, pr4 * 4, pr4 * 5),
            num_keys=1)[1:]))
    qg = jnp.mod(perm[:8192], M)
    C["gather8k_from30k_c3"] = chain(
        lambda i, dep: (x[:M, :3] + dep + i)[qg])
    # the B=4 sampler assembly shape: inverse-permutation sort over
    # B*M + NPg = 578,368 rows (2 operands) + the [., 3] row gather it feeds
    NA = 578_368
    ha = jnp.concatenate([h, h[::-1], h, h[::-1], h])[:NA]
    ia = jnp.arange(NA, dtype=jnp.int32)
    xa = jnp.concatenate([x[:, :3]] * 5, axis=0)[:NA]
    C["sort578k_i32_k1_p1"] = chain(lambda i, dep: jax.lax.sort(
        (ha + idep(i, dep), ia), num_keys=1)[1].astype(jnp.float32))
    pa = jnp.mod(jnp.cumsum(ha.astype(jnp.int64) % 1000003).astype(
        jnp.int32), NA)
    C["gather578k_c3"] = chain(lambda i, dep: (xa + dep + i)[pa])
    C["sort145k_i32_k1_p1"] = chain(lambda i, dep: jax.lax.sort(
        (ha[:145_000] + idep(i, dep), ia[:145_000]),
        num_keys=1)[1].astype(jnp.float32))

    want = sys.argv[1:] or list(C)
    print(f"device={jax.devices()[0]}  chain={CHAIN}")
    for name in want:
        ms = _time(C[name])
        print(f"{name:24s} {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
