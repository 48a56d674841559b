"""Benchmark CLI: the reference harness's four measurement axes plus full
50-step sampling (the reference only times single forward passes,
examples/benchmark.py:57-118).

Axes (reference examples/benchmark.py):
1. memory vs batch {1,2,4,8} x points {30k,60k,120k}  (:16-54)
2. single noise-predictor forward latency, 30k/60k/120k  (:57-118)
3. hierarchical vs direct at 120k  (:121-197)
4. point-count scaling sweep 10k->120k  (:200-265)
5. (new) full 50-step guided DDIM sampling — the BASELINE metric

Device memory is read from ``device.memory_stats()`` (the TPU equivalent of
torch.cuda.max_memory_allocated).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models import (PointCloudDiffusionModel, guided_sample_loop,
                      make_schedule)
from ..ops import voxel_downsample
from ..utils.logger import get_logger

log = get_logger("benchmark")


def _sync(x):
    # force a host transfer: on tunneled backends block_until_ready can
    # return before execution finishes, making timings bogus
    np.asarray(jax.tree_util.tree_leaves(x)[0][..., :1])
    return x


def _time(fn, *args, reps: int = 5):
    _sync(fn(*args))  # compile + warmup
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts)), float(np.mean(ts))


def _mem_mb(compiled=None):
    """Peak device memory in MB: runtime ``memory_stats()`` when the backend
    exposes it, else the compile-time ``memory_analysis()`` of the jitted
    computation (argument + output + temp bytes — XLA's static equivalent of
    torch.cuda.max_memory_allocated, reference examples/benchmark.py:16-54).
    Works on every backend, including the tunneled one (which lacks
    memory_stats, docs/PERF_NOTES.md)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        v = stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0))
        if v:
            return round(v / 1e6, 2)
    except Exception:
        pass
    if compiled is not None:
        try:
            ma = compiled.memory_analysis()
            peak = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                    + ma.temp_size_in_bytes)
            return round(peak / 1e6, 2)
        except Exception:
            pass
    return None


def _compiled(fn, *args):
    """Lower+compile for memory analysis (hits the persistent compile cache,
    so this costs one retrace, not a recompile)."""
    try:
        return jax.jit(fn).lower(*args).compile()
    except Exception:
        return None


def bench_forward(model, variables, batch_sizes, point_counts, reps):
    """Single noise-predictor forward latency + throughput."""
    results = []
    style = jnp.zeros((max(batch_sizes), model.config.feature_dim))

    for n in point_counts:
        for b in batch_sizes:
            x = jax.random.normal(jax.random.PRNGKey(0), (b, n, 3))
            t = jnp.zeros((b,), jnp.int32)

            def fwd(x, t, s):
                return model.predict_noise(variables, x, t, s[:x.shape[0]])
            try:
                jfwd = jax.jit(fwd)
                tmin, tmean = _time(jfwd, x, t, style, reps=reps)
                results.append({
                    "batch": b, "points": n,
                    "latency_ms": round(tmean * 1000, 3),
                    "throughput_pts_per_s": round(b * n / tmean, 1),
                    "memory_mb": _mem_mb(_compiled(fwd, x, t, style)),
                })
                log.info("forward b=%d n=%d: %.2fms (%.0f pts/s)", b, n,
                         tmean * 1000, b * n / tmean)
            except Exception as e:
                results.append({"batch": b, "points": n, "error": str(e)})
                log.warning("forward b=%d n=%d failed: %s", b, n, e)
    return results


def bench_hierarchical_vs_direct(model, variables, n, reps):
    """Hierarchical (voxel down -> predict coarse) vs direct full-res forward
    at n points (reference: examples/benchmark.py:121-197)."""
    style = jnp.zeros((1, model.config.feature_dim))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, n, 3))
    t = jnp.zeros((1,), jnp.int32)
    M = model.config.global_points

    def hier(x, t, s, k):
        xc, _ = voxel_downsample(x, M, k)
        return model.predict_noise(variables, xc, t, s)

    def direct(x, t, s):
        return model.predict_noise(variables, x, t, s)

    t_h, _ = _time(jax.jit(hier), x, t, style, jax.random.PRNGKey(1),
                   reps=reps)
    t_d, _ = _time(jax.jit(direct), x, t, style, reps=reps)
    return {"points": n, "hierarchical_ms": round(t_h * 1000, 3),
            "direct_ms": round(t_d * 1000, 3),
            "speedup": round(t_d / t_h, 2),
            "hierarchical_memory_mb": _mem_mb(
                _compiled(hier, x, t, style, jax.random.PRNGKey(1))),
            "direct_memory_mb": _mem_mb(_compiled(direct, x, t, style))}


def bench_sampling(model, schedule, variables, n, steps, reps,
                  batch: int = 1):
    """Full guided-sampling latency/throughput at batch size ``batch``.
    B > 1 exercises the production batched path (lax.map per-cloud grid
    passes + chunked flat-batched voxel downsample — the measured e2e
    winner; PCST_SAMPLER_FLAT_BATCH=1 opts into the flat interp layout,
    models/samplers.py); the reference's harness benchmarks a batch axis
    too (examples/benchmark.py:16-54)."""
    src = jax.random.normal(jax.random.PRNGKey(1), (batch, n, 3)) * 0.9
    cond = jax.random.normal(jax.random.PRNGKey(2), (batch, n, 3)) * 0.9

    def run(k):
        return guided_sample_loop(model, schedule, variables, src, cond, k,
                                  num_inference_steps=steps,
                                  guidance_scale=7.5)
    tmin, tmean = _time(run, jax.random.PRNGKey(3), reps=reps)
    return {"points": n, "steps": steps, "batch": batch,
            "seconds_per_batch": round(tmean, 4),
            "seconds_per_cloud": round(tmean / batch, 4),
            "points_per_sec_per_chip": round(batch * n / tmean, 1),
            "memory_mb": _mem_mb(_compiled(run, jax.random.PRNGKey(3)))}


def main(argv=None) -> int:
    from ..utils.cache import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Benchmark suite")
    parser.add_argument("--output", type=str, default="benchmark_results.json")
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--quick", action="store_true",
                        help="small sizes only (CI / CPU)")
    parser.add_argument("--skip_sampling", action="store_true")
    args = parser.parse_args(argv)

    if args.quick:
        config = Config(total_points=4096, global_points=1024)
        batch_sizes, point_counts = [1, 2], [1024, 4096]
        scaling = [1024, 2048, 4096]
        sample_steps = 5
    else:
        config = Config()
        batch_sizes, point_counts = [1, 2, 4, 8], [30000, 60000, 120000]
        scaling = [10000, 30000, 60000, 90000, 120000]
        sample_steps = 50

    model = PointCloudDiffusionModel(config)
    schedule = make_schedule(config)
    variables = model.init(jax.random.PRNGKey(0), example_points=1024)

    results = {"device": str(jax.devices()[0]), "quick": args.quick,
               "note": ("latencies are single-dispatch wall times and "
                        "include host<->device round-trip latency (~28 ms "
                        "on tunneled backends); see docs/PERF_NOTES.md")}

    log.info("=== forward latency / memory sweep ===")
    results["forward"] = bench_forward(model, variables, batch_sizes,
                                       point_counts, args.reps)

    log.info("=== hierarchical vs direct ===")
    results["hierarchical_vs_direct"] = bench_hierarchical_vs_direct(
        model, variables, point_counts[-1], args.reps)

    log.info("=== scaling sweep ===")
    results["scaling"] = bench_forward(model, variables, [1], scaling,
                                       args.reps)

    if not args.skip_sampling:
        log.info("=== full guided sampling ===")
        results["sampling"] = bench_sampling(
            model, schedule, variables, config.total_points, sample_steps,
            max(2, args.reps // 2))
        log.info("=== batched guided sampling (throughput axis) ===")
        results["sampling_batched"] = [
            bench_sampling(model, schedule, variables, config.total_points,
                           sample_steps, max(2, args.reps // 2), batch=b)
            for b in ([2] if args.quick else [2, 4, 8])]

    with open(args.output, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results.get("sampling", results["forward"][-1])))
    log.info("Results written to %s", args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
