"""Headline benchmark: 50-step guided (CFG) DDIM style transfer of one
120k-point cloud, hierarchical path, on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": points/sec/chip, "unit": ..., "vs_baseline": ...}

vs_baseline normalises against the BASELINE.md target of styling a 120k-point
cloud in 1 s (i.e. 120000 points/sec/chip == 1.0); >1.0 beats the target.
The reference publishes no numbers (BASELINE.md), so the target is the
self-measured north star from BASELINE.json.
"""

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _await_tpu(max_wait_s: float = 2400.0, probe_timeout_s: float = 180.0):
    """Block until the TPU backend answers, riding out relay outages.

    The axon relay has documented outages of 30+ minutes during which
    `jax.devices()` first hangs, then raises UNAVAILABLE; it comes back on
    its own (docs/PERF_NOTES.md).  Round 3 lost its only hardware artifact
    to a single cold attempt (BENCH_r03 rc=1), so the probe runs in a
    SUBPROCESS (a hung/failed backend init cannot poison this process) and
    retries for up to ``max_wait_s``.  The probe asserts a non-CPU device:
    if jax silently falls back to the cpu platform the probe must fail,
    not bless a meaningless benchmark."""
    code = ("import jax; d = jax.devices()[0]; "
            "assert d.platform != 'cpu', f'cpu fallback: {d}'; print(d)")
    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        rc = None
        try:
            proc = subprocess.run([sys.executable, "-c", code],
                                  capture_output=True, text=True,
                                  timeout=probe_timeout_s)
            rc = proc.returncode
            if rc == 0:
                print(f"bench: TPU up ({proc.stdout.strip()}) after "
                      f"{time.time() - t0:.0f}s, {attempt} probe(s)",
                      file=sys.stderr)
                return
        except subprocess.TimeoutExpired:
            rc = "timeout"
        elapsed = time.time() - t0
        if elapsed > max_wait_s:
            raise RuntimeError(
                f"TPU backend unavailable after {elapsed:.0f}s "
                f"({attempt} probes, last rc={rc})")
        print(f"bench: TPU probe {attempt} failed (rc={rc}, "
              f"{elapsed:.0f}s elapsed); retrying in 60s", file=sys.stderr)
        time.sleep(60)


def _force(x):
    """Force completion: fetch ONE scalar element to the host. (On tunneled
    backends `block_until_ready` can return before execution finishes, making
    timings bogus; a host transfer cannot — and it must be a true scalar:
    a [..., :1] slice of the 120k cloud ships 480 KB through the relay,
    ~8 ms/call of pure harness overhead. The result stays on device, as in
    any serving pipeline; this is the sync, not the consumer.)"""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)
    return x


def _inner_main():
    from pointcloud_style_transfer_tpu.utils.cache import \
        enable_compilation_cache
    enable_compilation_cache()
    from pointcloud_style_transfer_tpu.config import Config
    from pointcloud_style_transfer_tpu.models import (
        PointCloudDiffusionModel, guided_sample_loop,
        guided_sample_loop_coarse, make_schedule)

    steps = 50
    config = Config()  # 120k -> 30k hierarchical, CFG 7.5
    n_points = config.total_points

    model = PointCloudDiffusionModel(config)
    schedule = make_schedule(config)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, example_points=4096)

    src = jax.random.normal(jax.random.PRNGKey(1), (1, n_points, 3),
                            jnp.float32) * 0.9
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, n_points, 3),
                             jnp.float32) * 0.9

    def run(k):
        return guided_sample_loop(model, schedule, variables, src, cond, k,
                                  num_inference_steps=steps,
                                  guidance_scale=config.guidance_scale)

    # compile + warmup
    _force(run(jax.random.PRNGKey(3)))

    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        _force(run(jax.random.PRNGKey(4 + i)))
    dt = (time.perf_counter() - t0) / reps

    pts_per_sec = n_points / dt

    # batched-sampling throughput axis (round 5): B=4 clouds through the
    # production B>1 path (lax.map per-cloud grid passes + chunked flat-
    # batched voxel downsample — the measured e2e winner; the flat-batched
    # interp layout is opt-in via PCST_SAMPLER_FLAT_BATCH, see
    # models/samplers.py). The reference benchmarks a batch axis too
    # (examples/benchmark.py:16-54).
    B4 = 4
    src4 = jax.random.normal(jax.random.PRNGKey(11), (B4, n_points, 3),
                             jnp.float32) * 0.9
    cond4 = jax.random.normal(jax.random.PRNGKey(12), (B4, n_points, 3),
                              jnp.float32) * 0.9

    def run_b4(k):
        return guided_sample_loop(model, schedule, variables, src4, cond4,
                                  k, num_inference_steps=steps,
                                  guidance_scale=config.guidance_scale)

    _force(run_b4(jax.random.PRNGKey(13)))
    t0 = time.perf_counter()
    for i in range(reps):
        _force(run_b4(jax.random.PRNGKey(14 + i)))
    dt_b4 = (time.perf_counter() - t0) / reps

    # secondary: the TPU-native coarse displacement-field fast mode
    def run_fast(k):
        return guided_sample_loop_coarse(model, schedule, variables, src,
                                         cond, k, num_inference_steps=steps,
                                         guidance_scale=config.guidance_scale)

    _force(run_fast(jax.random.PRNGKey(30)))
    t0 = time.perf_counter()
    for i in range(reps):
        _force(run_fast(jax.random.PRNGKey(40 + i)))
    dt_fast = (time.perf_counter() - t0) / reps

    # tertiary: training-step throughput (B=1, full size, fwd+loss+grads+
    # opt+EMA — the reference's training axis, examples/benchmark.py:57-118)
    from pointcloud_style_transfer_tpu.training.trainer import (
        make_optimizer, make_train_step_fn)
    tx = make_optimizer(config)
    state = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": tx.init(variables["params"]),
        "ema_params": jax.tree_util.tree_map(lambda p: p,
                                             variables["params"]),
    }
    train_step = jax.jit(make_train_step_fn(model, schedule, tx, config))
    lr = jnp.float32(config.learning_rate)

    def run_train(st, k):
        st, loss_dict = train_step(st, src, cond, k, lr)
        return st, loss_dict

    state, _ = _force(run_train(state, jax.random.PRNGKey(50)))
    t0 = time.perf_counter()
    for i in range(reps):
        state, _ = run_train(state, jax.random.PRNGKey(51 + i))
    _force(state)
    dt_train = (time.perf_counter() - t0) / reps

    result = {
        "metric": f"ddim{steps}_cfg_{n_points // 1000}k_points_per_sec_per_chip",
        "value": round(pts_per_sec, 1),
        "unit": "points/s/chip",
        "vs_baseline": round(pts_per_sec / 120000.0, 4),
        "seconds_per_cloud": round(dt, 4),
        "batch4_seconds_per_batch": round(dt_b4, 4),
        "batch4_points_per_sec_per_chip": round(B4 * n_points / dt_b4, 1),
        "batch4_throughput_vs_b1": round((B4 * n_points / dt_b4)
                                         / pts_per_sec, 3),
        "fast_mode_seconds_per_cloud": round(dt_fast, 4),
        "fast_mode_points_per_sec_per_chip": round(n_points / dt_fast, 1),
        "train_step_seconds_b1": round(dt_train, 4),
        "train_step_points_per_sec_per_chip": round(n_points / dt_train, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


def main():
    """Outage-resilient wrapper: wait for the relay, then run the actual
    benchmark in a subprocess, retrying if the relay dies mid-run.  Only the
    final JSON line reaches stdout; everything else goes to stderr.  The
    per-attempt timeout is generous because a cold compile through the
    remote-compile relay takes ~10 min (the persistent compilation cache
    makes retries fast)."""
    deadline = time.time() + float(os.environ.get("PCST_BENCH_BUDGET_S",
                                                  "3300"))
    attempt = 0
    while True:
        attempt += 1
        _await_tpu(max_wait_s=max(120.0, deadline - time.time()))
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--inner"],
                capture_output=True, text=True,
                timeout=max(300.0, deadline - time.time()))
        except subprocess.TimeoutExpired as e:
            print(f"bench: inner run timed out (attempt {attempt})",
                  file=sys.stderr)
            if time.time() > deadline - 300:
                raise
            continue
        sys.stderr.write(proc.stderr)
        lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
        if proc.returncode == 0 and lines and lines[-1].startswith("{"):
            print(lines[-1])
            return 0
        print(f"bench: inner run failed rc={proc.returncode} "
              f"(attempt {attempt}); stdout tail: {lines[-3:]}",
              file=sys.stderr)
        if time.time() > deadline - 300:
            raise RuntimeError(
                f"bench failed after {attempt} attempts (budget exhausted)")
        time.sleep(60)


if __name__ == "__main__":
    if "--inner" in sys.argv:
        sys.exit(_inner_main())
    sys.exit(main())
