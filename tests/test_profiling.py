
from pointcloud_style_transfer_tpu.utils.profiling import (annotate,
                                                           device_memory_stats,
                                                           trace)


def test_memory_stats_returns_dict():
    stats = device_memory_stats()
    assert isinstance(stats, dict)


def test_trace_context(tmp_path):
    import jax.numpy as jnp
    with trace(str(tmp_path)):
        with annotate("unit-test-region"):
            _ = jnp.ones((8, 8)).sum()
    # a trace directory should have been produced
    assert any(tmp_path.iterdir())
