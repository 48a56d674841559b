"""Pallas TPU kernels (jnp reference implementations in ``..`` serve as
correctness oracles — see tests/test_pallas_kernels.py)."""

from .distance_topk import pallas_knn, pallas_min_sq_dist

__all__ = ["pallas_knn", "pallas_min_sq_dist"]
