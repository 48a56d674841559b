"""TPU-native LiDAR point-cloud style transfer framework.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of
wangxy0820/PointCloud_style_transfer: conditional diffusion (DDPM training,
DDIM + classifier-free-guidance sampling) over hierarchical 120k->30k point
clouds, with a PointNet++ style encoder — built for TPU (static shapes,
`lax.scan` samplers, pjit/shard_map data parallelism, Pallas distance kernels).
"""

__version__ = "0.1.0"

from .config import Config

__all__ = ["Config", "__version__"]
