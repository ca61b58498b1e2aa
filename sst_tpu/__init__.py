"""sst_tpu: a TPU-native (JAX/XLA/Pallas) fully-sparse LiDAR 3D detection framework.

A ground-up rebuild of the capabilities of tusen-ai/SST (SST, FSD, FSDv2,
FSD++, CTRL) designed for TPU: static bucketed shapes, sort/segment sparse
primitives, windowed attention as batched dense MHA, and pjit/shard_map data
parallelism over device meshes.
"""

from sst_tpu.version import __version__  # noqa: F401
