"""Install sst_tpu (pure python + a lazily-built C++ helper library).

The native pointprep library is compiled on first use (g++), so no build
step is needed here; jax/flax/optax/orbax come from the environment.
"""

from setuptools import find_packages, setup

setup(
    name="sst_tpu",
    version=open("sst_tpu/version.py").read().split('"')[1],
    description=(
        "TPU-native fully-sparse LiDAR 3D detection (SST / FSD / FSDv2 / "
        "FSD++ / CTRL) on JAX/XLA/Pallas"
    ),
    packages=find_packages(include=["sst_tpu", "sst_tpu.*"]),
    package_data={"sst_tpu.data.native": ["*.cc"]},
    python_requires=">=3.10",
    install_requires=["numpy", "jax", "flax", "optax", "orbax-checkpoint"],
)
