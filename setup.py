from setuptools import find_packages, setup

setup(
    name="monai_tpu",
    version="0.1.0",
    description="TPU-native medical imaging AI framework (JAX/XLA/Pallas)",
    packages=find_packages(exclude=("tests",)),
    python_requires=">=3.10",
    install_requires=["jax", "flax", "optax", "orbax-checkpoint", "numpy", "scipy"],
    extras_require={"full": ["pandas", "pillow", "pyyaml", "einops", "chex"]},
)
