from setuptools import find_packages, setup

setup(
    name="meshanything_tpu",
    version="0.1.0",
    description=(
        "TPU-native (JAX/XLA/Pallas) framework for point-cloud-conditioned "
        "autoregressive artist-mesh generation"
    ),
    packages=find_packages(include=["meshanything_tpu", "meshanything_tpu.*"]),
    package_data={"meshanything_tpu.native": ["*.cpp", "*.sh", "*.so"],
                  "meshanything_tpu": ["data/*.json"]},
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "numpy",
        "optax",
        "orbax-checkpoint",
        "safetensors",
        "scipy",
    ],
    extras_require={
        "serving": ["gradio"],
        "convert": ["torch"],
    },
)
