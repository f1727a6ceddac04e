from setuptools import find_packages, setup

setup(
    name="triangle_splatting_tpu",
    version="0.1.0",
    packages=find_packages(include=["triangle_splatting_tpu",
                                    "triangle_splatting_tpu.*"]),
    install_requires=[
        "jax",
        "numpy",
        "pyyaml",
        "scipy",
        "pillow",
    ],
    extras_require={
        "viz": ["opencv-python", "matplotlib", "tensorboard"],
    },
    description="TPU-native 2D Triangle Splatting (2DTS) framework",
    python_requires=">=3.10",
)
