from setuptools import setup, find_packages

setup(
    name="waterorderlib-tpu",
    version="0.1.0",
    packages=find_packages(include=["waterorderlib_tpu", "waterorderlib_tpu.*"]),
    python_requires=">=3.10",
    install_requires=["jax", "numpy", "scipy"],
)
