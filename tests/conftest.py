"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding tests run on a spoofed 8-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), the standard JAX
substitute for a real pod slice. Must run before jax is imported anywhere.
"""

import os
import sys

# WOL_TEST_TPU=1 leaves the ambient TPU backend in place so the
# @needs_tpu-marked kernel parity tests run ON-CHIP (the committed
# TPUTESTS_r* artifact); default is the spoofed 8-device CPU mesh.
_ON_CHIP = os.environ.get("WOL_TEST_TPU") == "1"

if not _ON_CHIP:
    # The ambient environment pins JAX_PLATFORMS to the TPU plugin; only
    # JAX_PLATFORM_NAME reliably overrides it, so force both.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The TPU-plugin sitecustomize imports jax at interpreter startup, BEFORE
# this conftest runs — jax's config captures JAX_PLATFORMS at import time,
# so the env writes above are too late when the plugin is healthy (with a
# wedged relay the backend fell back to CPU anyway, which masked this).
# jax.config.update rewrites the captured value; the backend itself is not
# yet initialized at conftest time, so XLA_FLAGS still takes effect.
import jax  # noqa: E402

if not _ON_CHIP:
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(20260816)


def make_water_box(n_waters: int, box_len: float, seed: int = 0, jitter: float = 0.35):
    """Synthetic water-oxygen positions: jittered cubic lattice filling the box.

    Dense enough to have realistic neighbor shells, deterministic, and with
    no dependence on any external trajectory file.
    """
    rs = np.random.RandomState(seed)
    n_side = int(np.ceil(n_waters ** (1.0 / 3.0)))
    spacing = box_len / n_side
    grid = np.arange(n_side) * spacing + spacing / 2
    pts = np.stack(np.meshgrid(grid, grid, grid, indexing="ij"), axis=-1).reshape(-1, 3)
    pts = pts[rs.permutation(len(pts))[:n_waters]]
    pts = pts + rs.uniform(-jitter, jitter, pts.shape) * spacing
    return np.mod(pts, box_len)


@pytest.fixture(scope="session")
def small_box():
    """216 waters in an 18.6 A box (bulk-water density ~0.0334 / A^3)."""
    box_len = 18.6
    pos = make_water_box(216, box_len, seed=3)
    return pos, np.array([box_len, box_len, box_len])
