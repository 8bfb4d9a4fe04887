"""Multi-device sharding tests, run in CPU-pinned subprocesses.

The environment pre-imports jax with the TPU plugin before conftest can pin
CPU, so in-process sharded tests would see 1 device and skip forever. Every
sharded check therefore runs in a subprocess whose env forces an 8-device
virtual CPU platform — they execute on every `pytest tests/` invocation.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cpu_env(n_devices=8):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORM_NAME="cpu",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={n_devices}",
        # prepend (never overwrite: the ambient PYTHONPATH wires sitecustomize)
        PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
    )
    return env


def _run(code_or_path, timeout=1200):
    if os.path.exists(code_or_path):
        cmd = [sys.executable, code_or_path]
    else:
        cmd = [sys.executable, "-c", code_or_path]
    return subprocess.run(
        cmd, cwd=REPO, env=_cpu_env(), capture_output=True, text=True, timeout=timeout
    )


def test_multichip_dryrun_subprocess():
    """The driver-facing entry: full sharded step over the default mesh."""
    out = _run("import __graft_entry__ as g; g.dryrun_multichip(8)")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip ok" in out.stdout


def test_sharded_parity_all_mesh_shapes_subprocess():
    """q_tet + distance-histogram parity on 4x2 / 8x1 / 2x4 meshes, plus
    non-divisible F/N through the padding wrapper (one subprocess run covers
    all shapes to amortize startup/compile)."""
    out = _run(os.path.join(REPO, "tests", "_sharded_checks.py"))
    assert out.returncode == 0, (out.stdout[-1000:] + out.stderr[-3000:])
    assert "sharded checks: all ok" in out.stdout
