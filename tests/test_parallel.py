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


def test_multichip_dryrun_env_vars_lie_about_backend():
    """Simulate the driver's invocation mode that broke rounds 1-2: the env
    vars claim a CPU platform with 8 devices, but jax is ALREADY live in the
    process on a different configuration (here: 1 CPU device; on the real
    driver: the axon/TPU plugin). The old pre-check trusted the env-var
    strings and ran in-process, dispatching onto the live (wrong) backend.
    The fixed pre-check must verify actual backend state and re-exec a
    scrubbed CPU subprocess instead.
    """
    code = (
        "import os\n"
        "os.environ.pop('XLA_FLAGS', None)\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "# driver-style: env vars set AFTER jax is live claim 8 devices\n"
        "os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('env-lie dryrun ok')\n"
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("_WOL_DRYRUN_CHILD", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, (out.stdout[-1000:] + out.stderr[-3000:])
    assert "env-lie dryrun ok" in out.stdout


def test_dryrun_child_marker_fails_loudly_instead_of_recursing():
    """If the re-exec'd child is still not CPU-pinned, it must raise (not
    fork another child forever)."""
    code = (
        "import os\n"
        "os.environ.pop('XLA_FLAGS', None)\n"
        "import jax\n"  # live with 1 CPU device
        "import __graft_entry__ as g\n"
        "try:\n"
        "    g.dryrun_multichip(8)\n"
        "except RuntimeError as e:\n"
        "    assert 'not CPU-pinned' in str(e), e\n"
        "    print('child guard ok')\n"
    )
    env = _cpu_env()
    env.pop("XLA_FLAGS", None)
    env["_WOL_DRYRUN_CHILD"] = "1"
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, (out.stdout[-1000:] + out.stderr[-3000:])
    assert "child guard ok" in out.stdout


def test_multichip_dryrun_wedged_backend(tmp_path):
    """Simulate the r03 failure mode: the ambient TPU plugin hangs/raises
    the moment ANY process that is not CPU-pinned touches jax (the wedged
    axon relay hung `jax.default_backend()` in the driver's parent —
    MULTICHIP_r03 rc=124). A sitecustomize poison raises on `import jax`
    unless JAX_PLATFORMS=cpu; dryrun_multichip must still complete, which
    requires (a) the parent never imports jax and (b) the child env scrub
    really pins CPU."""
    poison = tmp_path / "poison"
    poison.mkdir()
    (poison / "sitecustomize.py").write_text(
        "import os, sys\n"
        "if (os.environ.get('_WOL_FAKE_WEDGE') == '1'\n"
        "        and os.environ.get('JAX_PLATFORMS') != 'cpu'):\n"
        "    class _WedgeFinder:\n"
        "        def find_spec(self, name, path=None, target=None):\n"
        "            if name == 'jax' or name.startswith('jax.'):\n"
        "                raise RuntimeError(\n"
        "                    'simulated wedged TPU backend: jax touched in a '\n"
        "                    'non-CPU-pinned process')\n"
        "            return None\n"
        "    sys.meta_path.insert(0, _WedgeFinder())\n"
    )
    env = dict(os.environ)
    env.pop("_WOL_DRYRUN_CHILD", None)
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_PLATFORM_NAME", None)
    env.pop("XLA_FLAGS", None)
    # poison dir FIRST so its sitecustomize wins over any ambient one; the
    # repo next so __graft_entry__ imports; the ambient tail last
    env["PYTHONPATH"] = (
        str(poison) + os.pathsep + REPO + os.pathsep + env.get("PYTHONPATH", "")
    )
    env["_WOL_FAKE_WEDGE"] = "1"
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, (out.stdout[-1000:] + out.stderr[-3000:])
    assert "dryrun_multichip ok" in out.stdout
    assert '"multichip"' in out.stdout  # the parseable summary line


def test_child_env_scrub_unit():
    """The child env must drop every TPU/plugin var, strip the axon site
    dir from PYTHONPATH, pin CPU, and force the device count — pure
    function, no subprocess."""
    import __graft_entry__ as g

    base = {
        "PALLAS_AXON_POOL_IPS": "127.0.0.1",
        "AXON_LOOPBACK_RELAY": "1",
        "TPU_SKIP_MDS_QUERY": "1",
        "PJRT_DEVICE": "TPU",
        "JAX_PLATFORMS": "axon",
        "PYTHONPATH": "/root/.axon_site" + os.pathsep + "/some/repo",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2 --xla_foo",
        "HOME": "/root",
    }
    env = g._child_env(base, 8)
    assert "PALLAS_AXON_POOL_IPS" not in env
    assert "AXON_LOOPBACK_RELAY" not in env
    assert "TPU_SKIP_MDS_QUERY" not in env
    assert "PJRT_DEVICE" not in env
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["JAX_PLATFORM_NAME"] == "cpu"
    assert env["PYTHONPATH"] == "/some/repo"
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert "count=2" not in env["XLA_FLAGS"]
    assert "--xla_foo" in env["XLA_FLAGS"]
    assert env["_WOL_DRYRUN_CHILD"] == "1"
    assert env["HOME"] == "/root"


def test_graft_entry_module_has_no_jax_import():
    """Importing __graft_entry__ (what the driver parent does first) must
    not import jax: module-level jax would re-create the r03 hang.

    Runs under the module's own scrubbed env: with a healthy TPU plugin
    the ambient sitecustomize imports jax at interpreter startup in EVERY
    python process, which is outside this module's control — the property
    under test is that the module itself adds no jax import."""
    import __graft_entry__ as g

    code = (
        "import sys\n"
        "pre = 'jax' in sys.modules\n"
        "import __graft_entry__\n"
        "assert pre or 'jax' not in sys.modules, 'module import pulled in jax'\n"
        "print('no-jax import ok')\n"
    )
    env = g._child_env(dict(os.environ), 8)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "no-jax import ok" in out.stdout


def test_bench_structured_error_on_unavailable_backend():
    """bench.py must emit ONE parseable JSON line with an error field when
    the backend can't initialize (BENCH_r03 died with a raw traceback
    instead) — simulated with a nonexistent jax platform; under a truly
    wedged relay the probe's timeout produces the same line."""
    import json

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "nonexistent_plugin"
    env["JAX_PLATFORM_NAME"] = "nonexistent_plugin"
    env["WOL_BACKEND_PROBE_TIMEOUT"] = "90"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    parsed = json.loads(out.stdout.strip().splitlines()[-1])
    assert parsed["error"] == "tpu_backend_unavailable"
    assert parsed["metric"] == "qtet_frames_per_sec_per_chip"
    assert parsed["detail"]


def test_sharded_parity_all_mesh_shapes_subprocess():
    """q_tet + distance-histogram parity on 4x2 / 8x1 / 2x4 meshes, plus
    non-divisible F/N through the padding wrapper (one subprocess run covers
    all shapes to amortize startup/compile)."""
    out = _run(os.path.join(REPO, "tests", "_sharded_checks.py"))
    assert out.returncode == 0, (out.stdout[-1000:] + out.stderr[-3000:])
    assert "sharded checks: all ok" in out.stdout
