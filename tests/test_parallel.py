"""Multi-device sharding tests on a spoofed 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from waterorderlib_tpu.parallel import mesh as pmesh
from waterorderlib_tpu.order import qtet
from waterorderlib_tpu.ops import pairs

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_multichip_dryrun_subprocess():
    """The environment pre-imports jax with the TPU plugin before conftest
    can pin CPU, so in-process tests may see 1 device; this subprocess run
    guarantees the sharded path is exercised on an 8-device CPU mesh in
    every `pytest tests/` invocation."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.update(
        JAX_PLATFORM_NAME="cpu",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip ok" in out.stdout


def _data(n_frames=4, n_wat=128, seed=0):
    rs = np.random.RandomState(seed)
    box_len = (n_wat / 0.033456) ** (1.0 / 3.0)
    pos = rs.uniform(0, box_len, (n_frames, n_wat, 3)).astype(np.float32)
    boxes = np.tile(np.array([box_len] * 3, np.float32), (n_frames, 1))
    return jnp.asarray(pos), jnp.asarray(boxes)


@needs_8
def test_sharded_q_matches_single_device():
    pos, boxes = _data()
    m = pmesh.make_mesh(4, 2)
    q, mean_q, hist = pmesh.sharded_q_analysis(pos, boxes, m, row_block=64)
    # single-device reference
    q_ref = np.stack(
        [
            np.asarray(qtet.order_param_q(pos[f], pos[f], boxes[f], 0.0, 10.0, row_block=64))
            for f in range(pos.shape[0])
        ]
    )
    np.testing.assert_allclose(np.asarray(q), q_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mean_q), q_ref.mean(axis=1), atol=2e-5)
    assert float(np.asarray(hist).sum()) <= q_ref.size  # out-of-range q dropped


@needs_8
def test_sharded_q_16_frames_dp_only():
    pos, boxes = _data(n_frames=8)
    m = pmesh.make_mesh(8, 1)
    q, mean_q, hist = pmesh.sharded_q_analysis(pos, boxes, m, row_block=64)
    assert q.shape == (8, 128)


@needs_8
def test_sharded_distance_histogram_matches():
    pos, boxes = _data(n_frames=8)
    m = pmesh.make_mesh(4, 2)
    counts = pmesh.sharded_distance_histogram(pos, pos, boxes, m, 0.2, 40, same=True)
    want = np.zeros(40, np.float32)
    for f in range(8):
        want += np.asarray(
            pairs.distance_histogram(pos[f], pos[f], boxes[f], 0.2, 40, same=True)
        )
    np.testing.assert_allclose(np.asarray(counts), want, atol=2)
