"""Kernel dispatch-tier logging (VERDICT r2 item 5).

The certified-kernel dispatch in drivers/orderparams.py must (a) log which
tier served each driver call, and (b) degrade to the XLA path ONLY on the
expected kernel failure types, loudly. A deliberately-broken kernel import
must show up in the logs while results stay correct.
"""

import logging

import jax
import numpy as np
import pytest

from waterorderlib_tpu.drivers import orderparams as op
from waterorderlib_tpu.io.synthetic import make_water_box

on_tpu = jax.devices()[0].platform == "tpu"


@pytest.fixture()
def fresh_tier_log():
    saved = set(op._logged_tiers)
    op._logged_tiers.clear()
    yield
    op._logged_tiers.clear()
    op._logged_tiers.update(saved)


def _system(n_wat=1200, n_frames=3):
    top, traj = make_water_box(n_wat, n_frames=n_frames, seed=7)
    return top, traj


@pytest.mark.skipif(not on_tpu, reason="Pallas dispatch is TPU-only")
def test_happy_path_logs_pallas_tier(fresh_tier_log, caplog):
    top, traj = _system()
    with caplog.at_level(logging.INFO, logger="waterorderlib_tpu"):
        op.tet_order_calc(top, traj, output_dir="/tmp")
    assert ("tet_order_calc", "slab") in op._logged_tiers
    assert any("serving tier=slab" in r.message for r in caplog.records)


@pytest.mark.skipif(not on_tpu, reason="Pallas dispatch is TPU-only")
def test_broken_kernel_logs_and_falls_back_correctly(
    fresh_tier_log, caplog, monkeypatch
):
    top, traj = _system()
    baseline = op.tet_order_calc(top, traj, output_dir="/tmp")

    from waterorderlib_tpu.ops.pallas import qtet2

    def boom(*a, **k):
        raise jax.errors.JaxRuntimeError("simulated Mosaic regression")

    op._logged_tiers.clear()
    monkeypatch.setattr(qtet2, "order_param_q_certified", boom)
    with caplog.at_level(logging.WARNING, logger="waterorderlib_tpu"):
        degraded = op.tet_order_calc(top, traj, output_dir="/tmp")
    assert ("tet_order_calc", "xla-fallback") in op._logged_tiers
    assert any("kernel dispatch failed" in r.message for r in caplog.records)
    # results stay correct: kernel and XLA paths agree to float tolerance
    np.testing.assert_allclose(baseline[0][0], degraded[0][0], rtol=2e-5)
    np.testing.assert_allclose(baseline[1][0], degraded[1][0], rtol=2e-4)


def test_unexpected_exception_propagates(fresh_tier_log, monkeypatch):
    """A non-kernel error (a bug) must NOT be swallowed by the dispatch."""
    if not on_tpu:
        pytest.skip("Pallas dispatch is TPU-only")
    top, traj = _system()
    from waterorderlib_tpu.ops.pallas import qtet2

    def bug(*a, **k):
        raise TypeError("not a kernel failure")

    monkeypatch.setattr(qtet2, "order_param_q_certified", bug)
    with pytest.raises(TypeError):
        op.tet_order_calc(top, traj, output_dir="/tmp")
