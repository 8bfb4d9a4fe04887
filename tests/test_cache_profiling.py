"""Tests for the bound/wrap cache and the stage timer."""

import numpy as np

from waterorderlib_tpu.drivers.cache import cached_bound_wrap
from waterorderlib_tpu.io.synthetic import make_water_box
from waterorderlib_tpu.utils.profiling import StageTimer


def test_cached_bound_wrap_roundtrip(tmp_path):
    top, traj = make_water_box(24, n_frames=3, seed=51, solute_elements=["C", "O"])
    p = str(tmp_path / "bw.npz")
    first = cached_bound_wrap(p, top, traj)
    assert len(first) == 3
    # second call must hit the cache and return identical indices
    again = cached_bound_wrap(p, top, traj)
    for a, b in zip(first, again):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
    # different cutoff -> cache invalidated, result may differ in size
    other = cached_bound_wrap(p, top, traj, cutoff=6.0)
    assert len(other) == 3
    assert len(other[0][2]) >= len(first[0][2])  # larger shell at 6 A


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        sum(range(1000))
    with t.stage("b"):
        pass
    rep = t.report(n_frames=10)
    assert "a" in rep and "frames/s" in rep


def test_analysis_config_roundtrip(tmp_path):
    from waterorderlib_tpu.config import AnalysisConfig

    cfg = AnalysisConfig(hb_dist=3.2, stride=4)
    p = str(tmp_path / "cfg.json")
    cfg.to_json(p)
    cfg2 = AnalysisConfig.from_json(p)
    assert cfg2 == cfg
    # unknown keys rejected
    import json, pytest

    bad = dict(hb_dist=1.0, nonsense=True)
    (tmp_path / "bad.json").write_text(json.dumps(bad))
    with pytest.raises(ValueError):
        AnalysisConfig.from_json(str(tmp_path / "bad.json"))
