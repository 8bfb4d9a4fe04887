"""End-to-end tests for the order-parameter drivers on a synthetic box."""

import numpy as np

from waterorderlib_tpu.io.synthetic import make_water_box
from waterorderlib_tpu.drivers import orderparams
from reference import refimpl

N_WAT = 48
N_FRAMES = 20


def _system():
    return make_water_box(N_WAT, n_frames=N_FRAMES, seed=7)


def test_tet_order_calc_end_to_end(tmp_path):
    top, traj = _system()
    wat_inds, _, _ = top.get_wat_inds()
    sub_inds = [[wat_inds[:10]] for _ in range(N_FRAMES)]
    avg_q, var_q = orderparams.tet_order_calc(
        top, traj, sub_inds=sub_inds, n_pops=1, output_dir=str(tmp_path), row_block=16
    )
    means, cis = avg_q
    assert means.shape == (2,) and np.all(np.isfinite(means))
    assert np.all(cis >= 0)
    # frame-0 parity vs the numpy oracle
    pos = traj.positions[0].astype(np.float64)
    box = traj.boxes[0].astype(np.float64)
    wat = pos[wat_inds]
    want_q = refimpl.order_param_q(wat, wat, box)
    # per-frame mean of pop 0 equals oracle mean (f32 tolerance)
    got_file = np.loadtxt(tmp_path / "qDistribution_0.txt")
    assert got_file.shape == (500, 2)
    # exact histogram-sum parity vs the f64 oracle over the whole trajectory:
    # the all-water histogram must contain exactly the q values in [0, 1]
    # (out-of-range q dropped, np.histogram semantics). f32 boundary jitter
    # could move a value across 0 or 1, so allow a slack of 1 count.
    oracle_in_range = 0
    for f in range(N_FRAMES):
        posf = traj.positions[f].astype(np.float64)
        qf = refimpl.order_param_q(posf[wat_inds], posf[wat_inds], traj.boxes[f].astype(np.float64))
        oracle_in_range += int(np.sum((qf >= 0.0) & (qf <= 1.0)))
    assert abs(got_file[:, 1].sum() - oracle_in_range) <= 1
    assert abs(np.mean(want_q) - means[0]) < 0.05  # trajectory mean near frame-0 mean
    # population histogram file exists
    assert (tmp_path / "qDistribution_1.txt").exists()


def test_three_body_calc_end_to_end(tmp_path):
    top, traj = _system()
    p_tet, avg_cos, var_cos, entropy, n_wats = orderparams.three_body_calc(
        top, traj, output_dir=str(tmp_path), row_block=16, output_2d=True
    )
    assert np.isfinite(p_tet[0][0]) and 0 <= p_tet[0][0] <= 1
    assert n_wats[0][0] == N_WAT
    hist = np.loadtxt(tmp_path / "3bDistribution_0.txt")
    assert hist.shape == (500, 2)
    # parity of the accumulated histogram vs oracle on frame 0 scale:
    pos = traj.positions[0].astype(np.float64)
    box = traj.boxes[0].astype(np.float64)
    wat_inds, _, _ = top.get_wat_inds()
    angs, _ = refimpl.get_cos_angs(pos[wat_inds], pos[wat_inds], box)
    # total angle count across frames should be ~N_FRAMES * per-frame count
    assert abs(hist[:, 1].sum() - N_FRAMES * len(angs)) / (N_FRAMES * len(angs)) < 0.2
    assert (tmp_path / "3bDistribution_2D.txt").exists()


def test_lsi_calc_end_to_end(tmp_path):
    top, traj = _system()
    avg_lsi, var_lsi = orderparams.lsi_calc(top, traj, output_dir=str(tmp_path), row_block=16)
    assert np.isfinite(avg_lsi[0][0]) and avg_lsi[0][0] > 0
    hist = np.loadtxt(tmp_path / "lsiDistribution_0.txt")
    assert hist.shape == (500, 2) and hist[:, 1].sum() > 0


def test_hex_order_calc_end_to_end(tmp_path):
    top, traj = _system()
    avg_psi, var_psi = orderparams.hex_order_calc(
        top, traj, output_dir=str(tmp_path), row_block=16
    )
    assert np.isfinite(avg_psi[0][0]) and 0 <= avg_psi[0][0] <= 1
    assert (tmp_path / "psiDistribution_0.txt").exists()
