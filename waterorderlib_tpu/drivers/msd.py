"""Mean-squared-displacement driver.

Built on the `calcSD` unwrapping kernel (waterlib.f90:923-951, exposed here
as core.geometry.squared_displacement). The reference ships the building
block but no driver; this completes the workflow: PBC-unwrapped per-atom
squared displacements accumulated over the trajectory with a jitted scan,
MSD(t) vs the first frame, and a diffusion-coefficient estimate from the
linear tail.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from waterorderlib_tpu.core import geometry
from waterorderlib_tpu.drivers.orderparams import _resolve_system


def msd_calc(
    top_file,
    traj_file,
    atom_inds=None,
    wat_res: str = "WAT",
    stride: int = 1,
    dt: float = 1.0,
    fit_fraction: float = 0.5,
    output_dir: str = ".",
    mesh=None,
):
    """MSD(t) of the selected atoms (default: water oxygens) relative to the
    first frame, with PBC unwrapping between consecutive frames.

    Returns (msd (F,), D) where D = slope/6 from a least-squares fit over
    the final `fit_fraction` of the curve, in A^2 / time-unit. Writes
    msd.txt (time, msd).

    mesh: optional jax.sharding.Mesh — atoms are sharded over the whole
    mesh (the frame scan is serial, so atom TP is the natural axis here);
    atoms are zero-padded with a False mask to the device count."""
    top, traj = _resolve_system(top_file, traj_file, stride)
    if atom_inds is None:
        atom_inds, _, _ = top.get_wat_inds(wat_res)
    pos = jnp.asarray(traj.positions[:, atom_inds, :])
    boxes = jnp.asarray(traj.boxes)

    if mesh is not None:
        from waterorderlib_tpu.parallel.mesh import sharded_msd

        ndev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        n = pos.shape[1]
        n_pad = (-n) % ndev
        mask = jnp.concatenate([jnp.ones(n, bool), jnp.zeros(n_pad, bool)])
        if n_pad:
            pos = jnp.concatenate(
                [pos, jnp.zeros((pos.shape[0], n_pad, 3), pos.dtype)], axis=1
            )
        msd = np.asarray(sharded_msd(pos, boxes, mesh, mask=mask))
    else:
        @jax.jit
        def run(pos, boxes):
            ref = pos[0]

            def step(prev, frame):
                p, box = frame
                sd, new = geometry.squared_displacement(p, prev, ref, box)
                return new, jnp.mean(jnp.sum(sd, axis=-1))

            _, msd = jax.lax.scan(step, ref, (pos, boxes))
            return msd

        msd = np.asarray(run(pos, boxes))
    t = np.arange(len(msd)) * dt
    n_fit = max(int(len(msd) * fit_fraction), 2)
    slope = np.polyfit(t[-n_fit:], msd[-n_fit:], 1)[0] if len(msd) >= 2 else 0.0
    np.savetxt(
        os.path.join(output_dir, "msd.txt"),
        np.stack([t, msd], axis=1),
        header="time    MSD (A^2)", fmt="%.6e",
    )
    return msd, float(slope / 6.0)
