"""metrics.dat writer: the analog of scripts/process_out.py +
scripts/plot_metrics.py (reference), which scrape the run log for
[iteration, wall-time/iter, largest force, mean velocity, apparent
relative viscosity] rows.  Here the simulation appends the rows directly.
"""

from __future__ import annotations

import os
import time

import numpy as np


class MetricsLog:
    """Appends reference-format rows to <outdir>/metrics.dat."""

    COLUMNS = (
        "iteration",
        "wall_time_per_iter_s",
        "largest_force_pN",
        "mean_velocity_m_s",
        "apparent_rel_viscosity",
    )

    def __init__(self, outdir: str):
        os.makedirs(outdir, exist_ok=True)
        self.path = os.path.join(outdir, "metrics.dat")
        self._t0 = time.time()
        self._last_iter = 0
        with open(self.path, "w") as f:
            f.write("# " + " ".join(self.COLUMNS) + "\n")

    def record(self, hc):
        """Sample the facade's current state (call at tmeas boundaries)."""
        from ..config.defaults import FLAG_FLUID
        from ..fluid import lbm

        import jax.numpy as jnp

        now = time.time()
        d_it = max(1, hc.iter - self._last_iter)
        wall_per_iter = (now - self._t0) / d_it
        self._t0, self._last_iter = now, hc.iter

        u = np.asarray(hc.fluid_velocity())
        fluid = np.asarray(hc.flags) == FLAG_FLUID
        umean = float(np.abs(u[0])[fluid].mean()) * hc.params.dx / hc.params.dt
        largest = 0.0
        for cs in hc.state.cells:
            alive = np.asarray(cs.alive)
            if alive.any():
                frc = np.asarray(cs.force)[alive] + np.asarray(
                    cs.force_repulsion
                )[alive]
                largest = max(
                    largest,
                    float(np.linalg.norm(frc, axis=-1).max())
                    * hc.params.df * 1e12,
                )
        visc = (hc.params.u_lbm_max * 0.5) / max(
            float(np.abs(u[0])[fluid].mean()), 1e-30
        )
        with open(self.path, "a") as f:
            f.write(
                f"{hc.iter} {wall_per_iter:.6f} {largest:.6g} "
                f"{umean:.6g} {visc:.6g}\n"
            )


def plot_metrics(directory: str = "."):
    """Render the four reference plots from metrics.dat
    (scripts/plot_metrics.py) when matplotlib is available."""
    data = np.loadtxt(os.path.join(directory, "metrics.dat"))
    data = np.atleast_2d(data)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    names = [
        "wall-time (s)",
        "largest force (pN)",
        "mean velocity (m/s)",
        "apparent rel. viscosity",
    ]
    fnames = [
        "wall_time.png",
        "largest_force.png",
        "mean_vel.png",
        "app_rel_visc.png",
    ]
    for col in range(1, 5):
        fig = plt.figure()
        plt.plot(data[:, 0], data[:, col], label=names[col - 1])
        plt.xlabel("iteration")
        plt.ylabel(names[col - 1])
        plt.legend()
        plt.savefig(os.path.join(directory, fnames[col - 1]), dpi=150)
        plt.close(fig)
    return fnames
