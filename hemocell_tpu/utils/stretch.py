"""Optical-tweezers cell stretching.

Equivalent of ``HemoCellStretch`` (reference: helper/hemoCellStretch.{h,cpp}):
the N vertices with the lowest x-coordinate get -F/N in x, the N highest get
+F/N, applied every iteration.  Here it is a static per-vertex external force
array handed to the step (mechanics adds it whenever forces are rebuilt, so
the cell-type material timescale must be 1, as the reference enforces).
"""

from __future__ import annotations

import numpy as np


def stretch_force_array(
    template_vertices: np.ndarray, n_forced: int, total_force_lu: float
) -> np.ndarray:
    """[1, NV, 3] external force array for a single cell.

    template_vertices: [NV, 3]; vertex selection by x-rank matches
    FindForcedLsps (hemoCellStretch.cpp:30-60).
    """
    nv = template_vertices.shape[0]
    order = np.argsort(template_vertices[:, 0], kind="stable")
    per_vertex = total_force_lu / n_forced
    f = np.zeros((1, nv, 3))
    f[0, order[:n_forced], 0] = -per_vertex
    f[0, order[nv - n_forced :], 0] = +per_vertex
    return f
