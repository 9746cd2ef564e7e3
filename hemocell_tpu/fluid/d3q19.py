"""D3Q19 lattice constants.

TPU-native replacement for the Palabos ``ForcedD3Q19Descriptor``
(reference engine, instantiated at core/hemoCell.cpp:455-469).  Population
layout is ``f[19, X, Y, Z]`` — direction-major so streaming is 19 static
shifts and Z rides the TPU lane dimension.

Ordering: index 0 is the rest population; directions are listed with their
opposite at ``OPP[i]``.  cs^2 = 1/3.
"""

from __future__ import annotations

import numpy as np

# velocity set: rest, 6 axis-aligned, 12 diagonal
C = np.array(
    [
        [0, 0, 0],
        [-1, 0, 0], [1, 0, 0],
        [0, -1, 0], [0, 1, 0],
        [0, 0, -1], [0, 0, 1],
        [-1, -1, 0], [1, 1, 0],
        [-1, 1, 0], [1, -1, 0],
        [-1, 0, -1], [1, 0, 1],
        [-1, 0, 1], [1, 0, -1],
        [0, -1, -1], [0, 1, 1],
        [0, -1, 1], [0, 1, -1],
    ],
    dtype=np.int32,
)

W = np.array(
    [1.0 / 3.0]
    + [1.0 / 18.0] * 6
    + [1.0 / 36.0] * 12,
    dtype=np.float64,
)
# re-order weights to match C rows (axis pairs first then diagonals)
W = np.array(
    [1.0 / 3.0,
     1/18, 1/18, 1/18, 1/18, 1/18, 1/18,
     1/36, 1/36, 1/36, 1/36, 1/36, 1/36, 1/36, 1/36, 1/36, 1/36, 1/36, 1/36],
    dtype=np.float64,
)

# opposite directions: C[OPP[i]] == -C[i]
OPP = np.zeros(19, dtype=np.int32)
for _i in range(19):
    for _j in range(19):
        if (C[_j] == -C[_i]).all():
            OPP[_i] = _j
            break

INV_CS2 = 3.0
CS2 = 1.0 / 3.0

assert (C[OPP] == -C).all()
assert abs(W.sum() - 1.0) < 1e-15
assert (W[OPP] == W).all()
