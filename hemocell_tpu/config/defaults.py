"""Framework-wide constants.

TPU-native equivalents of the reference compile-time flags
(reference: config/constant_defaults.h:29-191).  Where the reference bakes
these in at compile time, we keep them as module constants; stability clamps
are part of the validated material models and must not be changed lightly.
"""

# Stability clamps for the high-order membrane models
# (reference: config/constant_defaults.h:154-175)
MAX_CELL_VOLUMETRIC_CHANGE = 0.01
MAX_CELL_SURFACE_AREA_CHANGE = 0.09
MAX_CELL_BENDING_ANGLE = 0.0555
MAX_PLT_BENDING_ANGLE = 2.467
MAX_CELL_PERSISTENCE_LENGTH = 9.0

# Force cap applied when spreading particle forces to the fluid, in pN
# (reference: config/constant_defaults.h:74, applied at
#  core/hemoCellParticleField.cpp:848-852)
FORCE_LIMIT_PN = 50.0

# Particle position integration: 1 = Euler (reference default)
MATERIAL_INTEGRATION = 1

# Biological persistence length used in kLink conversion [m]
# (reference: mechanics/cellMechanics.h:52)
PERSISTENCE_LENGTH_FINE = 7.5e-9

# Reference eq length for kBend/kVolume/kArea conversions [m]
# (reference: mechanics/cellMechanics.h:58-73)
EQ_LENGTH_REF = 5e-7

# Face-count normalisation in kVolume/kArea (reference: cellMechanics.h:65)
NFACES_REF = 1280.0

# Flag-matrix node kinds (uint8 lattice flags)
FLAG_FLUID = 0
FLAG_WALL = 1  # bounce-back
FLAG_VELOCITY = 2  # prescribed-velocity (equilibrium) node
FLAG_PRESSURE = 3  # fixed-density (anti-bounce-back) outlet node

# Default output field ids kept for API parity with the reference
# (reference: config/constant_defaults.h:34-112)
OUTPUT_POSITION = 1
OUTPUT_FORCE = 2
OUTPUT_FORCE_VOLUME = 3
OUTPUT_FORCE_BENDING = 4
OUTPUT_FORCE_LINK = 5
OUTPUT_FORCE_AREA = 6
OUTPUT_FORCE_VISC = 7
OUTPUT_FORCE_INNER_LINK = 8
OUTPUT_TRIANGLES = 9
OUTPUT_VELOCITY = 10
OUTPUT_DENSITY = 11
OUTPUT_OMEGA = 12
OUTPUT_FORCE_REPULSION = 13
OUTPUT_VERTEX_ID = 14
OUTPUT_CELL_ID = 15
OUTPUT_SHEAR_STRESS = 16
OUTPUT_SHEAR_RATE = 17
OUTPUT_STRAIN_RATE = 18
OUTPUT_RES_TIME = 19
OUTPUT_BOUNDARY = 20
OUTPUT_CELL_DENSITY = 21
OUTPUT_FORCE_TOTAL = 22
OUTPUT_BINDING_SITES = 23
OUTPUT_INTERIOR_POINTS = 24
