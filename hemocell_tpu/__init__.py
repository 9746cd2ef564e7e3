"""hemocell_tpu — a TPU-native immersed-boundary lattice-Boltzmann framework
for suspensions of deformable cells (blood: RBCs, platelets, WBCs).

Ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
HemoCell v2.7 (C++/MPI/Palabos).  The Eulerian D3Q19 fluid is a dense sharded
array advanced by a fused stream-collide kernel; Lagrangian membranes are
fixed-shape struct-of-array tensors over all cells, coupled through
gather/scatter IBM kernels; multi-chip scaling is GSPMD sharding over a
``jax.sharding.Mesh`` instead of MPI block decomposition.
"""

__version__ = "0.1.0"

from .config import Config, Parameters

__all__ = ["Config", "Parameters", "HemoCell", "__version__"]


def __getattr__(name):
    if name == "HemoCell":
        from .hemocell import HemoCell

        return HemoCell
    raise AttributeError(name)
