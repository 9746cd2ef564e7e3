from .checkpoint import (
    load_checkpoint,
    load_preinlet_checkpoint,
    save_checkpoint,
    save_preinlet_checkpoint,
)
from .hdf5io import write_cell_csv, write_cells_hdf5, write_fluid_hdf5, zero_pad

__all__ = [
    "load_checkpoint",
    "load_preinlet_checkpoint",
    "save_checkpoint",
    "save_preinlet_checkpoint",
    "write_cell_csv",
    "write_cells_hdf5",
    "write_fluid_hdf5",
    "zero_pad",
]
