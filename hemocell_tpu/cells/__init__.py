from .repulsion import (
    boundary_neighbor_mask,
    boundary_repulsion_forces,
    repulsion_forces,
)
from .state import (
    CellTypeState,
    filter_wall_overlaps,
    load_pos_file,
    make_cell_state,
    place_cells,
)

__all__ = [
    "CellTypeState",
    "boundary_neighbor_mask",
    "boundary_repulsion_forces",
    "filter_wall_overlaps",
    "load_pos_file",
    "make_cell_state",
    "place_cells",
    "repulsion_forces",
]
