"""Record WBC + RBC_MALARIA force-extension datapoints to anchor the
slow-gated material oracles (tests/test_material_oracles.py).

The reference publishes no numeric bands for these two models
(mechanics/wbcHighOrderModel.cpp, rbcMalariaModel.cpp; the stretchMalaria
case logs a diameter time series but ships no assertion), so the oracle
strategy is the same as the voxelizer's: record OUR measured response once,
assert the physics invariants (stiffness ordering vs the healthy RBC,
volume conservation, monotonicity in force) plus a band around the
recorded values to catch regressions.

Usage: timeout 3600 python scripts/probe_material_oracles.py
"""

import pathlib
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import numpy as np

REF_MALARIA = "/root/reference/cases/stretchMalaria/config.xml"


def wbc(force_pn, iters=3000):
    sys.path.insert(0, "/root/repo/tests")
    from test_integration import CONFIG_XML, make_stretch_setup  # noqa
    import textwrap

    from hemocell_tpu import HemoCell
    from hemocell_tpu.config.defaults import FLAG_WALL
    from hemocell_tpu.utils.stretch import stretch_force_array

    wbc_xml = pathlib.Path(
        "/root/repo/tools/cell_templates/WBC_template.xml"
    ).read_text()
    with tempfile.TemporaryDirectory() as d:
        d = pathlib.Path(d)
        (d / "config.xml").write_text(CONFIG_XML)
        (d / "WBC.xml").write_text(wbc_xml)
        (d / "WBC.pos").write_text("1\n13.0 6.5 6.5 0 0 0\n")
        hc = HemoCell(str(d / "config.xml"))
        n = 52
        flags = np.zeros((n, n // 2, n // 2), np.uint8)
        for ax in range(3):
            sl = [slice(None)] * 3
            sl[ax] = 0
            flags[tuple(sl)] = FLAG_WALL
            sl[ax] = -1
            flags[tuple(sl)] = FLAG_WALL
        hc.initialize_lattice(flags=flags)
        hc.add_cell_type("WBC", "WbcHighOrderModel")
        hc.load_particles()
        placed = np.asarray(hc.cell_states[0].pos[0])
        hc.set_external_force(
            0, stretch_force_array(placed, 7, hc.params.pn_to_lu(force_pn))
        )
        v0 = float(hc.cell_volumes(0)[0])
        bbox = np.asarray(hc.cell_bounding_boxes(0)[0])
        um = hc.params.dx * 1e6
        a0 = (bbox[1] - bbox[0]) * um
        hc.iterate(iters)
        bbox = np.asarray(hc.cell_bounding_boxes(0)[0])
        a1 = (bbox[1] - bbox[0]) * um
        t1 = (bbox[3] - bbox[2]) * um
        v1 = float(hc.cell_volumes(0)[0])
        print(f"WBC {force_pn:6.1f} pN: axial {a0:.3f} -> {a1:.3f} um, "
              f"transverse {t1:.3f} um, vol ratio {v1/v0:.4f}", flush=True)
        return a0, a1, t1, v1 / v0


def malaria(force_pn, iters=3000):
    sys.path.insert(0, "/root/repo/cases")
    from stretch_malaria import build

    hc = build(REF_MALARIA, force_pn)
    v0 = float(hc.cell_volumes(0)[0])
    um = hc.params.dx * 1e6
    bbox = np.asarray(hc.cell_bounding_boxes(0)[0])
    a0 = (bbox[1] - bbox[0]) * um
    hc.iterate(iters)
    bbox = np.asarray(hc.cell_bounding_boxes(0)[0])
    a1 = (bbox[1] - bbox[0]) * um
    t1 = (bbox[3] - bbox[2]) * um
    v1 = float(hc.cell_volumes(0)[0])
    print(f"MAL {force_pn:6.1f} pN: axial {a0:.3f} -> {a1:.3f} um, "
          f"transverse {t1:.3f} um, vol ratio {v1/v0:.4f}", flush=True)
    return a0, a1, t1, v1 / v0


if __name__ == "__main__":
    for f in (50.0, 125.0):
        wbc(f)
    for f in (55.0, 110.0):
        malaria(f)
