"""WBC + RBC_MALARIA force-extension oracles (VERDICT r03 #8).

The reference ships no numeric bands for these two models — the
stretchMalaria case logs a diameter time series with no assertion
(cases/stretchMalaria/stretchMalaria.cpp:138-168) and WbcHighOrderModel
has no validation case at all (mechanics/wbcHighOrderModel.cpp) — so the
oracle strategy matches the voxelizer's: record OUR measured response
once (scripts/probe_material_oracles.py, TPU chip, 2026-08-20), assert
the physics invariants (stiffness ordering vs the healthy RBC, volume
conservation, monotonicity in force) plus a band around the recorded
values to catch regressions.

Recorded (3000 iterations, f32):
  WBC  50 pN: axial 8.000 -> 9.330 um, transverse 7.940, vol ratio 1.0004
  WBC 125 pN: axial 8.000 -> 10.408 um, transverse 7.868, vol ratio 1.0010
  MAL  55 pN: axial 10.800 -> 11.668 um, transverse 4.758, vol ratio 1.0013
  MAL 110 pN: axial 10.800 -> 12.303 um, transverse 4.695, vol ratio 1.0021
"""

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import importlib.util

_spec = importlib.util.spec_from_file_location(
    "probe_material_oracles",
    pathlib.Path(__file__).resolve().parents[1]
    / "scripts" / "probe_material_oracles.py",
)
_probe = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_probe)


@pytest.mark.slow
@pytest.mark.parametrize(
    "force_pn,a_lo,a_hi,t_lo,t_hi",
    [
        (50.0, 9.0, 9.7, 7.6, 8.2),
        (125.0, 10.0, 10.8, 7.5, 8.2),
    ],
)
def test_wbc_stretch_oracle(force_pn, a_lo, a_hi, t_lo, t_hi):
    """WBC optical-tweezers response: band around the recorded values +
    the physics invariant that the rigid inner-edge core
    (wbcHighOrderModel.cpp:202-221) makes the WBC stretch LESS than the
    healthy RBC at the same force (RBC 125 pN axial band is 12.25-12.75,
    test_stretch_cell.cpp:159-163)."""
    a0, a1, t1, vr = _probe.wbc(force_pn)
    assert a_lo <= a1 <= a_hi, f"axial {a1}"
    assert t_lo <= t1 <= t_hi, f"transverse {t1}"
    assert 0.98 < vr <= 1.02
    if force_pn == 125.0:
        assert a1 < 12.25, "WBC must be stiffer than the healthy RBC"


@pytest.mark.slow
@pytest.mark.parametrize(
    "force_pn,a_lo,a_hi",
    [
        (55.0, 11.3, 12.0),
        (110.0, 11.9, 12.7),
    ],
)
def test_malaria_stretch_oracle(force_pn, a_lo, a_hi):
    """Stage-V gametocyte (RbcMalariaModel inner-link skeleton,
    rbcMalariaModel.cpp:200-220) under the reference stretchMalaria
    protocol (110 pN): band around the recorded response + the invariant
    that the infected cell's stretch INCREMENT stays far below the
    healthy RBC's (~1.5 um vs ~4.6 um at comparable force)."""
    a0, a1, t1, vr = _probe.malaria(force_pn)
    assert a_lo <= a1 <= a_hi, f"axial {a1}"
    assert 0.98 < vr <= 1.02
    assert (a1 - a0) < 2.5, "gametocyte must stretch far less than RBC"


@pytest.mark.slow
def test_wbc_monotone_in_force():
    """More force, more stretch (same protocol, shorter runs)."""
    _, a_50, _, _ = _probe.wbc(50.0, iters=1500)
    _, a_125, _, _ = _probe.wbc(125.0, iters=1500)
    assert a_125 > a_50 + 0.3
