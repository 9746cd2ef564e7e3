#!/bin/bash
# Serial on-chip work queue (one TPU job at a time — the axon tunnel
# serialises transfers; concurrent jobs inflate timings 2x).
# Run after a tunnel outage to re-validate everything in one pass.
set -x
cd /root/repo

echo "=== 1. entry AOT compile (strict Mosaic check)"
timeout 900 python -c "
import __graft_entry__ as g
fn, args = g.entry()
import jax; jax.block_until_ready(jax.jit(fn)(*args)); print('entry OK')" \
  2>&1 | tail -3

echo "=== 2. tx sweep (validates the new _pick_tx defaults + modes)"
timeout 1800 python scripts/probe_tx_sweep.py 2>&1 | grep -v "^E0\|experimental"

echo "=== 3. bench"
timeout 1800 python bench.py 2>&1 | tail -2

echo "=== 3b. roofline ablation (copy/collide/pull components at 128^3)"
timeout 1800 python scripts/probe_roofline.py 2>&1 | grep -v "^E0\|experimental"

echo "=== 4. perf sweep (2-D kernel tilings, resort cadence, phases)"
timeout 1800 python scripts/chip_sweep.py --skip bench 2>&1 \
  | grep -v "^E0\|experimental"

echo "=== 5. TPU validation oracles (append numbers to VALIDATION.md)"
timeout 3600 python scripts/run_validation.py --write VALIDATION.md 2>&1 | tail -8

echo "=== done"
