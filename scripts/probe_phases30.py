"""Per-phase breakdown of the north-star pipeflow30 case on the chip.

VERDICT r03 #3: the headline step's cost was unprofiled — at the fluid
kernel's measured speed the fluid pass is a small fraction of the step,
and the dominant IBM/sort/mechanics share had no committed evidence.
This drives `HemoCell.profile_phases` (the TPU analog of the reference's
hierarchical profiler, helper/profiler.cpp:138-180) on the actual
pipeflow30 configuration and prints the table for docs/PERFORMANCE.md.

Usage: timeout 1800 python scripts/probe_phases30.py [n]
"""

import os
import sys

import jax

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/cases")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100

    from pipeflow30 import build_pipeflow30

    hc = build_pipeflow30()
    hc.iterate(1)
    hc.block()
    print(f"backend={jax.default_backend()} shape={hc.shape} "
          f"cells={hc.alive_count(0)}+{hc.alive_count(1)} "
          f"resort_every={hc._auto_resort_every()}", flush=True)
    hc.profile_phases(n=n)


if __name__ == "__main__":
    main()
