"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
exercised on host-platform virtual devices (the driver separately dry-runs
the multi-chip path).  Must be set before jax is imported anywhere.
"""

import os

# The harness environment pins JAX_PLATFORMS=axon (single tunneled TPU chip)
# and its sitecustomize overrides jax_platforms via jax.config at interpreter
# start — so both the env var AND the config entry must be forced back to cpu.
# HEMOCELL_TEST_PLATFORM=tpu keeps the real chip (for the --run-slow
# validation oracles, whose recorded numbers live in VALIDATION.md).
_platform = os.environ.get("HEMOCELL_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
# f64 available for validation-grade tests; arrays default to f32 unless asked
# (TPU has no f64 — x64 stays off there)
if _platform == "cpu":
    os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# sitecustomize imports jax before this file runs, so env vars alone are
# ignored — the config entries must be set directly.
if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    assert jax.default_backend() == "cpu", jax.default_backend()

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long validation runs (--run-slow)")
    config.addinivalue_line(
        "markers",
        "shard: multi-device shard_map/owner/GSPMD tests — heavy compiles; "
        "fast tier deselects them with -m 'not shard' (see tests/README.md)",
    )
    config.addinivalue_line(
        "markers",
        "smoke: sub-2-minute core subset (config/mesh/mechanics/fluid/IBM/"
        "IO units) — run with -m smoke for quick CI iteration",
    )


def pytest_addoption(parser):
    parser.addoption(
        "--run-slow",
        action="store_true",
        default=False,
        help="run slow validation tests",
    )


def pytest_collection_modifyitems(config, items):
    # auto-tier: the multi-device suites dominate wall time (heavy shard_map
    # compiles on the 8-device CPU mesh) — mark them so CI can run a fast
    # tier with -m 'not shard'
    smoke_files = {
        "test_config.py", "test_mesh.py", "test_mechanics.py",
        "test_fluid.py", "test_ibm.py", "test_io.py",
        "test_aux_fields.py", "test_restime_signals.py",
    }
    for item in items:
        fn = item.fspath.basename
        if any(k in fn for k in ("shard", "owner", "gspmd", "preinlet")):
            item.add_marker(pytest.mark.shard)
        if fn in smoke_files:
            item.add_marker(pytest.mark.smoke)
    if config.getoption("--run-slow"):
        return
    skip_slow = pytest.mark.skip(reason="needs --run-slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
