"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on a virtual host-platform mesh (8 forced CPU devices), per the
build contract. The environment's sitecustomize pre-imports jax and
registers the remote-TPU backend, so the platform must be switched via
jax.config (env vars are read too early to help).
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: compiles dominate the suite's wall
# time on this 1-CPU host, and most test programs are identical across
# runs. The cache dir is repo-local (gitignored) so repeat runs — and
# the fast tier in particular — skip straight to execution.
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run the slow tier (long training loops, full virtual-mesh "
             "compiles); the default tier runs ~9 min warm-cache on an "
             "8-vCPU host, >10 min cold — pre-seed with "
             "scripts/ci_test.sh, which also documents the full "
             "--runslow tier")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (training loops, 8-device "
        "compiles); excluded unless --runslow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
