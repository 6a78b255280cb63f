"""Test configuration: force CPU backend with a virtual 8-device mesh.

The axon sitecustomize registers the TPU backend eagerly and pins
JAX_PLATFORMS=axon, so we must both set the env vars and override the jax
config before any computation runs. Multi-chip sharding paths are validated on
the virtual CPU mesh; the real TPU is exercised by bench.py and the driver's
compile checks.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# CPU tests: run protocol logic in numpy (device kernels are covered by the
# forced-device tests and by bench/driver runs on the real TPU)
os.environ.setdefault("CENO_TPU_HOST_N", str(1 << 17))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# fast/slow split: the default suite must stay green inside a 10-minute
# window on the 4-CPU host (driver verification + iteration speed). Heavy
# e2e / prove / aggregation tests carry @pytest.mark.slow and run with
# `pytest -m slow` (or CENO_RUN_SLOW=1) as the nightly path.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy e2e/prove tests (run with -m slow or CENO_RUN_SLOW=1)",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("CENO_RUN_SLOW"):
        return
    if "slow" in (config.getoption("-m") or ""):
        return
    skip = pytest.mark.skip(
        reason="slow test: run with -m slow or CENO_RUN_SLOW=1"
    )
    for it in items:
        if "slow" in it.keywords:
            it.add_marker(skip)
