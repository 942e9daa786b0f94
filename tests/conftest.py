"""Test config: force an 8-virtual-device CPU backend so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# Must run before any backend is initialized.  NOTE: this environment ships a
# TPU plugin that force-prepends itself to JAX_PLATFORMS, so the env var alone
# is not enough — we must also override via jax.config below.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Tiny-matrix transform math in tests must not be demoted to bf16 on any
# backend.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_ASSETS = "/root/reference/assets"
OUR_ASSETS = os.path.join(REPO, "assets")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
