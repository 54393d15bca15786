"""Test configuration: force an 8-device virtual CPU platform.

All tests run on CPU-JAX with 8 virtual devices so that multi-chip sharding
paths (data/tensor parallel) are exercised without TPU hardware — the
TPU-native analog of multi-node simulation (SURVEY.md §4).
"""

import os

# The container's sitecustomize force-registers the axon TPU plugin and the
# env pins JAX_PLATFORMS=axon, so a plain env override is not enough — set
# the platform through jax.config before any backend is initialized.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() == 8


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute tests (full-production-scale parity); "
        "deselect with -m 'not slow'",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# captured at conftest import — BEFORE any fixture can run a trainer.
# Restoring to a per-test `before` snapshot is not enough: module-scoped
# fixtures (higher scope) run before the function-scoped autouse fixture,
# so a trainer run inside e.g. test_end_to_end's module fixture would be
# captured as the "original" and leak rbg for the rest of the session
# (observed: test_multihost's in-process reference ran with rbg masks
# while its fresh worker subprocesses used threefry → loss mismatch).
_SESSION_PRNG_IMPL = jax.config.jax_default_prng_impl


@pytest.fixture(autouse=True)
def _isolate_default_prng_impl():
    """Trainer mains set jax_default_prng_impl='rbg' (train/config.py::
    rng_impl — the shipped TPU default); restore the session-start default
    after every test so trainer-invoking tests/fixtures don't leak the impl
    into bit-exactness tests (e.g. test_parallel's DP-vs-single equality,
    whose per-element threefry bits are topology-invariant while rbg bits
    under SPMD are not)."""
    yield
    if jax.config.jax_default_prng_impl != _SESSION_PRNG_IMPL:
        jax.config.update("jax_default_prng_impl", _SESSION_PRNG_IMPL)
