"""Test configuration.

Tests run on a virtual 8-device CPU mesh with float64 enabled so that the
conformance goldens (quoted to ~1e-10 by the reference test suite) can be
matched exactly.  TPU execution paths are exercised by bench.py and the
driver's compile checks instead.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax

# The container's sitecustomize registers the TPU ('axon') backend in every
# interpreter and overrides JAX_PLATFORMS; initializing it dials the TPU
# tunnel and can block for minutes.  Tests are CPU-only by design, so pin
# the platform list before any backend is initialized.  Set
# LINEARHAM_TEST_TPU=1 to leave the TPU visible for @pytest.mark.tpu
# compiled-kernel tests (never run two TPU-touching processes at once).
if not os.environ.get("LINEARHAM_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    # f64 for the reference conformance goldens.  The TPU kernel session
    # stays in the production configuration (f32, x64 off): x64 makes
    # Pallas grid index maps trace as i64, which Mosaic's AOT helper
    # rejects -- and no production TPU path ever runs with x64 on.
    jax.config.update("jax_enable_x64", True)
# CPU compiles of the fused phylo step take minutes; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/linearham_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pathlib
import subprocess
import sys

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session", autouse=True)
def _ensure_fixtures():
    if not (FIXTURES / "simple_hmm_input.yaml").exists():
        subprocess.run(
            [sys.executable, str(FIXTURES / "make_fixtures.py")], check=True
        )


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXTURES
