"""Test configuration.

Tests run on a virtual 8-device CPU mesh with float64 enabled so that the
conformance goldens (quoted to ~1e-10 by the reference test suite) can be
matched exactly.  TPU execution paths are exercised by bench.py and the
driver's compile checks instead.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax

jax.config.update("jax_enable_x64", True)

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
