"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so sharding logic is exercised
without a pod (SURVEY.md §4.4); bench.py runs on the real TPU chip.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The hosting image's sitecustomize registers the TPU platform and overrides
# JAX_PLATFORMS; force CPU after import so tests never claim the real chip.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def sample_bin() -> np.ndarray:
    """The reference golden capture: 286,080 u8 IQ pairs at 2,359,296 S/s
    containing at least one SCM packet (reference assets/sample.bin,
    SURVEY.md §2 C21)."""
    return np.fromfile(FIXTURES / "sample.bin", dtype=np.uint8)
