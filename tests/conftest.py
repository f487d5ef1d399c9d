"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Per SURVEY.md 4(c): multi-chip sharding is tested on a host-platform mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8) so pod behavior is
exercised without TPU hardware.  Set before jax import.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the axon TPU plugin ignores JAX_PLATFORMS from the environment; force the
# host platform through the config API before any jax use
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def random_genome(rng, length, seed_contigs=None):
    """Generate a random DNA string."""
    return "".join(np.array(list("ACGT"))[rng.integers(0, 4, size=length)])


@pytest.fixture(scope="session")
def small_reference(rng):
    """A small multi-contig reference with some N bases and a repeat."""
    c1 = random_genome(rng, 5000)
    # embed an exact repeat of a 300bp block to exercise multi-hit logic
    c1 = c1[:1200] + c1[400:700] + c1[1500:]
    c2 = random_genome(rng, 3000)
    c2 = c2[:1000] + "N" * 25 + c2[1025:]
    return [("chr1", "test contig 1", c1), ("chr2", "", c2)]
