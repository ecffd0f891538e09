"""Test env: force CPU backend with 8 virtual devices (standard JAX practice for
testing multi-chip sharding without hardware — SURVEY.md §4 implication (4)).

Must run before jax is imported anywhere.
"""
import os
import sys

# The environment's sitecustomize registers the axon TPU plugin whenever
# PALLAS_AXON_POOL_IPS is set and forces JAX_PLATFORMS=axon — and it imports
# jax at interpreter startup, *before* this conftest runs. Clearing env vars is
# therefore not enough: jax.config must be updated post-import so tests really
# run on CPU (the TPU is a single remote chip; tests must not claim it).
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def small_graph():
    from spgemm_gnn_tpu.graphs.synthetic import random_graph
    return random_graph(64, 512, seed=1)


@pytest.fixture(scope="session")
def skewed_graph():
    from spgemm_gnn_tpu.graphs.synthetic import powerlaw_graph
    return powerlaw_graph(200, 2000, seed=2)
