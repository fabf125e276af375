"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding paths run on a faked 8-device CPU mesh
(--xla_force_host_platform_device_count), the standard JAX trick for testing
pjit/mesh code without a pod (SURVEY.md §4). Must be set before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers a TPU backend and overrides
# JAX_PLATFORMS via jax.config — override it back before any backend init.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synth_root(tmp_path_factory):
    """Session-scoped synthetic dataset tree (tiny)."""
    from genome_minimizer_2_tpu.data import synthetic

    root = tmp_path_factory.mktemp("synthdata")
    info = synthetic.make_dataset_root(root, n_samples=40, n_genes=120,
                                       genome_length=4000, seed=0)
    return info


@pytest.fixture()
def rng():
    return np.random.RandomState(0)
