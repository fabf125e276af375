"""Small utilities: lazy API exports, distributed helpers, throughput meter,
dtype policy."""

import numpy as np
import pytest


def test_lazy_api_exports():
    import genome_minimizer_2_tpu as gm

    assert callable(gm.get_preset_config)
    assert callable(gm.parse_genbank)
    assert gm.ExperimentConfig().batch_size == 32
    with pytest.raises(AttributeError):
        gm.does_not_exist


def test_host_shard_partition():
    from genome_minimizer_2_tpu.parallel.distributed import host_shard

    lo, hi = host_shard(100)  # single process
    assert (lo, hi) == (0, 100)


def test_multihost_env_detection(monkeypatch):
    from genome_minimizer_2_tpu.parallel import distributed as D

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert not D.running_under_multihost_env()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host1,host2")
    assert D.running_under_multihost_env()
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "1.2.3.4:1234")
    assert D.running_under_multihost_env()


def test_maybe_initialize_noop_single_host(monkeypatch):
    from genome_minimizer_2_tpu.parallel import distributed as D

    for k in D._ENV_HINTS:
        monkeypatch.delenv(k, raising=False)
    assert D.maybe_initialize() is False


def test_throughput_meter():
    from genome_minimizer_2_tpu.utils.profiling import Throughput

    t = Throughput()
    with t.phase("work", 10):
        pass
    with t.phase("work", 20):
        pass
    assert t.counts["work"] == 30
    assert t.rate("work") > 0
    assert "work" in t.report()


def test_trace_noop(monkeypatch):
    from genome_minimizer_2_tpu.utils.profiling import trace

    monkeypatch.delenv("GM2_PROFILE_DIR", raising=False)
    with trace(None):
        x = 1
    assert x == 1


def test_dtype_policy():
    import jax.numpy as jnp

    from genome_minimizer_2_tpu.core.dtypes import FULL, MIXED, Policy, round_up

    assert FULL.compute_dtype == jnp.float32
    assert MIXED.compute_dtype == jnp.bfloat16
    assert Policy("bfloat16").param_dtype == jnp.float32
    assert round_up(55039, 128) == 55040
    assert round_up(128, 128) == 128


def test_auto_compute_dtype_resolution():
    from genome_minimizer_2_tpu.core.dtypes import resolve_compute_dtype

    assert resolve_compute_dtype("auto", "tpu") == "bfloat16"
    assert resolve_compute_dtype("auto", "cpu") == "float32"
    assert resolve_compute_dtype("float32", "tpu") == "float32"
    assert resolve_compute_dtype("bfloat16", "cpu") == "bfloat16"
    # platform=None -> default backend (cpu under the test conftest)
    assert resolve_compute_dtype("auto") == "float32"

    # the trainer resolves through the mesh's platform
    import jax

    from genome_minimizer_2_tpu.parallel import mesh as MESH
    from genome_minimizer_2_tpu.train.trainer import create_trainer
    from genome_minimizer_2_tpu.utils.config import ExperimentConfig

    cfg = ExperimentConfig(hidden_dim=8, latent_dim=2)
    assert cfg.compute_dtype == "auto"
    tr = create_trainer("v0", cfg, input_dim=16,
                        mesh=MESH.make_mesh(data=2, model=1,
                                            devices=jax.devices()[:2]))
    assert tr.model_cfg.policy.compute == "float32"
