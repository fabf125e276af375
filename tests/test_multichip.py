"""Multi-chip sharding on the virtual 8-device CPU mesh: numerical parity of
data-parallel and tensor-parallel training vs single-device, and the driver
dryrun contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genome_minimizer_2_tpu.parallel import mesh as MESH
from genome_minimizer_2_tpu.train import trainer as T
from genome_minimizer_2_tpu.utils.config import ExperimentConfig

D = 70


def _config(**kw):
    cfg = ExperimentConfig(hidden_dim=16, latent_dim=4, n_epochs=2, batch_size=8,
                           trainer_version="v3", print_every=1000)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def _data():
    rng = np.random.RandomState(0)
    return (rng.rand(44, D).round().astype(np.float32),
            rng.rand(13, D).round().astype(np.float32))


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("data,model", [(8, 1), (4, 2), (2, 2), (2, 4)])
def test_sharded_training_matches_single_device(data, model):
    train_x, val_x = _data()

    ref = T.create_trainer("v3", _config(), input_dim=D)
    tl_ref, vl_ref, _ = ref.train(train_x, val_x)

    mesh = MESH.make_mesh(data=data, model=model,
                         devices=jax.devices()[: data * model])
    par = T.create_trainer("v3", _config(), input_dim=D, mesh=mesh)
    state = par.shard_state(par.init_state())
    tl_par, vl_par, _ = par.train(train_x, val_x, state=state)

    np.testing.assert_allclose(tl_par, tl_ref, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(vl_par, vl_ref, rtol=2e-4, atol=1e-5)


def test_param_sharding_rules():
    mesh = MESH.make_mesh(data=4, model=2)
    from jax.sharding import PartitionSpec as P

    s = MESH.param_sharding(mesh, "params/encoder/0/w", (128, 16))
    assert s.spec == P("model", None)
    s = MESH.param_sharding(mesh, "1/0/mu/decoder/3/w", (16, 128))
    assert s.spec == P(None, "model")
    s = MESH.param_sharding(mesh, "params/encoder/1/w", (16, 16))
    assert s.spec == P()
    # trivial model axis -> everything replicated
    mesh1 = MESH.make_mesh(data=8, model=1)
    assert MESH.param_sharding(mesh1, "encoder/0/w", (128, 16)).spec == P()


def test_dryrun_multichip():
    import __graft_entry__ as G

    G.dryrun_multichip(8)


def test_entry_compiles_tiny():
    """entry() returns a jittable fn; compile-check a tiny analogue (the
    real 55k-dim flagship is exercised by the driver on TPU)."""
    from genome_minimizer_2_tpu.models import vae

    cfg = vae.VAEConfig(input_dim=50, hidden_dim=8, latent_dim=2)
    params, stats = vae.init(cfg, jax.random.key(0))
    batch = jnp.zeros((4, cfg.padded_dim))

    def fn(params, stats, batch, key):
        return vae.forward(cfg, params, stats, batch, key, train=False)[0]

    out = jax.jit(fn)(params, stats, batch, jax.random.key(1))
    assert out.shape == (4, cfg.padded_dim)
