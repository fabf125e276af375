"""Fused BCE+colsum kernel: value and gradient parity (closed-form custom
VJP vs autodiff of the unfused path), and fused-vs-unfused training
equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genome_minimizer_2_tpu.ops import losses as L
from genome_minimizer_2_tpu.ops import pallas_kernels as PK

B, D = 8, 40


@pytest.fixture()
def inputs(rng):
    logits = jnp.asarray(rng.randn(B, D).astype(np.float32))
    targets = jnp.asarray(rng.rand(B, D).round().astype(np.float32))
    mask = jnp.ones(D).at[D - 7 :].set(0.0)
    return logits, targets, mask


def test_value_parity(inputs):
    logits, targets, mask = inputs
    bce, col = PK.bce_and_colsum(logits, targets, mask)
    np.testing.assert_allclose(
        float(bce), float(L.bce_sum_logits(logits, targets, mask)), rtol=1e-6)
    expected_col = np.asarray(jax.nn.sigmoid(logits) * mask).sum(axis=0)
    np.testing.assert_allclose(np.asarray(col), expected_col, rtol=1e-5,
                               atol=1e-6)


def test_gradient_parity(inputs):
    logits, targets, mask = inputs

    def fused(l):
        bce, col = PK.bce_and_colsum(l, targets, mask)
        return bce + 0.3 * jnp.sum(jnp.abs(col))

    def unfused(l):
        bce = L.bce_sum_logits(l, targets, mask)
        return bce + 0.3 * L.gene_abundance(l, mask)

    v1, g1 = jax.value_and_grad(fused)(logits)
    v2, g2 = jax.value_and_grad(unfused)(logits)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)
    # masked columns receive exactly zero gradient
    assert np.all(np.asarray(g1)[:, D - 7 :] == 0.0)


def test_compute_losses_fused_equals_unfused(inputs, rng):
    logits, targets, mask = inputs
    mu = jnp.asarray(rng.randn(B, 3).astype(np.float32))
    logvar = jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.2)
    spec = L.LossSpec(n_epochs=50, scheduler_type="cosine", T=10,
                      use_abundance=True, gamma_start=1.0, gamma_end=0.1,
                      use_l1=True, lambda_l1=0.01)
    params = {"w": jnp.asarray(rng.randn(4, 4).astype(np.float32))}
    args = (spec, params, logits, targets, mu, logvar,
            jnp.asarray(2), jnp.asarray(5), mask)
    t1, c1 = L.compute_losses(*args, fused=False)
    t2, c2 = L.compute_losses(*args, fused=True)
    np.testing.assert_allclose(float(t1), float(t2), rtol=1e-6)
    for k in c1:
        np.testing.assert_allclose(float(c1[k]), float(c2[k]), rtol=1e-6,
                                   err_msg=k)


def test_trainer_fused_vs_unfused_training():
    from genome_minimizer_2_tpu.train import trainer as T
    from genome_minimizer_2_tpu.utils.config import ExperimentConfig

    rng = np.random.RandomState(0)
    x = rng.rand(20, D).round().astype(np.float32)

    def run(use_fused):
        cfg = ExperimentConfig(hidden_dim=10, latent_dim=3, n_epochs=3,
                               batch_size=6, trainer_version="v3",
                               print_every=1000)
        cfg.use_pallas_loss = use_fused
        tr = T.create_trainer("v3", cfg, input_dim=D)
        return tr.train(x[:14], x[14:])

    tl_f, vl_f, _ = run(True)
    tl_u, vl_u, _ = run(False)
    # float reassociation between the two reduction orders compounds over
    # optimizer steps; 1e-3 relative over 3 epochs is reassociation-level
    np.testing.assert_allclose(tl_f, tl_u, rtol=1e-3)
    np.testing.assert_allclose(vl_f, vl_u, rtol=1e-3)


# ---------------------------------------------------------------------------
# shard_map-wrapped variant (data-parallel meshes)
# ---------------------------------------------------------------------------

def _dp_mesh(n=4):
    from genome_minimizer_2_tpu.parallel import mesh as MESH

    return MESH.make_mesh(data=n, model=1, devices=jax.devices()[:n])


def test_sharded_value_and_gradient_parity(inputs):
    logits, targets, mask = inputs
    fused = PK.make_sharded_bce_colsum(_dp_mesh())

    bce, col = fused(logits, targets, mask)
    np.testing.assert_allclose(
        float(bce), float(L.bce_sum_logits(logits, targets, mask)), rtol=1e-6)
    expected_col = np.asarray(jax.nn.sigmoid(logits) * mask).sum(axis=0)
    np.testing.assert_allclose(np.asarray(col), expected_col, rtol=1e-5,
                               atol=1e-6)

    def f_sharded(l):
        b, c = fused(l, targets, mask)
        return b + 0.3 * jnp.sum(jnp.abs(c))

    def f_ref(l):
        return (L.bce_sum_logits(l, targets, mask)
                + 0.3 * L.gene_abundance(l, mask))

    v1, g1 = jax.value_and_grad(jax.jit(f_sharded))(logits)
    v2, g2 = jax.value_and_grad(f_ref)(logits)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_trainer_picks_sharded_fused_on_dp_mesh(monkeypatch):
    """On a data-parallel mesh with a TPU platform the trainer must route the
    loss through the shard_map kernel — and training numerics must match the
    single-device unfused run (on this CPU mesh the kernel inside shard_map
    is the jnp reference, so this validates the shard_map + psum plumbing
    and the trainer gating, not Mosaic codegen)."""
    from genome_minimizer_2_tpu.train import trainer as T
    from genome_minimizer_2_tpu.utils.config import ExperimentConfig

    rng = np.random.RandomState(1)
    x = rng.rand(30, D).round().astype(np.float32)

    def cfg():
        return ExperimentConfig(hidden_dim=10, latent_dim=3, n_epochs=2,
                                batch_size=8, trainer_version="v3",
                                print_every=1000)

    ref = T.create_trainer("v3", cfg(), input_dim=D)
    tl_ref, vl_ref, _ = ref.train(x[:22], x[22:])

    mesh = _dp_mesh()
    par = T.create_trainer("v3", cfg(), input_dim=D, mesh=mesh)
    monkeypatch.setattr(T.VAETrainer, "_mesh_platform", lambda self: "tpu")
    # gating: full batches (8 rows / 4 devices) take the sharded kernel,
    # remainder batches (6 rows) fall back to the jnp path
    assert callable(par._fused_for_batch((8, D)))
    assert par._fused_for_batch((8, D)) is not True
    assert par._fused_for_batch((6, D)) is None

    state = par.shard_state(par.init_state())
    tl_par, vl_par, _ = par.train(x[:22], x[22:], state=state)
    np.testing.assert_allclose(tl_par, tl_ref, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(vl_par, vl_ref, rtol=2e-4, atol=1e-5)


def test_fused_gating_tp_mesh_falls_back(monkeypatch):
    """A mesh with a nontrivial model axis must NOT take the sharded fused
    path (TP shards the gene axis of the logits)."""
    from genome_minimizer_2_tpu.parallel import mesh as MESH
    from genome_minimizer_2_tpu.train import trainer as T
    from genome_minimizer_2_tpu.utils.config import ExperimentConfig

    mesh = MESH.make_mesh(data=2, model=2, devices=jax.devices()[:4])
    cfg = ExperimentConfig(hidden_dim=10, latent_dim=3, n_epochs=1,
                           batch_size=8, trainer_version="v0")
    tr = T.create_trainer("v0", cfg, input_dim=D, mesh=mesh)
    monkeypatch.setattr(T.VAETrainer, "_mesh_platform", lambda self: "tpu")
    assert tr._fused_for_batch((8, D)) is None
