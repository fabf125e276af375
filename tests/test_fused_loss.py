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
