"""Loss component parity vs the reference torch implementations
(loss_components.py), including the cosine-beta counter quirk."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genome_minimizer_2_tpu.ops import losses as L

torch = pytest.importorskip("torch")

from tests._reference import import_reference_module  # noqa: E402

ref_losses = import_reference_module(
    "src.genome_minimizer_2.training.training.loss_components")

N, D, Lat = 8, 33, 4


@pytest.fixture()
def batch(rng):
    data = rng.rand(N, D).round().astype(np.float32)
    probs = rng.uniform(0.05, 0.95, (N, D)).astype(np.float32)
    logits = np.log(probs / (1 - probs)).astype(np.float32)
    mu = rng.randn(N, Lat).astype(np.float32)
    logvar = rng.randn(N, Lat).astype(np.float32) * 0.3
    return data, probs, logits, mu, logvar


def test_bce_sum_matches_torch(batch):
    data, probs, logits, *_ = batch
    ref = torch.nn.functional.binary_cross_entropy(
        torch.tensor(probs), torch.tensor(data), reduction="sum").item()
    mask = jnp.ones(D)
    ours = float(L.bce_sum_logits(jnp.asarray(logits), jnp.asarray(data), mask))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_bce_mask_excludes_padding(batch):
    data, probs, logits, *_ = batch
    mask = jnp.ones(D).at[D - 5 :].set(0.0)
    ours = float(L.bce_sum_logits(jnp.asarray(logits), jnp.asarray(data), mask))
    ref = torch.nn.functional.binary_cross_entropy(
        torch.tensor(probs[:, : D - 5]), torch.tensor(data[:, : D - 5]),
        reduction="sum").item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_kl_matches_torch(batch):
    *_, mu, logvar = batch
    klc = ref_losses.KLDivergenceLoss(scheduler_type="constant", max_beta=1.0)
    ref = klc.compute_loss(None, None, torch.tensor(mu), torch.tensor(logvar),
                           None, 0, 0).item()
    ours = float(L.kl_divergence(jnp.asarray(mu), jnp.asarray(logvar)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


@pytest.mark.parametrize("sched,T", [("linear", 10), ("cosine", 10), ("cosine", 50)])
def test_beta_schedule_matches_reference(sched, T):
    """Reference: linear uses epoch/n_epochs; cosine uses t=epoch*32+counter
    with a counter that increments on every loss call (loss_components.py:79-88)."""
    klc = ref_losses.KLDivergenceLoss(scheduler_type=sched, min_beta=0.1,
                                      max_beta=1.0, T=T)
    klc.n_epochs = 100
    spec = L.LossSpec(n_epochs=100, scheduler_type=sched, min_beta=0.1,
                      max_beta=1.0, T=T)
    mu = torch.zeros(2, 3)
    logvar = torch.zeros(2, 3)
    kl_t = float(-0.5 * torch.sum(1 + logvar - mu.pow(2) - logvar.exp()))
    counter = 0
    for epoch in [0, 1, 5, 17]:
        for _ in range(4):  # several "batches" per epoch
            ref_val = klc.compute_loss(None, None, mu, logvar, None, epoch, 0).item()
            beta = float(L.beta_schedule(spec, jnp.asarray(epoch), jnp.asarray(counter)))
            counter += 1
            np.testing.assert_allclose(beta * kl_t, ref_val, rtol=1e-5, atol=1e-7)


def test_gene_abundance_matches_torch(batch):
    data, probs, logits, *_ = batch
    gal = ref_losses.GeneAbundanceLoss(gamma_start=2.0, gamma_end=0.1, weight=1.5)
    gal.n_epochs = 50
    epoch = 7
    ref = gal.compute_loss(torch.tensor(probs), None, None, None, None, epoch, 0).item()
    spec = L.LossSpec(n_epochs=50, use_abundance=True, gamma_start=2.0,
                      gamma_end=0.1, weight=1.5)
    gamma = L.gamma_schedule(spec, jnp.asarray(epoch))
    ours = float(spec.weight * gamma * L.gene_abundance(jnp.asarray(logits), jnp.ones(D)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_l1_matches_torch():
    from genome_minimizer_2_tpu.models import vae
    ref_model = import_reference_module("src.genome_minimizer_2.training.model")
    from tests.test_model_parity import make_pair

    cfg, params, stats, tm = make_pair(pad_features=True)
    ref = ref_losses.l1_regularization(tm, 0.01).item()
    ours = float(0.01 * L.l1_penalty(params))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_l2_matches_torch():
    from tests.test_model_parity import make_pair

    cfg, params, stats, tm = make_pair(pad_features=True)
    l2c = ref_losses.L2RegularizationLoss(lambda_l2=0.02)
    ref = l2c.compute_loss(None, None, None, None, tm, 0, 0).item()
    ours = float(0.02 * L.l2_penalty(params))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_component_names_by_preset():
    from genome_minimizer_2_tpu.utils.config import get_preset_config

    for version, expected in {
        "v0": (L.RECONSTRUCTION, L.KL_DIVERGENCE, L.TOTAL),
        "v1": (L.RECONSTRUCTION, L.KL_DIVERGENCE, L.GENE_ABUNDANCE,
               L.L1_REGULARIZATION, L.TOTAL),
        "v2": (L.RECONSTRUCTION, L.KL_DIVERGENCE, L.GENE_ABUNDANCE,
               L.L1_REGULARIZATION, L.TOTAL),
        "v3": (L.RECONSTRUCTION, L.KL_DIVERGENCE, L.GENE_ABUNDANCE,
               L.L1_REGULARIZATION, L.TOTAL),
    }.items():
        cfg = get_preset_config(version)
        spec = L.spec_for_preset(version, cfg)
        assert spec.component_names() == expected


def test_preset_schedule_types():
    from genome_minimizer_2_tpu.utils.config import get_preset_config

    specs = {v: L.spec_for_preset(v, get_preset_config(v)) for v in ["v0", "v1", "v2", "v3"]}
    assert specs["v0"].scheduler_type == "linear"
    assert specs["v1"].scheduler_type == "linear"
    assert specs["v2"].scheduler_type == "cosine" and specs["v2"].T == 10
    assert specs["v3"].scheduler_type == "cosine" and specs["v3"].T == 50
    assert specs["v3"].gamma_start == 2.0
    assert not specs["v0"].use_l1 and specs["v1"].lambda_l1 == 0.01
