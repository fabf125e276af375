"""Trainer semantics: gradient parity vs the reference torch step, epoch-loss
normalization, StepLR values, early stopping, counter accounting."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genome_minimizer_2_tpu.models import vae
from genome_minimizer_2_tpu.ops import losses as L
from genome_minimizer_2_tpu.train import trainer as T
from genome_minimizer_2_tpu.utils.config import ExperimentConfig

torch = pytest.importorskip("torch")

from tests._reference import import_reference_module  # noqa: E402
from tests.test_model_parity import make_pair  # noqa: E402

ref_losses = import_reference_module(
    "src.genome_minimizer_2.training.training.loss_components")

D, H, Lat, N = 37, 16, 4, 12


def _deterministic(params, tm):
    """Force std ~ 0 so the reparameterization is deterministic on both sides."""
    params["logvar"]["b"] = params["logvar"]["b"] - 60.0
    with torch.no_grad():
        tm.logvar_layer.bias -= 60.0
    return params


def test_gradient_parity_full_backward():
    """One full loss backward (BCE + KL + abundance + L1) must produce the
    same gradients as torch autograd on the reference model."""
    cfg, params, stats, tm = make_pair(pad_features=True, seed=3)
    params = _deterministic(params, tm)
    x = np.random.RandomState(7).rand(N, D).round().astype(np.float32)

    spec = L.LossSpec(n_epochs=100, scheduler_type="linear", min_beta=0.1,
                      max_beta=1.0, use_abundance=True, gamma_start=1.0,
                      gamma_end=0.1, use_l1=True, lambda_l1=0.01)
    epoch = 3

    # --- torch side ---------------------------------------------------
    tm.train()
    xt = torch.tensor(x)
    recon, mu, logvar = tm(xt)
    comps = [
        ref_losses.ReconstructionLoss(),
        ref_losses.KLDivergenceLoss(scheduler_type="linear", min_beta=0.1, max_beta=1.0),
        ref_losses.GeneAbundanceLoss(gamma_start=1.0, gamma_end=0.1),
        ref_losses.L1RegularizationLoss(lambda_l1=0.01),
    ]
    for c in comps:
        if hasattr(c, "n_epochs"):
            c.n_epochs = 100
    total_t = sum(c.compute_loss(recon, xt, mu, logvar, tm, epoch, 0) for c in comps)
    total_t.backward()

    # --- jax side -----------------------------------------------------
    mask = cfg.feature_mask()

    def loss_fn(p):
        key = jax.random.key(0)  # irrelevant: std ~ 0
        logits, mu_j, lv_j, _ = vae.forward(cfg, p, stats, cfg.pad_inputs(jnp.asarray(x)),
                                            key, train=True)
        total, _ = L.compute_losses(spec, p, logits, cfg.pad_inputs(jnp.asarray(x)),
                                    mu_j, lv_j, jnp.asarray(epoch), jnp.asarray(0), mask)
        return total

    total_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(total_j), total_t.item(), rtol=2e-4)

    checks = [
        (grads["encoder"][0]["w"][:D].T, tm.encoder[0].weight.grad),
        (grads["encoder"][0]["b"], tm.encoder[0].bias.grad),
        (grads["encoder"][1]["bn"]["scale"], tm.encoder[4].weight.grad),
        (grads["mean"]["w"].T, tm.mean_layer.weight.grad),
        (grads["logvar"]["w"].T, tm.logvar_layer.weight.grad),
        (grads["decoder"][0]["w"].T, tm.decoder[0].weight.grad),
        (grads["decoder"][3]["w"][:, :D].T, tm.decoder[9].weight.grad),
        (grads["decoder"][3]["b"][:D], tm.decoder[9].bias.grad),
    ]
    for ours, theirs in checks:
        # atol floor: a bias feeding BatchNorm has an exactly-zero gradient
        # mathematically, so both sides are float roundoff there (~1e-7)
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), atol=1e-5, rtol=5e-3)

    # padded region receives exactly zero gradient
    assert np.all(np.asarray(grads["encoder"][0]["w"])[D:] == 0.0)
    assert np.all(np.asarray(grads["decoder"][3]["w"])[:, D:] == 0.0)


def test_step_lr_matches_torch_scheduler():
    tm_lin = torch.nn.Linear(2, 2)
    opt = torch.optim.Adam(tm_lin.parameters(), lr=1e-3)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=20, gamma=0.5)
    for epoch in range(65):
        torch_lr = opt.param_groups[0]["lr"]
        ours = T.step_lr(1e-3, 20, 0.5, epoch)
        np.testing.assert_allclose(ours, torch_lr, rtol=1e-9)
        sched.step()


def test_early_stopping_matches_reference():
    ref_trainer = import_reference_module(
        "src.genome_minimizer_2.training.training.trainer")
    seq = [10.0, 9.0, 9.0, 9.0, 8.5, 8.5001, 8.49995, 8.4, 9.0, 9.0, 9.0, 9.0]
    ref = ref_trainer.EarlyStopping(patience=3, min_delta=1e-4)
    ours = T.EarlyStopping(patience=3, min_delta=1e-4)
    for v in seq:
        assert ours.should_stop(v) == ref.should_stop(v)


def _tiny_config(**kw):
    cfg = ExperimentConfig(hidden_dim=H, latent_dim=Lat, n_epochs=3, batch_size=5,
                           trainer_version="v2", patience=10, print_every=1000)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_train_runs_and_counter_semantics():
    """3 epochs on 12 train / 7 val samples with batch 5: counter must advance
    by (#train batches + #val batches) per epoch = (3 + 2) * 3 = 15."""
    cfg = _tiny_config()
    tr = T.create_trainer("v2", cfg, input_dim=D)
    rng = np.random.RandomState(0)
    train_x = rng.rand(12, D).round().astype(np.float32)
    val_x = rng.rand(7, D).round().astype(np.float32)
    tl, vl, epochs = tr.train(train_x, val_x)
    assert epochs == 3
    assert len(tl) == 3 and len(vl) == 3
    assert int(tr.final_state.counter) == 15
    assert all(np.isfinite(v) for v in tl + vl)
    # loss history has every component
    assert set(tr.train_losses) == {L.RECONSTRUCTION, L.KL_DIVERGENCE,
                                    L.GENE_ABUNDANCE, L.L1_REGULARIZATION, L.TOTAL}


def test_epoch_losses_are_dataset_size_normalized():
    """Per-epoch loss = sum over all samples / dataset size (trainer.py:126-129).
    With identical rows, recon loss per epoch must equal per-sample BCE."""
    cfg = _tiny_config(n_epochs=1, learning_rate=0.0, lambda_l1=0.0)
    tr = T.create_trainer("v0", cfg, input_dim=D)
    row = np.random.RandomState(1).rand(D).round().astype(np.float32)
    train_x = np.tile(row, (10, 1))
    val_x = np.tile(row, (6, 1))
    tl, vl, _ = tr.train(train_x, val_x)
    # reconstruction component averaged by dataset size is per-sample-scale
    rec = tr.train_losses[L.RECONSTRUCTION][0]
    assert 0 < rec < D * 2  # BCE-sum per sample is O(D), not O(N*D)


def test_training_reduces_loss():
    cfg = _tiny_config(n_epochs=12, learning_rate=1e-3)
    tr = T.create_trainer("v0", cfg, input_dim=D)
    rng = np.random.RandomState(0)
    # learnable structure: 2 prototype genomes + noise
    protos = rng.rand(2, D).round()
    idx = rng.randint(0, 2, 64)
    x = (protos[idx] + (rng.rand(64, D) < 0.02)).clip(0, 1).astype(np.float32)
    tl, vl, _ = tr.train(x[:48], x[48:])
    assert tl[-1] < tl[0] * 0.9


def test_deterministic_given_seed():
    cfg = _tiny_config(n_epochs=2)
    r1 = T.create_trainer("v2", cfg, input_dim=D)
    r2 = T.create_trainer("v2", _tiny_config(n_epochs=2), input_dim=D)
    rng = np.random.RandomState(0)
    x = rng.rand(20, D).round().astype(np.float32)
    tl1, vl1, _ = r1.train(x[:14], x[14:])
    tl2, vl2, _ = r2.train(x[:14], x[14:])
    np.testing.assert_array_equal(tl1, tl2)
    np.testing.assert_array_equal(vl1, vl2)


def test_checkpoint_roundtrip(tmp_path):
    from genome_minimizer_2_tpu.utils import checkpoint as C

    cfg = _tiny_config(n_epochs=1)
    tr = T.create_trainer("v2", cfg, input_dim=D)
    rng = np.random.RandomState(0)
    x = rng.rand(20, D).round().astype(np.float32)
    tr.train(x[:14], x[14:])
    st = tr.final_state
    path = tmp_path / "ckpt.npz"
    C.save_checkpoint(path, st.params, st.batch_stats, cfg, extra={"epochs": 1})
    flat_p, flat_s, cfg2, extra = C.load_checkpoint(path)
    assert cfg2.hidden_dim == H and cfg2.trainer_version == "v2"
    assert extra == {"epochs": 1}
    params2 = C.unflatten_into(st.params, flat_p)
    stats2 = C.unflatten_into(st.batch_stats, flat_s)
    chex = pytest.importorskip("chex")
    chex.assert_trees_all_close(jax.tree.map(np.asarray, st.params), params2)
    chex.assert_trees_all_close(jax.tree.map(np.asarray, st.batch_stats), stats2)

