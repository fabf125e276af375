"""End-to-end training parity vs the reference implementation.

Runs the REFERENCE's own VAETrainer (torch) and ours for several epochs from
identical weights and compares per-epoch loss histories and final parameters.
Determinism across the frameworks' different RNGs is forced by:

- logvar-head bias at -60 => reparameterization std ~ 1e-13 (z == mean);
- batch_size >= dataset size => one batch per epoch, and every loss term
  (BCE sum, KL, abundance, L1) plus BatchNorm statistics are row-order
  invariant, so shuffling differences cannot matter.

This pins the whole chain: forward (BN train mode), loss bundle with
schedules, grad clip -> Adam -> StepLR, epoch-loss normalization, and
running-stat updates.
"""

import numpy as np
import pytest

import jax

from genome_minimizer_2_tpu.train import trainer as T
from genome_minimizer_2_tpu.utils.config import ExperimentConfig

torch = pytest.importorskip("torch")

from tests._reference import import_reference_module  # noqa: E402
from tests.test_model_parity import make_pair, _copy_params_to_torch  # noqa: E402

ref_trainer_mod = import_reference_module(
    "src.genome_minimizer_2.training.training.trainer")

D, H, L = 37, 16, 4
N_TRAIN, N_VAL = 24, 10
EPOCHS = 4


def _data():
    rng = np.random.RandomState(11)
    return (rng.rand(N_TRAIN, D).round().astype(np.float32),
            rng.rand(N_VAL, D).round().astype(np.float32))


@pytest.mark.parametrize("version", ["v0", "v2"])
def test_multi_epoch_training_matches_reference(version):
    train_x, val_x = _data()

    # --- shared init: our params copied into the torch model -----------
    cfg = ExperimentConfig(
        hidden_dim=H, latent_dim=L, n_epochs=EPOCHS, batch_size=64,
        trainer_version=version, min_beta=0.1, max_beta=1.0,
        gamma_start=1.0, gamma_end=0.1, lambda_l1=0.01,
        learning_rate=1e-3, scheduler_step_size=2, scheduler_gamma=0.5,
        print_every=1000, patience=100,
    )
    ours = T.create_trainer(version, cfg, input_dim=D)
    state = ours.init_state()
    params = jax.tree.map(lambda x: x, state.params)
    params["logvar"]["b"] = params["logvar"]["b"] - 60.0
    state = state._replace(params=params)

    model_cfg = ours.model_cfg
    from tests.test_model_parity import ref_model
    tm = ref_model.VAE(D, H, L)
    _copy_params_to_torch(model_cfg, params, tm)

    # --- torch side: the reference's own trainer -----------------------
    from torch.utils.data import DataLoader, TensorDataset

    opt = torch.optim.Adam(tm.parameters(), lr=1e-3)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=2, gamma=0.5)
    train_loader = DataLoader(TensorDataset(torch.tensor(train_x)),
                              batch_size=64, shuffle=True)
    val_loader = DataLoader(TensorDataset(torch.tensor(val_x)),
                            batch_size=64, shuffle=False)
    if version == "v0":
        ref = ref_trainer_mod.create_v0_trainer(
            tm, opt, sched, EPOCHS, 1.0, beta_start=0.1, beta_end=1.0)
    else:
        ref = ref_trainer_mod.create_v2_trainer(
            tm, opt, sched, EPOCHS, 1.0, 0.01, min_beta=0.0, max_beta=1.0,
            gamma_start=1.0, gamma_end=0.1)
        cfg.min_beta = 0.0
    torch.manual_seed(0)  # irrelevant: std ~ 0, single batch
    tl_ref, vl_ref, _ = ref.train(train_loader, val_loader)

    # --- our side ------------------------------------------------------
    if version == "v2":
        ours = T.create_trainer(version, cfg, input_dim=D)  # min_beta=0.0
    tl, vl, _ = ours.train(train_x, val_x, state=state)

    np.testing.assert_allclose(tl, tl_ref, rtol=2e-4)
    np.testing.assert_allclose(vl, vl_ref, rtol=2e-4)

    # final weights match after 4 full clip->Adam->StepLR epochs
    fs = ours.final_state
    w_ours = np.asarray(fs.params["decoder"][0]["w"])
    w_ref = tm.decoder[0].weight.detach().numpy().T
    np.testing.assert_allclose(w_ours, w_ref, atol=5e-5)
    w0_ours = np.asarray(fs.params["encoder"][0]["w"])[:D]
    w0_ref = tm.encoder[0].weight.detach().numpy().T
    np.testing.assert_allclose(w0_ours, w0_ref, atol=5e-5)
    # BN running stats (looser: drift compounds from ~5e-5 weight diffs
    # through 4 epochs of pre-activation statistics)
    bn_ours = np.asarray(fs.batch_stats["encoder"][0]["mean"])
    bn_ref = tm.encoder[1].running_mean.detach().numpy()
    np.testing.assert_allclose(bn_ours, bn_ref, atol=2e-3)
