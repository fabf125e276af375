"""Checkpoint-resume: training 2+2 epochs through a full train-state
checkpoint must be bit-exact vs 4 straight epochs (the reference is
save-only; resume is a new capability, SURVEY.md §5)."""

import numpy as np

from genome_minimizer_2_tpu.train import trainer as T
from genome_minimizer_2_tpu.utils.config import ExperimentConfig

D = 41


def _cfg(n_epochs):
    return ExperimentConfig(hidden_dim=12, latent_dim=3, n_epochs=n_epochs,
                            batch_size=6, trainer_version="v3", print_every=1000)


def _data():
    rng = np.random.RandomState(3)
    return (rng.rand(26, D).round().astype(np.float32),
            rng.rand(9, D).round().astype(np.float32))


def test_resume_bit_exact(tmp_path):
    train_x, val_x = _data()

    straight = T.create_trainer("v3", _cfg(4), input_dim=D)
    tl_ref, vl_ref, _ = straight.train(train_x, val_x)

    first = T.create_trainer("v3", _cfg(4), input_dim=D)
    first.train(train_x, val_x,
                checkpoint_path=str(tmp_path / "mid_{epoch}.npz"),
                checkpoint_every=2)
    ckpt = tmp_path / "mid_2.npz"
    assert ckpt.exists() and (tmp_path / "mid_4.npz").exists()

    second = T.create_trainer("v3", _cfg(4), input_dim=D)
    state, start_epoch = second.resume_from(str(ckpt))
    assert start_epoch == 2
    tl2, vl2, epochs = second.train(train_x, val_x, state=state,
                                    start_epoch=start_epoch)
    assert epochs == 4
    np.testing.assert_array_equal(tl2, tl_ref)
    np.testing.assert_array_equal(vl2, vl_ref)
    # final params identical too
    import jax
    ref_leaves = jax.tree.leaves(straight.final_state.params)
    res_leaves = jax.tree.leaves(second.final_state.params)
    for a, b in zip(ref_leaves, res_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_v_wrapper_functions():
    train_x, val_x = _data()
    tl, vl, epochs = T.v0(train_x, val_x, hidden_dim=8, latent_dim=2,
                          n_epochs=2, batch_size=8, print_every=1000)
    assert epochs == 2 and len(tl) == 2
    assert all(np.isfinite(v) for v in tl + vl)
