"""Elastic restart: a crash mid-training resumes from the newest complete
checkpoint and finishes with the SAME loss history as an uninterrupted run
(bit-exact resume underneath — tests/test_resume.py)."""

import numpy as np
import pytest

from genome_minimizer_2_tpu.train import trainer as T
from genome_minimizer_2_tpu.utils import elastic as E
from genome_minimizer_2_tpu.utils.config import ExperimentConfig

D = 33


def _cfg(**kw):
    cfg = ExperimentConfig(hidden_dim=12, latent_dim=3, n_epochs=8,
                           batch_size=6, trainer_version="v2",
                           print_every=1000, patience=100)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def _data():
    rng = np.random.RandomState(0)
    return (rng.rand(20, D).round().astype(np.float32),
            rng.rand(9, D).round().astype(np.float32))


def test_latest_checkpoint_selection(tmp_path):
    pat = str(tmp_path / "state_{epoch}.npz")
    assert E.latest_checkpoint(pat) is None
    for ep in (2, 10, 6):
        (tmp_path / f"state_{ep}.npz").write_bytes(b"x")
    (tmp_path / "state_99.npz.tmp").write_bytes(b"x")  # in-flight: ignored
    (tmp_path / "other_3.npz").write_bytes(b"x")       # different template
    assert E.latest_checkpoint(pat) == str(tmp_path / "state_10.npz")


def test_crash_and_restart_matches_uninterrupted(tmp_path):
    train_x, val_x = _data()

    straight = T.create_trainer("v2", _cfg(), input_dim=D)
    tl_ref, vl_ref, _ = straight.train(train_x, val_x)

    crashy = T.create_trainer("v2", _cfg(), input_dim=D)
    crashed = {"done": False}

    orig_val = type(crashy)._val_step

    # inject a crash at the host level after epoch 4's checkpoint exists:
    # wrap train() via progress callback — raise once at epoch 5
    calls = {"n": 0}

    def boom(epoch, tr, vl):
        if epoch == 5 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected host failure")

    pat = str(tmp_path / "st_{epoch}.npz")

    def train_wrapper(*args, **kwargs):
        kwargs["progress_cb"] = boom
        return T.VAETrainer.train(crashy, *args, **kwargs)

    crashy.train = train_wrapper
    tl, vl, epochs, restarts = E.train_with_restarts(
        crashy, train_x, val_x, checkpoint_path=pat, checkpoint_every=2,
        max_restarts=2)

    assert crashed["done"] and restarts == 1
    assert epochs == 8
    np.testing.assert_array_equal(tl, tl_ref)
    np.testing.assert_array_equal(vl, vl_ref)


def test_gives_up_after_max_restarts(tmp_path):
    train_x, val_x = _data()
    tr = T.create_trainer("v2", _cfg(n_epochs=3), input_dim=D)

    def always_boom(*a, **k):
        raise RuntimeError("permanent failure")

    tr.train = always_boom
    with pytest.raises(RuntimeError, match="permanent failure"):
        E.train_with_restarts(tr, train_x, val_x,
                              checkpoint_path=str(tmp_path / "s_{epoch}.npz"),
                              max_restarts=2)
