"""Numeric-fidelity bounds tracked in CI (round-2 VERDICT weak #5/#2-adjacent).

1. bf16-vs-f32 training divergence: the TPU fast path (bfloat16 matmuls,
   fused one-pass clip+Adam+apply, bf16 Adam moments) must track the f32
   reference path within a pinned bound over a multi-epoch run — the claim
   "bf16 parity" becomes a number a regression can trip, not prose.
2. Randomized-PCA fidelity: the explore mode's Figure 2a switches to a
   Halko randomized SVD above 16M elements (eval/pca.py); on a mid-size
   matrix where the exact PCA is feasible, scores must align with the exact
   solution (sign-corrected cosine >= 0.99 per component) and the explained
   variance ratios must agree.
"""

import numpy as np
import pytest

import jax

from genome_minimizer_2_tpu.eval import pca as P
from genome_minimizer_2_tpu.train import trainer as T
from genome_minimizer_2_tpu.utils.config import get_preset_config

D, H, L = 256, 32, 8
N_TRAIN, N_VAL, EPOCHS = 512, 128, 6


def _train(compute_dtype: str, monkeypatch=None):
    config = get_preset_config("v1")
    config.n_epochs = EPOCHS
    config.batch_size = 64
    config.compute_dtype = compute_dtype
    config.print_every = 10 ** 9
    trainer = T.create_trainer("v1", config, input_dim=D)
    if monkeypatch is not None:
        # route through the TPU fast path's code (fused optimizer + narrow
        # moments); the math is pure jnp so it runs on CPU with the same
        # rounding the chip applies at bf16 storage/compute boundaries
        monkeypatch.setattr(T.VAETrainer, "_mesh_platform",
                            lambda self: "tpu")
        trainer = T.create_trainer("v1", config, input_dim=D)
    rng = np.random.RandomState(0)
    train_x = (rng.rand(N_TRAIN, D) < 0.3).astype(np.float32)
    val_x = (rng.rand(N_VAL, D) < 0.3).astype(np.float32)
    tr, vl, _ = trainer.train(train_x, val_x)
    flat = np.concatenate([np.asarray(p, np.float64).ravel()
                           for p in jax.tree_util.tree_leaves(
                               trainer.final_state.params)])
    return np.asarray(tr), np.asarray(vl), flat


def test_bf16_fast_path_tracks_f32(monkeypatch):
    tr32, vl32, p32 = _train("float32")
    tr16, vl16, p16 = _train("bfloat16", monkeypatch)

    # loss curves: per-epoch relative difference of the total loss
    rel_tr = np.abs(tr16 - tr32) / np.abs(tr32)
    rel_vl = np.abs(vl16 - vl32) / np.abs(vl32)
    # pinned bounds, ~5x above observed (rel loss 1.5e-3, weight cosine
    # 0.99789, rel norm 2.3e-5 on this fixture): room for backend-version
    # jitter while a broken bf16 path — which diverges by >10x the bound
    # within a few epochs — still trips them
    assert rel_tr.max() < 1e-2, rel_tr
    assert rel_vl.max() < 1e-2, rel_vl

    # final weights: cosine similarity and relative norm difference
    cos = float(p16 @ p32 / (np.linalg.norm(p16) * np.linalg.norm(p32)))
    assert cos > 0.99, cos
    rel_norm = abs(np.linalg.norm(p16) - np.linalg.norm(p32)) \
        / np.linalg.norm(p32)
    assert rel_norm < 1e-3, rel_norm


def _clustered_binary(n, m, k, seed):
    """Presence/absence-like matrix with k dominant cluster components."""
    rng = np.random.RandomState(seed)
    centers = rng.rand(k, m) < 0.25
    labels = rng.randint(0, k, size=n)
    base = centers[labels]
    flip = rng.rand(n, m) < 0.03
    return np.logical_xor(base, flip).astype(np.uint8)


def test_randomized_pca_matches_exact_mid_scale():
    x = _clustered_binary(2500, 6000, k=4, seed=3)  # 15M elements
    t_exact, r_exact = P._exact_pca(x, 2)
    t_rand, r_rand = P._randomized_pca(x, 2)

    for c in range(2):
        a, b = t_exact[:, c], t_rand[:, c]
        cos = abs(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos >= 0.99, (c, cos)
    np.testing.assert_allclose(r_rand, r_exact, rtol=1e-3)


def test_randomized_pca_dispatch_threshold():
    """Above EXACT_MAX_ELEMS the dispatcher takes the randomized path and its
    scores still align with exact on the same data."""
    n, m = 2200, 8000  # 17.6M elements > 1<<24
    assert n * m > P.EXACT_MAX_ELEMS
    x = _clustered_binary(n, m, k=3, seed=9)
    t_disp, r_disp = P.pca_fit_transform(x, 2)
    t_exact, r_exact = P._exact_pca(x, 2)
    for c in range(2):
        a, b = t_exact[:, c], t_disp[:, c]
        cos = abs(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos >= 0.99, (c, cos)
    np.testing.assert_allclose(r_disp, r_exact, rtol=1e-3)
