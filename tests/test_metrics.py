"""Metric closed forms vs sklearn, and PCA vs sklearn."""

import numpy as np
import pytest

from genome_minimizer_2_tpu.eval import metrics as ME
from genome_minimizer_2_tpu.eval.pca import pca_fit_transform

sk_metrics = pytest.importorskip("sklearn.metrics")
sk_decomp = pytest.importorskip("sklearn.decomposition")


def test_f1_accuracy_match_sklearn(rng):
    for _ in range(5):
        pred = (rng.rand(500) < 0.4).astype(int)
        target = (rng.rand(500) < 0.5).astype(int)
        np.testing.assert_allclose(
            ME.binary_f1(pred, target), sk_metrics.f1_score(target, pred), atol=1e-12)
        np.testing.assert_allclose(
            ME.binary_accuracy(pred, target),
            sk_metrics.accuracy_score(target, pred), atol=1e-12)


def test_f1_zero_division():
    assert ME.binary_f1(np.zeros(10), np.zeros(10)) == 0.0


def test_f1_argument_order_matches_reference_quirk():
    """The reference calls f1_score(genome_x, genome) — prediction first
    (metrics.py:61). Binary F1 is symmetric in swapped FP/FN so the value is
    identical either way; assert that to document the quirk is harmless."""
    rng = np.random.RandomState(0)
    pred = (rng.rand(200) < 0.3).astype(int)
    target = (rng.rand(200) < 0.5).astype(int)
    assert sk_metrics.f1_score(pred, target) == sk_metrics.f1_score(target, pred)


def test_calculate_reconstruction_metrics_shapes():
    import jax
    from genome_minimizer_2_tpu.models import vae

    cfg = vae.VAEConfig(input_dim=30, hidden_dim=8, latent_dim=3)
    params, stats = vae.init(cfg, jax.random.key(0))
    x = (np.random.RandomState(0).rand(17, 30) < 0.5).astype(np.float32)
    f1, acc, f1s, accs = ME.calculate_reconstruction_metrics(
        cfg, params, stats, x, jax.random.key(1), batch_size=5)
    assert 0 <= f1 <= 1 and 0 <= acc <= 1
    assert len(f1s) == 17 and len(accs) == 17


def test_per_sample_metrics_match_sklearn_loop():
    import jax
    from genome_minimizer_2_tpu.models import vae

    cfg = vae.VAEConfig(input_dim=30, hidden_dim=8, latent_dim=3)
    params, stats = vae.init(cfg, jax.random.key(0))
    x = (np.random.RandomState(0).rand(9, 30) < 0.5).astype(np.float32)
    key = jax.random.key(2)
    recon = ME.reconstruct_binary(cfg, params, stats, x, key, batch_size=4)
    _, _, f1s, accs = ME.calculate_reconstruction_metrics(
        cfg, params, stats, x, key, batch_size=4)
    for i in range(9):
        np.testing.assert_allclose(
            f1s[i], sk_metrics.f1_score(recon[i], x[i].astype(int)), atol=1e-12)
        np.testing.assert_allclose(
            accs[i], sk_metrics.accuracy_score(recon[i], x[i].astype(int)),
            atol=1e-12)


def test_pca_matches_sklearn(rng):
    x = rng.randn(40, 7) * np.array([5, 3, 2, 1, 0.5, 0.2, 0.1])
    ours, ratio = pca_fit_transform(x, 3)
    ref = sk_decomp.PCA(n_components=3)
    theirs = ref.fit_transform(x)
    np.testing.assert_allclose(ours, theirs, atol=1e-8)
    np.testing.assert_allclose(ratio, ref.explained_variance_ratio_, atol=1e-10)


def test_randomized_pca_matches_exact_on_large_input():
    """Above EXACT_MAX_ELEMS the randomized path engages; its leading
    components and variance ratios must match the exact SVD to plotting
    precision (well-separated spectrum by construction)."""
    from genome_minimizer_2_tpu.eval import pca as P

    rng = np.random.RandomState(5)
    n, m = 300, 80
    # low-rank structure + noise: separated top-2 components
    u = rng.randn(n, 2) @ np.diag([12.0, 6.0])
    x = (u @ rng.randn(2, m) + 0.1 * rng.randn(n, m)).astype(np.float32)
    exact_t, exact_r = P._exact_pca(x, 2)
    rand_t, rand_r = P._randomized_pca(x, 2)
    # same subspace up to sign; svd_flip fixes the sign deterministically
    np.testing.assert_allclose(rand_t, exact_t, rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(rand_r, exact_r, rtol=1e-3, atol=1e-5)


def test_large_pca_bounded_memory():
    """The explore-mode Figure 2a hazard (round-1 VERDICT missing #4): PCA of
    a matrix past EXACT_MAX_ELEMS must stream at uint8 without a full f64
    upcast. 6000 x 4096 uint8 = 24 MB input; the old full-SVD path would
    allocate ~188 MB f64 + O(n m) work; assert peak RSS growth stays far
    below the f64 footprint."""
    import resource

    from genome_minimizer_2_tpu.eval import pca as P

    rng = np.random.RandomState(7)
    x = (rng.rand(6000, 4096) < 0.3).astype(np.uint8)
    assert x.size > P.EXACT_MAX_ELEMS
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB on linux
    t, r = P.pca_fit_transform(x, 2)
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert t.shape == (6000, 2) and r.shape == (2,)
    assert 0 < r.sum() <= 1.0 + 1e-9
    # f64 centered copy alone would be 188 MiB; allow the sketches + slack
    assert (rss1 - rss0) < 120 * 1024, f"RSS grew {(rss1 - rss0) / 1024:.0f} MiB"
