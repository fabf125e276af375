"""PCA via SVD (no sklearn dependency on the compute path).

The reference uses sklearn.decomposition.PCA for latent-space and dataset
visualizations (visualise.py:43-44, data_exploration.py:401). This is the
same centered-SVD computation with sklearn's deterministic sign convention
(columns flipped so each component's largest-|loading| is positive).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def pca_fit_transform(x: np.ndarray, n_components: int = 2) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (transformed (N, k), explained_variance_ratio (k,))."""
    x = np.asarray(x, np.float64)
    mean = x.mean(axis=0)
    xc = x - mean
    u, s, vt = np.linalg.svd(xc, full_matrices=False)
    # sklearn svd_flip (v-based): sign set by the largest-|loading| entry of
    # each right-singular vector
    max_abs_idx = np.argmax(np.abs(vt), axis=1)
    signs = np.sign(vt[np.arange(vt.shape[0]), max_abs_idx])
    signs[signs == 0] = 1.0
    u = u * signs
    transformed = (u * s)[:, :n_components]
    var = (s ** 2) / max(x.shape[0] - 1, 1)
    ratio = var / var.sum() if var.sum() > 0 else np.zeros_like(var)
    return transformed, ratio[:n_components]
