"""Split parity: our numpy reimplementation must match sklearn's
train_test_split exactly (the reference's 70/20/10, random_state=12345 —
experiments.py:232-237)."""

import numpy as np
import pytest

from genome_minimizer_2_tpu.data import split as S

sklearn = pytest.importorskip("sklearn.model_selection")


@pytest.mark.parametrize("n,test_size,seed", [
    (10, 0.3, 12345),
    (40, 0.3, 12345),
    (101, 0.3333, 12345),
    (997, 0.3, 7),
    (10000, 0.3, 12345),
])
def test_shuffle_split_matches_sklearn(n, test_size, seed):
    x = np.arange(n)
    tr_ref, te_ref = sklearn.train_test_split(x, test_size=test_size, random_state=seed)
    tr_idx, te_idx = S.shuffle_split_indices(n, test_size, seed)
    np.testing.assert_array_equal(x[tr_idx], tr_ref)
    np.testing.assert_array_equal(x[te_idx], te_ref)


def test_three_way_split_matches_reference_recipe():
    """Nested split replicates experiments.py:232-237 membership exactly."""
    n = 200
    x = np.arange(n)
    labels = np.arange(n) % 7
    tr_ref, tmp_ref, _, tmp_lab = sklearn.train_test_split(
        x, labels, test_size=0.3, random_state=12345)
    val_ref, te_ref, _, _ = sklearn.train_test_split(
        tmp_ref, tmp_lab, test_size=0.3333, random_state=12345)

    sp = S.three_way_split(n, 0.3, 0.3333, 12345)
    np.testing.assert_array_equal(x[sp.train_idx], tr_ref)
    np.testing.assert_array_equal(x[sp.val_idx], val_ref)
    np.testing.assert_array_equal(x[sp.test_idx], te_ref)


def test_splits_disjoint_and_complete():
    sp = S.three_way_split(101, 0.3, 0.3333, 12345)
    allidx = np.concatenate([sp.train_idx, sp.val_idx, sp.test_idx])
    assert len(set(allidx.tolist())) == len(allidx)
    assert len(allidx) == 101


def test_batch_plan():
    assert S.batch_plan(100, 32) == (3, 4)
    assert S.batch_plan(64, 32) == (2, 0)
