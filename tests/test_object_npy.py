"""Streaming object-.npy writer: np.load equality with np.save, shared-string
semantics, and error paths."""

import numpy as np
import pytest

from genome_minimizer_2_tpu.genome.object_npy import ObjectListNpyWriter


NAMES = ["alpha", "beta", "gamma", "déjà_vu", "z" * 300]
IDX = {s: i for i, s in enumerate(NAMES)}


def _roundtrip(tmp_path, lists, names=NAMES, chunks=None):
    ref = tmp_path / "ref.npy"
    got = tmp_path / "got.npy"
    # canonical (N,) object array of lists — note np.array(lists, object)
    # would silently become 2-D when all rows happen to share a length
    ref_arr = np.empty(len(lists), dtype=object)
    for i, l in enumerate(lists):
        ref_arr[i] = l
    np.save(ref, ref_arr)
    with ObjectListNpyWriter(str(got), len(lists), names) as w:
        if chunks is None:
            w.append_lists(lists, {s: i for i, s in enumerate(names)})
        else:
            for lo, hi in chunks:
                w.append_lists(lists[lo:hi],
                               {s: i for i, s in enumerate(names)})
    a = np.load(ref, allow_pickle=True)
    b = np.load(got, allow_pickle=True)
    assert type(b) is np.ndarray and b.dtype == object
    assert a.shape == b.shape
    for ra, rb in zip(a, b):
        assert list(ra) == list(rb)
    return b


def test_equal_length_rows_keep_1d_shape(tmp_path):
    # equal-length nested lists are the trap: naive np.array() would
    # re-infer a 2-D shape; the setstate path must preserve (N,)
    out = _roundtrip(tmp_path, [["alpha", "beta"], ["beta", "gamma"]])
    assert out.shape == (2,)


def test_ragged_empty_and_unicode_rows(tmp_path):
    lists = [["alpha"], [], ["déjà_vu", "alpha", "z" * 300], [], ["beta"]]
    _roundtrip(tmp_path, lists)


def test_chunked_appends_match_single_shot(tmp_path):
    lists = [[NAMES[j % len(NAMES)] for j in range(i % 4)] for i in range(23)]
    _roundtrip(tmp_path, lists, chunks=[(0, 7), (7, 7), (7, 20), (20, 23)])


def test_zero_rows(tmp_path):
    out = _roundtrip(tmp_path, [])
    assert out.shape == (0,)


def test_strings_are_shared_objects(tmp_path):
    """Every occurrence of a name unpickles to the SAME str object — the
    memory property that keeps 100k-scale loads at pointer cost, matching
    np.save of lists that share str objects."""
    p = tmp_path / "shared.npy"
    with ObjectListNpyWriter(str(p), 3, NAMES) as w:
        w.append_lists([["alpha", "beta"], ["alpha"], ["beta", "alpha"]], IDX)
    arr = np.load(p, allow_pickle=True)
    assert arr[0][0] is arr[1][0] is arr[2][1]
    assert arr[0][1] is arr[2][0]


def test_vectorized_append_rows(tmp_path):
    rng = np.random.RandomState(0)
    counts = rng.randint(0, 5, size=40)
    flat = rng.randint(0, len(NAMES), size=int(counts.sum()))
    p = tmp_path / "vec.npy"
    with ObjectListNpyWriter(str(p), 40, NAMES) as w:
        w.append_rows(flat, counts)
    arr = np.load(p, allow_pickle=True)
    off = 0
    for i in range(40):
        expect = [NAMES[j] for j in flat[off:off + counts[i]]]
        assert list(arr[i]) == expect
        off += counts[i]


def test_row_count_mismatch_raises(tmp_path):
    w = ObjectListNpyWriter(str(tmp_path / "x.npy"), 3, NAMES)
    w.append_lists([["alpha"]], IDX)
    with pytest.raises(ValueError, match="declared 3 rows"):
        w.close()
    w2 = ObjectListNpyWriter(str(tmp_path / "y.npy"), 1, NAMES)
    with pytest.raises(ValueError, match="more rows"):
        w2.append_lists([["alpha"], ["beta"]], IDX)


def test_large_vocab_long_binget_ids(tmp_path):
    """Memo ids above 255 must round-trip (LONG_BINPUT/LONG_BINGET paths)."""
    names = [f"n{i}" for i in range(300)]
    lists = [[names[299], names[0], names[256]]]
    ref = np.array(lists, dtype=object)
    p = tmp_path / "big.npy"
    with ObjectListNpyWriter(str(p), 1, names) as w:
        w.append_lists(lists, {s: i for i, s in enumerate(names)})
    arr = np.load(p, allow_pickle=True)
    assert list(arr[0]) == list(ref[0])
