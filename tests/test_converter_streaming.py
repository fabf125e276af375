"""Streaming convert-samples: load-equality with the staged converter on
every masks artifact kind, including packed-npz ingestion."""

import numpy as np
import pytest

from genome_minimizer_2_tpu.genome import converter as C


COLS = np.array(["gB", "gA", "gB", "gC", "gD", "gE"], dtype=object)  # dup gB
ESSENTIALS = {"gA", "gE", "zzNotACol", "aaNotACol"}


@pytest.fixture()
def masks(rng):
    return (rng.rand(17, len(COLS)) > 0.45).astype(np.float32)


def _staged(masks_path, tmp_path):
    out = str(tmp_path / "staged.npy")
    lists = C.masks_to_gene_lists(masks_path, COLS, out)
    filled = C.check_essential_genes(set(ESSENTIALS), lists, out)
    return (np.load(out, allow_pickle=True),
            np.load(filled, allow_pickle=True))


def _assert_rows_equal(a, b):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert list(ra) == list(rb)


@pytest.mark.parametrize("chunk", [0, 1, 5, 64])
def test_streaming_matches_staged_float_npy(masks, tmp_path, chunk):
    src = str(tmp_path / "m.npy")
    np.save(src, masks)
    ref_ids, ref_filled = _staged(src, tmp_path)
    out = str(tmp_path / "s.npy")
    out_p, filled_p, n = C.convert_samples_streaming(
        src, COLS, out, essential_set=set(ESSENTIALS), chunk_size=chunk)
    assert n == 17
    _assert_rows_equal(ref_ids, np.load(out_p, allow_pickle=True))
    _assert_rows_equal(ref_filled, np.load(filled_p, allow_pickle=True))


def test_streaming_packed_npz_matches_dense(masks, tmp_path):
    """Packed-npz artifact ingestion (no dense full-matrix expansion) must
    give identical outputs to the float .npy of the same bits."""
    dense_src = str(tmp_path / "m.npy")
    np.save(dense_src, masks)
    packed = np.packbits(masks.astype(np.uint8), axis=1, bitorder="little")
    packed_src = str(tmp_path / "m.npz")
    C.save_packed_npz(packed, masks.shape[1], packed_src)

    a = C.convert_samples_streaming(dense_src, COLS, str(tmp_path / "a.npy"),
                                    essential_set=set(ESSENTIALS),
                                    chunk_size=4)
    b = C.convert_samples_streaming(packed_src, COLS, str(tmp_path / "b.npy"),
                                    essential_set=set(ESSENTIALS),
                                    chunk_size=4)
    for pa, pb in zip(a[:2], b[:2]):
        _assert_rows_equal(np.load(pa, allow_pickle=True),
                           np.load(pb, allow_pickle=True))


def test_legacy_masks_to_gene_lists_accepts_packed(masks, tmp_path):
    dense_src = str(tmp_path / "m.npy")
    np.save(dense_src, masks)
    packed_src = str(tmp_path / "m.npz")
    C.save_packed_npz(
        np.packbits(masks.astype(np.uint8), axis=1, bitorder="little"),
        masks.shape[1], packed_src)
    a = C.masks_to_gene_lists(dense_src, COLS, None)
    b = C.masks_to_gene_lists(packed_src, COLS, None, chunk_size=3)
    assert a == b


def test_streaming_object_rows_input(tmp_path, rng):
    rows = [(rng.rand(len(COLS)) > 0.5).astype(float) for _ in range(7)]
    rows[3] = rows[0]  # duplicates allowed
    src = str(tmp_path / "obj.npy")
    arr = np.empty(7, object)
    for i, r in enumerate(rows):
        arr[i] = list(r)
    np.save(src, arr)
    ref_ids, ref_filled = _staged(src, tmp_path)
    out_p, filled_p, n = C.convert_samples_streaming(
        src, COLS, str(tmp_path / "s.npy"), essential_set=set(ESSENTIALS),
        chunk_size=2)
    assert n == 7
    _assert_rows_equal(ref_ids, np.load(out_p, allow_pickle=True))
    _assert_rows_equal(ref_filled, np.load(filled_p, allow_pickle=True))


def test_streaming_without_essentials(masks, tmp_path):
    src = str(tmp_path / "m.npy")
    np.save(src, masks)
    out_p, filled_p, n = C.convert_samples_streaming(
        src, COLS, str(tmp_path / "only.npy"), essential_set=None)
    assert filled_p is None and n == 17
    ref_ids, _ = _staged(src, tmp_path)
    _assert_rows_equal(ref_ids, np.load(out_p, allow_pickle=True))


def test_streaming_failure_leaves_no_partial_artifacts(masks, tmp_path,
                                                       monkeypatch):
    src = str(tmp_path / "m.npy")
    np.save(src, masks)
    out = str(tmp_path / "s.npy")
    from genome_minimizer_2_tpu.genome.object_npy import ObjectListNpyWriter

    orig = ObjectListNpyWriter.append_rows
    calls = {"n": 0}

    def boom(self, *a, **k):
        calls["n"] += 1
        if calls["n"] >= 4:
            raise RuntimeError("injected failure")
        return orig(self, *a, **k)

    monkeypatch.setattr(ObjectListNpyWriter, "append_rows", boom)
    with pytest.raises(RuntimeError, match="injected"):
        C.convert_samples_streaming(src, COLS, out,
                                    essential_set=set(ESSENTIALS),
                                    chunk_size=3)
    assert not list(tmp_path.glob("s*.npy"))  # no partial pickles remain


def test_streaming_sorted_union_semantics(tmp_path):
    """The domain-scatter construction must reproduce sorted(set | set)
    exactly — including essentials absent from the columns and the
    ordering of names that interleave lexicographically."""
    masks = np.array([[1, 0, 1, 0, 0, 0],
                      [0, 0, 0, 0, 0, 0]], dtype=float)
    src = str(tmp_path / "m.npy")
    np.save(src, masks)
    _, filled_p, _ = C.convert_samples_streaming(
        src, COLS, str(tmp_path / "u.npy"), essential_set=set(ESSENTIALS))
    got = np.load(filled_p, allow_pickle=True)
    # dedupe keeps first occurrences -> kept cols [gB, gA, gC, gD, gE]; the
    # original-width row [1,0,1,0,0,0] slices to [1,0,0,0,0] (the duplicate
    # gB column is dropped), so row 0's present set is {gB}
    expect0 = sorted({"gB"} | ESSENTIALS)
    expect1 = sorted(ESSENTIALS)
    assert list(got[0]) == expect0
    assert list(got[1]) == expect1
