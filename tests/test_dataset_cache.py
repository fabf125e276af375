"""Dataset .npz cache: identical matrix, invalidated on source change."""

import os
import time

import numpy as np

from genome_minimizer_2_tpu.data import dataset as D


def test_cache_roundtrip_and_invalidation(synth_root):
    pa, ph = synth_root["presence_absence"], synth_root["phylogroups"]
    cache = pa + ".cache.npz"
    if os.path.exists(cache):
        os.remove(cache)

    m1 = D.load_matrix(pa, ph, cache=True)
    assert os.path.exists(cache)
    m2 = D.load_matrix(pa, ph, cache=True)  # from cache
    np.testing.assert_array_equal(m1.data, m2.data)
    np.testing.assert_array_equal(m1.genes, m2.genes)
    np.testing.assert_array_equal(m1.phylogroups, m2.phylogroups)
    assert m2.data.dtype == np.float32

    # touching the source invalidates the cache
    t = time.time() + 10
    os.utime(pa, (t, t))
    m3 = D.load_matrix(pa, ph, cache=True)
    np.testing.assert_array_equal(m1.data, m3.data)

    os.remove(cache)


def test_gene_vocab_zero_csv_parse_when_cached(synth_root, monkeypatch):
    """convert-samples/pipeline vocab loads (round-3 VERDICT next #5): with
    an mtime-stable cache, load_gene_vocab must not touch the CSV at all."""
    pa, ph = synth_root["presence_absence"], synth_root["phylogroups"]
    for p in (pa + ".cache.npz", pa + ".vocab.npz"):
        if os.path.exists(p):
            os.remove(p)

    expect = D.load_matrix(pa, ph, cache=False).genes

    # cold: index-only read, writes the .vocab.npz
    v1 = D.load_gene_vocab(pa)
    np.testing.assert_array_equal(v1, expect)
    assert os.path.exists(pa + ".vocab.npz")

    # warm: any CSV parse is a failure
    import pandas as pd

    def boom(*a, **k):
        raise AssertionError("CSV parsed despite warm vocab cache")

    monkeypatch.setattr(pd, "read_csv", boom)
    v2 = D.load_gene_vocab(pa)
    np.testing.assert_array_equal(v2, expect)

    # the load_matrix cache alone also satisfies it (vocab cache removed)
    monkeypatch.undo()
    D.load_matrix(pa, ph, cache=True)
    os.remove(pa + ".vocab.npz")  # leave only the .cache.npz
    monkeypatch.setattr(pd, "read_csv", boom)
    v3 = D.load_gene_vocab(pa)
    np.testing.assert_array_equal(v3, expect)
    monkeypatch.undo()

    # source touch invalidates: falls back to the index-only read
    t = time.time() + 20
    os.utime(pa, (t, t))
    v4 = D.load_gene_vocab(pa)
    np.testing.assert_array_equal(v4, expect)
    for p in (pa + ".cache.npz", pa + ".vocab.npz"):
        if os.path.exists(p):
            os.remove(p)


def test_vocab_cache_invalidates_on_small_mtime_drift(tmp_path):
    """Non-vacuous invalidation (round-4 ADVICE): a dataset REGENERATED with
    different content but an mtime within ~minutes of the cached one must not
    be served from the stale vocab cache. (np.isclose's default RELATIVE
    tolerance at epoch-scale mtimes accepted ~18,000 s of drift — the exact
    comparison must reject even 60 s.)"""
    csv = tmp_path / "pa.csv"
    csv.write_text(",s1\nLineage,1\ngeneA,1\ngeneB,0\n")
    t0 = 1.8e9
    os.utime(csv, (t0, t0))
    v1 = D.load_gene_vocab(str(csv))
    np.testing.assert_array_equal(v1, np.array(["geneA", "geneB"], object))

    csv.write_text(",s1\nLineage,1\ngeneX,1\ngeneY,0\ngeneZ,1\n")
    os.utime(csv, (t0 + 60.0, t0 + 60.0))  # inside the old isclose window
    v2 = D.load_gene_vocab(str(csv))
    np.testing.assert_array_equal(v2, np.array(["geneX", "geneY", "geneZ"],
                                               object))


def test_matrix_cache_invalidates_on_small_mtime_drift(tmp_path):
    """Same exactness requirement for the load_matrix .cache.npz
    (np.allclose had the identical relative-tolerance flaw)."""
    pa = tmp_path / "pa.csv"
    ph = tmp_path / "ph.csv"
    pa.write_text(",s1,s2\nLineage,1,1\ngeneA,1,0\ngeneB,0,1\n")
    ph.write_text("ID,Phylogroup\nS1,A\nS2,B\n")
    t0 = 1.8e9
    os.utime(pa, (t0, t0))
    os.utime(ph, (t0, t0))
    m1 = D.load_matrix(str(pa), str(ph), cache=True)
    assert m1.data.shape == (2, 2)

    pa.write_text(",s1,s2\nLineage,1,1\ngeneA,1,0\ngeneB,0,1\ngeneC,1,1\n")
    os.utime(pa, (t0 + 60.0, t0 + 60.0))
    m2 = D.load_matrix(str(pa), str(ph), cache=True)
    assert m2.data.shape == (2, 3)  # regenerated, not the stale 2-gene cache


def test_gene_vocab_preserves_duplicates_and_order(tmp_path):
    """The real dataset can contain duplicate gene names; dedupe belongs to
    the converter (first-occurrence, binary_converter.py semantics), so the
    vocab loader must return the raw CSV index order including duplicates —
    on the cold index-read path AND through the .vocab.npz cache."""
    csv = tmp_path / "pa.csv"
    csv.write_text(
        ",s1,s2\n"
        "Lineage,1,2\n"
        "geneB,1,0\n"
        "geneA,0,1\n"
        "geneB,1,1\n"   # duplicate name, different row
        "geneC,0,0\n")
    expect = np.array(["geneB", "geneA", "geneB", "geneC"], dtype=object)
    v_cold = D.load_gene_vocab(str(csv))
    np.testing.assert_array_equal(v_cold, expect)
    v_warm = D.load_gene_vocab(str(csv))  # from .vocab.npz
    np.testing.assert_array_equal(v_warm, expect)
