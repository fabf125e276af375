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
