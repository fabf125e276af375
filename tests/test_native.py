"""Native C++ minimization core: byte-identity with the numpy path."""

import numpy as np
import pytest

from genome_minimizer_2_tpu.data import synthetic
from genome_minimizer_2_tpu.genome import minimizer as M
from genome_minimizer_2_tpu.genome import native


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    genes = [f"gene{i:03d}" for i in range(40)]
    path = d / "g.gb"
    synthetic.write_genbank(path, genes, genome_length=6000, seed=9)
    return M.MinimizerEngine.from_genbank(path), genes


def test_native_available(engine):
    assert native.available(), "native library should build on this image"


def test_native_matches_numpy_batch(engine):
    eng, genes = engine
    rng = np.random.RandomState(0)
    gene_lists = [[g for g in genes if rng.rand() < p]
                  for p in [0.0, 0.2, 0.5, 0.8, 1.0]]
    numpy_out = eng.minimize_batch(gene_lists, use_native=False)
    native_out = eng.minimize_batch(gene_lists, use_native=True)
    assert numpy_out == native_out


def test_native_fasta_matches_python_fasta(engine, tmp_path):
    eng, genes = engine
    rng = np.random.RandomState(1)
    gene_lists = [[g for g in genes if rng.rand() < 0.5] for _ in range(7)]
    p_native = tmp_path / "native.fasta"
    p_py = tmp_path / "py.fasta"
    lens_n = eng.minimize_batch_to_fasta(gene_lists, str(p_native),
                                         start_index=3, use_native=True)
    lens_p = eng.minimize_batch_to_fasta(gene_lists, str(p_py),
                                         start_index=3, use_native=False)
    assert p_native.read_bytes() == p_py.read_bytes()
    np.testing.assert_array_equal(lens_n, lens_p)
    text = p_native.read_text()
    assert text.startswith(">Minimized_E_coli_K12_MG1655_4\n")


def test_native_append_mode(engine, tmp_path):
    eng, genes = engine
    p = tmp_path / "a.fasta"
    p.write_text("# header\n")
    eng.minimize_batch_to_fasta([genes[:5], genes[:10]], str(p), append=True)
    lines = p.read_text().splitlines()
    assert lines[0] == "# header"
    assert lines[1] == ">Minimized_E_coli_K12_MG1655_1"


def test_drop_masks_semantics(engine):
    eng, genes = engine
    drop = eng.drop_masks([genes, [], genes[:1]])
    names = eng.gene_names.astype(str)
    # all genes needed -> only unnamed ("") features dropped
    np.testing.assert_array_equal(drop[0], (names == "").astype(np.uint8) * 0
                                  + np.array([n not in set(genes) for n in names],
                                             np.uint8))
    assert drop[1].all()  # nothing needed -> drop everything


def test_write_base_offset_mode_native_and_fallback(engine, tmp_path):
    """write_base (explicit byte offset) mode: two half-batches written at
    computed offsets + a stream-end truncate must be byte-identical to one
    fresh write — for BOTH the native writer and the Python fallback, and
    when rewriting over a larger stale file (recycled pages path)."""
    import os

    eng, genes = engine
    rng = np.random.RandomState(3)
    drop = (rng.rand(9, eng.gene_names.size) < 0.4).astype(np.uint8)

    fresh = tmp_path / "fresh.fasta"
    lens = eng.minimize_drop_to_fasta(drop, str(fresh), use_native=True)

    prefix_len = len(M.SEQ_ID_PREFIX) + 4  # '>' + prefix + '_' + '\n' + '\n'
    for use_native in (True, False):
        out = tmp_path / f"off_{use_native}.fasta"
        # stale larger content first: offset mode must not leave a tail
        out.write_bytes(b"x" * (fresh.stat().st_size + 4096))
        off = 0
        for lo, hi in ((0, 5), (5, 9)):
            part = eng.minimize_drop_to_fasta(
                drop[lo:hi], str(out), start_index=lo,
                use_native=use_native, write_base=off)
            off += int(part.sum()) + sum(
                prefix_len + len(str(j + 1)) for j in range(lo, hi))
        os.truncate(out, off)
        assert out.read_bytes() == fresh.read_bytes(), f"native={use_native}"
        np.testing.assert_array_equal(
            np.concatenate([eng.minimize_drop_to_fasta(
                drop[0:5], str(tmp_path / "x.fasta"), use_native=use_native),
                eng.minimize_drop_to_fasta(
                drop[5:9], str(tmp_path / "x.fasta"), use_native=use_native)]),
            lens)
