"""Genome subsystem tests: GenBank parsing, mask->gene-list conversion,
essential backfill, and minimization byte-equality against an in-test oracle
that transcribes the reference algorithm's semantics (per-base set loop,
minimizer_2.py:50-101)."""

import numpy as np
import pytest

from genome_minimizer_2_tpu.data import synthetic
from genome_minimizer_2_tpu.genome import converter as C
from genome_minimizer_2_tpu.genome import genbank as GB
from genome_minimizer_2_tpu.genome import minimizer as M


# ---------------------------------------------------------------------------
# GenBank parser
# ---------------------------------------------------------------------------

def test_parse_location_simple():
    assert GB.parse_location("42..90") == (41, 90, 1)
    assert GB.parse_location("complement(42..90)") == (41, 90, -1)
    assert GB.parse_location("join(10..20,30..40)") == (9, 40, 1)
    assert GB.parse_location("complement(join(10..20,30..40))") == (9, 40, -1)
    assert GB.parse_location("<5..>99") == (4, 99, 1)
    assert GB.parse_location("7") == (6, 7, 1)


def test_parse_synthetic_genbank(tmp_path):
    genes = [f"g{i:03d}" for i in range(30)]
    path = tmp_path / "t.gb"
    seq = synthetic.write_genbank(path, genes, genome_length=3000, seed=1)
    rec = GB.parse_genbank(path)
    assert rec.seq == seq.upper()
    assert len(rec.seq) == 3000
    gene_feats = rec.gene_features()
    assert len(gene_feats) > 5
    named = [f for f in gene_feats if f.gene_name()]
    assert named and all(f.gene_name() in genes for f in named)
    # intervals in range and 0-based half-open
    for f in gene_feats:
        assert 0 <= f.start < f.end <= 3000


def test_qualifier_multiline(tmp_path):
    gb = """LOCUS       X             40 bp    DNA     linear BCT 01-JAN-2024
FEATURES             Location/Qualifiers
     gene            1..12
                     /gene="abcD"
                     /note="a very long note that wraps
                     onto the next line"
     gene            complement(20..30)
                     /gene="efgH"
ORIGIN
        1 acgtacgtac gtacgtacgt acgtacgtac gtacgtacgt
//
"""
    path = tmp_path / "q.gb"
    path.write_text(gb)
    rec = GB.parse_genbank(path)
    assert [f.gene_name() for f in rec.gene_features()] == ["abcD", "efgH"]
    assert rec.gene_features()[0].qualifiers["note"][0] == \
        "a very long note that wraps onto the next line"
    assert rec.seq == "ACGT" * 10


# ---------------------------------------------------------------------------
# Minimizer vs reference-semantics oracle
# ---------------------------------------------------------------------------

def oracle_minimize(features, seq, needed_genes):
    """Direct transcription of the reference algorithm's semantics:
    set-of-positions union + per-base loop (minimizer_2.py:50-101)."""
    positions = set()
    for name, start, end in features:
        if name not in needed_genes:
            positions.update(range(start, end))
    return "".join(b for i, b in enumerate(seq) if i not in positions)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_minimize_matches_oracle(tmp_path, seed):
    genes = [f"gene{i:02d}" for i in range(25)]
    path = tmp_path / "o.gb"
    synthetic.write_genbank(path, genes, genome_length=2500, seed=seed)
    engine = M.MinimizerEngine.from_genbank(path)
    feats = list(zip(engine.gene_names.tolist(), engine.starts.tolist(),
                     engine.ends.tolist()))
    rng = np.random.RandomState(seed)
    for _ in range(5):
        needed = [g for g in genes if rng.rand() < 0.5]
        expected = oracle_minimize(feats, engine.record.seq, needed)
        assert engine.minimize(needed) == expected


def test_minimize_overlapping_intervals():
    """Union of overlapping removals must match the set semantics."""
    rec = GB.GenBankRecord(
        name="t", seq="ABCDEFGHIJKLMNOPQRST",
        features=[
            GB.Feature("gene", 2, 8, 1, {"gene": ["keepMe"]}),
            GB.Feature("gene", 5, 12, 1, {"gene": ["dropA"]}),
            GB.Feature("gene", 10, 15, 1, {"gene": ["dropB"]}),
            GB.Feature("gene", 18, 20, 1, {}),  # unnamed -> name ""
        ],
    )
    engine = M.MinimizerEngine.from_record(rec)
    feats = [("keepMe", 2, 8), ("dropA", 5, 12), ("dropB", 10, 15), ("", 18, 20)]
    needed = ["keepMe"]
    assert engine.minimize(needed) == oracle_minimize(feats, rec.seq, needed)
    # unnamed feature ("") is removed unless "" is in the needed list —
    # reference semantics (minimizer_2.py:61-62)
    needed2 = ["keepMe", ""]
    assert engine.minimize(needed2) == oracle_minimize(feats, rec.seq, needed2)


def test_genome_minimiser_facade(tmp_path):
    genes = [f"g{i}" for i in range(10)]
    path = tmp_path / "f.gb"
    synthetic.write_genbank(path, genes, genome_length=1200, seed=4)
    gm = M.GenomeMinimiser(record_path=str(path), needed_genes_list=genes[:3], idx=2)
    stats = gm.get_reduction_stats()
    assert stats["original_length"] == 1200
    assert stats["reduced_length"] == len(gm.reduced_genome_str)
    assert stats["positions_removed"] == 1200 - stats["reduced_length"]
    out = tmp_path / "one.fasta"
    gm.save_minimized_genome(str(out))
    content = out.read_text()
    assert content.startswith(">Minimized_E_coli_K12_MG1655_3\n")
    assert content.endswith(gm.reduced_genome_str)


def test_single_file_fasta_layout(tmp_path):
    genes = [f"g{i}" for i in range(12)]
    gb = tmp_path / "w.gb"
    synthetic.write_genbank(gb, genes, genome_length=1500, seed=5)
    lists = np.array([genes[:4], genes[4:8], genes], dtype=object)
    genes_path = tmp_path / "lists.npy"
    np.save(genes_path, lists)
    out = tmp_path / "mini.fasta"
    res = M.process_multiple_genomes_single_file(
        str(gb), str(genes_path), "vX", str(out), verbose=False)
    assert res["genome_count"] == 3
    lines = out.read_text().splitlines()
    assert lines[0] == "# Minimized genomes generated using model: vX"
    assert lines[1] == "# Total genomes: 3"
    assert lines[2].startswith("# Generated on: ")
    assert lines[3] == ">Minimized_E_coli_K12_MG1655_1"
    assert lines[5] == ">Minimized_E_coli_K12_MG1655_2"
    engine = M.MinimizerEngine.from_genbank(gb)
    assert lines[4] == engine.minimize(genes[:4])
    # full gene list -> only unnamed features removed
    assert lines[8] == engine.minimize(genes)


def test_multiple_files_layout(tmp_path):
    genes = [f"g{i}" for i in range(8)]
    gb = tmp_path / "w.gb"
    synthetic.write_genbank(gb, genes, genome_length=900, seed=6)
    lists = np.array([genes[:2], genes[2:]], dtype=object)
    genes_path = tmp_path / "lists.npy"
    np.save(genes_path, lists)
    outdir = tmp_path / "multi"
    res = M.process_multiple_genomes_multiple_files(
        str(gb), str(genes_path), "vY", str(outdir), verbose=False)
    assert res["genome_count"] == 2
    f0 = (outdir / "minimized_vY_0000.fasta").read_text()
    assert f0.startswith(">Minimized_E_coli_K12_MG1655_1\n")
    assert f0.endswith("\n")


def test_sharded_merge_is_byte_identical(tmp_path):
    genes = [f"g{i}" for i in range(10)]
    gb = tmp_path / "w.gb"
    synthetic.write_genbank(gb, genes, genome_length=1100, seed=7)
    lists = np.array([genes[:k] for k in range(1, 8)], dtype=object)
    genes_path = tmp_path / "lists.npy"
    np.save(genes_path, lists)

    single = tmp_path / "single.fasta"
    M.process_multiple_genomes_single_file(str(gb), str(genes_path), "m",
                                           str(single), verbose=False)
    merged = tmp_path / "merged.fasta"
    for pi in range(3):
        M.process_sharded(str(gb), str(genes_path), "m", str(merged),
                          process_index=pi, process_count=3, merge=False)
    M.process_sharded(str(gb), str(genes_path), "m", str(merged),
                      process_index=0, process_count=3, merge=True)
    s = single.read_text().splitlines()
    m = merged.read_text().splitlines()
    # identical up to the timestamp comment line
    assert s[0] == m[0] and s[1] == m[1]
    assert s[3:] == m[3:]


# ---------------------------------------------------------------------------
# Converter
# ---------------------------------------------------------------------------

def test_masks_to_gene_lists_threshold_and_dedupe(tmp_path):
    cols = np.array(["a", "b", "a", "c"])  # duplicate 'a' -> keep first
    masks = np.array([
        [0.6, 0.5, 0.9, 0.49],   # >= 0.5 -> a, b
        [0.1, 0.9, 0.2, 1.0],    # b, c
    ])
    mpath = tmp_path / "masks.npy"
    np.save(mpath, masks)
    out = tmp_path / "ids.npy"
    lists = C.masks_to_gene_lists(str(mpath), cols, str(out))
    assert lists == [["a", "b"], ["b", "c"]]
    loaded = np.load(out, allow_pickle=True)
    assert list(loaded[0]) == ["a", "b"] and list(loaded[1]) == ["b", "c"]


def test_masks_threshold_is_geq_half():
    """Converter uses >= 0.5 (binary_converter.py:55); exactly 0.5 is kept."""
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        mpath = os.path.join(d, "m.npy")
        np.save(mpath, np.array([[0.5, 0.4999999]]))
        lists = C.masks_to_gene_lists(mpath, np.array(["x", "y"]), None)
        assert lists == [["x"]]


def test_masks_to_gene_lists_streaming_identical(tmp_path):
    """chunk_size > 0 streams through a memory map; outputs (return value
    AND saved .npy) must be identical to the whole-file path, including
    ragged chunk tails and the dedupe-width acceptance."""
    rng = np.random.RandomState(5)
    cols = np.array([f"g{i:03d}" for i in range(37)])
    cols[7] = cols[3]  # duplicate -> dedupe keeps first
    masks = rng.rand(23, 37)
    mpath = tmp_path / "masks.npy"
    np.save(mpath, masks)

    out_w = tmp_path / "whole.npy"
    out_s = tmp_path / "stream.npy"
    whole = C.masks_to_gene_lists(str(mpath), cols, str(out_w), chunk_size=0)
    for chunk in (1, 7, 23, 100):
        streamed = C.masks_to_gene_lists(str(mpath), cols, str(out_s),
                                         chunk_size=chunk)
        assert streamed == whole, f"chunk_size={chunk}"
    lw = np.load(out_w, allow_pickle=True)
    ls = np.load(out_s, allow_pickle=True)
    assert all(list(a) == list(b) for a, b in zip(lw, ls))


def test_masks_to_gene_lists_streaming_object_fallback(tmp_path):
    """Object-dtype (pickled) mask files cannot be memory-mapped; the
    streaming path must fall back to the whole-file coercions."""
    masks = np.empty(2, dtype=object)
    masks[0] = [0.9, 0.1, 0.7]
    masks[1] = [0.0, 1.0, 0.2]
    mpath = tmp_path / "obj.npy"
    np.save(mpath, masks, allow_pickle=True)
    cols = np.array(["a", "b", "c"])
    lists = C.masks_to_gene_lists(str(mpath), cols, None, chunk_size=8)
    assert lists == [["a", "c"], ["b"]]


def test_check_essential_genes_sorted_union(tmp_path):
    id_lists = [["zeta", "beta"], ["alpha", "beta", "essZ"]]
    essential_set = {"essZ", "essA"}
    out = tmp_path / "ids.npy"
    np.save(out, np.array(id_lists, dtype=object))
    out_path = C.check_essential_genes(essential_set, id_lists, str(out))
    saved = np.load(out_path, allow_pickle=True)
    assert list(saved[0]) == sorted({"zeta", "beta", "essZ", "essA"})
    assert list(saved[1]) == sorted({"alpha", "beta", "essZ", "essA"})
    assert out_path.endswith("_with_essentials.npy")


def test_load_files_header_variants(tmp_path):
    import pandas as pd
    p1 = tmp_path / "e1.csv"
    pd.DataFrame({"# gene": ["a ", "b"]}).to_csv(p1, index=False)
    ids = tmp_path / "ids.npy"
    np.save(ids, np.array([["a"]], dtype=object))
    es, il = C.load_files(str(p1), str(ids))
    assert es == {"a", "b"}  # stripped
    p2 = tmp_path / "e2.csv"
    pd.DataFrame({"gene": ["c"]}).to_csv(p2, index=False)
    es2, _ = C.load_files(str(p2), str(ids))
    assert es2 == {"c"}
