"""Essential-gene extraction semantics: prefix map, direct/variant matching,
final position mapping — checked against handcrafted expectations that
transcribe the reference's matching rules (extract_essential_genes.py)."""

import pickle

import numpy as np
import pandas as pd
import pytest

from genome_minimizer_2_tpu.explore import essential_genes as EG


def test_extract_prefix():
    """Leading [a-zA-Z0-9]+ run (utils/extras.py:41-46)."""
    assert EG.extract_prefix("thrA_1") == "thrA"
    assert EG.extract_prefix("ssb") == "ssb"
    assert EG.extract_prefix("abc123_x") == "abc123"
    assert EG.extract_prefix("_odd") == "_odd"  # no match -> unchanged


def test_clean_gene_name():
    assert EG.clean_gene_name("  thrA ") == "thrA"
    assert EG.clean_gene_name("") is None
    assert EG.clean_gene_name(None) is None
    assert EG.clean_gene_name(float("nan")) is None


@pytest.fixture()
def tiny_root(tmp_path):
    """Dataset with controlled gene names exercising every matching branch."""
    genes = ["aceE", "thrA_1", "thrA_2", "ssbA", "lptB", "lptB_2", "zzz"]
    samples = [f"s{i}" for i in range(6)]
    rng = np.random.RandomState(0)
    mat = (rng.rand(len(genes), len(samples)) < 0.7).astype(int)
    df = pd.DataFrame(mat, index=genes, columns=samples)
    lineage = pd.DataFrame([np.ones(len(samples), int)], index=["Lineage"],
                           columns=samples)
    pa = tmp_path / "pa.csv"
    pd.concat([lineage, df]).to_csv(pa)
    ph = tmp_path / "ph.csv"
    pd.DataFrame({"ID": [s.upper() for s in samples],
                  "Phylogroup": ["A"] * len(samples)}).to_csv(ph, index=False)
    eg = tmp_path / "eg.csv"
    # aceE: direct; thrA: family prefix (absent, variants thrA_1/_2);
    # ssb: prefix of ssbA; lptB: direct AND has a variant; missing: absent
    pd.DataFrame({"gene": ["aceE", "thrA", "ssb", "lptB", "missing"]}).to_csv(
        eg, index=False)
    return dict(pa=str(pa), ph=str(ph), eg=str(eg), out=tmp_path / "out",
                genes=genes)


def test_gene_position_mapping_and_matches(tiny_root):
    p = EG.EssentialGeneProcessor(
        dataset_path=tiny_root["pa"], phylogroups_path=tiny_root["ph"],
        essential_genes_path=tiny_root["eg"], output_dir=tiny_root["out"])
    p.load_datasets()
    mapping = p.create_gene_position_mapping()
    # prefixes group suffix variants (extract_essential_genes.py:90-109)
    assert mapping["thrA"] == [1, 2]
    assert mapping["lptB"] == [4, 5]
    assert mapping["aceE"] == [0]
    assert mapping["ssbA"] == [3]  # prefix of 'ssbA' is 'ssbA'

    present, absent, variants = p.identify_gene_matches()
    assert set(map(str, present)) == {"aceE", "lptB"}
    assert set(map(str, absent)) == {"thrA", "ssb", "missing"}
    # regex ^name over columns: thrA->thrA_1/2, ssb->ssbA
    assert set(map(str, variants)) == {"thrA_1", "thrA_2", "ssbA"}

    final = p.create_final_essential_genes_mapping()
    # direct genes use the prefix map; absent families resolve when the
    # family name IS a prefix key ('thrA' yes, 'ssb' no — 'ssbA' has prefix
    # 'ssbA'); 'missing' maps nowhere (extract_essential_genes.py:199-211)
    assert final == {"aceE": [0], "lptB": [4, 5], "thrA": [1, 2]}


def test_full_preprocess_writes_pickle_and_summary(tiny_root):
    p = EG.EssentialGeneProcessor(
        dataset_path=tiny_root["pa"], phylogroups_path=tiny_root["ph"],
        essential_genes_path=tiny_root["eg"], output_dir=tiny_root["out"])
    result = p.process()
    with open(tiny_root["out"] / "essential_gene_positions.pkl", "rb") as f:
        loaded = pickle.load(f)
    assert loaded == result
    summary = (tiny_root["out"] / "essential_gene_positions_summary.txt").read_text()
    assert "Total essential genes mapped: 3" in summary
    assert "lptB: positions [4, 5]" in summary
    assert "aceE: position 0" in summary


def test_exploration_process_essential_genes(tiny_root, monkeypatch):
    """Family consolidation in the exploration module
    (data_exploration.py:235-347)."""
    from genome_minimizer_2_tpu.data.dataset import load_and_validate_data
    from genome_minimizer_2_tpu.explore import exploration

    _, merged_df, _ = load_and_validate_data(tiny_root["pa"], tiny_root["ph"])
    final_df = exploration.process_essential_genes(
        merged_df, essential_genes_path=tiny_root["eg"], save_list=False)
    cols = set(final_df.columns)
    # direct matches stay; variant columns replaced by consolidated families
    assert "aceE" in cols and "lptB" in cols
    assert "thrA" in cols and "thrA_1" not in cols
    assert "ssb" in cols and "ssbA" not in cols
    # consolidated presence = OR of variants
    orig = merged_df[["thrA_1", "thrA_2"]].sum(axis=1) > 0
    np.testing.assert_array_equal(final_df["thrA"].to_numpy(),
                                  orig.astype(int).to_numpy())
