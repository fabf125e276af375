"""Mid-scale ADVERSARIAL reference-oracle golden (round-2 VERDICT weak #4).

The small oracle (test_reference_golden.py, 5 kbp / ~48 genes / 6 samples)
never pushed the nasty interactions through the reference code end-to-end.
This fixture does: ~100 kbp genome, ~500 heavily-overlapping gene features
including complement()/join() locations, TWO origin-wrapping joins (circular
genome — BioPython's CompoundLocation then spans the whole genome, so
dropping that gene erases every base), duplicate gene names across features,
duplicate dataset columns (converter dedupe), gene names absent from the
dataset, unnamed features, and essentials absent from both dataset and
genome — 200 samples through the ACTUAL reference converter + minimizer
(imported from /root/reference, BioPython shimmed with ground-truth records)
vs our converter + native C++ minimize engine reading the GenBank FILE.

Asserts identical gene lists, byte-equal FASTA, and pins both with SHA256
goldens so later refactors can regression-check without the (slow) oracle.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import numpy as np
import pytest

import _bio_shim
from test_reference_golden import REFERENCE, _reference_modules_for_spec

from genome_minimizer_2_tpu.data import synthetic
from genome_minimizer_2_tpu.genome import converter as C
from genome_minimizer_2_tpu.genome import genbank as GB
from genome_minimizer_2_tpu.genome import minimizer as M

pytestmark = pytest.mark.skipif(
    not (REFERENCE / "src").exists(),
    reason="reference checkout not available on this machine",
)

GENOME_LENGTH = 100_000
N_FEATURES = 500
N_SAMPLES = 200

# 480 dataset columns, ~20 literal duplicates (dedupe-first-occurrence path)
def _columns() -> list[str]:
    cols = [f"gene{i:03d}" for i in range(460)]
    rng = np.random.RandomState(5)
    for i in rng.choice(420, size=20, replace=False):
        cols.append(cols[int(i)])  # duplicate column names
    return cols


ESSENTIALS = {
    "gene003", "gene077", "gene211",      # dataset-present
    "notInDataset", "alsoMissing",        # absent from dataset AND genome
    "wrapGhost",                          # on an origin-wrapping feature,
                                          # absent from the dataset columns
}

GOLDEN_LISTS_SHA = "315e71d5b0c5281457f159d3e93e0e07230e6271aa097cba51daa152e9cb5002"
GOLDEN_FASTA_SHA = "e5e262337345ec362d4f5d43411c3fca8732d20a8899c4409775cf43cc902917"


def _build(tmp_path: Path):
    cols = _columns()
    spec = synthetic.adversarial_genbank_spec(
        cols[:460], genome_length=GENOME_LENGTH, n_features=N_FEATURES,
        seed=21)
    gb = tmp_path / "adversarial.gb"
    synthetic.write_genbank_from_spec(gb, spec)
    rng = np.random.RandomState(77)
    # the converter requires mask width == DEDUPED column count (the
    # reference raises otherwise — binary_converter.py:50-54); the duplicate
    # columns still exercise the keep-first-occurrence dedupe of `cols`
    n_dedup = len(dict.fromkeys(cols))
    masks = rng.rand(N_SAMPLES, n_dedup)
    masks_path = tmp_path / "masks.npy"
    np.save(masks_path, masks)
    return cols, spec, gb, masks_path


def _strip_timestamp(path: Path) -> str:
    lines = path.read_text().splitlines(keepends=True)
    return "".join(l for l in lines if not l.startswith("# Generated on"))


def test_parser_matches_spec(tmp_path):
    """Our GenBank parser agrees with the ground-truth spans BioPython would
    expose — including the origin-wrapping compound locations."""
    cols, spec, gb, _ = _build(tmp_path)
    rec = GB.parse_genbank(gb)
    ours = [(f.gene_name(), f.start, f.end) for f in rec.gene_features()]
    want = [((n if n is not None else ""), s0, e0)
            for _loc, n, s0, e0, _tag in spec["features"]]
    assert ours == want
    assert rec.seq == spec["seq"].upper()
    # the adversarial ingredients are actually present
    assert sum(1 for _l, _n, s0, e0, _t in spec["features"]
               if s0 == 0 and e0 == GENOME_LENGTH) == 2
    names = [n for _l, n, *_ in spec["features"] if n]
    assert len(names) != len(set(names))  # duplicate feature names
    assert any(n.startswith("ghost") for n in names)  # dataset-absent


def test_adversarial_reference_oracle_byte_equality(tmp_path):
    cols, spec, gb, masks_path = _build(tmp_path)
    ref_conv, ref_mini = _reference_modules_for_spec(gb, spec)

    # --- reference pipeline (its own code, verbatim) ----------------------
    ref_ids = tmp_path / "ref_ids.npy"
    ref_conv.masks_to_gene_lists(str(masks_path), np.array(cols), str(ref_ids))
    ref_filled = ref_conv.check_essential_genes(
        set(ESSENTIALS), np.load(ref_ids, allow_pickle=True), str(ref_ids))
    ref_fasta = tmp_path / "ref.fasta"
    ref_mini.process_multiple_genomes_single_file(
        str(gb), str(ref_filled), "adversarial", str(ref_fasta))

    # --- ours --------------------------------------------------------------
    ids = tmp_path / "ids.npy"
    lists = C.masks_to_gene_lists(str(masks_path), np.array(cols), str(ids))
    filled = C.check_essential_genes(set(ESSENTIALS), lists, str(ids))
    fasta = tmp_path / "ours.fasta"
    M.process_multiple_genomes_single_file(str(gb), str(filled),
                                           "adversarial", str(fasta),
                                           verbose=False)

    ref_lists = [list(x) for x in np.load(ref_filled, allow_pickle=True)]
    our_lists = [list(x) for x in np.load(filled, allow_pickle=True)]
    assert our_lists == ref_lists

    ref_body = _strip_timestamp(ref_fasta)
    our_body = _strip_timestamp(fasta)
    assert our_body == ref_body

    # the origin-wrap drop really erased whole genomes in this fixture
    assert "\n>" in ref_body and "\n\n" in ref_body

    # pin the goldens (recorded from the reference run)
    assert hashlib.sha256(repr(ref_lists).encode()).hexdigest() \
        == GOLDEN_LISTS_SHA
    assert hashlib.sha256(ref_body.encode()).hexdigest() == GOLDEN_FASTA_SHA


def test_adversarial_golden_regression(tmp_path):
    """Fast-path regression (no reference import): our pipeline against the
    SHA-pinned reference-produced goldens."""
    cols, spec, gb, masks_path = _build(tmp_path)
    ids = tmp_path / "ids.npy"
    lists = C.masks_to_gene_lists(str(masks_path), np.array(cols), str(ids))
    filled = C.check_essential_genes(set(ESSENTIALS), lists, str(ids))
    fasta = tmp_path / "ours.fasta"
    M.process_multiple_genomes_single_file(str(gb), str(filled),
                                           "adversarial", str(fasta),
                                           verbose=False)
    our_lists = [list(x) for x in np.load(filled, allow_pickle=True)]
    assert hashlib.sha256(repr(our_lists).encode()).hexdigest() \
        == GOLDEN_LISTS_SHA
    assert hashlib.sha256(_strip_timestamp(fasta).encode()).hexdigest() \
        == GOLDEN_FASTA_SHA
