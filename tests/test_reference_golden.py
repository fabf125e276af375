"""Byte-equality against the ACTUAL reference code (not a transcription).

Runs the reference's own converter (binary_converter.py:19-121) and
minimizer (minimizer_2.py:447-495) — imported from /root/reference — on the
same synthetic fixture as tests/test_golden.py, with BioPython replaced by a
minimal shim (tests/_bio_shim.py) whose records come straight from the
synthetic generator's ground-truth feature spec. Asserts:

1. our converter's gene lists == the reference converter's, exactly;
2. our single-file FASTA == the reference minimizer's, byte-for-byte
   (modulo the timestamp comment line);
3. both match the SHA-pinned goldens in tests/test_golden.py — proving those
   recorded goldens are reference-produced, closing round-1 VERDICT
   missing-item #3 ("transcription error mirrors itself").
"""

from __future__ import annotations

import hashlib
import importlib
import sys
from pathlib import Path

import numpy as np
import pytest

import _bio_shim
from test_golden import GOLDEN_FASTA_SHA, GOLDEN_GENE_LISTS_SHA, _build

from genome_minimizer_2_tpu.data import synthetic
from genome_minimizer_2_tpu.genome import converter as C
from genome_minimizer_2_tpu.genome import minimizer as M

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REFERENCE / "src").exists(),
    reason="reference checkout not available on this machine",
)

ESSENTIALS = {"gene000", "gene013", "notInDataset"}


def _reference_modules(gb_path: Path, genes: list[str]):
    spec = synthetic.genbank_spec(genes, genome_length=5000, seed=1234)
    return _reference_modules_for_spec(gb_path, spec)


def _reference_modules_for_spec(gb_path: Path, spec: dict):
    """Shim BioPython with the ground-truth record for ``spec`` and import
    the reference's converter + minimizer modules (shared with the mid-scale
    adversarial oracle, test_reference_golden_scale.py)."""
    _bio_shim.install({str(gb_path): _bio_shim.record_from_spec(spec)})
    if str(REFERENCE) not in sys.path:
        # APPEND, never prepend: the reference tree has its own top-level
        # main.py, and a prepended entry would shadow the repo's `main` for
        # any test that runs later in the same process
        sys.path.append(str(REFERENCE))
    conv = importlib.import_module(
        "src.genome_minimizer_2.explore_data.binary_converter")
    mini = importlib.import_module(
        "src.genome_minimizer_2.minimizer.minimizer_2")
    return conv, mini


def _strip_timestamp(path: Path) -> str:
    lines = path.read_text().splitlines(keepends=True)
    return "".join(l for l in lines if not l.startswith("# Generated on"))


def test_reference_convert_minimize_byte_equality(tmp_path):
    genes, gb, masks_path = _build(tmp_path)
    ref_conv, ref_mini = _reference_modules(gb, genes)

    # --- reference pipeline (its own code, verbatim) ----------------------
    ref_ids = tmp_path / "ref_ids.npy"
    ref_conv.masks_to_gene_lists(str(masks_path), np.array(genes),
                                 str(ref_ids))
    ref_filled = ref_conv.check_essential_genes(
        set(ESSENTIALS), np.load(ref_ids, allow_pickle=True), str(ref_ids))
    ref_fasta = tmp_path / "ref.fasta"
    ref_mini.process_multiple_genomes_single_file(
        str(gb), str(ref_filled), "golden", str(ref_fasta))

    # --- our pipeline ------------------------------------------------------
    ids = tmp_path / "ids.npy"
    lists = C.masks_to_gene_lists(str(masks_path), np.array(genes), str(ids))
    filled = C.check_essential_genes(set(ESSENTIALS), lists, str(ids))
    fasta = tmp_path / "ours.fasta"
    M.process_multiple_genomes_single_file(str(gb), str(filled), "golden",
                                           str(fasta), verbose=False)

    # 1. gene lists exactly equal
    ref_lists = [list(x) for x in np.load(ref_filled, allow_pickle=True)]
    our_lists = [list(x) for x in np.load(filled, allow_pickle=True)]
    assert our_lists == ref_lists

    # 2. FASTA byte-equal (timestamp line excepted)
    ref_body = _strip_timestamp(ref_fasta)
    our_body = _strip_timestamp(fasta)
    assert our_body == ref_body

    # 3. the committed goldens are reference-produced
    assert hashlib.sha256(repr(ref_lists).encode()).hexdigest() \
        == GOLDEN_GENE_LISTS_SHA
    assert hashlib.sha256(ref_body.encode()).hexdigest() == GOLDEN_FASTA_SHA
