"""Golden-file regression: the deterministic convert->minimize sub-pipeline
(no RNG anywhere — SURVEY.md §7.1's byte-equality scope) pinned by SHA256.

The fixture inputs are generated from fixed seeds (numpy's RandomState is
stable across versions by spec); if this test ever fails, outputs changed —
that is a parity regression, not a flaky test.
"""

import hashlib

import numpy as np

from genome_minimizer_2_tpu.data import synthetic
from genome_minimizer_2_tpu.genome import converter as C
from genome_minimizer_2_tpu.genome import minimizer as M

GOLDEN_GENE_LISTS_SHA = "1426c679f831a36b21355263b9536df8828457e835bb12d7e0cc068b5640b617"
GOLDEN_FASTA_SHA = "0d6b78cc954ce0ec66c26e8a199c84f258ac4c0ae4c9f8fe05ffbc724b956bfa"


def _build(tmp_path):
    genes = [f"gene{i:03d}" for i in range(48)]
    gb = tmp_path / "g.gb"
    synthetic.write_genbank(gb, genes, genome_length=5000, seed=1234)
    rng = np.random.RandomState(99)
    masks = rng.rand(6, 48)
    masks_path = tmp_path / "masks.npy"
    np.save(masks_path, masks)
    return genes, gb, masks_path


def test_convert_minimize_golden(tmp_path):
    genes, gb, masks_path = _build(tmp_path)
    ids = tmp_path / "ids.npy"
    lists = C.masks_to_gene_lists(str(masks_path), np.array(genes), str(ids))
    essential_set = {"gene000", "gene013", "notInDataset"}
    filled = C.check_essential_genes(essential_set, lists, str(ids))

    lists_digest = hashlib.sha256(
        repr([list(x) for x in np.load(filled, allow_pickle=True)]).encode()
    ).hexdigest()

    out = tmp_path / "golden.fasta"
    M.process_multiple_genomes_single_file(str(gb), str(filled), "golden",
                                           str(out), verbose=False)
    # strip the timestamp comment line before hashing
    lines = out.read_text().splitlines(keepends=True)
    body = "".join(l for l in lines if not l.startswith("# Generated on"))
    fasta_digest = hashlib.sha256(body.encode()).hexdigest()

    assert lists_digest == GOLDEN_GENE_LISTS_SHA, lists_digest
    assert fasta_digest == GOLDEN_FASTA_SHA, fasta_digest
