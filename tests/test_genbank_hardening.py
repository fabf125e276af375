"""GenBank parser hardening: realistic E. coli-file constructs — origin-
spanning joins on circular genomes, CDS/tRNA features interleaved, pseudo
genes, long wrapped locations, quoted slashes in qualifiers."""

import pytest

from genome_minimizer_2_tpu.genome import genbank as GB


def _parse(text, tmp_path):
    p = tmp_path / "t.gb"
    p.write_text(text)
    return GB.parse_genbank(p)


def test_origin_spanning_join(tmp_path):
    """Circular genomes: join(3900..4000,1..50) -> BioPython start=0,
    end=4000 (min/max over parts)."""
    rec = _parse("""LOCUS       C             4000 bp    DNA     circular BCT 01-JAN-2024
FEATURES             Location/Qualifiers
     gene            join(3900..4000,1..50)
                     /gene="wrap"
ORIGIN
""" + "".join(f"{i*60+1:>9} {'acgtacgtag' * 6}\n" for i in range(4000 // 60))
        + f"{3961:>9} {'acgtacgtag' * 4}\n//\n", tmp_path)
    f = rec.gene_features()[0]
    assert (f.start, f.end) == (0, 4000)
    assert f.gene_name() == "wrap"


def test_interleaved_feature_types(tmp_path):
    rec = _parse("""LOCUS       X             120 bp    DNA     linear BCT 01-JAN-2024
FEATURES             Location/Qualifiers
     source          1..120
     gene            1..30
                     /gene="aaa"
     CDS             1..30
                     /gene="aaa"
                     /product="protein A"
     tRNA            40..60
     gene            70..100
                     /gene="bbb"
                     /pseudo
     misc_feature    101..110
ORIGIN
        1 acgtacgtac gtacgtacgt acgtacgtac gtacgtacgt acgtacgtac gtacgtacgt
       61 acgtacgtac gtacgtacgt acgtacgtac gtacgtacgt
//
""", tmp_path)
    genes = rec.gene_features()
    assert [f.gene_name() for f in genes] == ["aaa", "bbb"]
    assert "pseudo" in genes[1].qualifiers
    # only 'gene' features feed the minimizer (minimizer_2.py:60)
    assert len([f for f in rec.features if f.type == "CDS"]) == 1


def test_wrapped_location(tmp_path):
    rec = _parse("""LOCUS       W             200 bp    DNA     linear BCT 01-JAN-2024
FEATURES             Location/Qualifiers
     gene            join(1..20,30..40,50..60,70..80,90..100,110..120,
                     130..140,150..160)
                     /gene="multi"
ORIGIN
        1 acgtacgtac gtacgtacgt acgtacgtac gtacgtacgt acgtacgtac gtacgtacgt
       61 acgtacgtac gtacgtacgt acgtacgtac gtacgtacgt acgtacgtac gtacgtacgt
      121 acgtacgtac gtacgtacgt acgtacgtac gtacgtacgt acgtacgtac gtacgtacgt
      181 acgtacgtac gtacgtacgt
//
""", tmp_path)
    f = rec.gene_features()[0]
    assert (f.start, f.end) == (0, 160)
    assert f.gene_name() == "multi"


def test_quoted_slash_in_note(tmp_path):
    rec = _parse("""LOCUS       Q             40 bp    DNA     linear BCT 01-JAN-2024
FEATURES             Location/Qualifiers
     gene            1..12
                     /gene="abc"
                     /note="reg: a/b and c/d elements"
ORIGIN
        1 acgtacgtac gtacgtacgt acgtacgtac gtacgtacgt
//
""", tmp_path)
    f = rec.gene_features()[0]
    assert f.qualifiers["note"][0] == "reg: a/b and c/d elements"
    assert f.gene_name() == "abc"


def test_sequence_with_n_bases(tmp_path):
    rec = _parse("""LOCUS       N             20 bp    DNA     linear BCT 01-JAN-2024
ORIGIN
        1 acgtnacgtn acgtnacgtn
//
""", tmp_path)
    assert rec.seq == "ACGTNACGTNACGTNACGTN"
