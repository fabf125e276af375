"""Visualization suite smoke tests: every plot function writes its PDF."""

import numpy as np
import pytest

from genome_minimizer_2_tpu.eval import visualise as V
from genome_minimizer_2_tpu.utils.config import ExperimentConfig


@pytest.fixture()
def cfg():
    return ExperimentConfig(trainer_version="v2")


def test_loss_curve(tmp_path):
    out = tmp_path / "loss.pdf"
    V.plot_loss_vs_epochs_graph([1, 2, 3], [3.0, 2.0, 1.5], [3.2, 2.4, 1.9],
                                str(out))
    assert out.stat().st_size > 0


def test_samples_distribution(tmp_path, rng):
    out = tmp_path / "dist.pdf"
    V.plot_samples_distribution(rng.rand(30, 50).round(), str(out),
                                "dodgerblue", 0, 50)
    assert out.exists()


def test_essential_distribution(tmp_path, rng):
    out = tmp_path / "ess.pdf"
    V.plot_essential_genes_distribution(rng.randint(0, 20, 30), str(out),
                                        "violet", 0, 25)
    assert out.exists()


def test_essential_vs_total(tmp_path, rng):
    out = tmp_path / "vs.pdf"
    V.plot_essential_vs_total(rng.randint(0, 20, 30),
                              rng.randint(20, 50, 30), str(out))
    assert out.exists()


def test_latent_pca(tmp_path, cfg, rng):
    latents = rng.randn(40, 8)
    phylo = rng.choice(["A", "B1", "D"], 40)
    df = V.plot_latent_space_pca(latents, phylo, cfg, str(tmp_path))
    assert list(df.columns) == ["PC1", "PC2", "PC3", "phylogroup"]
    assert (tmp_path / "v2_pca_latent_space_test_set.pdf").exists()


def test_latent_dims(tmp_path, rng):
    V.plot_latent_dimensions_distribution(rng.randn(30, 6), str(tmp_path))
    assert (tmp_path / "latent_dimensions_distribution.pdf").exists()


def test_reconstruction_examples(tmp_path, rng):
    V.plot_reconstruction_examples(rng.rand(4, 30).round(), rng.rand(4, 30),
                                   str(tmp_path), n_examples=3)
    for i in (1, 2, 3):
        assert (tmp_path / f"reconstruction_example_{i}.pdf").exists()


def test_metric_histograms(tmp_path, cfg, rng):
    V.generate_metric_histograms(rng.rand(30).tolist(), rng.rand(30).tolist(),
                                 cfg, str(tmp_path))
    assert (tmp_path / "v2_f1_score_frequency_test_set.pdf").exists()
    assert (tmp_path / "v2_accuracy_score_frequency_test_set.pdf").exists()


def test_training_summary(tmp_path, rng):
    V.create_training_summary_plot([3.0, 2.0], [3.1, 2.2],
                                   rng.rand(20).tolist(), rng.rand(20).tolist(),
                                   str(tmp_path), "modelX")
    assert (tmp_path / "modelX_training_summary.pdf").exists()


def test_minimized_distribution(tmp_path, rng):
    from genome_minimizer_2_tpu.genome.minimizer import plot_minimized_distribution

    # below threshold: no plot (reference parity, minimizer_2.py:216-252)
    assert plot_minimized_distribution([1.0] * 10, "m", str(tmp_path)) is None
    out = plot_minimized_distribution((rng.rand(120) + 3).tolist(), "m",
                                      str(tmp_path))
    assert out and (tmp_path / "minimised_genomes_distribution_m.pdf").exists()


def test_genbank_multi_record_rejected(tmp_path):
    from genome_minimizer_2_tpu.genome.genbank import parse_genbank

    gb = """LOCUS       A             4 bp    DNA     linear BCT 01-JAN-2024
ORIGIN
        1 acgt
//
LOCUS       B             4 bp    DNA     linear BCT 01-JAN-2024
ORIGIN
        1 acgt
//
"""
    p = tmp_path / "two.gb"
    p.write_text(gb)
    with pytest.raises(ValueError, match="More than one record"):
        parse_genbank(p)
