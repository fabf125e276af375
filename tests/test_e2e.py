"""End-to-end pipeline through the CLI on a synthetic data root:
preprocess -> explore -> experiment (train) -> sample -> convert-samples ->
minimizer — the BASELINE.json config-0 slice at miniature scale."""

import os
import pickle

import numpy as np
import pytest

import main as cli


@pytest.fixture()
def cli_root(synth_root, tmp_path, monkeypatch):
    monkeypatch.setenv("GM2_ROOT", synth_root["root"])
    monkeypatch.chdir(tmp_path)
    return synth_root


def test_preprocess_mode(cli_root):
    rc = cli.main(["--mode", "preprocess", "--force-reprocess"])
    assert rc == 0
    from genome_minimizer_2_tpu.utils import directories

    path = directories.essential_genes_positions()
    assert os.path.exists(path)
    with open(path, "rb") as f:
        positions = pickle.load(f)
    assert positions and all(isinstance(v, list) for v in positions.values())
    # skip-if-exists actually works (the reference's check was path-mismatched)
    rc = cli.main(["--mode", "preprocess"])
    assert rc == 0


def test_explore_mode(cli_root):
    rc = cli.main(["--mode", "explore"])
    assert rc == 0
    from genome_minimizer_2_tpu.utils import directories

    figdir = directories.project_root() / "data" / "data_exploration"
    for name in ["plot_genome_size_final.pdf", "plot_gene_count_final.pdf",
                 "plot_gene_frequency_final.pdf", "plot_EG_number.pdf",
                 "plot_PCA_by_phylogroup.pdf", "data_exploration_report.txt"]:
        assert (figdir / name).exists(), name


def test_full_pipeline(cli_root, tmp_path):
    from genome_minimizer_2_tpu.utils import directories

    # -- preprocess (needed by sampling) --------------------------------
    assert cli.main(["--mode", "preprocess", "--force-reprocess"]) == 0

    # -- train (custom experiment, tiny dims) ---------------------------
    rc = cli.main([
        "--mode", "experiment", "--trainer-version", "v1",
        "--hidden-dim", "16", "--latent-dim", "4", "--n-epochs", "2",
        "--batch-size", "8", "--experiment-name", "e2e_v1",
    ])
    assert rc == 0
    ckpt = (directories.project_root() / "models" / "trained_models" / "e2e_v1"
            / "saved_VAE_v1.npz")
    assert ckpt.exists()
    figures = directories.project_root() / "models" / "e2e_v1" / "figures"
    assert (figures / "e2e_v1_config.txt").exists()
    assert (figures / "v1_train_val_loss.pdf").exists()
    assert (figures / "v1_metrics_summary.txt").exists()
    assert (figures / "v1_pca_latent_space_test_set.pdf").exists()
    assert (figures / "e2e_v1_training_summary.pdf").exists()

    # -- sample ----------------------------------------------------------
    rc = cli.main(["--mode", "sample", "--model-path", str(ckpt),
                   "--num-samples", "20"])
    assert rc == 0
    sdir = directories.project_root() / "models" / "v1_model" / "sampling_results"
    samples_npy = sdir / "v1_binary_samples_default.npy"
    assert samples_npy.exists()
    samples = np.load(samples_npy)
    assert samples.shape == (20, 120)
    assert (sdir / "v1_data_full_samples_df.csv").exists()

    # -- mesh-parallel sampling (decode sharded over the 8 CPU devices)
    # must be bitwise identical to the single-device run above
    rc = cli.main(["--mode", "sample", "--model-path", str(ckpt),
                   "--num-samples", "20", "--data-parallel", "8"])
    assert rc == 0
    np.testing.assert_array_equal(np.load(samples_npy), samples)

    # -- focused sampling ------------------------------------------------
    rc = cli.main(["--mode", "sample", "--model-path", str(ckpt),
                   "--num-samples", "5", "--sampling-mode", "focused",
                   "--noise-level", "0.2"])
    assert rc == 0
    assert (sdir / "v1_binary_samples_focused.npy").exists()

    # -- convert-samples -------------------------------------------------
    out_ids = tmp_path / "ids.npy"
    rc = cli.main(["--mode", "convert-samples", "--genes-path", str(samples_npy),
                   "--output-file", str(out_ids)])
    assert rc == 0
    assert out_ids.exists()
    filled = tmp_path / "ids_with_essentials.npy"
    assert filled.exists()
    id_lists = np.load(filled, allow_pickle=True)
    assert len(id_lists) == 20
    # every sample contains every essential gene after backfill
    import pandas as pd
    ess = pd.read_csv(directories.paper_essential_genes())
    col = "# gene" if "# gene" in ess.columns else "gene"
    essentials = set(ess[col].astype(str).str.strip())
    for lst in id_lists:
        assert essentials <= set(lst)

    # -- minimizer (single file) ----------------------------------------
    fasta = tmp_path / "minimized.fasta"
    rc = cli.main(["--mode", "minimizer", "--genes-path", str(filled),
                   "--output-file", str(fasta), "--model-name", "v1"])
    assert rc == 0
    text = fasta.read_text()
    assert text.startswith("# Minimized genomes generated using model: v1\n")
    assert text.count(">Minimized_E_coli_K12_MG1655_") == 20
    # sequences only contain uppercase bases
    seq_lines = [l for l in text.splitlines() if l and not l.startswith(("#", ">"))]
    assert seq_lines and all(set(l) <= set("ACGTN") for l in seq_lines)

    # -- minimizer (multiple files) -------------------------------------
    outdir = tmp_path / "multi"
    rc = cli.main(["--mode", "minimizer", "--genes-path", str(filled),
                   "--output-dir", str(outdir), "--model-name", "v1"])
    assert rc == 0
    files = sorted(os.listdir(outdir))
    assert len(files) == 20
    assert files[0] == "minimized_v1_0000.fasta"


def test_training_mode_preset(cli_root):
    """--mode training with a preset (v0 architecture, 1 epoch)."""
    rc = cli.main(["--mode", "training", "--preset", "v0", "--epochs", "1"])
    assert rc == 0
    from genome_minimizer_2_tpu.utils import directories

    ckpt = (directories.project_root() / "models" / "trained_models" / "v0_model"
            / "saved_VAE_v0.npz")
    assert ckpt.exists()
