"""CLI coverage: config files, resume-from, checkpoint-every, missing-data
handling."""

import json
import os

import numpy as np
import pytest

import main as cli
from genome_minimizer_2_tpu.utils import directories


@pytest.fixture()
def cli_root(synth_root, tmp_path, monkeypatch):
    monkeypatch.setenv("GM2_ROOT", synth_root["root"])
    monkeypatch.chdir(tmp_path)
    return synth_root


def test_missing_data_exits_nonzero(tmp_path, monkeypatch):
    monkeypatch.setenv("GM2_ROOT", str(tmp_path / "empty"))
    rc = cli.main(["--mode", "training", "--preset", "v0", "--epochs", "1"])
    assert rc == 1


def test_config_file_mode(cli_root, tmp_path):
    cfg_file = tmp_path / "exp.json"
    cfg_file.write_text(json.dumps({
        "hidden_dim": 8, "latent_dim": 2, "n_epochs": 1, "batch_size": 16,
        "trainer_version": "v0", "experiment_name": "from_file",
        "generate_plots": False, "calculate_metrics": False,
        "explore_latent_space": False,
    }))
    rc = cli.main(["--mode", "experiment", "--config-file", str(cfg_file)])
    assert rc == 0
    ckpt = (directories.project_root() / "models" / "trained_models"
            / "from_file" / "saved_VAE_v0.npz")
    assert ckpt.exists()


def test_cli_flag_overrides_config_file(cli_root, tmp_path):
    cfg_file = tmp_path / "exp2.json"
    cfg_file.write_text(json.dumps({
        "hidden_dim": 8, "latent_dim": 2, "n_epochs": 5, "batch_size": 16,
        "trainer_version": "v0", "experiment_name": "override_me",
        "generate_plots": False, "calculate_metrics": False,
        "explore_latent_space": False,
    }))
    rc = cli.main(["--mode", "experiment", "--config-file", str(cfg_file),
                   "--n-epochs", "1", "--experiment-name", "overridden"])
    assert rc == 0
    cfg_txt = (directories.project_root() / "models" / "overridden" / "figures"
               / "overridden_config.txt").read_text()
    line = next(l for l in cfg_txt.splitlines() if l.strip().startswith("n_epochs"))
    assert line.split(":")[1].strip() == "1"


def test_checkpoint_every_and_resume(cli_root):
    common = ["--mode", "experiment", "--trainer-version", "v2",
              "--hidden-dim", "8", "--latent-dim", "2", "--batch-size", "16",
              "--no-generate-plots", "--no-calculate-metrics",
              "--no-explore-latent-space"]
    rc = cli.main(common + ["--n-epochs", "2", "--experiment-name", "ck",
                            "--checkpoint-every", "2"])
    assert rc == 0
    state_ckpt = (directories.project_root() / "models" / "trained_models"
                  / "ck" / "train_state_2.npz")
    assert state_ckpt.exists()
    rc = cli.main(common + ["--n-epochs", "4", "--experiment-name", "ck2",
                            "--resume-from", str(state_ckpt)])
    assert rc == 0


def test_sample_save_dtype_uint8(cli_root):
    """--save-dtype uint8: binary_samples .npy written as uint8 (4x smaller
    at scale), values identical to the float32 default; converters accept
    either dtype."""
    import jax

    from genome_minimizer_2_tpu.models import vae
    from genome_minimizer_2_tpu.utils import checkpoint as CKPT
    from genome_minimizer_2_tpu.utils.config import ExperimentConfig

    assert cli.main(["--mode", "preprocess", "--force-reprocess"]) == 0
    cfg = ExperimentConfig(hidden_dim=8, latent_dim=2, trainer_version="v2")
    vcfg = vae.VAEConfig(input_dim=120, hidden_dim=8, latent_dim=2)
    params, stats = vae.init(vcfg, jax.random.key(4))
    ck = str(directories.project_root() / "saved_VAE_v2.npz")
    CKPT.save_checkpoint(ck, params, stats, cfg, extra={"input_dim": 120})

    sdir = directories.project_root() / "models" / "v2_model" / "sampling_results"
    npy = sdir / "v2_binary_samples_default.npy"
    assert cli.main(["--mode", "sample", "--model-path", ck,
                     "--num-samples", "9"]) == 0
    f32 = np.load(npy)
    assert f32.dtype == np.float32
    assert cli.main(["--mode", "sample", "--model-path", ck,
                     "--num-samples", "9", "--save-dtype", "uint8"]) == 0
    u8 = np.load(npy)
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(u8.astype(np.float32), f32)


def test_sample_save_dtype_packed_and_no_csv(cli_root):
    """--save-dtype packed writes the ~32x-smaller bitmask .npz (identical
    bits), --no-csv skips the genes x samples CSV, and convert-samples
    ingests the packed artifact with outputs load-equal to the float32
    path's (round-4 VERDICT next #7)."""
    import jax

    from genome_minimizer_2_tpu.models import vae
    from genome_minimizer_2_tpu.ops.pallas_kernels import unpack_bits
    from genome_minimizer_2_tpu.utils import checkpoint as CKPT
    from genome_minimizer_2_tpu.utils.config import ExperimentConfig

    assert cli.main(["--mode", "preprocess", "--force-reprocess"]) == 0
    cfg = ExperimentConfig(hidden_dim=8, latent_dim=2, trainer_version="v3")
    vcfg = vae.VAEConfig(input_dim=120, hidden_dim=8, latent_dim=2)
    params, stats = vae.init(vcfg, jax.random.key(6))
    ck = str(directories.project_root() / "saved_VAE_v3.npz")
    CKPT.save_checkpoint(ck, params, stats, cfg, extra={"input_dim": 120})

    sdir = directories.project_root() / "models" / "v3_model" / "sampling_results"
    csv = sdir / "v3_data_full_samples_df.csv"
    assert cli.main(["--mode", "sample", "--model-path", ck,
                     "--num-samples", "9"]) == 0
    f32 = np.load(sdir / "v3_binary_samples_default.npy")
    assert csv.exists()
    csv.unlink()

    assert cli.main(["--mode", "sample", "--model-path", ck,
                     "--num-samples", "9", "--save-dtype", "packed",
                     "--no-csv"]) == 0
    assert not csv.exists()
    npz = sdir / "v3_binary_samples_default.npz"
    with np.load(npz) as z:
        assert int(z["input_dim"]) == 120
        np.testing.assert_array_equal(
            unpack_bits(z["packed"], 120).astype(np.float32), f32)

    # convert-samples on packed vs float32 input: load-equal outputs
    outs = {}
    for label, src in (("f32", sdir / "v3_binary_samples_default.npy"),
                       ("packed", npz)):
        out = directories.project_root() / f"ids_{label}.npy"
        assert cli.main(["--mode", "convert-samples", "--genes-path",
                         str(src), "--output-file", str(out)]) == 0
        filled = str(out).replace(".npy", "_with_essentials.npy")
        outs[label] = (np.load(out, allow_pickle=True),
                       np.load(filled, allow_pickle=True))
    for a, b in zip(outs["f32"], outs["packed"]):
        assert len(a) == len(b) == 9
        for ra, rb in zip(a, b):
            assert list(ra) == list(rb)
