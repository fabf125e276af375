"""Import reference torch checkpoints (.pt state_dicts) into this framework.

A user of the reference has ``saved_VAE_{v0..v3}.pt`` files written by
``torch.save(model.state_dict())`` (experiments.py:322-325). This module
converts one into our config-bearing ``.npz`` checkpoint so sampling and
evaluation run on TPU without torch.

Key mapping (reference model.py:62-93):
  encoder.{0,3,6}.{weight,bias}      -> params/encoder/{i}/{w.T, b}
  encoder.{1,4,7}.{weight,bias}      -> params/encoder/{i}/bn/{scale,bias}
  encoder.{1,4,7}.running_{mean,var} -> batch_stats/encoder/{i}/{mean,var}
  mean_layer / logvar_layer          -> params/{mean,logvar}
  decoder.{0,3,6}.* / decoder.9.*    -> params/decoder/{0..3} analogously

Weights transpose from torch's (out, in) to our (in, out); the gene axis
zero-pads to the model's padded_dim. NB: importing torch in a process that
has touched this image's TPU backend deadlocks — run the conversion CLI
(`python -m genome_minimizer_2_tpu.utils.torch_import ...`) in its own
process, which this module's functions do not require jax for.
"""

from __future__ import annotations

import argparse
from typing import Dict

import numpy as np


def _pad2(w: np.ndarray, rows: int, cols: int) -> np.ndarray:
    out = np.zeros((rows, cols), np.float32)
    out[: w.shape[0], : w.shape[1]] = w
    return out


def _pad1(b: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros(n, np.float32)
    out[: b.shape[0]] = b
    return out


def convert_state_dict(
    state_dict: Dict[str, np.ndarray],
    pad_features: bool = True,
) -> tuple[Dict[str, np.ndarray], dict]:
    """torch state_dict (tensors or ndarrays) -> flat {path: array} in our
    checkpoint layout. Returns (flat_arrays, inferred_dims)."""
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().numpy()
                        if hasattr(v, "numpy") else v, np.float32)
          for k, v in state_dict.items()}
    input_dim, hidden_dim = sd["encoder.0.weight"].shape[1], sd["encoder.0.weight"].shape[0]
    latent_dim = sd["mean_layer.weight"].shape[0]
    padded = ((input_dim + 127) // 128 * 128) if pad_features else input_dim

    flat: Dict[str, np.ndarray] = {}

    def linear(prefix_t, prefix_o, rows, cols, true_rows=None, true_cols=None):
        w = sd[f"{prefix_t}.weight"].T  # (in, out)
        b = sd[f"{prefix_t}.bias"]
        flat[f"params/{prefix_o}/w"] = _pad2(w, rows, cols)
        flat[f"params/{prefix_o}/b"] = _pad1(b, cols)

    def bn(prefix_t, tree, idx):
        flat[f"params/{tree}/{idx}/bn/scale"] = sd[f"{prefix_t}.weight"]
        flat[f"params/{tree}/{idx}/bn/bias"] = sd[f"{prefix_t}.bias"]
        flat[f"batch_stats/{tree}/{idx}/mean"] = sd[f"{prefix_t}.running_mean"]
        flat[f"batch_stats/{tree}/{idx}/var"] = sd[f"{prefix_t}.running_var"]

    linear("encoder.0", "encoder/0", padded, hidden_dim)
    bn("encoder.1", "encoder", 0)
    linear("encoder.3", "encoder/1", hidden_dim, hidden_dim)
    bn("encoder.4", "encoder", 1)
    linear("encoder.6", "encoder/2", hidden_dim, hidden_dim)
    bn("encoder.7", "encoder", 2)
    linear("mean_layer", "mean", hidden_dim, latent_dim)
    linear("logvar_layer", "logvar", hidden_dim, latent_dim)
    linear("decoder.0", "decoder/0", latent_dim, hidden_dim)
    bn("decoder.1", "decoder", 0)
    linear("decoder.3", "decoder/1", hidden_dim, hidden_dim)
    bn("decoder.4", "decoder", 1)
    linear("decoder.6", "decoder/2", hidden_dim, hidden_dim)
    bn("decoder.7", "decoder", 2)
    linear("decoder.9", "decoder/3", hidden_dim, padded)

    dims = dict(input_dim=input_dim, hidden_dim=hidden_dim,
                latent_dim=latent_dim, padded_dim=padded)
    return flat, dims


def write_npz(flat: Dict[str, np.ndarray], dims: dict, config_overrides: dict,
              out_path: str) -> None:
    """Write our checkpoint .npz (format of utils.checkpoint) without jax."""
    import json

    config = {
        "hidden_dim": dims["hidden_dim"], "latent_dim": dims["latent_dim"],
        "pad_features": dims["padded_dim"] != dims["input_dim"],
    }
    config.update(config_overrides)
    meta = {"config": config,
            "extra": {"input_dim": dims["input_dim"],
                      "imported_from": "torch_state_dict"}}
    arrays = dict(flat)
    arrays["__config_json__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    np.savez(out_path, **arrays)


def convert_file(pt_path: str, out_path: str, trainer_version: str = "v0",
                 pad_features: bool = True) -> dict:
    """Load a .pt state_dict with torch and write our .npz. Requires torch;
    run in a torch-only process."""
    import torch

    sd = torch.load(pt_path, map_location="cpu", weights_only=True)
    flat, dims = convert_state_dict(sd, pad_features)
    write_npz(flat, dims, {"trainer_version": trainer_version}, out_path)
    return dims


def infer_version_from_filename(path) -> str | None:
    """The reference's filename-based preset inference ('v0' in name etc. —
    /root/reference/main.py:292-303)."""
    from pathlib import Path

    name = Path(path).name.lower()
    for v in ("v0", "v1", "v2", "v3"):
        if v in name:
            return v
    return None


def ensure_npz(model_path: str, trainer_version: str | None = None) -> str:
    """Accept either a framework ``.npz`` checkpoint or a reference torch
    ``.pt``/``.pth`` state_dict (the reference sampling mode loads those
    directly — /root/reference/main.py:285-319, extras.py:166-189).

    Torch files are converted to a cached ``<file>.pt.npz`` sibling in a
    SUBPROCESS — importing torch into a process where the registered TPU
    backend has run compute deadlocks on this image, so the conversion must
    not share the caller's process — and the npz path is returned. Re-runs
    reuse the cache unless the .pt is newer. Non-torch paths pass through.
    """
    import subprocess
    import sys
    from pathlib import Path

    p = Path(model_path)
    if p.suffix.lower() not in (".pt", ".pth"):
        return model_path
    out = p.with_name(p.name + ".npz")
    if out.exists() and out.stat().st_mtime >= p.stat().st_mtime:
        return str(out)
    version = trainer_version or infer_version_from_filename(p)
    if version is None:
        raise ValueError(
            f"Could not detect version (v0..v3) from filename: {p.name}; "
            "pass trainer_version explicitly or rename the checkpoint")
    repo_root = Path(__file__).resolve().parents[2]
    proc = subprocess.run(
        [sys.executable, "-m", "genome_minimizer_2_tpu.utils.torch_import",
         str(p), str(out), "--trainer-version", version],
        cwd=str(repo_root), capture_output=True, text=True, timeout=600)
    if proc.returncode != 0 or not out.exists():
        raise RuntimeError(
            f"torch checkpoint conversion failed (rc={proc.returncode}):\n"
            f"{proc.stderr.strip()}")
    return str(out)


def main():
    parser = argparse.ArgumentParser(
        description="Convert a reference saved_VAE_*.pt into a framework .npz")
    parser.add_argument("pt_path")
    parser.add_argument("out_path")
    parser.add_argument("--trainer-version", default="v0",
                        choices=["v0", "v1", "v2", "v3"])
    parser.add_argument("--no-pad-features", action="store_false",
                        dest="pad_features")
    args = parser.parse_args()
    dims = convert_file(args.pt_path, args.out_path, args.trainer_version,
                        args.pad_features)
    print(f"✓ Converted {args.pt_path} -> {args.out_path} ({dims})")


if __name__ == "__main__":
    main()
