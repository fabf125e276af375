#!/usr/bin/env python3
"""Scale check: `--mode sample --num-samples 100000` under 4 GiB RSS.

Round-2 VERDICT weak #3's done-criterion for the bounded-memory sample mode.
Builds a synthetic dataset tree at the REAL gene width (55,039 columns, few
samples) plus a v0-dim checkpoint, then drives the actual CLI entry
(main.main) through sampling at the north-star sample count, and reports
peak RSS + output sizes. The decode runs on whatever backend is default
(TPU here — CPU would take hours at 23 TFLOP of decode).

Usage: python tools/sample_scale_check.py [num_samples]  (default 100000)
"""

from __future__ import annotations

import os
import resource
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
D, H, L = 55039, 1024, 64


def main():
    import jax
    import numpy as np

    from genome_minimizer_2_tpu.data.synthetic import make_dataset_root
    from genome_minimizer_2_tpu.models import vae
    from genome_minimizer_2_tpu.utils import checkpoint as ckpt
    from genome_minimizer_2_tpu.utils.config import get_v0_config

    tmp = tempfile.mkdtemp(prefix="gm2scale_")
    print(f"[scale] building synthetic tree at {tmp} (D={D})", flush=True)
    make_dataset_root(tmp, n_samples=48, n_genes=D, genome_length=20000,
                      seed=0)
    os.environ["GM2_ROOT"] = tmp

    cfg = vae.VAEConfig(input_dim=D, hidden_dim=H, latent_dim=L)
    params, stats = vae.init(cfg, jax.random.key(0))
    config = get_v0_config()
    ck = os.path.join(tmp, "saved_VAE_v0.npz")
    ckpt.save_checkpoint(ck, params, stats, config, extra={"input_dim": D})
    del params, stats

    # preprocess (essential positions pickle) once
    import main as cli

    assert cli.main(["--mode", "preprocess"]) == 0

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    t0 = time.time()
    save_dtype = os.environ.get("GM2_SAVE_DTYPE", "float32")
    argv = ["--mode", "sample", "--model-path", ck,
            "--num-samples", str(N), "--save-dtype", save_dtype]
    if os.environ.get("GM2_NO_CSV"):  # the lean north-star artifact path
        argv.append("--no-csv")
    rc = cli.main(argv)
    wall = time.time() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    outdir = os.path.join(tmp, "models", "v0_model", "sampling_results")
    sizes = {f: os.path.getsize(os.path.join(outdir, f)) / 1e9
             for f in sorted(os.listdir(outdir))}
    print(f"\n[scale] rc={rc} n={N} wall={wall:.0f}s "
          f"peak_rss={rss:.2f} GB (pre-sample baseline {rss0:.2f} GB)")
    for f, gb in sizes.items():
        print(f"[scale]   {f}: {gb:.2f} GB")
    limit = 4.0  # GiB criterion (ru_maxrss is KB on Linux -> /1e6 ~ GB)
    print(f"[scale] RSS {'OK' if rss < limit else 'EXCEEDED'} "
          f"(< {limit} GB required)")
    sys.exit(0 if rc == 0 and rss < limit else 1)


if __name__ == "__main__":
    main()
