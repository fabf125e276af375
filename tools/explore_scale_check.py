#!/usr/bin/env python3
"""Explore mode at REAL dataset scale (10k genomes x 55k genes) under a
measured RSS cap — round-1 VERDICT missing #4 / next-step #7.

Streams a synthetic presence/absence CSV at full scale (the bundled
generator materializes the whole matrix, which is exactly the failure mode
being tested), points GM2_ROOT at it, runs the explore mode end-to-end
(figures 1a-1d + randomized-PCA figure 2a + summary report), and prints
peak RSS.

Usage: python tools/explore_scale_check.py [n_samples] [n_genes] [workdir]
"""

from __future__ import annotations

import os
import resource
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

N_SAMPLES = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
N_GENES = int(sys.argv[2]) if len(sys.argv) > 2 else 55_000
WORK = sys.argv[3] if len(sys.argv) > 3 else "/tmp/gm2_scale_root"


def rss_mib() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def stream_presence_csv(path: str, chunk_rows: int = 2000) -> list[str]:
    """genes x samples CSV at scale, written in row chunks (bounded memory)."""
    from genome_minimizer_2_tpu.data.synthetic import make_gene_names

    rng = np.random.RandomState(0)
    genes = make_gene_names(N_GENES, rng)
    samples = [f"sample_{i:04d}" for i in range(N_SAMPLES)]
    lineage = pd.DataFrame([rng.randint(1, 20, size=N_SAMPLES)],
                           index=["Lineage"], columns=samples)
    lineage.to_csv(path)
    for lo in range(0, N_GENES, chunk_rows):
        hi = min(lo + chunk_rows, N_GENES)
        core = rng.rand(hi - lo) < 0.3
        p = np.where(core, 0.97, rng.uniform(0.05, 0.9, size=hi - lo))
        mat = (rng.rand(hi - lo, N_SAMPLES) < p[:, None]).astype(np.uint8)
        pd.DataFrame(mat, index=genes[lo:hi], columns=samples).to_csv(
            path, mode="a", header=False)
        if lo % 10000 == 0:
            print(f"  csv rows {lo}/{N_GENES} (rss {rss_mib():.0f} MiB)",
                  flush=True)
    return genes, samples


def main():
    from genome_minimizer_2_tpu.data.synthetic import (
        write_essential_genes_csv, write_phylogroups_csv)

    root = os.path.join(WORK)
    data = os.path.join(root, "data")
    os.makedirs(data, exist_ok=True)
    pa = os.path.join(data, "F4_complete_presence_absence.csv")

    t0 = time.perf_counter()
    if not os.path.exists(pa):
        print(f"generating {N_GENES}x{N_SAMPLES} CSV...", flush=True)
        genes, samples = stream_presence_csv(pa)
        write_phylogroups_csv(os.path.join(data, "accessionID_phylogroup_BD.csv"),
                              samples, seed=0)
        write_essential_genes_csv(os.path.join(data, "essential_genes.csv"),
                                  genes, 200, seed=0)
    print(f"fixture ready in {time.perf_counter()-t0:.0f}s "
          f"({os.path.getsize(pa)/2**20:.0f} MiB CSV); rss {rss_mib():.0f} MiB",
          flush=True)

    os.environ["GM2_ROOT"] = root
    rss_before = rss_mib()
    t0 = time.perf_counter()
    from genome_minimizer_2_tpu.explore import exploration

    rc = exploration.main()
    dt = time.perf_counter() - t0
    print(f"explore mode rc={rc} in {dt:.0f}s | peak RSS {rss_mib():.0f} MiB "
          f"(before explore: {rss_before:.0f} MiB)", flush=True)
    out = os.path.join(root, "data_exploration_outputs")
    if os.path.isdir(out):
        print("artifacts:", sorted(os.listdir(out)), flush=True)


if __name__ == "__main__":
    main()
