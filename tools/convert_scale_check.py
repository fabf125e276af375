#!/usr/bin/env python3
"""Scale check: `--mode convert-samples` at the 100k north-star scale.

Round-4 VERDICT next #8's done-criterion: a recorded 100k convert-samples
run with RSS < 4 GB and no per-row Python list building held live (the
streaming pickle writers, genome/object_npy.py). Drives the REAL CLI on a
masks artifact produced by sample_scale_check.py (pass its GM2_ROOT tree),
or builds a fresh packed artifact from a checkpoint decode when pointed at
a tree without one.

Usage:
  GM2_ROOT=<tree from sample_scale_check> python tools/convert_scale_check.py
      [masks_path]

After the timed/RSS-recorded conversion, a small dense slice of the same
masks is converted through the in-memory staged path and compared row-wise
against the streamed outputs — the at-scale spot-check of the CI-pinned
equivalence (tests/test_converter_streaming.py).
"""

from __future__ import annotations

import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import numpy as np

    root = os.environ.get("GM2_ROOT")
    if not root:
        print("set GM2_ROOT to the dataset tree (sample_scale_check's tmp)")
        sys.exit(2)

    if len(sys.argv) > 1:
        masks = sys.argv[1]
    else:
        outdir = os.path.join(root, "models", "v0_model", "sampling_results")
        cands = [os.path.join(outdir, f) for f in sorted(os.listdir(outdir))
                 if "binary_samples" in f]
        if not cands:
            print(f"no binary_samples artifact under {outdir}")
            sys.exit(2)
        # prefer the packed artifact when present
        masks = next((c for c in cands if c.endswith(".npz")), cands[0])
    print(f"[scale] masks artifact: {masks} "
          f"({os.path.getsize(masks) / 1e9:.2f} GB)", flush=True)

    import main as cli

    out = os.path.join(root, "seq_out_scale.npy")
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    t0 = time.time()
    rc = cli.main(["--mode", "convert-samples", "--genes-path", masks,
                   "--output-file", out, "--chunk-size", "2048"])
    wall = time.time() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    filled = out.replace(".npy", "_with_essentials.npy")
    print(f"\n[scale] rc={rc} wall={wall:.0f}s "
          f"peak_rss={rss:.2f} GB (baseline {rss0:.2f} GB)")
    for f in (out, filled):
        print(f"[scale]   {f}: {os.path.getsize(f) / 1e9:.2f} GB")
    ok = rc == 0 and rss < 4.0
    print(f"[scale] RSS {'OK' if ok else 'EXCEEDED'} (< 4 GB required)")

    # at-scale spot check: staged in-memory conversion of the first rows
    # must match the streamed outputs row-for-row
    from genome_minimizer_2_tpu.data.dataset import load_gene_vocab
    from genome_minimizer_2_tpu.genome import converter as C
    from genome_minimizer_2_tpu.utils import directories

    k = 64
    n_total, _, chunks = C.iter_mask_chunks(masks, k)
    head = next(chunks)
    slice_path = os.path.join(root, ".convert_check_head.npy")
    np.save(slice_path, np.asarray(head, np.uint8))
    cols = load_gene_vocab()
    ids_head = C.masks_to_gene_lists(slice_path, cols, None)
    ess = C.load_essential_set(directories.paper_essential_genes())
    got = np.load(out, allow_pickle=True)
    got_filled = np.load(filled, allow_pickle=True)
    assert len(got) == len(got_filled) == n_total, (len(got), n_total)
    mismatch = 0
    for i in range(len(ids_head)):
        if list(got[i]) != ids_head[i]:
            mismatch += 1
        if list(got_filled[i]) != sorted(set(ids_head[i]) | ess):
            mismatch += 1
    print(f"[scale] head slice equivalence ({len(ids_head)} rows): "
          f"{'OK' if mismatch == 0 else f'{mismatch} MISMATCHES'}")
    os.remove(slice_path)
    sys.exit(0 if ok and mismatch == 0 else 1)


if __name__ == "__main__":
    main()
