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

    # At-scale spot check WITHOUT materializing the 100k outputs (np.load
    # of either would hold ~22 GB of list-slot pointers — the very cost the
    # streaming writers avoid; a consumer at this scale feeds the minimizer
    # per-shard or uses pipeline mode): convert the head slice standalone
    # and byte-compare the row-data regions. Equal-vocab writers emit
    # byte-identical row bytes regardless of declared n_rows, and the head
    # rows themselves are verified against the STAGED converter.
    from genome_minimizer_2_tpu.data.dataset import load_gene_vocab
    from genome_minimizer_2_tpu.genome import converter as C
    from genome_minimizer_2_tpu.genome.object_npy import ObjectListNpyWriter
    from genome_minimizer_2_tpu.utils import directories

    k = 64
    n_total, _, chunks = C.iter_mask_chunks(masks, k)
    head = next(chunks)
    slice_path = os.path.join(root, ".convert_check_head.npy")
    np.save(slice_path, np.asarray(head, np.uint8))
    cols = load_gene_vocab()
    ess = C.load_essential_set(directories.paper_essential_genes())
    head_out = os.path.join(root, ".head_ids.npy")
    h_out, h_filled, _ = C.convert_samples_streaming(
        slice_path, cols, head_out, essential_set=ess, chunk_size=k)

    # head rows vs the STAGED (in-memory) converter
    ids_staged = C.masks_to_gene_lists(slice_path, cols, None)
    got_head = np.load(h_out, allow_pickle=True)
    got_filled_head = np.load(h_filled, allow_pickle=True)
    mismatch = 0
    for i in range(k):
        if list(got_head[i]) != ids_staged[i]:
            mismatch += 1
        if list(got_filled_head[i]) != sorted(set(ids_staged[i]) | ess):
            mismatch += 1

    def data_start(n_rows, names):
        probe = os.path.join(root, ".ds_probe.npy")
        w = ObjectListNpyWriter(probe, n_rows, names)
        ds = w.data_start
        w._f.close()
        os.remove(probe)
        return ds

    names = [str(c) for c in C.dedupe_columns(np.asarray(cols, object))[0]]
    domain = sorted(set(names) | set(ess))
    prefix_ok = True
    for big, small, vocab in ((out, h_out, names),
                              (filled, h_filled, domain)):
        small_bytes = open(small, "rb").read()
        region = small_bytes[data_start(k, vocab):-3]  # strip TUPLE BUILD STOP
        with open(big, "rb") as f:
            f.seek(data_start(n_total, vocab))
            if f.read(len(region)) != region:
                prefix_ok = False
    print(f"[scale] head equivalence: staged rows "
          f"{'OK' if mismatch == 0 else f'{mismatch} MISMATCHES'}; "
          f"at-scale data-region prefix {'OK' if prefix_ok else 'MISMATCH'}")
    for p in (slice_path, h_out, h_filled):
        os.remove(p)
    sys.exit(0 if ok and mismatch == 0 and prefix_ok else 1)


if __name__ == "__main__":
    main()
