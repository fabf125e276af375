#!/usr/bin/env python3
"""Probe: variance of the pipeline/sampling bench phases on the real chip.

Round-2 VERDICT weak #1: the driver-recorded pipeline median collapsed to
102.76/s with a 17x min-max spread (BENCH_r02) vs BASELINE.md's 271/s.
This probe isolates the contributors on this 2-core + tunneled-TPU rig:

- run length (384 vs 1024+ genomes): short runs amortize dispatch/transfer
  hiccups poorly;
- native minimize thread count inside the pipeline (0 = all cores vs 1):
  the TPU client's service threads contend for the same 2 cores;
- per-trial phase breakdown (sample_s = time blocked on device+transfer,
  minimize_s = native worker time) to attribute the swings.

Configs run round-robin-interleaved so slow host-load drift hits all
configs equally. Usage: python tools/probe_pipeline_stability.py [trials]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    import jax

    from genome_minimizer_2_tpu.genome.genbank import GenBankRecord
    from genome_minimizer_2_tpu.genome.minimizer import MinimizerEngine
    from genome_minimizer_2_tpu.pipeline import sample_and_minimize
    from genome_minimizer_2_tpu.sample.sampler import Sampler

    INPUT_DIM = bench.INPUT_DIM
    rng = np.random.RandomState(0)
    L, n_genes = 4_600_000, 4000
    seq_bytes = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=L)
    starts = np.sort(rng.choice(L - 2000, size=n_genes,
                                replace=False)).astype(np.int64)
    ends = np.minimum(starts + rng.randint(300, 1500, size=n_genes), L)
    cols = np.array([f"gene{i:05d}" for i in range(INPUT_DIM)], dtype=object)
    names = cols[rng.choice(INPUT_DIM, size=n_genes, replace=False)]
    engine = MinimizerEngine(record=GenBankRecord("bench", "", []),
                             gene_names=names, starts=starts, ends=ends,
                             seq_bytes=seq_bytes)
    trainer = bench._make_trainer(32)
    state = trainer.init_state()
    s = Sampler(cfg=trainer.model_cfg, params=state.params,
                batch_stats=state.batch_stats, chunk_size=128)
    essential_set = {f"gene{i:05d}" for i in range(40)}
    outdir = "/dev/shm" if os.path.isdir("/dev/shm") else "."
    out = os.path.join(outdir, ".probe_pipeline.fasta")

    def run(n_genomes, chunk, nt, ov):
        t0 = time.perf_counter()
        st = sample_and_minimize(s, engine, cols, essential_set, n_genomes,
                                 out, key=jax.random.key(0), chunk_size=chunk,
                                 process_index=0, process_count=1,
                                 native_threads=nt, overlap=ov)
        wall = time.perf_counter() - t0
        return st.rate(), st.sample_s, st.minimize_s, wall

    # (n_genomes, chunk_size, native_threads, overlap). Round-3 final A/B:
    # with the writer's mmap path actually engaged (the O_WRONLY bug made
    # every pre-fix nt comparison measure the pwrite kernel path), does a
    # second native worker pay off under overlap? The drain thread is now
    # ~idle (async copies), so the old "cede a core to the client" rule may
    # be stale.
    configs = [(2048, 128, 1, True), (2048, 128, 2, True),
               (2048, 128, 0, True), (2048, 512, 2, True)]

    # warmup: compile decode at every chunk shape + touch every path
    for chunk in sorted({c[1] for c in configs}):
        t0 = time.perf_counter()
        run(chunk, chunk, 0, True)
        print(f"[warmup chunk={chunk}] {time.perf_counter() - t0:.1f}s",
              flush=True)

    results = {c: [] for c in configs}
    for t in range(trials):
        for c in configs:
            rate, ss, ms, wall = run(*c)
            results[c].append(rate)
            print(f"trial {t} n={c[0]:5d} ch={c[1]:4d} nt={c[2]} ov={int(c[3])} "
                  f"rate={rate:7.1f}/s sample_s={ss:5.2f} "
                  f"minimize_s={ms:5.2f} wall={wall:5.2f}", flush=True)

    # sampling-phase stability (packed production path)
    samp = []
    for t in range(trials):
        t0 = time.perf_counter()
        packed, _ = s.sample_packed(jax.random.key(1), 2048)
        dt = time.perf_counter() - t0
        samp.append(2048 / dt)
        print(f"trial {t} sample_packed 2048: {2048 / dt:7.1f}/s", flush=True)

    print("\n== summary ==")
    for c, vals in results.items():
        v = sorted(vals)
        print(f"n={c[0]:5d} ch={c[1]:4d} nt={c[2]} ov={int(c[3])}: "
              f"median={v[len(v) // 2]:7.1f} "
              f"min={v[0]:7.1f} max={v[-1]:7.1f} ratio={v[-1] / v[0]:.2f}")
    v = sorted(samp)
    print(f"sample_packed:  median={v[len(v) // 2]:7.1f} min={v[0]:7.1f} "
          f"max={v[-1]:7.1f} ratio={v[-1] / v[0]:.2f}")
    if os.path.exists(out):
        os.remove(out)


if __name__ == "__main__":
    main()
