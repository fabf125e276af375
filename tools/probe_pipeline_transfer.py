"""A/B probe: pipeline throughput with packed vs feature-bits transfer.

Run on the real TPU (no env overrides). Each mode pays its own remote
compiles in the warmup call inside bench_pipeline; the reported rate is the
steady-state second run. Usage: python tools/probe_pipeline_transfer.py
[modes...] (default: feature-bits packed).
"""
import sys
import time

sys.path.insert(0, ".")
import bench

modes = sys.argv[1:] or ["feature-bits", "packed"]
trainer = bench._make_trainer(32)
for mode in modes:
    t0 = time.perf_counter()
    rate = bench.bench_pipeline(trainer, transfer=mode)
    print(f"{mode}: {rate:.1f} genomes/s (wall {time.perf_counter()-t0:.0f}s)",
          flush=True)
