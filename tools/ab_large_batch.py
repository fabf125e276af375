#!/usr/bin/env python3
"""A/B: does bs=4096/8192 amortize the optimizer's fixed ~2.8 ms/step?

Round-3 VERDICT next #4: the optimizer pass is batch-size-independent
(moments traffic only), so BASELINE.md's phase table predicts ~118-121 TF
at bs=4096 vs the recorded ~112.7 TF at bs=2048. This measures it with the
bench's own machinery (same epoch program, on-device data, host-readback
sync) at bs 2048/4096/8192 and prints TF per batch size.

Usage: python tools/ab_large_batch.py [bs ...]   (default 2048 4096 8192)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import _make_trainer, bench_training  # noqa: E402


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [2048, 4096, 8192]
    results = {}
    for bs in sizes:
        n_train = max(4 * bs, 8192)
        t0 = time.perf_counter()
        trainer = _make_trainer(bs)
        eps = bench_training(trainer, n_train)
        tf = eps * 0.7e9 / 1e12  # ~0.7 GFLOP/example (3x-forward convention)
        results[bs] = (eps, tf)
        print(f"[ab] bs={bs}: {eps:,.0f} ex/s = {tf:.1f} TF "
              f"(n_train={n_train}, wall {time.perf_counter() - t0:.0f}s "
              f"incl. compile)", flush=True)
    print({bs: round(tf, 1) for bs, (eps, tf) in results.items()})


if __name__ == "__main__":
    main()
