#!/usr/bin/env python3
"""A/B: v0 bs=32 train throughput with the fused one-pass optimizer on vs off.

Run on the TPU host: python tools/opt_ab.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

INPUT_DIM, BATCH, N_TRAIN = 55039, 32, 3488


def make_trainer(use_fused: bool):
    from genome_minimizer_2_tpu.train import trainer as T
    from genome_minimizer_2_tpu.utils.config import get_v0_config

    config = get_v0_config()
    config.n_epochs = 1
    config.batch_size = BATCH
    config.compute_dtype = "bfloat16"
    config.print_every = 10 ** 9
    config.use_fused_optimizer = use_fused
    return T.create_trainer("v0", config, input_dim=INPUT_DIM)


def bench(trainer) -> float:
    data_key = jax.random.key(0)
    Dp = trainer.model_cfg.padded_dim

    @jax.jit
    def gen(key):
        x = jax.random.bernoulli(key, 0.5, (N_TRAIN, INPUT_DIM))
        return jnp.pad(x.astype(jnp.float32), ((0, 0), (0, Dp - INPUT_DIM)))

    data = gen(data_key)
    state = trainer.init_state()
    epoch_fn = trainer._get_epoch_fn(N_TRAIN, train=True)
    e = jnp.asarray(0, jnp.int32)
    lr = jnp.asarray(1e-3, jnp.float32)
    state, sums = epoch_fn(state, data, e, lr)
    float(sums["total"])  # host readback = the only real sync on this rig
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        state, sums = epoch_fn(state, data, e, lr)
        float(sums["total"])
        best = max(best, N_TRAIN / (time.perf_counter() - t0))
    return best


def main():
    assert jax.default_backend() == "tpu"
    for fused in (True, False):
        t0 = time.perf_counter()
        eps = bench(make_trainer(fused))
        print(f"fused={fused}: {eps:,.0f} examples/s "
              f"(phase {time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
