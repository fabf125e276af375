#!/usr/bin/env python3
"""Production-epoch throughput probe (bs=2048, shuffle included)."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

BATCH, N_TRAIN = 2048, 8192
STEPS = N_TRAIN // BATCH


def run(tag, trainer, data):
    epoch_fn = trainer._get_epoch_fn(N_TRAIN, train=True)
    e = jnp.asarray(0, jnp.int32)
    lr = jnp.asarray(1e-3, jnp.float32)
    st = trainer.init_state()
    t0 = time.perf_counter()
    st, sums = epoch_fn(st, data, e, lr)
    float(sums["total"])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(6):
        st, sums = epoch_fn(st, data, e, lr)
    float(sums["total"])
    dt = (time.perf_counter() - t0) / 6 / STEPS
    eps = BATCH / dt
    print(f"{tag:<40s} {dt*1e3:8.2f} ms/step  {eps:10,.0f} ex/s "
          f"{eps*0.7e9/1e12:6.1f} TF [compile {compile_s:.0f}s]", flush=True)


def main():
    from bench import _make_trainer

    def data_for(trainer):
        Dp = trainer.model_cfg.padded_dim
        dt = trainer.model_cfg.policy.compute_dtype

        @jax.jit
        def gen(key):
            x = jax.random.bernoulli(key, 0.5, (N_TRAIN, 55039)).astype(dt)
            return jnp.pad(x, ((0, 0), (0, Dp - 55039)))

        return gen(jax.random.key(0))

    t = _make_trainer(BATCH)
    data = data_for(t)

    # production epoch (jnp loss — XLA fuses the BCE into the dot epilogue;
    # the Pallas BCE (100.8 TF) and fused-bwd (74.8 TF) kernels this replaced
    # are recorded in BASELINE.md)
    run("production epoch (jnp loss)", t, data)


if __name__ == "__main__":
    main()
