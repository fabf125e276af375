#!/usr/bin/env python3
"""Decompose the production-epoch regression: wcast carry vs shuffle gather.

profile_step2 round: C (no wcast, no shuffle) = 14.20 ms/step;
E (production: wcast + per-batch row gather) = 17.41 ms/step.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

BATCH, N_TRAIN = 2048, 8192
STEPS = N_TRAIN // BATCH
INPUT_DIM = 55039


def timeit(name, fn, *args, iters=6, readback=None):
    t0 = time.perf_counter()
    out = fn(*args)
    state = out[0] if isinstance(out, tuple) else None
    rb = readback or (lambda o: float(jnp.asarray(
        jax.tree.leaves(o)[-1]).ravel()[0]))
    rb(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(state, *args[1:]) if state is not None else fn(*args)
        if isinstance(out, tuple):
            state = out[0]
    rb(out)
    dt = (time.perf_counter() - t0) / iters / STEPS * 1e3
    eps = BATCH / dt * 1e3
    tf = eps * 0.7e9 / 1e12
    print(f"{name:<44s} {dt:8.2f} ms/step  {tf:6.1f} TF [compile {compile_s:.0f}s]",
          flush=True)


def main():
    from bench import _make_trainer

    trainer = _make_trainer(BATCH)
    Dp = trainer.model_cfg.padded_dim
    cdtype = trainer.model_cfg.policy.compute_dtype
    lr = jnp.asarray(1e-3, jnp.float32)
    e = jnp.asarray(0, jnp.int32)

    @jax.jit
    def gen(key):
        x = jax.random.bernoulli(key, 0.5, (N_TRAIN, INPUT_DIM)).astype(cdtype)
        return jnp.pad(x, ((0, 0), (0, Dp - INPUT_DIM)))

    data = gen(jax.random.key(0))
    print(f"dtype={data.dtype}", flush=True)

    # F: real _train_step (wcast active), contiguous batches, no shuffle
    @jax.jit
    def steps_wcast(st, d):
        def body(carry, batch):
            st2, comps = trainer._train_step(carry, batch, e, lr)
            return st2, comps["total"]

        st, tots = jax.lax.scan(
            body, st, d[: STEPS * BATCH].reshape(STEPS, BATCH, d.shape[1]))
        return st, jnp.sum(tots)

    timeit("F wcast steps, contiguous", steps_wcast, trainer.init_state(),
           data, readback=lambda o: float(o[1]))

    # G: epoch-level materialized permutation (bf16)
    @jax.jit
    def take_all(d):
        perm = jax.random.permutation(jax.random.key(3), N_TRAIN)
        return jnp.sum(jnp.take(d, perm, axis=0)[:, :1].astype(jnp.float32))

    timeit("G materialized take (whole epoch)", take_all, data,
           readback=float)

    # H: per-batch row gather only (the production shuffle's access pattern)
    @jax.jit
    def gather_only(d):
        perm = jax.random.permutation(jax.random.key(3), N_TRAIN)

        def body(tot, idx):
            b = jnp.take(d, idx, axis=0)
            return tot + jnp.sum(b[:, :1].astype(jnp.float32)), None

        tot, _ = jax.lax.scan(body, jnp.float32(0),
                              perm[: STEPS * BATCH].reshape(STEPS, BATCH))
        return tot

    timeit("H per-batch row gather only", gather_only, data, readback=float)

    # I: per-batch BLOCK gather (8-row blocks)
    BLK = 8

    @jax.jit
    def block_gather_only(d):
        nb = N_TRAIN // BLK
        db = d.reshape(nb, BLK * d.shape[1])
        perm = jax.random.permutation(jax.random.key(3), nb)

        def body(tot, idx):
            b = jnp.take(db, idx, axis=0)
            return tot + jnp.sum(b[:, :1].astype(jnp.float32)), None

        tot, _ = jax.lax.scan(body, jnp.float32(0),
                              perm.reshape(STEPS, BATCH // BLK))
        return tot

    timeit("I per-batch 8-row-block gather", block_gather_only, data,
           readback=float)


if __name__ == "__main__":
    main()
