#!/usr/bin/env python3
"""Optimizer-variant decomposition inside the real train step (bs=2048).

profile_step.py attribution: fwd+bwd 8.25 ms, fused-pallas optimizer +15.5 ms,
optax +10.4 ms, while the micro-bench says the same update runs at 2.97 ms per
56M leaf (~6.2 ms for all params). This script times the step with each
optimizer formulation to find what the step context costs.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
N_TRAIN = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
STEPS = N_TRAIN // BATCH
INPUT_DIM = 55039
PEAK_TFLOPS = 197.0
FLOP_PER_EXAMPLE = 0.7e9


def report(name, dt, compile_s):
    per_step = dt / STEPS * 1e3
    eps = BATCH * STEPS / dt
    tflops = eps * FLOP_PER_EXAMPLE / 1e12
    print(f"{name:<44s} {per_step:8.2f} ms/step  {eps:10,.0f} ex/s "
          f"{tflops:6.1f} TF ({100*tflops/PEAK_TFLOPS:4.1f}%) "
          f"[compile {compile_s:.0f}s]", flush=True)


def timeit(name, fn, state, *args, iters=6):
    t0 = time.perf_counter()
    out = fn(state, *args)
    state = out[0]
    float(jnp.asarray(out[1]).ravel()[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(state, *args)
        state = out[0]
    float(jnp.asarray(out[1]).ravel()[0])
    report(name, (time.perf_counter() - t0) / iters, compile_s)


def main():
    import optax

    from bench import _make_trainer
    from genome_minimizer_2_tpu.ops.optimizer import fused_clip_adam_apply
    from genome_minimizer_2_tpu.train.trainer import TrainState

    trainer = _make_trainer(BATCH)
    Dp = trainer.model_cfg.padded_dim
    cdtype = trainer.model_cfg.policy.compute_dtype

    @jax.jit
    def gen(key):
        x = jax.random.bernoulli(key, 0.5, (N_TRAIN, INPUT_DIM)).astype(cdtype)
        return jnp.pad(x, ((0, 0), (0, Dp - INPUT_DIM)))

    data = gen(jax.random.key(0))
    lr = jnp.asarray(1e-3, jnp.float32)
    e = jnp.asarray(0, jnp.int32)
    print(f"batch={BATCH} n={N_TRAIN} steps={STEPS} data dtype={data.dtype}",
          flush=True)

    def batches(d):
        return d[: STEPS * BATCH].reshape(STEPS, BATCH, d.shape[1])

    def make_steps(update):
        """Scan of train steps with a custom optimizer-update fn."""

        @jax.jit
        def steps(st, d):
            def body(carry, batch):
                st = carry
                rng, key = jax.random.split(st.rng)
                grad_fn = jax.value_and_grad(
                    lambda p: trainer._loss_fn(p, st.batch_stats, batch, key,
                                               e, st.counter, True),
                    has_aux=True)
                (_, (comps, new_stats)), grads = grad_fn(st.params)
                params, new_opt = update(grads, st.opt_state, st.params)
                st = TrainState(params, new_stats, new_opt, st.counter + 1, rng)
                return st, comps["total"]

            st, tots = jax.lax.scan(body, st, batches(d))
            return st, jnp.sum(tots)

        return steps

    mx = trainer.config.max_norm

    def upd_fused(g, o, p):
        return fused_clip_adam_apply(g, o, p, lr, max_norm=mx)

    def upd_optax(g, o, p):
        updates, new_opt = trainer.tx.update(g, o, p)
        updates = jax.tree.map(lambda u: (-lr) * u, updates)
        return optax.apply_updates(p, updates), new_opt

    def upd_none(g, o, p):
        # no update at all: the step floor (fwd+bwd+stats carry)
        gs = sum(jnp.vdot(x, x) for x in jax.tree.leaves(g))
        return jax.tree.map(lambda x: x + 0.0 * gs.astype(x.dtype), p), o

    def init_state(moment_dtype=None):
        # the hand-rolled probe bodies rebuild TrainState without wcast;
        # drop it from the carry (the production E variant keeps it)
        st = trainer.init_state()._replace(wcast=None)
        if moment_dtype is None:
            return st
        clip, adam = st.opt_state
        cast = lambda t: jax.tree.map(lambda x: x.astype(moment_dtype), t)
        adam = adam._replace(mu=cast(adam.mu), nu=cast(adam.nu))
        return st._replace(opt_state=(clip, adam))

    for name, upd, mdt in (
            ("B fused one-pass, f32 moments", upd_fused, jnp.float32),
            ("C fused one-pass, bf16 moments", upd_fused, jnp.bfloat16),
            ("D optax chain", upd_optax, jnp.float32)):
        timeit(name, make_steps(upd), init_state(mdt), data)

    # the PRODUCTION epoch program end-to-end (shuffle + fused loss + fused
    # optimizer with config-resolved moment dtype)
    epoch_fn = trainer._get_epoch_fn(N_TRAIN, train=True)

    def run_epoch(st, d):
        st, sums = epoch_fn(st, d, e, lr)
        return st, sums["total"]

    timeit("E production epoch (shuffle incl.)", run_epoch,
           trainer.init_state(), data)


if __name__ == "__main__":
    main()
