#!/usr/bin/env python3
"""On-chip A/B decomposition of the bs=2048 train step (VERDICT round-1 #1).

Times jitted variants of the v0 train step on the real TPU to attribute the
per-step wall time: shuffle, forward, backward, optimizer, loss kernel. Each
variant scans STEPS steps inside ONE jit program so tunnel dispatch overhead
is excluded from per-step numbers. State is re-bound through every call
(epoch programs donate their input state).

Usage: python tools/profile_step.py [batch_size] [n_train]
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

PEAK_TFLOPS = 197.0  # v5e bf16
FLOP_PER_EXAMPLE = 0.7e9  # 3x fwd matmul cost (bench.py convention)


def report(name, dt_per_call, compile_s):
    per_step = dt_per_call / STEPS * 1e3
    eps = BATCH * STEPS / dt_per_call
    tflops = eps * FLOP_PER_EXAMPLE / 1e12
    print(f"{name:<36s} {per_step:8.2f} ms/step  {eps:10,.0f} ex/s "
          f"{tflops:6.1f} TF ({100*tflops/PEAK_TFLOPS:4.1f}% peak) "
          f"[compile {compile_s:.0f}s]", flush=True)


def timeit(name, fn, state, *args, iters=6, stateful=True, readback=None):
    """fn(state, *args) -> (new_state, metric) if stateful else metric."""

    def sync(out):
        if readback is not None:
            return readback(out)
        leaf = jax.tree.leaves(out[1] if stateful else out)[0]
        return float(jnp.asarray(leaf).ravel()[0])

    t0 = time.perf_counter()
    out = fn(state, *args)
    if stateful:
        state = out[0]
    sync(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(state, *args)
        if stateful:
            state = out[0]
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    report(name, dt, compile_s)
    return dt


def main():
    from bench import _make_trainer

    trainer = _make_trainer(BATCH)
    cfg = trainer.model_cfg
    Dp = cfg.padded_dim

    @jax.jit
    def gen(key):
        x = jax.random.bernoulli(key, 0.5, (N_TRAIN, INPUT_DIM)).astype(jnp.float32)
        return jnp.pad(x, ((0, 0), (0, Dp - INPUT_DIM)))

    data = gen(jax.random.key(0))
    lr = jnp.asarray(1e-3, jnp.float32)
    e = jnp.asarray(0, jnp.int32)
    print(f"batch={BATCH} n={N_TRAIN} steps/epoch={STEPS} padded_dim={Dp}",
          flush=True)

    # --- the production epoch program, as bench times it -------------------
    epoch_fn = trainer._get_epoch_fn(N_TRAIN, train=True)
    timeit("T0 epoch (prod: shuffle+loss+opt)", lambda st, d: epoch_fn(st, d, e, lr),
           trainer.init_state(), data,
           readback=lambda o: float(o[1]["total"]))

    try:
        st_tmp = trainer.init_state()
        comp = epoch_fn.lower(st_tmp, data, e, lr).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        fl = ca.get("flops", 0.0)
        ba = ca.get("bytes accessed", 0.0)
        print(f"   cost_analysis: flops={fl/1e12:.2f}T bytes={ba/1e9:.2f}GB "
              f"(per step: {fl/STEPS/1e12:.3f}T, {ba/STEPS/1e9:.2f}GB)", flush=True)
    except Exception as ex:
        print(f"   cost_analysis unavailable: {ex}", flush=True)

    names = trainer.spec.component_names()

    def batches(d):
        return d[: STEPS * BATCH].reshape(STEPS, BATCH, d.shape[1])

    # T1: steps only — no shuffle
    @jax.jit
    def no_shuffle(st, d):
        def body(carry, batch):
            st2, comps = trainer._train_step(carry, batch, e, lr)
            return st2, comps["total"]

        st, tots = jax.lax.scan(body, st, batches(d))
        return st, jnp.sum(tots)

    timeit("T1 steps only (no shuffle)", no_shuffle, trainer.init_state(), data)

    # T2: shuffle only
    @jax.jit
    def shuffle_only(st, d):
        perm = jax.random.permutation(jax.random.key(7), N_TRAIN)
        d = jnp.take(d, perm, axis=0)
        return jnp.sum(d[:, :1])

    timeit("T2 shuffle only (perm+take)", shuffle_only, trainer.init_state(),
           data, stateful=False, readback=float)

    # T3: forward + loss only
    @jax.jit
    def fwd_only(st, d):
        def body(tot, batch):
            total, _ = trainer._loss_fn(st.params, st.batch_stats, batch,
                                        jax.random.key(0), e, st.counter, True)
            return tot + total, None

        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), batches(d))
        return tot

    state = trainer.init_state()
    timeit("T3 fwd+loss only", fwd_only, state, data, stateful=False,
           readback=float)

    # T4: fwd+bwd (grads -> scalar; no optimizer)
    @jax.jit
    def fwd_bwd(st, d):
        def body(tot, batch):
            g = jax.grad(
                lambda p: trainer._loss_fn(p, st.batch_stats, batch,
                                           jax.random.key(0), e, st.counter,
                                           True)[0])(st.params)
            gs = sum(jnp.vdot(x, x) for x in jax.tree.leaves(g))
            return tot + gs, None

        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), batches(d))
        return tot

    timeit("T4 fwd+bwd (no optimizer)", fwd_bwd, state, data, stateful=False,
           readback=float)

    # T5: full step with the optax (unfused) optimizer
    import optax
    from genome_minimizer_2_tpu.train.trainer import TrainState

    @jax.jit
    def optax_step(st, d):
        def body(carry, batch):
            st = carry
            rng, key = jax.random.split(st.rng)
            grad_fn = jax.value_and_grad(
                lambda p: trainer._loss_fn(p, st.batch_stats, batch, key, e,
                                           st.counter, True), has_aux=True)
            (_, (comps, new_stats)), grads = grad_fn(st.params)
            updates, new_opt = trainer.tx.update(grads, st.opt_state, st.params)
            updates = jax.tree.map(lambda u: (-lr) * u, updates)
            params = optax.apply_updates(st.params, updates)
            st = TrainState(params, new_stats, new_opt, st.counter + 1, rng)
            return st, comps["total"]

        st, tots = jax.lax.scan(body, st, batches(d))
        return st, jnp.sum(tots)

    timeit("T5 steps w/ optax optimizer", optax_step, trainer.init_state(), data)

    # T6: full step, jnp loss (now the only loss path)

    @jax.jit
    def jnp_loss_steps(st, d):
        def body(carry, batch):
            st2, comps = trainer._train_step(carry, batch, e, lr)
            return st2, comps["total"]

        st, tots = jax.lax.scan(body, st, batches(d))
        return st, jnp.sum(tots)

    timeit("T6 steps w/ jnp loss", jnp_loss_steps, trainer.init_state(), data)


if __name__ == "__main__":
    main()
