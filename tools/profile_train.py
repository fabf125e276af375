#!/usr/bin/env python3
"""On-chip training-step profiler — ALL the bs=2048 A/B experiments in one
documented probe (consolidates the round-2 profile_step{,2,3,4,5}.py
scripts; their recorded conclusions live in BASELINE.md's roofline table).

Every experiment scans STEPS steps inside ONE jit program so tunnel
dispatch overhead is excluded, and synchronizes by host readback
(block_until_ready does not synchronize on this relay backend).

Usage: python tools/profile_train.py EXP [batch] [n_train]

  production    the epoch program exactly as bench.py times it (shuffle +
                fused loss + fused optimizer) — the headline number
  attribution   T0-T6 decomposition: epoch, steps-only, shuffle-only,
                fwd+loss, fwd+bwd, optax vs fused optimizer   [was profile_step.py]
  optimizer     optimizer formulations inside the real step: fused one-pass
                f32/bf16 moments vs optax chain vs production [was profile_step2.py]
  shuffle       epoch-shuffle strategies: contiguous, materialized take,
                per-batch row gather, 8-row block gather      [was profile_step3.py]
  dtype         bf16-grads + precast-weights + MXU-dot norm vs production
                (measured LOSS in round 2: the master->bf16 recast does not
                fuse into the optimizer pass)                 [was profile_step4.py]
  all           production + attribution

Recorded history (BASELINE.md): round 2 landed fused one-pass clip+Adam with
bf16 moments (+optimizer roofline), the 8-row Pallas block-DMA shuffle
(~530 GB/s vs XLA's 45-80 GB/s row gather), and rejected the Pallas BCE
kernel, fused output-layer backward, Pallas Adam, and the dtype experiment.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

EXP = sys.argv[1] if len(sys.argv) > 1 else "production"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
N_TRAIN = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
STEPS = N_TRAIN // BATCH
INPUT_DIM = 55039
PEAK_TFLOPS = 197.0  # v5e bf16
FLOP_PER_EXAMPLE = 0.7e9  # 3x fwd matmul cost (bench.py convention)
B1, B2, ADAM_EPS = 0.9, 0.999, 1e-8


def report(name, dt_per_call, compile_s):
    per_step = dt_per_call / STEPS * 1e3
    eps = BATCH * STEPS / dt_per_call
    tflops = eps * FLOP_PER_EXAMPLE / 1e12
    print(f"{name:<44s} {per_step:8.2f} ms/step  {eps:10,.0f} ex/s "
          f"{tflops:6.1f} TF ({100 * tflops / PEAK_TFLOPS:4.1f}% peak) "
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


def setup():
    from bench import _make_trainer

    trainer = _make_trainer(BATCH)
    Dp = trainer.model_cfg.padded_dim
    cdtype = trainer.model_cfg.policy.compute_dtype

    @jax.jit
    def gen(key):
        x = jax.random.bernoulli(key, 0.5,
                                 (N_TRAIN, INPUT_DIM)).astype(cdtype)
        return jnp.pad(x, ((0, 0), (0, Dp - INPUT_DIM)))

    data = gen(jax.random.key(0))
    print(f"exp={EXP} batch={BATCH} n={N_TRAIN} steps/epoch={STEPS} "
          f"padded_dim={Dp} dtype={data.dtype}", flush=True)
    return trainer, data


E0 = None  # set in main: traced epoch/lr scalars
LR = None


def batches(d):
    return d[: STEPS * BATCH].reshape(STEPS, BATCH, d.shape[1])


def exp_production(trainer, data):
    epoch_fn = trainer._get_epoch_fn(N_TRAIN, train=True)
    timeit("production epoch (shuffle+loss+opt)",
           lambda st, d: epoch_fn(st, d, E0, LR), trainer.init_state(), data,
           readback=lambda o: float(o[1]["total"]))


def exp_attribution(trainer, data):
    exp_production(trainer, data)

    epoch_fn = trainer._get_epoch_fn(N_TRAIN, train=True)
    try:
        comp = epoch_fn.lower(trainer.init_state(), data, E0, LR).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        fl, ba = ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)
        print(f"   cost_analysis: flops={fl / 1e12:.2f}T bytes={ba / 1e9:.2f}GB "
              f"(per step: {fl / STEPS / 1e12:.3f}T, {ba / STEPS / 1e9:.2f}GB)",
              flush=True)
    except Exception as ex:
        print(f"   cost_analysis unavailable: {ex}", flush=True)

    @jax.jit
    def no_shuffle(st, d):
        def body(carry, batch):
            st2, comps = trainer._train_step(carry, batch, E0, LR)
            return st2, comps["total"]

        st, tots = jax.lax.scan(body, st, batches(d))
        return st, jnp.sum(tots)

    timeit("T1 steps only (no shuffle)", no_shuffle, trainer.init_state(),
           data)

    @jax.jit
    def shuffle_only(st, d):
        perm = jax.random.permutation(jax.random.key(7), N_TRAIN)
        d = jnp.take(d, perm, axis=0)
        return jnp.sum(d[:, :1].astype(jnp.float32))

    timeit("T2 shuffle only (perm+take)", shuffle_only, trainer.init_state(),
           data, stateful=False, readback=float)

    state = trainer.init_state()

    @jax.jit
    def fwd_only(st, d):
        def body(tot, batch):
            total, _ = trainer._loss_fn(st.params, st.batch_stats, batch,
                                        jax.random.key(0), E0, st.counter,
                                        True)
            return tot + total, None

        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), batches(d))
        return tot

    timeit("T3 fwd+loss only", fwd_only, state, data, stateful=False,
           readback=float)

    @jax.jit
    def fwd_bwd(st, d):
        def body(tot, batch):
            g = jax.grad(
                lambda p: trainer._loss_fn(p, st.batch_stats, batch,
                                           jax.random.key(0), E0, st.counter,
                                           True)[0])(st.params)
            gs = sum(jnp.vdot(x, x) for x in jax.tree.leaves(g))
            return tot + gs, None

        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), batches(d))
        return tot

    timeit("T4 fwd+bwd (no optimizer)", fwd_bwd, state, data, stateful=False,
           readback=float)


def _make_steps(trainer, update):
    """Scan of train steps with a custom optimizer-update fn."""
    from genome_minimizer_2_tpu.train.trainer import TrainState

    @jax.jit
    def steps(st, d):
        def body(carry, batch):
            st = carry
            rng, key = jax.random.split(st.rng)
            grad_fn = jax.value_and_grad(
                lambda p: trainer._loss_fn(p, st.batch_stats, batch, key,
                                           E0, st.counter, True),
                has_aux=True)
            (_, (comps, new_stats)), grads = grad_fn(st.params)
            params, new_opt = update(grads, st.opt_state, st.params)
            st = TrainState(params, new_stats, new_opt, st.counter + 1, rng)
            return st, comps["total"]

        st, tots = jax.lax.scan(body, st, batches(d))
        return st, jnp.sum(tots)

    return steps


def exp_optimizer(trainer, data):
    import optax

    from genome_minimizer_2_tpu.ops.optimizer import fused_clip_adam_apply

    mx = trainer.config.max_norm

    def upd_fused(g, o, p):
        return fused_clip_adam_apply(g, o, p, LR, max_norm=mx)

    def upd_optax(g, o, p):
        updates, new_opt = trainer.tx.update(g, o, p)
        updates = jax.tree.map(lambda u: (-LR) * u, updates)
        return optax.apply_updates(p, updates), new_opt

    def init_state(moment_dtype):
        st = trainer.init_state()
        clip, adam = st.opt_state
        cast = lambda t: jax.tree.map(lambda x: x.astype(moment_dtype), t)
        adam = adam._replace(mu=cast(adam.mu), nu=cast(adam.nu))
        return st._replace(opt_state=(clip, adam))

    for name, upd, mdt in (
            ("B fused one-pass, f32 moments", upd_fused, jnp.float32),
            ("C fused one-pass, bf16 moments", upd_fused, jnp.bfloat16),
            ("D optax chain", upd_optax, jnp.float32)):
        timeit(name, _make_steps(trainer, upd), init_state(mdt), data)
    exp_production(trainer, data)


def exp_shuffle(trainer, data):
    @jax.jit
    def steps_contig(st, d):
        def body(carry, batch):
            st2, comps = trainer._train_step(carry, batch, E0, LR)
            return st2, comps["total"]

        st, tots = jax.lax.scan(body, st, batches(d))
        return st, jnp.sum(tots)

    timeit("F steps, contiguous (no shuffle)", steps_contig,
           trainer.init_state(), data, readback=lambda o: float(o[1]))

    @jax.jit
    def take_all(d):
        perm = jax.random.permutation(jax.random.key(3), N_TRAIN)
        return jnp.sum(jnp.take(d, perm, axis=0)[:, :1].astype(jnp.float32))

    timeit("G materialized take (whole epoch)", take_all, data,
           stateful=False, readback=float)

    @jax.jit
    def gather_only(d):
        perm = jax.random.permutation(jax.random.key(3), N_TRAIN)

        def body(tot, idx):
            b = jnp.take(d, idx, axis=0)
            return tot + jnp.sum(b[:, :1].astype(jnp.float32)), None

        tot, _ = jax.lax.scan(body, jnp.float32(0),
                              perm[: STEPS * BATCH].reshape(STEPS, BATCH))
        return tot

    timeit("H per-batch row gather only", gather_only, data, stateful=False,
           readback=float)

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
           stateful=False, readback=float)


def exp_dtype(trainer, data):
    """bf16 grads + precast bf16 weight copies + MXU-dot global norm vs the
    production step. Round-2 verdict: LOSS — XLA does not fuse the
    master->bf16 recast into the optimizer pass (+0.5-0.7 ms/step)."""
    import optax

    from genome_minimizer_2_tpu.train.trainer import TrainState

    def cast_w(tree):
        def c(path, leaf):
            return (leaf.astype(jnp.bfloat16)
                    if getattr(path[-1], "key", None) == "w" else leaf)
        return jax.tree_util.tree_map_with_path(c, tree)

    def mxu_norm(grads):
        tot = jnp.float32(0)
        for g in jax.tree.leaves(grads):
            v = g.reshape(1, -1)
            tot = tot + jax.lax.dot_general(
                v, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)[0, 0]
        return jnp.sqrt(tot)

    def adam(g, m, v, p, norm, bc1, bc2):
        gf = g.astype(jnp.float32)
        gf = jnp.where(norm < 1.0, gf, gf / norm)
        m_new = 0.1 * gf + 0.9 * m.astype(jnp.float32)
        v_new = 0.001 * gf * gf + 0.999 * v.astype(jnp.float32)
        upd = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + ADAM_EPS)
        return (m_new.astype(m.dtype), v_new.astype(v.dtype), p - LR * upd)

    @jax.jit
    def v2(carry, d):
        def body(c, batch):
            st, wc = c
            rng, key = jax.random.split(st.rng)
            grad_fn = jax.value_and_grad(
                lambda pc: trainer._loss_fn(pc, st.batch_stats, batch, key,
                                            E0, st.counter, True),
                has_aux=True)
            (_, (comps, new_stats)), grads = grad_fn(wc)
            clip, a = st.opt_state
            cnt = optax.safe_increment(a.count)
            norm = mxu_norm(grads)
            bc1 = (1 - B1 ** cnt).astype(jnp.float32)
            bc2 = (1 - B2 ** cnt).astype(jnp.float32)
            gl, td = jax.tree.flatten(grads)
            ml = td.flatten_up_to(a.mu)
            vl = td.flatten_up_to(a.nu)
            pl_ = td.flatten_up_to(st.params)
            out = [adam(g, m, v, p, norm, bc1, bc2)
                   for g, m, v, p in zip(gl, ml, vl, pl_)]
            params = jax.tree.unflatten(td, [o[2] for o in out])
            a = a._replace(count=cnt,
                           mu=jax.tree.unflatten(td, [o[0] for o in out]),
                           nu=jax.tree.unflatten(td, [o[1] for o in out]))
            st = TrainState(params, new_stats, (clip, a), st.counter + 1, rng)
            return (st, cast_w(params)), comps["total"]

        (st, wc), tots = jax.lax.scan(body, carry, batches(d))
        return (st, wc), jnp.sum(tots)

    @jax.jit
    def v1(st, d):
        def body(c, batch):
            st2, comps = trainer._train_step(c, batch, E0, LR)
            return st2, comps["total"]

        st, tots = jax.lax.scan(body, st, batches(d))
        return st, jnp.sum(tots)

    timeit("V1 production step (no shuffle)", v1, trainer.init_state(), data)
    st0 = trainer.init_state()
    timeit("V2 bf16 grads + MXU norm + precast", v2,
           (st0, cast_w(st0.params)), data)


def main():
    global E0, LR
    trainer, data = setup()
    E0 = jnp.asarray(0, jnp.int32)
    LR = jnp.asarray(1e-3, jnp.float32)
    exps = {
        "production": [exp_production],
        "attribution": [exp_attribution],
        "optimizer": [exp_optimizer],
        "shuffle": [exp_shuffle],
        "dtype": [exp_dtype],
        "all": [exp_production, exp_attribution],
    }
    if EXP not in exps:
        sys.exit(f"unknown experiment {EXP!r}; pick from {sorted(exps)}")
    for fn in exps[EXP]:
        fn(trainer, data)


if __name__ == "__main__":
    main()
