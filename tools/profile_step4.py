#!/usr/bin/env python3
"""Probe: does bf16-grad + precast-weights win once the global norm is
computed via an MXU dot (no materialized f32 upcast of the 56M grads)?

V1: current production structure (f32 params fwd, f32 grads) — expect ~14.2
V2: grad wrt precast bf16 weights; norm via lax.dot on bf16; Adam upcasts
    in-register; bf16 weight copies re-cast at step end.
Both: bf16 moments, no shuffle (isolates the optimizer/grad dtype question).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, "/root/repo")

BATCH, N_TRAIN = 2048, 8192
STEPS = N_TRAIN // BATCH
INPUT_DIM = 55039
B1, B2, EPS = 0.9, 0.999, 1e-8


def timeit(name, fn, state, data, iters=6):
    t0 = time.perf_counter()
    st, tot = fn(state, data)
    float(tot)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        st, tot = fn(st, data)
    float(tot)
    dt = (time.perf_counter() - t0) / iters / STEPS
    eps = BATCH / dt
    print(f"{name:<40s} {dt*1e3:8.2f} ms/step  {eps:10,.0f} ex/s "
          f"{eps*0.7e9/1e12:6.1f} TF [compile {compile_s:.0f}s]", flush=True)


def main():
    from bench import _make_trainer
    from genome_minimizer_2_tpu.train.trainer import TrainState

    trainer = _make_trainer(BATCH)
    Dp = trainer.model_cfg.padded_dim
    lr = jnp.float32(1e-3)
    e = jnp.asarray(0, jnp.int32)

    @jax.jit
    def gen(key):
        x = jax.random.bernoulli(key, 0.5, (N_TRAIN, INPUT_DIM)).astype(jnp.bfloat16)
        return jnp.pad(x, ((0, 0), (0, Dp - INPUT_DIM)))

    data = gen(jax.random.key(0))

    def batches(d):
        return d[: STEPS * BATCH].reshape(STEPS, BATCH, d.shape[1])

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
        upd = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + EPS)
        return (m_new.astype(m.dtype), v_new.astype(v.dtype), p - lr * upd)

    def make_v2():
        @jax.jit
        def steps(carry, d):
            def body(c, batch):
                st, wc = c
                rng, key = jax.random.split(st.rng)

                def loss(pc):
                    return trainer._loss_fn(pc, st.batch_stats, batch, key,
                                            e, st.counter, True)

                grad_fn = jax.value_and_grad(loss, has_aux=True)
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
                st = TrainState(params, new_stats, (clip, a), st.counter + 1,
                                rng)
                return (st, cast_w(params)), comps["total"]

            (st, wc), tots = jax.lax.scan(body, carry, batches(d))
            return (st, wc), jnp.sum(tots)

        return steps

    @jax.jit
    def v1(st, d):
        def body(c, batch):
            st2, comps = trainer._train_step(c, batch, e, lr)
            return st2, comps["total"]

        st, tots = jax.lax.scan(body, st, batches(d))
        return st, jnp.sum(tots)

    st0 = trainer.init_state()
    timeit("V1 production step (no shuffle)", v1, st0, data)
    st0 = trainer.init_state()
    timeit("V2 bf16 grads + MXU norm + precast", make_v2(),
           (st0, cast_w(st0.params)), data)


if __name__ == "__main__":
    main()
