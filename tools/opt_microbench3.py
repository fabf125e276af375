#!/usr/bin/env python3
"""Dispatch-free HBM bandwidth + Adam formulation probe: every measurement
is a fori_loop of K iterations inside ONE compiled program."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from genome_minimizer_2_tpu.ops import optimizer as FO  # noqa: E402

N = 55040 * 1024
LANE = 1024
ROWS = N // LANE
K = 16  # loop iterations per program


def timeit(name, fn, gb_per_iter, *args, iters=4):
    try:
        out = fn(*args)
        jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0].item()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0].item()
        dt = (time.perf_counter() - t0) / (iters * K)
        print(f"{name:<46s} {dt*1e3:7.2f} ms/iter ({gb_per_iter/dt:6.0f} GB/s)",
              flush=True)
    except Exception as e:
        print(f"{name:<46s} FAILED: {str(e)[:120]}", flush=True)


@jax.jit
def copy_loop(x):
    return jax.lax.fori_loop(0, K, lambda i, x: x + 1.0, x)


@jax.jit
def saxpy_loop(x, y):
    return jax.lax.fori_loop(0, K, lambda i, y: y + 0.5 * x, y)


@jax.jit
def adam_jnp_loop(g, m, v, p, scalars):
    norm, bc1, bc2, lr = scalars[0, 0], scalars[0, 1], scalars[0, 2], scalars[0, 3]

    def body(i, mvp):
        m, v, p = mvp
        return FO._adam_math(g, m, v, p, norm, bc1, bc2, lr, max_norm=1.0)

    return jax.lax.fori_loop(0, K, body, (m, v, p))


def adam_pallas_loop(block_m, alias):
    def kernel(g_ref, m_ref, v_ref, p_ref, s_ref, mo_ref, vo_ref, po_ref):
        norm, bc1, bc2, lr = s_ref[0, 0], s_ref[0, 1], s_ref[0, 2], s_ref[0, 3]
        m_new, v_new, p_new = FO._adam_math(
            g_ref[:], m_ref[:], v_ref[:], p_ref[:], norm, bc1, bc2, lr,
            max_norm=1.0)
        mo_ref[:] = m_new
        vo_ref[:] = v_new
        po_ref[:] = p_new

    spec = pl.BlockSpec((block_m, LANE), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    kwargs = {"input_output_aliases": {1: 0, 2: 1, 3: 2}} if alias else {}
    call = pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32)
                        for _ in range(3)),
        grid=(ROWS // block_m,),
        in_specs=[spec] * 4 + [pl.BlockSpec((1, 4), lambda i: (0, 0),
                                            memory_space=pltpu.SMEM)],
        out_specs=(spec, spec, spec),
        **kwargs)

    @jax.jit
    def run(g, m, v, p, scalars):
        g = g.reshape(ROWS, LANE)

        def body(i, mvp):
            m, v, p = mvp
            return call(g, m, v, p, scalars)

        r = lambda x: x.reshape(ROWS, LANE)
        return jax.lax.fori_loop(0, K, body, (r(m), r(v), r(p)))

    return run


def main():
    key = jax.random.key(0)
    ks = jax.random.split(key, 4)
    mk = lambda k, s: jax.random.normal(k, (N,), jnp.float32) * s
    scalars = jnp.asarray([[2.0, 0.4, 0.01, 1e-3]], jnp.float32)

    x = mk(ks[0], 1.0)
    timeit("copy loop (0.45 GB/iter)", copy_loop, 2 * N * 4 / 1e9, x)
    timeit("saxpy loop (0.68 GB/iter)", saxpy_loop, 3 * N * 4 / 1e9, x,
           mk(ks[1], 1.0))

    g, m, v, p = (mk(k, s) for k, s in zip(ks, (3.0, 0.1, 0.01, 1.0)))
    gb = 7 * N * 4 / 1e9
    timeit("adam jnp loop (1.58 GB/iter)", adam_jnp_loop, gb, g, jnp.abs(m),
           v, p, scalars)
    timeit("adam pallas 128 NO-alias loop", adam_pallas_loop(128, False), gb,
           g, jnp.abs(m), v, p, scalars)
    timeit("adam pallas 128 alias loop", adam_pallas_loop(128, True), gb,
           g, jnp.abs(m), v, p, scalars)
    timeit("adam pallas 512 NO-alias loop", adam_pallas_loop(512, False), gb,
           g, jnp.abs(m), v, p, scalars)


if __name__ == "__main__":
    main()
