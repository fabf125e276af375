#!/usr/bin/env python3
"""Find the practical HBM bandwidth ceiling and the fastest Adam-update
formulation for the 56M-element leaves."""

from __future__ import annotations

import functools
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


def timeit(name, fn, gb, *args, iters=20):
    try:
        out = fn(*args)
        jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0].item()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0].item()
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:<46s} {dt*1e3:7.2f} ms  ({gb/dt:6.0f} GB/s)", flush=True)
    except Exception as e:
        print(f"{name:<46s} FAILED: {str(e)[:120]}", flush=True)


# --- bandwidth ceiling -------------------------------------------------------

@jax.jit
def xla_copy(x):
    return x + 1.0


def pallas_copy(block_m):
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    spec = lambda: pl.BlockSpec((block_m, LANE), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((ROWS, LANE), jnp.float32),
        grid=(ROWS // block_m,), in_specs=[spec()], out_specs=spec())
    return jax.jit(lambda x: call(x.reshape(ROWS, LANE)))


# --- adam variants -----------------------------------------------------------

def adam_pallas(block_m, alias, dimsem=None):
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
    kwargs = {}
    if alias:
        kwargs["input_output_aliases"] = {1: 0, 2: 1, 3: 2}
    if dimsem:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(dimsem,))
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
        r = lambda x: x.reshape(ROWS, LANE)
        return call(r(g), r(m), r(v), r(p), scalars)

    return run


@functools.partial(jax.jit, donate_argnums=(1, 2, 3))
def adam_jnp_donated(g, m, v, p, scalars):
    norm, bc1, bc2, lr = scalars[0, 0], scalars[0, 1], scalars[0, 2], scalars[0, 3]
    return FO._adam_math(g, m, v, p, norm, bc1, bc2, lr, max_norm=1.0)


def main():
    key = jax.random.key(0)
    ks = jax.random.split(key, 4)
    mk = lambda k, s: jax.random.normal(k, (N,), jnp.float32) * s
    scalars = jnp.asarray([[2.0, 0.4, 0.01, 1e-3]], jnp.float32)
    gb_copy = 2 * N * 4 / 1e9
    gb_adam = 7 * N * 4 / 1e9

    x = mk(ks[0], 1.0)
    timeit("XLA copy (read+write 450MB)", xla_copy, gb_copy, x)
    timeit("pallas copy 128 rows", pallas_copy(128), gb_copy, x)
    timeit("pallas copy 512 rows", pallas_copy(512), gb_copy, x)
    timeit("pallas copy 2048 rows", pallas_copy(2048), gb_copy, x)

    for name, fn in (
        ("adam pallas 128 NO-alias", adam_pallas(128, False)),
        ("adam pallas 128 alias arbitrary", adam_pallas(128, True, "arbitrary")),
        ("adam pallas 256 NO-alias", adam_pallas(256, False)),
        ("adam pallas 64 alias", adam_pallas(64, True)),
    ):
        g, m, v, p = (mk(k, s) for k, s in zip(ks, (3.0, 0.1, 0.01, 1.0)))
        timeit(name, fn, gb_adam, g, jnp.abs(m), v, p, scalars)

    g, m, v, p = (mk(k, s) for k, s in zip(ks, (3.0, 0.1, 0.01, 1.0)))
    timeit("adam jnp donated", adam_jnp_donated, gb_adam, g, jnp.abs(m), v, p,
           scalars)


if __name__ == "__main__":
    main()
