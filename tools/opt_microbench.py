#!/usr/bin/env python3
"""Micro-benchmark the Adam update on one 56M-element leaf (the v0 wide
matmul weight) — Pallas kernel variants vs one fused jnp pass.

Ideal traffic: read g,m,v,p (4x225MB) + write m,v,p (3x225MB) = 1.58 GB
-> ~1.9 ms at 819 GB/s. The round-1 kernel measured ~3.5x worse than that
inside the step; find out why and what block shape fixes it.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from genome_minimizer_2_tpu.ops import optimizer as FO  # noqa: E402

N = 55040 * 1024  # the flagship wide-layer leaf
IDEAL_GB = (4 + 3) * N * 4 / 1e9


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jnp.asarray(out[0]).ravel()[0].item()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jnp.asarray(out[0]).ravel()[0].item()
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<44s} {dt*1e3:7.2f} ms  ({IDEAL_GB/dt:6.0f} GB/s effective)",
          flush=True)
    return dt


def make_pallas(block_m: int, lane: int = 1024, alias: bool = True,
                dimsem: str | None = None):
    rows = N // lane

    def kernel(g_ref, m_ref, v_ref, p_ref, s_ref, mo_ref, vo_ref, po_ref):
        norm, bc1, bc2, lr = s_ref[0, 0], s_ref[0, 1], s_ref[0, 2], s_ref[0, 3]
        m_new, v_new, p_new = FO._adam_math(
            g_ref[:], m_ref[:], v_ref[:], p_ref[:], norm, bc1, bc2, lr,
            max_norm=1.0)
        mo_ref[:] = m_new
        vo_ref[:] = v_new
        po_ref[:] = p_new

    spec = pl.BlockSpec((block_m, lane), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    kwargs = {}
    if alias:
        kwargs["input_output_aliases"] = {1: 0, 2: 1, 3: 2}
    if dimsem:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(dimsem,))
    call = pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((rows, lane), jnp.float32)
                        for _ in range(3)),
        grid=(rows // block_m,),
        in_specs=[spec] * 4 + [pl.BlockSpec((1, 4), lambda i: (0, 0),
                                            memory_space=pltpu.SMEM)],
        out_specs=(spec, spec, spec),
        **kwargs,
    )

    @jax.jit
    def run(g, m, v, p, scalars):
        r = lambda x: x.reshape(rows, lane)
        return call(r(g), r(m), r(v), r(p), scalars)

    return run


@jax.jit
def jnp_fused(g, m, v, p, scalars):
    norm, bc1, bc2, lr = scalars[0, 0], scalars[0, 1], scalars[0, 2], scalars[0, 3]
    return FO._adam_math(g, m, v, p, norm, bc1, bc2, lr, max_norm=1.0)


@jax.jit
def jnp_donated(g, m, v, p, scalars):
    norm, bc1, bc2, lr = scalars[0, 0], scalars[0, 1], scalars[0, 2], scalars[0, 3]
    return FO._adam_math(g, m, v, p, norm, bc1, bc2, lr, max_norm=1.0)


def main():
    key = jax.random.key(0)
    ks = jax.random.split(key, 4)
    g, m, v, p = (jax.random.normal(k, (N,), jnp.float32) * s
                  for k, s in zip(ks, (3.0, 0.1, 0.01, 1.0)))
    v = jnp.abs(v)
    scalars = jnp.asarray([[2.0, 0.4, 0.01, 1e-3]], jnp.float32)
    print(f"leaf = {N/1e6:.0f}M f32; ideal 7-pass traffic {IDEAL_GB:.2f} GB",
          flush=True)

    timeit("jnp one-pass (XLA fusion)", jnp_fused, g, m, v, p, scalars)
    timeit("round-1 kernel (128 rows, alias)",
           functools.partial(FO._fused_leaf_pallas, max_norm=1.0),
           g, m, v, p, scalars)
    for bm in (256, 512, 1024):
        try:
            timeit(f"pallas block_m={bm}, alias", make_pallas(bm), g, m, v, p,
                   scalars)
        except Exception as e:
            print(f"block_m={bm} alias FAILED: {e}", flush=True)
    timeit("pallas block_m=256, NO alias", make_pallas(256, alias=False),
           g, m, v, p, scalars)
    timeit("pallas block_m=256, alias, arbitrary",
           make_pallas(256, dimsem="arbitrary"), g, m, v, p, scalars)


if __name__ == "__main__":
    main()
