#!/usr/bin/env python3
"""Iterate on the fused output-layer backward kernel: operand orientations
and tile sizes. Compares against the XLA fwd+bwd chain (7.05 ms measured)."""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

B, H, D = 2048, 1024, 55040


def make_bwd(bm, bn, ht_input: bool, wt_input: bool):
    def kernel(l_ref, y_ref, m_ref, h_ref, w_ref, g_ref,
               dw_ref, db_ref, dh_ref, dh_acc, sem):
        j = pl.program_id(0)
        i = pl.program_id(1)
        nj = pl.num_programs(0)
        ni = pl.num_programs(1)
        g = g_ref[0, 0]
        l = l_ref[:].astype(jnp.float32)
        y = y_ref[:].astype(jnp.float32)
        dl = (g * (jax.nn.sigmoid(l) - y) * m_ref[:]).astype(jnp.bfloat16)

        if ht_input:  # h_ref is (H, B): dW = hT[:, rows] @ dl
            ht = h_ref[:, pl.ds(i * bm, bm)]
            dw_tile = jnp.dot(ht, dl, preferred_element_type=jnp.float32)
        else:  # h_ref is (B, H)
            htile = h_ref[pl.ds(i * bm, bm), :]
            dw_tile = jax.lax.dot_general(
                htile, dl, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        db_tile = jnp.sum(dl.astype(jnp.float32), axis=0, keepdims=True)

        @pl.when(i == 0)
        def _():
            dw_ref[:] = dw_tile
            db_ref[:] = db_tile

        @pl.when(i > 0)
        def _():
            dw_ref[:] += dw_tile
            db_ref[:] += db_tile

        if wt_input:  # w_ref block is (bn, H): dh = dl @ wT_blk
            dh_tile = jnp.dot(dl, w_ref[:], preferred_element_type=jnp.float32)
        else:  # w_ref block is (H, bn)
            dh_tile = jax.lax.dot_general(
                dl, w_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        rows = pl.ds(i * bm, bm)

        @pl.when(j == 0)
        def _():
            dh_acc[rows, :] = dh_tile

        @pl.when(j > 0)
        def _():
            dh_acc[rows, :] += dh_tile

        @pl.when((j == nj - 1) & (i == ni - 1))
        def _():
            c = pltpu.make_async_copy(dh_acc, dh_ref, sem)
            c.start()
            c.wait()

    def bwd(h_c, w_c, logits, targets, mask, g):
        grid = (D // bn, B // bm)
        mask2d = mask.reshape(1, D).astype(jnp.float32)
        g2d = jnp.reshape(g.astype(jnp.float32), (1, 1))
        harg = h_c.T if ht_input else h_c
        hspec = (pl.BlockSpec((H, B), lambda j, i: (0, 0),
                              memory_space=pltpu.VMEM) if ht_input else
                 pl.BlockSpec((B, H), lambda j, i: (0, 0),
                              memory_space=pltpu.VMEM))
        warg = w_c.T if wt_input else w_c
        wspec = (pl.BlockSpec((bn, H), lambda j, i: (j, 0),
                              memory_space=pltpu.VMEM) if wt_input else
                 pl.BlockSpec((H, bn), lambda j, i: (0, j),
                              memory_space=pltpu.VMEM))
        tile = lambda: pl.BlockSpec((bm, bn), lambda j, i: (i, j),
                                    memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[tile(), tile(),
                      pl.BlockSpec((1, bn), lambda j, i: (0, j),
                                   memory_space=pltpu.VMEM),
                      hspec, wspec,
                      pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=(
                pl.BlockSpec((H, bn), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ),
            out_shape=(jax.ShapeDtypeStruct((H, D), jnp.float32),
                       jax.ShapeDtypeStruct((1, D), jnp.float32),
                       jax.ShapeDtypeStruct((B, H), jnp.float32)),
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )(logits, targets, mask2d, harg, warg, g2d)

    return bwd


def main():
    k = jax.random.split(jax.random.key(0), 5)
    h = jax.random.normal(k[0], (B, H), jnp.bfloat16)
    w = (jax.random.normal(k[1], (H, D), jnp.float32) * 0.02).astype(jnp.bfloat16)
    y = jax.random.bernoulli(k[3], 0.5, (B, D)).astype(jnp.bfloat16)
    mask = jnp.ones((D,), jnp.float32)
    logits = jax.jit(lambda h, w: (
        jnp.dot(h, w, preferred_element_type=jnp.float32)).astype(jnp.bfloat16)
    )(h, w)
    g = jnp.float32(1.0)

    def timeloop(fn, n=10):
        out = fn(h, w, logits, y, mask, g)
        float(out[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(h, w, logits, y, mask, g)
        float(out[0].ravel()[0])
        return (time.perf_counter() - t0) / n * 1e3

    for name, (bm, bn, ht, wt) in (
            ("bm128 bn256 (current)", (128, 256, False, False)),
            ("bm128 bn256 hT", (128, 256, True, False)),
            ("bm256 bn256 hT", (256, 256, True, False)),
            ("bm256 bn256 hT wT", (256, 256, True, True)),
            ("bm512 bn256 hT", (512, 256, True, False)),
    ):
        try:
            fn = jax.jit(make_bwd(bm, bn, ht, wt))
            print(f"{name:<26s} {timeloop(fn):7.2f} ms (bwd only)", flush=True)
        except Exception as e:
            print(f"{name:<26s} FAILED {str(e)[:100]}", flush=True)


if __name__ == "__main__" and "--fullk" not in sys.argv:
    main()


def make_bwd_fullk(bn):
    """1-D grid over column tiles; K = full batch per dot; dh resident."""
    def kernel(l_ref, y_ref, m_ref, ht_ref, w_ref, g_ref,
               dw_ref, db_ref, dh_ref):
        j = pl.program_id(0)
        g = g_ref[0, 0]
        l = l_ref[:].astype(jnp.float32)
        y = y_ref[:].astype(jnp.float32)
        dl = (g * (jax.nn.sigmoid(l) - y) * m_ref[:]).astype(jnp.bfloat16)
        dw_ref[:] = jnp.dot(ht_ref[:], dl, preferred_element_type=jnp.float32)
        db_ref[:] = jnp.sum(dl.astype(jnp.float32), axis=0, keepdims=True)
        dh_tile = jax.lax.dot_general(
            dl, w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _():
            dh_ref[:] = dh_tile

        @pl.when(j > 0)
        def _():
            dh_ref[:] += dh_tile

    def bwd(h_c, w_c, logits, targets, mask, g):
        grid = (D // bn,)
        mask2d = mask.reshape(1, D).astype(jnp.float32)
        g2d = jnp.reshape(g.astype(jnp.float32), (1, 1))
        full = lambda r, c: pl.BlockSpec((r, c), lambda j: (0, 0),
                                         memory_space=pltpu.VMEM)
        colb = lambda r, c: pl.BlockSpec((r, c), lambda j: (0, j),
                                         memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(os.environ.get("BOL_VMEM", 32 * 2**20))),
            in_specs=[colb(B, bn), colb(B, bn), colb(1, bn),
                      full(H, B), colb(H, bn),
                      pl.BlockSpec((1, 1), lambda j: (0, 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=(colb(H, bn), colb(1, bn), full(B, H)),
            out_shape=(jax.ShapeDtypeStruct((H, D), jnp.float32),
                       jax.ShapeDtypeStruct((1, D), jnp.float32),
                       jax.ShapeDtypeStruct((B, H), jnp.float32)),
        )(logits, targets, mask2d, h_c.T, w_c, g2d)

    return bwd


def main2():
    k = jax.random.split(jax.random.key(0), 5)
    h = jax.random.normal(k[0], (B, H), jnp.bfloat16)
    w = (jax.random.normal(k[1], (H, D), jnp.float32) * 0.02).astype(jnp.bfloat16)
    y = jax.random.bernoulli(k[3], 0.5, (B, D)).astype(jnp.bfloat16)
    mask = jnp.ones((D,), jnp.float32)
    logits = jax.jit(lambda h, w: (
        jnp.dot(h, w, preferred_element_type=jnp.float32)).astype(jnp.bfloat16)
    )(h, w)
    g = jnp.float32(1.0)

    def timeloop(fn, n=10):
        out = fn(h, w, logits, y, mask, g)
        float(out[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(h, w, logits, y, mask, g)
        float(out[0].ravel()[0])
        return (time.perf_counter() - t0) / n * 1e3

    for name, bn in (("fullK bn128", 128), ("fullK bn256", 256)):
        try:
            fn = jax.jit(make_bwd_fullk(bn))
            print(f"{name:<26s} {timeloop(fn):7.2f} ms (bwd only)", flush=True)
        except Exception as e:
            print(f"{name:<26s} FAILED {str(e)[:100]}", flush=True)


if __name__ == "__main__" and "--fullk" in sys.argv:
    main2()
