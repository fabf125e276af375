"""Pallas TPU kernels for the paths where hand-written kernels MEASURABLY
beat XLA on this hardware. Each has a jnp reference implementation (used on
CPU and as the test oracle — outputs are bit-identical).

- ``decode_threshold_pack``: the sampling hot path. Fuses the 55k-wide
  decoder output matmul with sigmoid-thresholding (logits > 0) and 8-to-1
  bit-packing, emitting a uint8 bitmask — this cuts the device->host
  transfer of sampled genomes by 8x, which profiling shows is the sampling
  bottleneck on tunneled/multi-host setups (the matmul itself is ~free).
- ``gather_row_blocks``: the epoch-shuffle permutation as manual HBM->HBM
  block DMAs — ~6x the throughput of XLA's gather lowering on this chip
  (tools/profile_train.py shuffle: 45-80 GB/s XLA vs ~530 GB/s here).

Kernels that were built, measured on-chip, and REMOVED because XLA's fusion
beat them inside the real training step (round 2; evidence in BASELINE.md
and tools/profile_train.py): a blocked matmul+bias+activation building
block, a fused BCE+colsum loss kernel with closed-form VJP (XLA fuses the
jnp BCE reduction into the output matmul's epilogue and never materializes
the logits — 112.7 vs 100.8 TFLOPs/chip at bs=2048), a fused Adam update
(aliased in-scan Pallas forced defensive copies of the optimizer state),
and a fused output-layer backward producing dW/db/dh in one pass (its
small-K MXU contractions ran ~2x below XLA's scheduled dots).

Grid/tiling: 128-row x 1024-col output tiles (lane-aligned), K streamed
whole (hidden dims here are <= 1024 so the K panel fits VMEM comfortably).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on CPU-only builds
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from ..core.dtypes import round_up


def _on_tpu() -> bool:
    return pltpu is not None and jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# decode -> threshold -> bitpack
# ---------------------------------------------------------------------------

def _pack_bits_2d(bits):
    """(M, N) {0,1} -> (M, N//8) uint8, little-bit-order (np.unpackbits
    bitorder='little' inverse).

    The bit weights are generated with an in-kernel iota (1 << [0..7]) — a
    captured numpy constant would be rejected by pallas_call.
    """
    m, n = bits.shape
    grouped = bits.astype(jnp.int32).reshape(m, n // 8, 8)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8), 2)
    weights = jnp.left_shift(1, iota)
    return jnp.sum(grouped * weights, axis=-1).astype(jnp.uint8)


def pack_bits(bits):
    """Public little-bit-order packer: (M, N) {0,1} -> (M, N//8) uint8, the
    inverse of :func:`unpack_bits` (N must be a multiple of 8 — pad first).
    Traceable (pure jnp), usable inside jit/shard_map and Pallas kernels."""
    return _pack_bits_2d(bits)


def _dtp_kernel(h_ref, w_ref, b_ref, o_ref):
    logits = jnp.dot(h_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    logits = logits + b_ref[:].astype(jnp.float32)
    bits = (logits > 0.0).astype(jnp.float32)
    # Pack 8 lanes -> 1 byte via an MXU matmul with an iota-built packing
    # matrix (Mosaic cannot reshape-split the lane dimension): P[j, c] = 2^k
    # where j = 8c + k, else 0. Byte values <= 255 are exact in f32.
    n = bits.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n // 8), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n // 8), 1)
    shift = row - col * 8
    in_byte = (shift >= 0) & (shift < 8)
    weights = jnp.left_shift(1, jnp.clip(shift, 0, 7)).astype(jnp.float32)
    pack = jnp.where(in_byte, weights, 0.0)
    packed = jnp.dot(bits, pack, preferred_element_type=jnp.float32)
    # Mosaic lacks f32->uint8 casts; emit int32, downcast in XLA outside
    o_ref[:] = packed.astype(jnp.int32)


def _matmul_bias_reference(x, w, b, compute_dtype=jnp.bfloat16):
    precision = (None if compute_dtype == jnp.bfloat16
                 else jax.lax.Precision.HIGHEST)
    return jnp.dot(x.astype(compute_dtype), w.astype(compute_dtype),
                   preferred_element_type=jnp.float32,
                   precision=precision) + b.astype(jnp.float32)


def decode_threshold_pack_reference(h, w, b, compute_dtype=jnp.bfloat16):
    logits = _matmul_bias_reference(h, w, b, compute_dtype)
    n8 = round_up(logits.shape[1], 8)
    bits = jnp.pad((logits > 0.0), ((0, 0), (0, n8 - logits.shape[1])))
    return _pack_bits_2d(bits)


@functools.partial(jax.jit,
                   static_argnames=("block_m", "block_n", "compute_dtype"))
def decode_threshold_pack(h, w, b, block_m: int = 128, block_n: int = 1024,
                          compute_dtype=jnp.bfloat16):
    """Fused final-decode: sigmoid(h @ w + b) > 0.5 as packed uint8 bits.

    h: (M, K) hidden activations; w: (K, N) output weights; b: (N,).
    Returns uint8 (M, ceil(N/8)) — unpack with
    ``np.unpackbits(out, axis=1, bitorder='little')[:, :N]``.
    Padding columns pack as 0 bits (b pads to -inf).
    """
    M, K = h.shape
    N = w.shape[1]
    if not _on_tpu():
        return decode_threshold_pack_reference(
            h, w, b, compute_dtype)[:, : round_up(N, 8) // 8]
    Mp, Np = round_up(M, block_m), round_up(N, block_n)
    hb = jnp.pad(h.astype(compute_dtype), ((0, Mp - M), (0, 0)))
    wb = jnp.pad(w.astype(compute_dtype), ((0, 0), (0, Np - N)))
    bb = jnp.pad(b.astype(jnp.float32), (0, Np - N),
                 constant_values=-1e30).reshape(1, Np)
    grid = (Mp // block_m, Np // block_n)
    out = pl.pallas_call(
        _dtp_kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, Np // 8), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n // 8), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(hb, wb, bb)
    return out[:M, : round_up(N, 8) // 8].astype(jnp.uint8)


def unpack_bits(packed: np.ndarray, n: int) -> np.ndarray:
    """Host-side inverse of the packers: uint8 (M, ceil(n/8)) -> (M, n)."""
    return np.unpackbits(np.asarray(packed), axis=1, bitorder="little")[:, :n]


# ---------------------------------------------------------------------------
# row-block gather (epoch shuffle) — manual HBM->HBM DMAs
# ---------------------------------------------------------------------------
#
# The trainer materializes each epoch's permutation once. XLA's gather
# lowering runs at ~45-80 GB/s on this chip (tools/profile_train.py shuffle H/G);
# this kernel issues concurrent block DMAs straight from the source array in
# HBM to the output in HBM (no VMEM transit), sustaining near the streaming
# roofline. The index vector rides scalar prefetch so each grid step's
# addresses are known before its DMAs issue.
#
# Granularity: HBM memrefs are (8, 128)-tiled, so the smallest addressable
# row slice is 8 rows — the shuffle permutes 8-ROW BLOCKS, not single rows.
# The trainer gates this on batch_size >= 256 (>= 32 blocks mix per batch);
# smaller batches keep the exact row-level jnp permutation.

GATHER_BLOCK = 8  # HBM sublane tiling: minimum addressable row-slice


def _gather_blocks_kernel(idx_ref, x_ref, o_ref, sems, *,
                          blocks_per_step: int):
    i = pl.program_id(0)
    base = i * blocks_per_step
    copies = [
        pltpu.make_async_copy(
            x_ref.at[pl.ds(idx_ref[base + j] * GATHER_BLOCK, GATHER_BLOCK)],
            o_ref.at[pl.ds((base + j) * GATHER_BLOCK, GATHER_BLOCK)],
            sems.at[j],
        )
        for j in range(blocks_per_step)
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()


def gather_row_blocks(x, block_idx):
    """Permute 8-row blocks: out[i*8:(i+1)*8] = x[block_idx[i]*8 : ...+8].

    x: (n, d), n need not be a multiple of 8 (trailing rows are not
    addressed); block_idx: (m,) int32 of block ordinals. Returns (m*8, d).
    jnp fallback off-TPU (used by tests as the oracle).
    """
    m = int(block_idx.shape[0])
    d = x.shape[1]
    if not _on_tpu():
        rows = (block_idx[:, None] * GATHER_BLOCK
                + jnp.arange(GATHER_BLOCK)[None, :]).reshape(-1)
        return jnp.take(x, rows, axis=0)
    blocks_per_step = next(b for b in (16, 8, 4, 2, 1) if m % b == 0)
    return pl.pallas_call(
        functools.partial(_gather_blocks_kernel,
                          blocks_per_step=blocks_per_step),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m // blocks_per_step,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((blocks_per_step,))],
        ),
        out_shape=jax.ShapeDtypeStruct((m * GATHER_BLOCK, d), x.dtype),
    )(block_idx.astype(jnp.int32), x)
