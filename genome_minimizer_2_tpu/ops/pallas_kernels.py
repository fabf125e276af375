"""Pallas TPU kernels for the hot compute paths.

Two kernels, both with jnp reference implementations (used on CPU and as
test oracles — outputs are bit-identical):

- ``matmul_bias_act``: blocked x @ W + b with optional ReLU epilogue, bf16
  operands / f32 accumulation on the MXU. The building block of the VAE's
  [Linear -> BatchNorm -> ReLU] stacks (BatchNorm's batch-statistics
  reduction stays in XLA, which fuses it with the epilogue).
- ``decode_threshold_pack``: the sampling hot path. Fuses the 55k-wide
  decoder output matmul with sigmoid-thresholding (logits > 0) and 8-to-1
  bit-packing, emitting a uint8 bitmask — this cuts the device->host
  transfer of sampled genomes by 8x, which profiling shows is the sampling
  bottleneck on tunneled/multi-host setups (the matmul itself is ~free).

Grid/tiling: 128-row x 512-col output tiles (lane-aligned), K streamed whole
(hidden dims here are <= 1024 so the K panel fits VMEM comfortably).
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

_PACK_WEIGHTS = np.array([1, 2, 4, 8, 16, 32, 64, 128], np.uint8)


def _on_tpu() -> bool:
    return pltpu is not None and jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# matmul + bias + activation
# ---------------------------------------------------------------------------

def _mba_kernel(x_ref, w_ref, b_ref, o_ref, *, relu: bool):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[:] = acc


def matmul_bias_act_reference(x, w, b, relu: bool = False,
                              compute_dtype=jnp.bfloat16):
    precision = None if compute_dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    out = jnp.dot(x.astype(compute_dtype), w.astype(compute_dtype),
                  preferred_element_type=jnp.float32,
                  precision=precision) + b.astype(jnp.float32)
    return jnp.maximum(out, 0.0) if relu else out


@functools.partial(jax.jit,
                   static_argnames=("relu", "block_m", "block_n", "compute_dtype"))
def matmul_bias_act(x, w, b, relu: bool = False, block_m: int = 128,
                    block_n: int = 512, compute_dtype=jnp.bfloat16):
    """relu?(x @ w + b) via a blocked Pallas MXU kernel (TPU) or XLA (CPU).

    x: (M, K) any float dtype; w: (K, N); b: (N,). Returns f32 (M, N).
    M, N need not be tile-aligned (padded internally).
    """
    if not _on_tpu():
        return matmul_bias_act_reference(x, w, b, relu, compute_dtype)
    M, K = x.shape
    N = w.shape[1]
    Mp, Np = round_up(M, block_m), round_up(N, block_n)
    xb = jnp.pad(x.astype(compute_dtype), ((0, Mp - M), (0, 0)))
    wb = jnp.pad(w.astype(compute_dtype), ((0, 0), (0, Np - N)))
    bb = jnp.pad(b.astype(jnp.float32), (0, Np - N)).reshape(1, Np)
    grid = (Mp // block_m, Np // block_n)
    out = pl.pallas_call(
        functools.partial(_mba_kernel, relu=relu),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(xb, wb, bb)
    return out[:M, :N]


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


def decode_threshold_pack_reference(h, w, b, compute_dtype=jnp.bfloat16):
    logits = matmul_bias_act_reference(h, w, b, relu=False,
                                       compute_dtype=compute_dtype)
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
# fused BCE-sum + abundance column-sum with closed-form custom VJP
# ---------------------------------------------------------------------------
#
# One pass over the (B, D) logits computing BOTH reductions the VAE loss
# needs from the reconstruction: the masked BCE sum (reconstruction loss,
# loss_components.py:50) and the per-gene column sum of probabilities (the
# abundance loss input, loss_components.py:113). The backward pass is the
# closed form d/dl = (g_bce*(s - y) + g_col*s*(1-s)) * mask — no stored
# activations beyond the logits the caller already has.

def _bce_colsum_kernel(l_ref, y_ref, m_ref, bce_ref, col_ref):
    # grid is (col tiles, row tiles): rows innermost so the per-column
    # accumulator block is revisited on consecutive steps
    j = pl.program_id(0)  # col tile
    i = pl.program_id(1)  # row tile
    l = l_ref[:]
    y = y_ref[:].astype(jnp.float32)  # targets may be stored bf16 ({0,1} exact)
    m = m_ref[:]
    per_elem = (jnp.logaddexp(0.0, l) - l * y) * m
    probs = jax.nn.sigmoid(l) * m

    @pl.when((i == 0) & (j == 0))
    def _():
        bce_ref[0, 0] = 0.0

    bce_ref[0, 0] += jnp.sum(per_elem)
    tile = jnp.sum(probs, axis=0, keepdims=True)

    # the (1, block_n) col block for j is revisited once per row tile i
    @pl.when(i == 0)
    def _():
        col_ref[:] = tile

    @pl.when(i > 0)
    def _():
        col_ref[:] += tile


def _bce_colsum_reference(logits, targets, mask):
    logits = logits.astype(jnp.float32)
    per_elem = (jnp.logaddexp(0.0, logits) - logits * targets) * mask
    probs = jax.nn.sigmoid(logits) * mask
    return jnp.sum(per_elem), jnp.sum(probs, axis=0)


@functools.partial(jax.jit, static_argnames=("block_n", "block_m"))
def _bce_colsum_impl(logits, targets, mask, block_n: int = 1280,
                     block_m: int = 128):
    M, N = logits.shape
    block_m = min(block_m, M)
    # Row padding would corrupt the BCE sum (logaddexp(0,0)=log2 per padded
    # element); fall back for non-tileable batch sizes (remainder steps).
    if not _on_tpu() or M % block_m != 0:
        return _bce_colsum_reference(logits, targets, mask)
    Np = round_up(N, block_n)
    if Np != N:
        # zero-masked column padding contributes 0 to both reductions
        logits = jnp.pad(logits, ((0, 0), (0, Np - N)))
        targets = jnp.pad(targets, ((0, 0), (0, Np - N)))
        mask = jnp.pad(mask, (0, Np - N))
    grid = (Np // block_n, M // block_m)  # rows innermost
    mask2d = mask.reshape(1, Np).astype(jnp.float32)
    bce, col = pl.pallas_call(
        _bce_colsum_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_n), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_n), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ),
    )(logits.astype(jnp.float32), targets, mask2d)  # targets read at native
    return bce[0, 0], col[0, :N]                    # width (bf16 or f32)


@jax.custom_vjp
def bce_and_colsum(logits, targets, mask):
    """(masked BCE-with-logits sum, per-column probability sums).

    Identical math to ops.losses.bce_sum_logits + the abundance column sum,
    fused into one memory pass on TPU; jnp reference elsewhere.
    """
    return _bce_colsum_impl(logits, targets, mask)


def _bce_colsum_fwd(logits, targets, mask):
    out = _bce_colsum_impl(logits, targets, mask)
    return out, (logits, targets, mask)


def _bce_colsum_bwd(residuals, cotangents):
    logits, targets, mask = residuals
    g_bce, g_col = cotangents
    s = jax.nn.sigmoid(logits.astype(jnp.float32))
    dl = (g_bce * (s - targets) + g_col[None, :] * s * (1.0 - s)) * mask
    return dl.astype(logits.dtype), jnp.zeros_like(targets), jnp.zeros_like(mask)


bce_and_colsum.defvjp(_bce_colsum_fwd, _bce_colsum_bwd)


def make_sharded_bce_colsum(mesh, data_axis: str = "data"):
    """Data-parallel variant of :func:`bce_and_colsum`.

    ``pallas_call`` has no GSPMD partitioning rule, so under a >1-device mesh
    XLA would gather the sharded batch to run it. This factory instead wraps
    the kernel in ``shard_map`` over the mesh's data axis: each device runs
    the one-pass kernel on its own batch shard and the two reductions are
    combined with ``psum`` over ICI — the same math as the single-device
    kernel on the global batch (both reductions are sums over rows).

    The backward pass stays the closed form d/dlogits = (g_bce*(s-y) +
    g_col*s*(1-s))*mask — purely elementwise over the sharded logits, so it
    needs no shard_map; XLA partitions it along with the rest of the step.

    Requirements (the trainer gates on these): the mesh's other axes are
    trivial for the logits (model axis size 1 — TP shards the gene axis of
    the logits, which would break the per-shard column sums), and the batch
    divides evenly over ``data_axis``.
    """
    from jax.sharding import PartitionSpec as P

    def impl(logits, targets, mask):
        def shard_fn(l, y, m):
            bce, col = _bce_colsum_impl(l, y, m)
            return (jax.lax.psum(bce, data_axis),
                    jax.lax.psum(col, data_axis))

        return jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(data_axis, None), P(data_axis, None), P(None)),
            out_specs=(P(), P(None)),
            check_vma=False,
        )(logits, targets, mask)

    @jax.custom_vjp
    def sharded_bce_and_colsum(logits, targets, mask):
        return impl(logits, targets, mask)

    def _fwd(logits, targets, mask):
        return impl(logits, targets, mask), (logits, targets, mask)

    sharded_bce_and_colsum.defvjp(_fwd, _bce_colsum_bwd)
    return sharded_bce_and_colsum
