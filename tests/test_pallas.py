"""Pallas kernel reference paths (CPU): packing correctness, threshold
consistency with the dense decode, f32/bf16 dtype plumbing. The compiled TPU
kernels themselves are exercised by bench.py / the driver on hardware and are
bit-compared against these reference implementations there."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from genome_minimizer_2_tpu.models import vae
from genome_minimizer_2_tpu.ops import pallas_kernels as PK


def test_pack_unpack_roundtrip(rng):
    bits = (rng.rand(16, 64) < 0.5).astype(np.uint8)
    packed = np.asarray(PK._pack_bits_2d(jnp.asarray(bits)))
    assert packed.shape == (16, 8)
    np.testing.assert_array_equal(PK.unpack_bits(packed, 64), bits)


def test_pack_matches_numpy_packbits(rng):
    bits = (rng.rand(4, 128) < 0.3).astype(np.uint8)
    packed = np.asarray(PK._pack_bits_2d(jnp.asarray(bits)))
    expected = np.packbits(bits, axis=1, bitorder="little")
    np.testing.assert_array_equal(packed, expected)


def test_gather_row_blocks_reference(rng):
    """Block-gather oracle (the CPU fallback path): out[i*8:(i+1)*8] ==
    x[idx[i]*8 : idx[i]*8+8], i.e. an 8-row-granular permutation."""
    x = rng.randn(40, 12).astype(np.float32)
    idx = np.array([3, 0, 4, 2, 1], np.int32)
    out = np.asarray(PK.gather_row_blocks(jnp.asarray(x), jnp.asarray(idx)))
    expect = np.concatenate([x[i * 8:(i + 1) * 8] for i in idx])
    np.testing.assert_array_equal(out, expect)


def test_block_shuffle_gating():
    """The trainer's block shuffle engages only for TPU execution with
    batch >= 256 and 8-divisible n; everything else keeps the exact
    row-level permutation."""
    from genome_minimizer_2_tpu.train.trainer import VAETrainer, create_trainer
    from genome_minimizer_2_tpu.utils.config import get_v0_config

    cfg = get_v0_config()
    cfg.batch_size = 2048
    tr = create_trainer("v0", cfg, input_dim=64)
    assert not tr._use_block_shuffle(4096)  # CPU backend
    orig = VAETrainer._mesh_platform
    try:
        VAETrainer._mesh_platform = lambda self: "tpu"
        assert tr._use_block_shuffle(4096)
        assert not tr._use_block_shuffle(4095)  # not 8-divisible
        cfg.batch_size = 32
        assert not tr._use_block_shuffle(4096)  # small batch: exact shuffle
        cfg.batch_size = 2048
        cfg.use_pallas_gather = False
        assert not tr._use_block_shuffle(4096)
    finally:
        VAETrainer._mesh_platform = orig


def test_decode_threshold_pack_matches_dense(rng):
    h = rng.randn(6, 16).astype(np.float32)
    w = rng.randn(16, 50).astype(np.float32)
    b = rng.randn(50).astype(np.float32)
    packed = np.asarray(PK.decode_threshold_pack(
        jnp.asarray(h), jnp.asarray(w), jnp.asarray(b),
        compute_dtype=jnp.float32))
    bits = PK.unpack_bits(packed, 50)
    logits = h @ w + b
    np.testing.assert_array_equal(bits, (logits > 0).astype(np.uint8))


def test_sampler_packed_equals_dense_decode():
    """Sampler's packed decode must produce the same binary masks as the
    dense logits>0 path."""
    from genome_minimizer_2_tpu.sample.sampler import Sampler

    cfg = vae.VAEConfig(input_dim=45, hidden_dim=12, latent_dim=3)
    params, stats = vae.init(cfg, jax.random.key(0))
    s = Sampler(cfg=cfg, params=params, batch_stats=stats, chunk_size=16)
    z = np.asarray(jax.random.normal(jax.random.key(1), (33, 3)))
    packed_path = s.decode_binary(z)
    dense = s._decode_chunked(z, s._decode_binary)
    np.testing.assert_array_equal(packed_path, dense)
