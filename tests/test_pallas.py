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


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_matmul_bias_act_reference(rng, dtype):
    x = rng.randn(5, 16).astype(np.float32)
    w = rng.randn(16, 24).astype(np.float32)
    b = rng.randn(24).astype(np.float32)
    out = np.asarray(PK.matmul_bias_act(jnp.asarray(x), jnp.asarray(w),
                                        jnp.asarray(b), compute_dtype=dtype))
    expect = x.astype(dtype) @ w.astype(dtype) + b
    tol = 1e-5 if dtype == jnp.float32 else 0.1
    np.testing.assert_allclose(out, np.asarray(expect, np.float32), atol=tol,
                               rtol=tol)
    relu_out = np.asarray(PK.matmul_bias_act(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), relu=True,
        compute_dtype=dtype))
    assert relu_out.min() >= 0


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
