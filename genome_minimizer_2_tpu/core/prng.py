"""PRNG discipline: per-index key derivation.

All stochasticity in the framework flows through explicitly threaded
``jax.random`` keys (the reference relies on torch's *global* RNG with no seed
set anywhere — SURVEY.md §7.1). Determinism contract: a fixed seed gives
bit-reproducible results within this framework; byte-equality vs the reference
is proven on the RNG-free convert->minimize sub-pipeline.

The framework-wide discipline is **key-per-index, not key-per-call**: any code
that processes sample i (or batch i) derives its key as ``fold_in(root, i)``
rather than splitting sequentially. This makes results independent of chunk
sizes, shard boundaries, host counts, and retry/resume behavior — sample 173
gets the same latent whether it is decoded in chunk 0 of a 512-chunk
single-host run or chunk 2 of an 8-host pod (pipeline.py), and batch k of an
eval pass sees the same reparameterization noise at any batch size chunking
(eval/metrics.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def key_for_index(key: jax.Array, index) -> jax.Array:
    """The per-index key: fold_in(root, index).

    ``index`` is a global position (sample index, batch ordinal, process
    index) — never a local offset, or two shards would collide.
    """
    return jax.random.fold_in(key, index)


@functools.partial(jax.jit, static_argnames=("latent_dim",))
def draw_latents(key: jax.Array, indices, latent_dim: int) -> jax.Array:
    """z_i ~ N(0, I) for each global sample index i in ``indices``.

    Deterministic per (key, index) — shard/chunk boundaries never change
    results. Module-level jit: one compiled program shared by every pipeline
    invocation and test. Used by the streaming pipeline (pipeline.py) and the
    sharded-sampling tests.
    """
    return jax.vmap(
        lambda i: jax.random.normal(key_for_index(key, i), (latent_dim,))
    )(indices)


def host_shard_key(key: jax.Array, process_index: int) -> jax.Array:
    """Per-host key for host-local randomness (e.g. data augmentation) that
    must differ across processes but be reproducible per host."""
    return key_for_index(key, jnp.asarray(process_index, jnp.int32))
