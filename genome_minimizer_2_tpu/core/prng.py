"""PRNG discipline.

All stochasticity in the framework flows through explicitly threaded
``jax.random`` keys (the reference relies on torch's *global* RNG with no seed
set anywhere — SURVEY.md §7.1). Determinism contract: a fixed seed gives
bit-reproducible results within this framework; byte-equality vs the reference
is proven on the RNG-free convert->minimize sub-pipeline.
"""

from __future__ import annotations

import jax


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def split(key, n: int = 2):
    return jax.random.split(key, n)


def fold(key, data: int):
    return jax.random.fold_in(key, data)
