"""Dtype policy for TPU compute.

The reference trains everything in float32 (torch default). On TPU the MXU
gives ~2x matmul throughput in bfloat16, so the policy here is:

- parameters and optimizer state in float32 (master weights),
- matmul operands cast to a configurable ``compute`` dtype (bf16 on TPU),
- matmul accumulation always in float32 (``preferred_element_type``),
- losses/reductions in float32.

``Policy('float32')`` reproduces reference-style full-precision training (the
default for CPU tests); ``Policy('bfloat16')`` is the TPU fast path.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    compute: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.compute)

    @property
    def param_dtype(self):
        return jnp.float32

    @property
    def logits_dtype(self):
        """Storage dtype for the (B, ~55k) decoder logits.

        bf16 under the mixed policy: the matmul still accumulates f32
        in-register; only the HBM materialization narrows. The logits tensor
        and its cotangent are the largest activations in the step — f32
        storage costs ~2.7 GB/step of HBM traffic at bs=2048.
        """
        return self.compute_dtype

    def cast_compute(self, x):
        return x.astype(self.compute_dtype)


FULL = Policy("float32")
MIXED = Policy("bfloat16")


def resolve_compute_dtype(name: str, platform: str | None = None) -> str:
    """Resolve a configured compute dtype, where ``"auto"`` means bfloat16 on
    TPU and float32 elsewhere. ``platform`` should be the platform of the
    devices that will EXECUTE (a mesh's, when training over one) — not
    necessarily ``jax.default_backend()``."""
    if name != "auto":
        return name
    if platform is None:
        import jax

        platform = jax.default_backend()
    return "bfloat16" if platform == "tpu" else "float32"


def resolve_policy(name: str, platform: str | None = None) -> Policy:
    return Policy(resolve_compute_dtype(name, platform))


def round_up(x: int, multiple: int) -> int:
    """Round ``x`` up to the nearest multiple (TPU lane/sublane alignment)."""
    return ((x + multiple - 1) // multiple) * multiple
