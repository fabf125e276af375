"""VAE loss components as pure functions.

Functional re-design of the reference's LossComponent class hierarchy
(/root/reference/src/genome_minimizer_2/training/training/loss_components.py:16-202).
Instead of stateful objects calling ``.item()`` per batch (a device sync the
TPU path must avoid — trainer.py:53), each component is a pure function of
``(params, logits, data, mu, logvar, epoch, counter)`` and the whole bundle
jits into the training step; per-component scalars are accumulated on-device.

Faithfully reproduced semantics, including the quirks:

- reconstruction: BCE summed over all elements (loss_components.py:50), here in
  the numerically stable logits form (identical for |logit| < ~100; torch
  clamps per-element log at -100 which only differs in hard saturation);
- KL: -0.5 * sum(1 + logvar - mu^2 - exp(logvar)) with linear / cosine /
  constant beta schedules (loss_components.py:77-88). The cosine schedule uses
  ``t = epoch*32 + counter`` where the counter increments on *every* loss
  evaluation including validation batches (loss_components.py:82-84) — the
  counter is carried in the train state and threaded in;
- gene abundance: weight * gamma * sum(|sum_batch(recon_probs)|) with linear
  gamma annealing (loss_components.py:111-115);
- L1/L2 over all trainable parameters (loss_components.py:167-184, 154-161).

Feature-axis reductions are masked so lane padding (models/vae.py) contributes
exactly zero.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

RECONSTRUCTION = "reconstruction"
KL_DIVERGENCE = "kl_divergence"
GENE_ABUNDANCE = "gene_abundance"
L1_REGULARIZATION = "l1_regularization"
L2_REGULARIZATION = "l2_regularization"
TOTAL = "total"


@dataclasses.dataclass(frozen=True)
class LossSpec:
    """Static description of the active loss components for one trainer preset."""

    n_epochs: int
    # KL
    scheduler_type: str = "linear"  # 'linear' | 'cosine' | 'constant'
    min_beta: float = 0.0
    max_beta: float = 1.0
    T: int = 10
    # abundance
    use_abundance: bool = False
    gamma_start: float = 0.0
    gamma_end: float = 1.0
    weight: float = 1.0
    # regularization
    lambda_l1: float = 0.0
    use_l1: bool = False
    lambda_l2: float = 0.0
    use_l2: bool = False

    def component_names(self) -> tuple[str, ...]:
        names = [RECONSTRUCTION, KL_DIVERGENCE]
        if self.use_abundance:
            names.append(GENE_ABUNDANCE)
        if self.use_l1:
            names.append(L1_REGULARIZATION)
        if self.use_l2:
            names.append(L2_REGULARIZATION)
        names.append(TOTAL)
        return tuple(names)


def spec_for_preset(version: str, cfg) -> LossSpec:
    """Loss bundle per trainer preset (reference: trainer.py:193-257).

    ``cfg`` is an ExperimentConfig; min_beta/max_beta map to beta_start/
    beta_end for the linear presets exactly as the reference wires them
    (experiments.py:280-309).
    """
    common = dict(n_epochs=cfg.n_epochs, min_beta=cfg.min_beta, max_beta=cfg.max_beta)
    if version == "v0":
        return LossSpec(scheduler_type="linear", **common)
    if version == "v1":
        return LossSpec(
            scheduler_type="linear", use_abundance=True,
            gamma_start=cfg.gamma_start, gamma_end=cfg.gamma_end,
            use_l1=True, lambda_l1=cfg.lambda_l1, **common)
    if version == "v2":
        return LossSpec(
            scheduler_type="cosine", T=10, use_abundance=True,
            gamma_start=cfg.gamma_start, gamma_end=cfg.gamma_end,
            use_l1=True, lambda_l1=cfg.lambda_l1, **common)
    if version == "v3":
        return LossSpec(
            scheduler_type="cosine", T=50, use_abundance=True,
            gamma_start=cfg.gamma_start, gamma_end=cfg.gamma_end,
            weight=cfg.weight, use_l1=True, lambda_l1=cfg.lambda_l1, **common)
    raise ValueError(f"Unknown trainer version: {version}")


# ---------------------------------------------------------------------------
# Components
# ---------------------------------------------------------------------------

def bce_sum_logits(logits, targets, feature_mask) -> jnp.ndarray:
    """sum BCE(sigmoid(logits), targets) — stable logits form, masked.

    softplus(l) - l*y  ==  -[y*log(sigmoid(l)) + (1-y)*log(1-sigmoid(l))]

    Elementwise math in f32 even when logits/targets are stored bf16 (the
    casts fuse into this reduction — no extra HBM traffic).
    """
    logits = logits.astype(jnp.float32)
    per_elem = jnp.logaddexp(0.0, logits) - logits * targets.astype(jnp.float32)
    return jnp.sum(per_elem * feature_mask)


def kl_divergence(mu, logvar) -> jnp.ndarray:
    """-0.5 * sum(1 + logvar - mu^2 - exp(logvar)) (loss_components.py:77)."""
    return -0.5 * jnp.sum(1.0 + logvar - jnp.square(mu) - jnp.exp(logvar))


def cosine_annealing_schedule(t, T, min_beta, max_beta):
    """Reference cosine schedule (loss_components.py:187-202)."""
    return min_beta + (max_beta - min_beta) / 2.0 * (1.0 + jnp.cos(jnp.pi * (t % T) / T))


def beta_schedule(spec: LossSpec, epoch, counter):
    """Beta at (epoch, counter). ``counter`` is the per-loss-call counter the
    reference increments in KLDivergenceLoss.compute_loss (loss_components.py:82-84)."""
    if spec.scheduler_type == "linear":
        return spec.min_beta + (spec.max_beta - spec.min_beta) * epoch / spec.n_epochs
    if spec.scheduler_type == "cosine":
        t = epoch * 32 + counter
        return cosine_annealing_schedule(t, spec.T, spec.min_beta, spec.max_beta)
    return jnp.asarray(spec.max_beta, jnp.float32)


def gamma_schedule(spec: LossSpec, epoch):
    return spec.gamma_start + (spec.gamma_end - spec.gamma_start) * epoch / spec.n_epochs


def gene_abundance(logits, feature_mask) -> jnp.ndarray:
    """sum(|sum over batch of recon probabilities|) (loss_components.py:113-114).

    recon probs are non-negative so the abs is a no-op, but kept for parity.
    """
    probs = jax.nn.sigmoid(logits.astype(jnp.float32)) * feature_mask
    total_gene_number = jnp.sum(probs, axis=0)
    return jnp.sum(jnp.abs(total_gene_number))


def _abs_torch_subgrad(x):
    """|x| with d|x|/dx = sign(x) and sign(0) = 0 (torch's subgradient).

    JAX's jnp.abs uses derivative 1 at x == 0, which would push zero-initialized
    biases (and the inert padding rows) off zero under L1. Value is identical;
    only the x == 0 cotangent differs.
    """
    return x * jnp.sign(jax.lax.stop_gradient(x))


def l1_penalty(params) -> jnp.ndarray:
    """sum |p| over all trainable params (loss_components.py:181-184).

    Padded rows/cols are exactly zero and sign(0)=0, so padding neither
    contributes to the penalty nor receives gradient.
    """
    leaves = jax.tree_util.tree_leaves(params)
    return sum(jnp.sum(_abs_torch_subgrad(p)) for p in leaves)


def l2_penalty(params) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(params)
    return sum(jnp.sum(jnp.square(p)) for p in leaves)


def compute_losses(
    spec: LossSpec,
    params,
    logits,
    data,
    mu,
    logvar,
    epoch,
    counter,
    feature_mask,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total loss + per-component dict for one batch (LossTracker.compute_total_loss,
    trainer.py:44-56 — without the per-batch host sync).

    Pure jnp by design: XLA fuses the BCE reduction into the output matmul's
    epilogue on TPU — the logits never materialize in the forward pass. A
    hand-written Pallas BCE(+colsum) kernel with a closed-form VJP was
    measured 12% SLOWER inside the bs=2048 step (100.8 vs 112.7 TFLOPs,
    tools/profile_train.py production) because its custom-call boundary forces the
    logits into HBM; it was removed in round 2.
    """
    comps: Dict[str, jnp.ndarray] = {}
    comps[RECONSTRUCTION] = bce_sum_logits(logits, data, feature_mask)
    beta = beta_schedule(spec, epoch, counter)
    comps[KL_DIVERGENCE] = beta * kl_divergence(mu, logvar)
    if spec.use_abundance:
        gamma = gamma_schedule(spec, epoch)
        comps[GENE_ABUNDANCE] = (spec.weight * gamma
                                 * gene_abundance(logits, feature_mask))
    if spec.use_l1:
        # lambda is static: skip the penalty entirely when 0 (the reference
        # returns a constant 0 tensor then — loss_components.py:134-136)
        comps[L1_REGULARIZATION] = (
            jnp.asarray(0.0, jnp.float32) if spec.lambda_l1 == 0.0
            else spec.lambda_l1 * l1_penalty(params)
        )
    if spec.use_l2:
        comps[L2_REGULARIZATION] = (
            jnp.asarray(0.0, jnp.float32) if spec.lambda_l2 == 0.0
            else spec.lambda_l2 * l2_penalty(params)
        )
    total = jnp.asarray(0.0, jnp.float32)
    for v in comps.values():
        total = total + v
    comps[TOTAL] = total
    return total, comps
