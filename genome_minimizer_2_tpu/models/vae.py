"""TPU-native MLP VAE.

Same architecture as the reference model (/root/reference/src/
genome_minimizer_2/training/model.py:62-120): encoder = 3 x [Linear ->
BatchNorm -> ReLU], mean/logvar heads, decoder = 3 x [Linear -> BatchNorm ->
ReLU] + Linear -> Sigmoid, Xavier-uniform weights and zero biases — but
implemented as an explicit parameter pytree with pure apply functions, so the
whole forward/backward jits into one XLA program, shards trivially under
pjit, and the hot matmuls can be swapped for Pallas kernels.

TPU-specific design decisions:

- **Logits, not probabilities.** The decoder returns pre-sigmoid logits; the
  BCE loss uses the numerically stable logits form and sampling thresholds
  logits at 0 (== sigmoid(x) > 0.5). Mathematically identical to the
  reference's Sigmoid + BCE, but bf16-safe.
- **Lane padding.** The gene axis (~55,039) is padded to a multiple of 128
  (``padded_dim``). Padded input columns are zero, the corresponding rows of
  the first encoder weight and columns/bias of the final decoder layer are
  initialized to zero, and every feature-axis reduction is masked — so padded
  entries receive exactly zero gradient and the padded model is numerically
  identical to the unpadded one while XLA tiles cleanly onto the MXU.
- **BatchNorm faithful to torch semantics** (momentum 0.1, eps 1e-5, biased
  variance for normalization, unbiased for the running average), carried as an
  explicit ``batch_stats`` pytree instead of module state.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..core.dtypes import Policy, FULL, round_up

Params = Dict[str, Any]
BatchStats = Dict[str, Any]

BN_EPS = 1e-5
BN_MOMENTUM = 0.1  # torch convention: new = (1-m)*running + m*batch


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    input_dim: int           # true number of gene columns (e.g. 55039)
    hidden_dim: int
    latent_dim: int
    pad_features: bool = True
    policy: Policy = FULL

    @property
    def padded_dim(self) -> int:
        return round_up(self.input_dim, 128) if self.pad_features else self.input_dim

    def feature_mask(self) -> jnp.ndarray:
        """(padded_dim,) float32 mask: 1 for real genes, 0 for padding."""
        mask = jnp.zeros(self.padded_dim, jnp.float32)
        return mask.at[: self.input_dim].set(1.0)

    def pad_inputs(self, x: jnp.ndarray) -> jnp.ndarray:
        """Zero-pad (N, input_dim) -> (N, padded_dim)."""
        extra = self.padded_dim - x.shape[-1]
        if extra == 0:
            return x
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, extra)])


# ---------------------------------------------------------------------------
# Initialization (reference parity: model.py:115-120 — Xavier uniform, zero bias)
# ---------------------------------------------------------------------------

def _xavier_uniform(key, shape_io: Tuple[int, int], fan_in: int, fan_out: int):
    """torch.nn.init.xavier_uniform_ with explicit fans.

    Weight stored (in, out) for x @ W; the bound sqrt(6/(fan_in+fan_out)) is
    symmetric in the fans so the layout difference vs torch's (out, in) does
    not change the distribution.
    """
    bound = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape_io, jnp.float32, -bound, bound)


def _linear_init(key, d_in: int, d_out: int, true_in: int | None = None,
                 true_out: int | None = None) -> Params:
    """Linear layer params; the random draw happens at the *true* dims (so a
    padded and an unpadded model initialized from the same key are numerically
    identical), then zero-pads. Padded rows/cols stay exactly zero through
    training (zero grads, sign(0)=0 for L1)."""
    true_in = d_in if true_in is None else true_in
    true_out = d_out if true_out is None else true_out
    w = _xavier_uniform(key, (true_in, true_out), true_in, true_out)
    if true_in < d_in or true_out < d_out:
        w = jnp.pad(w, ((0, d_in - true_in), (0, d_out - true_out)))
    return {"w": w, "b": jnp.zeros((d_out,), jnp.float32)}


def _bn_init(dim: int) -> Tuple[Params, BatchStats]:
    params = {"scale": jnp.ones((dim,), jnp.float32),
              "bias": jnp.zeros((dim,), jnp.float32)}
    stats = {"mean": jnp.zeros((dim,), jnp.float32),
             "var": jnp.ones((dim,), jnp.float32)}
    return params, stats


def init(cfg: VAEConfig, key) -> Tuple[Params, BatchStats]:
    """Build the (params, batch_stats) pytrees."""
    keys = jax.random.split(key, 10)
    D, Dp, H, L = cfg.input_dim, cfg.padded_dim, cfg.hidden_dim, cfg.latent_dim

    enc_layers, enc_stats = [], []
    dims = [(Dp, H, D, H), (H, H, H, H), (H, H, H, H)]
    for i, (di, do, ti, to) in enumerate(dims):
        lin = _linear_init(keys[i], di, do, ti, to)
        bn_p, bn_s = _bn_init(do)
        lin["bn"] = bn_p
        enc_layers.append(lin)
        enc_stats.append(bn_s)

    mean_head = _linear_init(keys[3], H, L)
    logvar_head = _linear_init(keys[4], H, L)

    dec_layers, dec_stats = [], []
    dims = [(L, H, L, H), (H, H, H, H), (H, H, H, H)]
    for i, (di, do, ti, to) in enumerate(dims):
        lin = _linear_init(keys[5 + i], di, do, ti, to)
        bn_p, bn_s = _bn_init(do)
        lin["bn"] = bn_p
        dec_layers.append(lin)
        dec_stats.append(bn_s)
    dec_layers.append(_linear_init(keys[8], H, Dp, H, D))  # output layer, no BN

    params: Params = {
        "encoder": enc_layers,
        "mean": mean_head,
        "logvar": logvar_head,
        "decoder": dec_layers,
    }
    stats: BatchStats = {"encoder": enc_stats, "decoder": dec_stats}
    return params, stats


def param_count(cfg: VAEConfig) -> int:
    """Trainable parameter count at the *true* (unpadded) dims, matching the
    reference's torch model (experiments.py:268-270)."""
    D, H, L = cfg.input_dim, cfg.hidden_dim, cfg.latent_dim
    lin = lambda i, o: i * o + o
    bn = lambda d: 2 * d
    enc = lin(D, H) + bn(H) + 2 * (lin(H, H) + bn(H))
    heads = 2 * lin(H, L)
    dec = lin(L, H) + bn(H) + 2 * (lin(H, H) + bn(H)) + lin(H, D)
    return enc + heads + dec


# ---------------------------------------------------------------------------
# Apply functions
# ---------------------------------------------------------------------------

def _matmul(x, w, policy: Policy):
    """MXU matmul with mixed-precision policy: bf16 operands, f32 accumulate.

    For the float32 policy, force HIGHEST precision — the TPU default would
    silently decompose f32 matmuls into bf16 passes, breaking parity with the
    reference's full-precision training.
    """
    compute = policy.compute_dtype
    precision = None if compute == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    return jnp.dot(
        x.astype(compute),
        w.astype(compute),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _bn_apply(x, bn_params, bn_stats, train: bool):
    """BatchNorm1d with torch semantics. Returns (y, new_stats).

    Train: normalize with biased batch variance; update running stats with
    momentum 0.1 and the *unbiased* variance (torch BatchNorm1d behavior).
    Eval: normalize with running stats.
    """
    if train:
        mean = jnp.mean(x, axis=0)
        var = jnp.mean(jnp.square(x - mean), axis=0)  # biased
        n = x.shape[0]
        unbiased = var * (n / max(n - 1, 1))
        new_stats = {
            "mean": (1 - BN_MOMENTUM) * bn_stats["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * bn_stats["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = bn_stats["mean"], bn_stats["var"]
        new_stats = bn_stats
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (x - mean) * inv * bn_params["scale"] + bn_params["bias"]
    return y, new_stats


def _mlp_block(x, layer, bn_stats, train: bool, policy: Policy):
    """Linear -> BatchNorm -> ReLU (one encoder/decoder block)."""
    h = _matmul(x, layer["w"], policy) + layer["b"]
    h, new_stats = _bn_apply(h, layer["bn"], bn_stats, train)
    return jnp.maximum(h, 0.0), new_stats


def encode(cfg: VAEConfig, params: Params, stats: BatchStats, x, train: bool):
    """x (N, padded_dim) -> (mean, logvar, new_encoder_stats)."""
    new_stats = []
    h = x
    for layer, bn_s in zip(params["encoder"], stats["encoder"]):
        h, s = _mlp_block(h, layer, bn_s, train, cfg.policy)
        new_stats.append(s)
    mean = _matmul(h, params["mean"]["w"], cfg.policy) + params["mean"]["b"]
    logvar = _matmul(h, params["logvar"]["w"], cfg.policy) + params["logvar"]["b"]
    return mean, logvar, new_stats


def decode_hidden(cfg: VAEConfig, params: Params, stats: BatchStats, z, train: bool):
    """Decoder hidden stack only: z -> (h (N, hidden_dim), new_stats).

    Split out so fused output-layer kernels (ops/pallas_kernels.py) can
    consume the hidden activations directly.
    """
    new_stats = []
    h = z
    for layer, bn_s in zip(params["decoder"][:-1], stats["decoder"]):
        h, s = _mlp_block(h, layer, bn_s, train, cfg.policy)
        new_stats.append(s)
    return h, new_stats


def decode_logits(cfg: VAEConfig, params: Params, stats: BatchStats, z, train: bool):
    """z (N, latent_dim) -> (logits (N, padded_dim), new_decoder_stats).

    Logits are pre-sigmoid; apply jax.nn.sigmoid for probabilities, or
    threshold at 0 for the reference's `sigmoid(x) > 0.5` binarization.

    Under the bf16 policy the logits MATERIALIZE at bf16 (the accumulation
    is still f32 in-register; the astype fuses into the matmul epilogue) —
    this tensor and its cotangent dominate activation HBM traffic. Loss
    reductions upcast to f32 elementwise.
    """
    h, new_stats = decode_hidden(cfg, params, stats, z, train)
    out = params["decoder"][-1]
    logits = _matmul(h, out["w"], cfg.policy) + out["b"]
    return logits.astype(cfg.policy.logits_dtype), new_stats


def reparameterize(key, mean, logvar):
    """z = mean + exp(0.5*logvar) * eps, eps ~ N(0, I) (model.py:100-104)."""
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    return mean + std * eps


def forward(cfg: VAEConfig, params: Params, stats: BatchStats, x, key, train: bool):
    """Full VAE forward (model.py:109-113), returning decoder *logits*.

    Returns (logits, mean, logvar, new_batch_stats).
    """
    mean, logvar, enc_stats = encode(cfg, params, stats, x, train)
    z = reparameterize(key, mean, logvar)
    logits, dec_stats = decode_logits(cfg, params, stats, z, train)
    return logits, mean, logvar, {"encoder": enc_stats, "decoder": dec_stats}
