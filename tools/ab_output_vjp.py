#!/usr/bin/env python3
"""A/B: recompute-in-backward output layer + BCE (round-2 VERDICT next #2).

The bs=2048 step's last measured non-optimizer stream is the (B, 55k) bf16
logits tensor's backward round-trip (~2.3 ms/step, BASELINE.md roofline
table): AD saves the logits as a residual (write+read 225 MB) before the
dlogits = (sigmoid(l) - x) cotangent (another 225 MB write + 2 reads by the
dW/dh dots). Two candidates to kill the residual leg:

  B  custom VJP over [output matmul -> stable BCE]: forward computes the
     reduction straight off the dot (XLA epilogue fusion, logits never
     stored); backward RECOMPUTES logits from the saved (B, 1024) hidden
     activations — trading the 450 MB residual round-trip for an extra
     2*B*H*D = 231 GFLOP MXU pass.
  C  jax.checkpoint around the output matmul (same recompute, derived by
     AD instead of hand-written).

Arithmetic predicts a LOSS (~0.6 ms saved streaming vs ~1.2+ ms recompute
at MXU peak); this probe records the on-chip verdict inside the REAL
production epoch program (shuffle + optimizer included, profile_train.py production
harness) plus an isolated [output+BCE] fwd+bwd microbench for the
bytes/step attribution.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from genome_minimizer_2_tpu.models import vae
from genome_minimizer_2_tpu.ops import losses as L

# round-5: batch/n_train are CLI args — the round-3 verdict was taken at
# bs2048 where the residual-vs-recompute decision hinged on overlap ratios
# that change 4x at the bs8192 production optimum (round-4 VERDICT next #1)
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
N_TRAIN = int(sys.argv[2]) if len(sys.argv) > 2 else 4 * BATCH
STEPS = N_TRAIN // BATCH


# ---------------------------------------------------------------------------
# Variant B: hand-written recompute VJP
# ---------------------------------------------------------------------------

@jax.custom_vjp
def output_bce(h, w, b, x, mask):
    """sum BCE(sigmoid(h @ w + b), x), masked — logits never saved."""
    l = jnp.dot(h.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    l = (l + b.astype(jnp.float32)).astype(jnp.float32)
    per = jnp.logaddexp(0.0, l) - l * x.astype(jnp.float32)
    return jnp.sum(per * mask)


def _output_bce_fwd(h, w, b, x, mask):
    return output_bce(h, w, b, x, mask), (h, w, b, x, mask)


def _output_bce_bwd(res, g):
    h, w, b, x, mask = res
    l = jnp.dot(h.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    l = (l + b.astype(jnp.float32)).astype(jnp.float32)
    dl = ((jax.nn.sigmoid(l) - x.astype(jnp.float32)) * mask * g)
    dl16 = dl.astype(jnp.bfloat16)
    dh = jnp.dot(dl16, w.astype(jnp.bfloat16).T,
                 preferred_element_type=jnp.float32).astype(h.dtype)
    dw = jnp.dot(h.astype(jnp.bfloat16).T, dl16,
                 preferred_element_type=jnp.float32)
    db = jnp.sum(dl, axis=0)
    return dh, dw.astype(w.dtype), db.astype(b.dtype), \
        jnp.zeros_like(x), jnp.zeros_like(mask)


output_bce.defvjp(_output_bce_fwd, _output_bce_bwd)


def make_loss_fn(variant: str):
    """Replacement VAETrainer._loss_fn computing the v0 bundle (BCE + KL)
    with the chosen output-layer treatment."""

    def loss_fn(self, params, batch_stats, batch, key, epoch, counter, train):
        cfg = self.model_cfg
        mean, logvar, enc_stats = vae.encode(cfg, params, batch_stats, batch,
                                             train)
        z = vae.reparameterize(key, mean, logvar)
        h, dec_stats = vae.decode_hidden(cfg, params, batch_stats, z, train)
        out = params["decoder"][-1]
        mask = cfg.feature_mask()
        if variant == "B":
            bce = output_bce(h, out["w"], out["b"], batch, mask)
        else:  # variant C: remat the output matmul, BCE on the rematted l

            @functools.partial(jax.checkpoint,
                               policy=jax.checkpoint_policies.nothing_saveable)
            def _logits(h_):
                l = jnp.dot(h_.astype(jnp.bfloat16),
                            out["w"].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                return (l + out["b"].astype(jnp.float32)).astype(jnp.bfloat16)

            bce = L.bce_sum_logits(_logits(h), batch, mask)
        beta = L.beta_schedule(self.spec, epoch, counter)
        kl = beta * L.kl_divergence(mean, logvar)
        total = bce + kl
        comps = {L.RECONSTRUCTION: bce, L.KL_DIVERGENCE: kl, L.TOTAL: total}
        return total, (comps, {"encoder": enc_stats, "decoder": dec_stats})

    return loss_fn


# ---------------------------------------------------------------------------


def run_epoch(tag, trainer, data):
    epoch_fn = trainer._get_epoch_fn(N_TRAIN, train=True)
    e = jnp.asarray(0, jnp.int32)
    lr = jnp.asarray(1e-3, jnp.float32)
    st = trainer.init_state()
    t0 = time.perf_counter()
    st, sums = epoch_fn(st, data, e, lr)
    loss0 = float(sums["total"])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(6):
        st, sums = epoch_fn(st, data, e, lr)
    float(sums["total"])
    dt = (time.perf_counter() - t0) / 6 / STEPS
    eps = BATCH / dt
    print(f"{tag:<34s} {dt * 1e3:8.2f} ms/step {eps:10,.0f} ex/s "
          f"{eps * 0.7e9 / 1e12:6.1f} TF loss0={loss0:.1f} "
          f"[compile {compile_s:.0f}s]", flush=True)
    return dt


def micro(tag, fn, args):
    # operands (incl. the (B, 55k) batch) are explicit jit ARGUMENTS — a
    # closure would embed them as HLO constants, and at bs8192 the 450 MB
    # literal exceeds the remote-compile service's request size limit
    f = jax.jit(jax.value_and_grad(fn, argnums=(0, 1, 2)))
    (v, _) = f(*args)
    float(v)
    t0 = time.perf_counter()
    for _ in range(20):
        v, g = f(*args)
    float(v), float(g[2][0])
    dt = (time.perf_counter() - t0) / 20
    print(f"micro {tag:<28s} {dt * 1e3:8.2f} ms fwd+bwd", flush=True)
    return dt


def main():
    from bench import _make_trainer
    from genome_minimizer_2_tpu.train import trainer as T

    def data_for(trainer):
        Dp = trainer.model_cfg.padded_dim
        dt = trainer.model_cfg.policy.compute_dtype

        @jax.jit
        def gen(key):
            x = jax.random.bernoulli(key, 0.5, (N_TRAIN, 55039)).astype(dt)
            return jnp.pad(x, ((0, 0), (0, Dp - 55039)))

        return gen(jax.random.key(0))

    t = _make_trainer(BATCH)
    data = data_for(t)

    # isolated [output layer + BCE] fwd+bwd: the segment under test
    cfg = t.model_cfg
    H, Dp = cfg.hidden_dim, cfg.padded_dim
    kh, kw, kx = jax.random.split(jax.random.key(0), 3)
    h = jax.random.normal(kh, (BATCH, H), jnp.bfloat16)
    w = jax.random.normal(kw, (H, Dp), jnp.float32) * 0.02
    b = jnp.zeros((Dp,), jnp.float32)
    x = jax.random.bernoulli(kx, 0.5, (BATCH, Dp)).astype(jnp.bfloat16)
    mask = cfg.feature_mask()

    def seg_A(h, w, b, x, mask):
        l = jnp.dot(h.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        l = (l + b).astype(jnp.bfloat16)
        return L.bce_sum_logits(l, x, mask)

    micro("A jnp (AD residual)", seg_A, (h, w, b, x, mask))
    micro("B custom recompute VJP", output_bce, (h, w, b, x, mask))

    def seg_C(h, w, b, x, mask):
        @functools.partial(jax.checkpoint,
                           policy=jax.checkpoint_policies.nothing_saveable)
        def _l(h_):
            l = jnp.dot(h_.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            return (l + b).astype(jnp.bfloat16)

        return L.bce_sum_logits(_l(h), x, mask)

    micro("C remat output matmul", seg_C, (h, w, b, x, mask))

    # full production epoch A/B
    run_epoch("A production (jnp loss)", t, data)
    tB = _make_trainer(BATCH)
    tB._loss_fn = make_loss_fn("B").__get__(tB, T.VAETrainer)
    run_epoch("B recompute custom VJP", tB, data)
    tC = _make_trainer(BATCH)
    tC._loss_fn = make_loss_fn("C").__get__(tC, T.VAETrainer)
    run_epoch("C remat output matmul", tC, data)


if __name__ == "__main__":
    main()
