#!/usr/bin/env python3
"""TPU smoke-check: bit/numeric comparison of the compiled Pallas kernels
against their jnp reference implementations ON THE REAL CHIP, plus a packed
vs dense sampling identity check. (The pytest suite runs CPU-only, where the
kernels fall back to the references — this script is the hardware check.)

Run: python tools/tpu_smoke.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def main():
    from genome_minimizer_2_tpu.models import vae
    from genome_minimizer_2_tpu.ops import pallas_kernels as PK
    from genome_minimizer_2_tpu.sample.sampler import Sampler
    from genome_minimizer_2_tpu.core.dtypes import Policy

    backend = jax.default_backend()
    print(f"backend: {backend}, devices: {jax.devices()}")
    assert backend == "tpu", "run this on the TPU host"

    rng = np.random.RandomState(0)
    failures = 0

    # --- matmul_bias_act vs reference (bf16) ---------------------------
    x = rng.randn(200, 256).astype(np.float32)
    w = rng.randn(256, 1000).astype(np.float32)
    b = rng.randn(1000).astype(np.float32)
    ours = np.asarray(PK.matmul_bias_act(jnp.asarray(x), jnp.asarray(w),
                                         jnp.asarray(b), relu=True))
    ref = np.asarray(PK.matmul_bias_act_reference(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), relu=True))
    err = np.abs(ours - ref).max()
    ok = err <= 1e-2 * max(1.0, np.abs(ref).max())
    print(f"matmul_bias_act: max|diff|={err:.3e} {'OK' if ok else 'FAIL'}")
    failures += not ok

    # --- decode_threshold_pack vs reference ----------------------------
    h = rng.randn(300, 512).astype(np.float32)
    w2 = (rng.randn(512, 55039).astype(np.float32) * 0.05)
    b2 = rng.randn(55039).astype(np.float32) * 0.1
    packed = np.asarray(PK.decode_threshold_pack(
        jnp.asarray(h), jnp.asarray(w2), jnp.asarray(b2)))
    ref_packed = np.asarray(PK.decode_threshold_pack_reference(
        jnp.asarray(h), jnp.asarray(w2), jnp.asarray(b2)))[:, :packed.shape[1]]
    mismatch = int((packed != ref_packed).sum())
    # bf16 rounding near the threshold can flip a handful of borderline bits
    total_bits = packed.size * 8
    ok = mismatch <= total_bits * 1e-5
    print(f"decode_threshold_pack: {mismatch}/{packed.size} bytes differ "
          f"{'OK' if ok else 'FAIL'}")
    failures += not ok

    # --- fused BCE+colsum kernel vs reference (multi-row-tile path) ----
    Bm, Dm = 256, 55040
    logits = jnp.asarray(rng.randn(Bm, Dm).astype(np.float32))
    targets = jnp.asarray((rng.rand(Bm, Dm) < 0.5).astype(np.float32))
    mask = jnp.ones(Dm).at[55039:].set(0.0)
    bce_k, col_k = PK._bce_colsum_impl(logits, targets, mask)
    bce_r, col_r = PK._bce_colsum_reference(logits, targets, mask)
    e1 = abs(float(bce_k) - float(bce_r)) / abs(float(bce_r))
    e2 = float(jnp.max(jnp.abs(col_k - col_r)))
    ok = e1 < 1e-5 and e2 < 1e-2
    print(f"bce_and_colsum: rel_bce={e1:.2e} max|col diff|={e2:.2e} "
          f"{'OK' if ok else 'FAIL'}")
    failures += not ok

    # --- fused-loss gradient through the train step --------------------
    def loss_fused(l):
        bce, col = PK.bce_and_colsum(l, targets, mask)
        return bce + 0.1 * jnp.sum(jnp.abs(col))

    def loss_ref(l):
        bce, col = PK._bce_colsum_reference(l, targets, mask)
        return bce + 0.1 * jnp.sum(jnp.abs(col))

    g_f = jax.grad(loss_fused)(logits)
    g_r = jax.grad(loss_ref)(logits)
    gerr = float(jnp.max(jnp.abs(g_f - g_r)))
    ok = gerr < 1e-4
    print(f"bce_and_colsum grad: max|diff|={gerr:.2e} {'OK' if ok else 'FAIL'}")
    failures += not ok

    # --- fused clip+Adam+apply kernel vs the jnp math -------------------
    from genome_minimizer_2_tpu.ops import optimizer as FO

    shape = (55040, 1024)  # the flagship wide-layer leaf
    g = jnp.asarray(rng.randn(*shape).astype(np.float32))
    m = jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.1)
    v = jnp.abs(jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.01))
    p = jnp.asarray(rng.randn(*shape).astype(np.float32))
    norm = jnp.sqrt(jnp.sum(g * g))
    scalars = jnp.stack([norm, jnp.float32(1 - 0.9 ** 3),
                         jnp.float32(1 - 0.999 ** 3),
                         jnp.float32(1e-3)]).reshape(1, 4)
    got = FO._fused_leaf_pallas(g, m, v, p, scalars, max_norm=1.0)
    want = FO._adam_math(g, m, v, p, norm, scalars[0, 1], scalars[0, 2],
                         scalars[0, 3], max_norm=1.0)
    errs = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(got, want)]
    scale = [float(jnp.max(jnp.abs(b))) for b in want]
    ok = all(e <= 1e-6 * max(1.0, s) for e, s in zip(errs, scale))
    print(f"fused_adam_update: max|diff| m/v/p = "
          f"{errs[0]:.2e}/{errs[1]:.2e}/{errs[2]:.2e} {'OK' if ok else 'FAIL'}")
    failures += not ok

    # --- sampler packed path vs dense logits path ----------------------
    cfg = vae.VAEConfig(input_dim=55039, hidden_dim=512, latent_dim=32,
                        policy=Policy("bfloat16"))
    params, stats = vae.init(cfg, jax.random.key(0))
    s = Sampler(cfg=cfg, params=params, batch_stats=stats, chunk_size=256)
    z = np.asarray(jax.random.normal(jax.random.key(1), (256, 32)))
    packed_bits = s.decode_binary(z)
    dense = s._decode_chunked(z, s._decode_binary)
    mism = int((packed_bits != dense).sum())
    ok = mism <= packed_bits.size * 1e-5
    print(f"sampler packed vs dense: {mism}/{packed_bits.size} mismatched bits "
          f"{'OK' if ok else 'FAIL'}")
    failures += not ok

    print("SMOKE", "PASS" if failures == 0 else f"FAIL ({failures})")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
