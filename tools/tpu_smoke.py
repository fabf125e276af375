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

    # --- block-gather shuffle kernel vs jnp.take ------------------------
    n, d = 4096, 1408  # 8-divisible rows, 128-aligned cols
    xg = jnp.asarray(rng.randn(n, d).astype(np.float32))
    bidx = jnp.asarray(rng.permutation(n // PK.GATHER_BLOCK).astype(np.int32))
    got = np.asarray(PK.gather_row_blocks(xg, bidx))
    rows = (np.asarray(bidx)[:, None] * PK.GATHER_BLOCK
            + np.arange(PK.GATHER_BLOCK)[None, :]).reshape(-1)
    want = np.asarray(xg)[rows]
    ok = np.array_equal(got, want)
    print(f"gather_row_blocks: bitwise {'OK' if ok else 'FAIL'}")
    failures += not ok

    # --- fused one-pass clip+Adam+apply vs the optax chain, on-chip -----
    import optax

    from genome_minimizer_2_tpu.ops import optimizer as FO
    from genome_minimizer_2_tpu.train.trainer import make_optimizer

    shape = (55040, 64)  # wide-leaf layout at a chip-friendly test size
    tree = {"w": jnp.asarray(rng.randn(*shape).astype(np.float32)),
            "b": jnp.asarray(rng.randn(64).astype(np.float32))}
    grads = jax.tree.map(lambda x: x * 0.1, tree)
    tx = make_optimizer(max_norm=1.0)
    opt_state = tx.init(tree)
    lr = jnp.float32(1e-3)
    got_p, _ = jax.jit(
        lambda g, o, p: FO.fused_clip_adam_apply(g, o, p, lr, max_norm=1.0)
    )(grads, opt_state, tree)
    upd, _ = tx.update(grads, tx.init(tree), tree)
    want_p = optax.apply_updates(tree, jax.tree.map(lambda u: -lr * u, upd))
    errs = [float(jnp.max(jnp.abs(a - b))) for a, b in
            zip(jax.tree.leaves(got_p), jax.tree.leaves(want_p))]
    ok = all(e <= 1e-6 for e in errs)
    print(f"fused_adam_update vs optax: max|diff| = {max(errs):.2e} "
          f"{'OK' if ok else 'FAIL'}")
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
