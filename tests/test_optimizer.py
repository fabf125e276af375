"""Fused clip+Adam+apply optimizer vs the optax chain it replaces.

The fused one-pass path (ops/optimizer.py) must be numerically identical to
``optax.chain(clip_by_global_norm(max_norm), scale_by_adam())`` + LR scale +
``apply_updates`` at f32 moment storage — the exact update the trainer uses
on the CPU path (reference semantics: trainer.py:119-123, clip_grad_norm_
then Adam step). With bf16 moment storage the math still runs in f32 and
only the stored moments round.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from genome_minimizer_2_tpu.ops import optimizer as FO
from genome_minimizer_2_tpu.train.trainer import make_optimizer


def _toy_tree(rng, scale=1.0):
    return {
        "big": jnp.asarray(rng.randn(1024, 1024).astype(np.float32) * scale),
        "w": jnp.asarray(rng.randn(40, 7).astype(np.float32) * scale),
        "b": jnp.asarray(rng.randn(7).astype(np.float32) * scale),
    }


@pytest.mark.parametrize("grad_scale", [1e-4, 10.0])  # no-clip and clip paths
def test_fused_matches_optax_chain(grad_scale):
    rng = np.random.RandomState(0)
    params = _toy_tree(rng)
    tx = make_optimizer(max_norm=1.0)
    opt_state = tx.init(params)
    opt_state_f = tx.init(params)
    params_f = params

    for step in range(3):
        grads = _toy_tree(np.random.RandomState(100 + step), grad_scale)
        lr = jnp.asarray(1e-3 * (0.5 ** step), jnp.float32)

        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: (-lr) * u, updates)
        params = optax.apply_updates(params, updates)

        params_f, opt_state_f = FO.fused_clip_adam_apply(
            grads, opt_state_f, params_f, lr, max_norm=1.0)

        adam, adam_f = opt_state[1], opt_state_f[1]
        assert int(adam_f.count) == int(adam.count) == step + 1
        for ours, ref in ((params_f, params), (adam_f.mu, adam.mu),
                          (adam_f.nu, adam.nu)):
            for o, r in zip(jax.tree.leaves(ours), jax.tree.leaves(ref)):
                # identical op order; last-ulp differences remain possible
                # where XLA forms FMAs differently between fusion contexts
                np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                           rtol=1e-5, atol=1e-6)


def test_bf16_moments_round_trip():
    """bf16 moment storage: dtypes preserved through the update, values
    close to the f32-moment path (math runs in f32 either way)."""
    rng = np.random.RandomState(3)
    params = _toy_tree(rng)
    tx = make_optimizer(max_norm=1.0)
    state_f32 = tx.init(params)
    clip, adam = tx.init(params)
    cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
    state_bf16 = (clip, adam._replace(mu=cast(adam.mu), nu=cast(adam.nu)))
    p32, pbf = params, params
    lr = jnp.float32(1e-3)
    for step in range(3):
        grads = _toy_tree(np.random.RandomState(7 + step), 0.5)
        p32, state_f32 = FO.fused_clip_adam_apply(grads, state_f32, p32, lr,
                                                  max_norm=1.0)
        pbf, state_bf16 = FO.fused_clip_adam_apply(grads, state_bf16, pbf, lr,
                                                   max_norm=1.0)
    for leaf in jax.tree.leaves(state_bf16[1].mu) + jax.tree.leaves(
            state_bf16[1].nu):
        assert leaf.dtype == jnp.bfloat16
    for o, r in zip(jax.tree.leaves(pbf), jax.tree.leaves(p32)):
        # params stay f32; moment rounding perturbs the update slightly
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-2, atol=2e-5)
        assert o.dtype == jnp.float32


def test_trainer_gates_fused_optimizer_off_tpu():
    from genome_minimizer_2_tpu.train.trainer import create_trainer
    from genome_minimizer_2_tpu.utils.config import get_v0_config

    cfg = get_v0_config()
    trainer = create_trainer("v0", cfg, input_dim=64)
    if jax.default_backend() != "tpu":
        assert not trainer._use_fused_optimizer()
        # narrow moments require the fused update: off-TPU forces f32
        cfg.adam_state_dtype = "bfloat16"
        assert trainer._moment_dtype() == jnp.float32
    cfg.use_fused_optimizer = False
    assert not trainer._use_fused_optimizer()


def test_trainer_fused_optimizer_gates_on_mesh_platform(monkeypatch):
    """The positive gate: TPU execution (single device or any mesh) selects
    the fused one-pass update; the platform comes from _mesh_platform(), not
    jax.default_backend() (the CLAUDE.md dryrun/mixed-context rule)."""
    from genome_minimizer_2_tpu.train.trainer import VAETrainer, create_trainer
    from genome_minimizer_2_tpu.utils.config import get_v0_config

    cfg = get_v0_config()
    cfg.compute_dtype = "bfloat16"
    trainer = create_trainer("v0", cfg, input_dim=64)
    monkeypatch.setattr(VAETrainer, "_mesh_platform", lambda self: "tpu")

    assert trainer.mesh is None
    assert trainer._use_fused_optimizer()
    assert trainer._moment_dtype() == jnp.bfloat16  # 'auto' follows policy

    class FakeMesh:
        size = 8
    trainer.mesh = FakeMesh()
    assert trainer._use_fused_optimizer()  # jnp path partitions under GSPMD

    trainer.mesh = None
    cfg.adam_state_dtype = "float32"
    assert trainer._moment_dtype() == jnp.float32
    cfg.use_fused_optimizer = False
    assert not trainer._use_fused_optimizer()
