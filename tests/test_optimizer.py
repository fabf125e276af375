"""Fused clip+Adam+apply optimizer vs the optax chain it replaces.

The fused path (ops/optimizer.py) must be numerically identical to
``optax.chain(clip_by_global_norm(max_norm), scale_by_adam())`` + LR scale +
``apply_updates`` — the exact update the trainer uses everywhere else
(reference semantics: trainer.py:119-123, clip_grad_norm_ then Adam step).
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
            grads, opt_state_f, params_f, lr, max_norm=1.0, use_pallas=False)

        adam, adam_f = opt_state[1], opt_state_f[1]
        assert int(adam_f.count) == int(adam.count) == step + 1
        for ours, ref in ((params_f, params), (adam_f.mu, adam.mu),
                          (adam_f.nu, adam.nu)):
            for o, r in zip(jax.tree.leaves(ours), jax.tree.leaves(ref)):
                # identical op order; last-ulp differences remain possible
                # where XLA forms FMAs differently between fusion contexts
                np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                           rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(FO.pltpu is None,
                    reason="pallas TPU backend unavailable on this build")
def test_pallas_kernel_matches_jnp_path_interpret():
    """The Pallas kernel body (interpret mode on CPU) vs the jnp math."""
    rng = np.random.RandomState(1)
    shape = (1024, 1024)  # >= _MIN_PALLAS_ELEMS and tiles cleanly
    g, m, v, p = (jnp.asarray(rng.randn(*shape).astype(np.float32) * s)
                  for s in (3.0, 0.1, 0.01, 1.0))
    v = jnp.abs(v)
    norm = optax.global_norm({"g": g})
    bc1 = jnp.float32(1 - FO.ADAM_B1 ** 5)
    bc2 = jnp.float32(1 - FO.ADAM_B2 ** 5)
    lr = jnp.float32(1e-3)
    scalars = jnp.stack([norm, bc1, bc2, lr]).reshape(1, 4)

    got = FO._fused_leaf_pallas(g, m, v, p, scalars, max_norm=1.0,
                                interpret=True)
    want = FO._adam_math(g, m, v, p, norm, bc1, bc2, lr, max_norm=1.0)
    for o, r in zip(got, want):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=1e-6,
                                   atol=1e-7)


def test_trainer_gates_fused_optimizer_off_tpu():
    from genome_minimizer_2_tpu.train.trainer import create_trainer
    from genome_minimizer_2_tpu.utils.config import get_v0_config

    cfg = get_v0_config()
    trainer = create_trainer("v0", cfg, input_dim=64)
    if jax.default_backend() != "tpu":
        assert not trainer._use_fused_optimizer()
    cfg.use_pallas_optimizer = False
    assert not trainer._use_fused_optimizer()


def test_trainer_fused_optimizer_gates_on_mesh_platform(monkeypatch):
    """The positive gate: a single-device TPU mesh selects the fused path;
    a multi-device TPU mesh deselects it (pallas_call has no GSPMD rule).
    The platform comes from _mesh_platform(), not jax.default_backend()."""
    from genome_minimizer_2_tpu.train.trainer import VAETrainer, create_trainer
    from genome_minimizer_2_tpu.utils.config import get_v0_config

    cfg = get_v0_config()
    trainer = create_trainer("v0", cfg, input_dim=64)
    monkeypatch.setattr(VAETrainer, "_mesh_platform", lambda self: "tpu")

    assert trainer.mesh is None
    assert trainer._use_fused_optimizer()  # mesh=None + tpu platform => True

    class FakeMesh:
        size = 8
    trainer.mesh = FakeMesh()
    assert not trainer._use_fused_optimizer()

    trainer.mesh = None
    cfg.use_pallas_optimizer = False
    assert not trainer._use_fused_optimizer()


def test_leaf_on_pallas_gates_on_executing_platform():
    """_leaf_on_pallas must honor the passed platform (the executing mesh's),
    not jax.default_backend() — the CLAUDE.md dryrun/mixed-context rule."""
    x = jnp.zeros((2048, 1024), jnp.float32)  # tiles cleanly, >= 1M elems
    assert not FO._leaf_on_pallas(x, platform="cpu")
    expected_on_tpu = FO.pltpu is not None
    assert FO._leaf_on_pallas(x, platform="tpu") == expected_on_tpu
