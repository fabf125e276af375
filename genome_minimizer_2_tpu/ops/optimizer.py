"""Fused clip-by-global-norm + Adam + parameter-apply update.

The reference steps its optimizer through torch's generic Adam
(/root/reference/src/genome_minimizer_2/training/training/trainer.py:119-123:
clip_grad_norm_ then opt.step()). On TPU the v0 step at batch 32 is
HBM-traffic bound, and most of that traffic is optimizer state: for every
parameter element the chain clip -> scale_by_adam -> (-lr) -> apply reads
g, m, v, p and writes m, v, p. This module performs the whole post-norm
update in ONE Pallas pass per large parameter leaf — the minimal 4-read /
3-write HBM traffic — instead of trusting XLA to fuse across the optax
tree.map boundaries.

Numerics are kept exactly equal to the optax chain the trainer otherwise
uses (``optax.chain(clip_by_global_norm(max_norm), scale_by_adam())`` with
the LR applied as a traced scalar):

- global norm:  sqrt(sum of per-leaf sum(g*g)) (optax.global_norm)
- clip:         g                      if norm < max_norm
                (g / norm) * max_norm  otherwise       (that exact op order)
- m' = (1-b1)*g + b1*m ; v' = (1-b2)*g^2 + b2*v
- update = (m'/(1-b1^t)) / (sqrt(v'/(1-b2^t)) + eps)   (eps_root = 0)
- p' = p + (-lr)*update

Small leaves (biases, BatchNorm, latent heads) go through the identical jnp
formula — XLA fuses those fine; only the >=1M-element matrices (the two
55k-wide layers and the hidden blocks, ~98% of all parameter bytes) run the
Pallas kernel. The optax ``(EmptyState, ScaleByAdamState)`` state structure
is preserved bit-for-bit, so checkpoints and resume are interchangeable
between the fused and unfused paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on CPU-only builds
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

ADAM_B1, ADAM_B2, ADAM_EPS = 0.9, 0.999, 1e-8

# Only leaves at least this many elements take the Pallas path; the rest are
# plain jnp (identical math) fused by XLA.
_MIN_PALLAS_ELEMS = 1 << 20
_LANE = 1024  # reshape target: (rows, 1024) f32 tiles
_BLOCK_M = 128  # 0.5 MB per ref per block; 7 refs double-buffered ~= 7 MB VMEM


def _adam_math(g, m, v, p, norm, bc1, bc2, lr, *, max_norm):
    """The shared elementwise update — used verbatim by both the Pallas
    kernel body and the jnp fallback so the two paths cannot diverge."""
    g = jnp.where(norm < max_norm, g, (g / norm) * max_norm)
    m_new = (1.0 - ADAM_B1) * g + ADAM_B1 * m
    v_new = (1.0 - ADAM_B2) * (g * g) + ADAM_B2 * v
    update = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + ADAM_EPS)
    p_new = p + (-lr) * update
    return m_new, v_new, p_new


def _adam_kernel(g_ref, m_ref, v_ref, p_ref, s_ref, mo_ref, vo_ref, po_ref,
                 *, max_norm: float):
    norm, bc1, bc2, lr = s_ref[0, 0], s_ref[0, 1], s_ref[0, 2], s_ref[0, 3]
    m_new, v_new, p_new = _adam_math(
        g_ref[:], m_ref[:], v_ref[:], p_ref[:], norm, bc1, bc2, lr,
        max_norm=max_norm)
    mo_ref[:] = m_new
    vo_ref[:] = v_new
    po_ref[:] = p_new


def _pallas_shape(x) -> tuple[int, int] | None:
    """(rows, _LANE) view of a leaf if it tiles cleanly, else None."""
    n = x.size
    if n % _LANE:
        return None
    rows = n // _LANE
    if rows % _BLOCK_M:
        return None
    return rows, _LANE


@functools.partial(jax.jit, static_argnames=("max_norm", "interpret"))
def _fused_leaf_pallas(g, m, v, p, scalars, *, max_norm: float,
                       interpret: bool = False):
    if pltpu is None:  # pallas TPU backend absent on this build
        raise RuntimeError(
            "jax.experimental.pallas.tpu unavailable — the fused Adam kernel "
            "cannot run; callers must gate on _leaf_on_pallas()")
    rows, lane = _pallas_shape(g)
    g2, m2, v2, p2 = (x.reshape(rows, lane) for x in (g, m, v, p))
    grid = (rows // _BLOCK_M,)
    spec = pl.BlockSpec((_BLOCK_M, lane), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_adam_kernel, max_norm=max_norm),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, lane), jnp.float32) for _ in range(3)),
        grid=grid,
        in_specs=[spec, spec, spec, spec,
                  pl.BlockSpec((1, 4), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=(spec, spec, spec),
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=interpret,
    )(g2, m2, v2, p2, scalars)
    return tuple(o.reshape(g.shape) for o in out)


def _leaf_on_pallas(x, platform: str | None = None) -> bool:
    """Whether this leaf takes the Pallas kernel.

    ``platform`` is the platform of the devices that will EXECUTE (the
    trainer passes its mesh's platform) — gating on jax.default_backend()
    would silently skip the kernel in mixed setups where a TPU mesh executes
    under a CPU default platform (CLAUDE.md dryrun/mixed-context rule).
    """
    if platform is None:
        platform = jax.default_backend()
    return (pltpu is not None and platform == "tpu"
            and x.size >= _MIN_PALLAS_ELEMS
            and x.dtype == jnp.float32 and _pallas_shape(x) is not None)


def fused_clip_adam_apply(grads, opt_state, params, lr, *, max_norm: float,
                          use_pallas: bool = True, platform: str | None = None):
    """One-pass replacement for ``tx.update`` + LR scale + ``apply_updates``.

    Args:
      grads/params: matching pytrees of f32 leaves.
      opt_state: the ``optax.chain(clip_by_global_norm, scale_by_adam)``
        state — ``(EmptyState, ScaleByAdamState(count, mu, nu))``.
      lr: traced scalar learning rate (StepLR applied by the caller).
      max_norm: static clip threshold.
      use_pallas: route big leaves through the fused kernel (TPU); the jnp
        path (same math) is used otherwise and for small/odd-shaped leaves.

    Returns ``(new_params, new_opt_state)`` with the optax state structure
    preserved (checkpoint-compatible with the unfused path).
    """
    clip_state, adam = opt_state
    count_inc = optax.safe_increment(adam.count)
    norm = optax.global_norm(grads)
    bc1 = (1 - ADAM_B1 ** count_inc).astype(jnp.float32)
    bc2 = (1 - ADAM_B2 ** count_inc).astype(jnp.float32)
    lr = jnp.asarray(lr, jnp.float32)
    scalars = jnp.stack([norm.astype(jnp.float32), bc1, bc2, lr]).reshape(1, 4)

    g_leaves, treedef = jax.tree.flatten(grads)
    m_leaves = treedef.flatten_up_to(adam.mu)
    v_leaves = treedef.flatten_up_to(adam.nu)
    p_leaves = treedef.flatten_up_to(params)

    new_m, new_v, new_p = [], [], []
    for g, m, v, p in zip(g_leaves, m_leaves, v_leaves, p_leaves):
        if use_pallas and _leaf_on_pallas(g, platform):
            mn, vn, pn = _fused_leaf_pallas(g, m, v, p, scalars,
                                            max_norm=max_norm)
        else:
            mn, vn, pn = _adam_math(g, m, v, p, norm, bc1, bc2, lr,
                                    max_norm=max_norm)
        new_m.append(mn)
        new_v.append(vn)
        new_p.append(pn)

    new_adam = adam._replace(count=count_inc,
                             mu=jax.tree.unflatten(treedef, new_m),
                             nu=jax.tree.unflatten(treedef, new_v))
    return jax.tree.unflatten(treedef, new_p), (clip_state, new_adam)
