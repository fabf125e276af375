"""Checkpoint save/load.

The reference saves only ``model.state_dict()`` (experiments.py:322-325) and
then *infers the architecture from the checkpoint filename* at sampling time
(main.py:288-319, with a latent `model_name` NameError when the config IS
present). Here every checkpoint stores params + batch_stats + the full
experiment config + PRNG state, so loading never guesses.

Format: a single ``.npz`` with '/'-joined pytree paths plus a JSON config
blob — dependency-free and portable across hosts. Checkpoints are written
from host 0 only under multi-host; resume is supported (the reference is
save-only).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Tuple

import jax
import numpy as np

from .config import ExperimentConfig

_CONFIG_KEY = "__config_json__"


def _to_host(leaf) -> np.ndarray:
    """Materialize a leaf on this host.

    A leaf sharded ACROSS processes (cross-process tensor parallelism —
    parallel/mesh.py shards the wide layers' gene axis over the global mesh)
    is not fully addressable from any one host; gather it collectively.
    Every process must call this (it is a collective), even though only
    host 0 writes the file.
    """
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(leaf, tiled=True))
    return np.asarray(leaf)


def _flatten(tree: Any, prefix: str) -> Dict[str, np.ndarray]:
    flat = {}
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_paths:
        key = prefix + "/".join(_path_str(p) for p in path)
        flat[key] = _to_host(leaf)
    return flat


def _write_npz(path: Path, arrays: Dict[str, np.ndarray]) -> None:
    """Host-0-only atomic write: tmp file + rename, so a host lost mid-save
    never leaves a truncated checkpoint (restart-after-failure reads either
    the previous complete checkpoint or the new complete one)."""
    if jax.process_index() != 0:
        return
    path.parent.mkdir(parents=True, exist_ok=True)
    if path.suffix != ".npz":  # np.savez's extension coercion
        path = path.with_name(path.name + ".npz")
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _path_str(entry) -> str:
    if hasattr(entry, "key"):
        return str(entry.key)
    if hasattr(entry, "idx"):
        return str(entry.idx)
    return str(entry)


def save_checkpoint(
    path: str | Path,
    params: Any,
    batch_stats: Any,
    config: ExperimentConfig,
    extra: Dict[str, Any] | None = None,
) -> None:
    # NB: _flatten is collective under cross-process sharding — every
    # process runs it; only host 0 writes (enforced in _write_npz).
    arrays = {}
    arrays.update(_flatten(params, "params/"))
    arrays.update(_flatten(batch_stats, "batch_stats/"))
    meta = {"config": config.to_dict(), "extra": extra or {}}
    arrays[_CONFIG_KEY] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    _write_npz(Path(path), arrays)


def load_checkpoint(path: str | Path) -> Tuple[Dict, Dict, ExperimentConfig, Dict]:
    """Returns (flat_params, flat_batch_stats, config, extra).

    ``flat_params``/``flat_batch_stats`` are {'/'-joined path: np.ndarray}
    dicts; use :func:`unflatten_into` to pour them into a freshly-initialized
    pytree of the right structure.
    """
    with np.load(path, allow_pickle=False) as z:
        arrays = {k: z[k] for k in z.files}
    meta = json.loads(bytes(arrays.pop(_CONFIG_KEY)).decode("utf-8"))
    config = ExperimentConfig()
    config.update_from_dict(meta["config"], verbose=False)
    params = {k[len("params/"):]: v for k, v in arrays.items() if k.startswith("params/")}
    stats = {k[len("batch_stats/"):]: v for k, v in arrays.items()
             if k.startswith("batch_stats/")}
    return params, stats, config, meta.get("extra", {})


def save_train_state(
    path: str | Path,
    state,  # train.trainer.TrainState
    config: ExperimentConfig,
    epoch: int,
    extra: Dict[str, Any] | None = None,
) -> None:
    """Full mid-training checkpoint: params + BN stats + optimizer state +
    the cosine-beta counter + PRNG key — everything needed for bit-exact
    resume (the reference is save-only, SURVEY.md §5)."""
    arrays = {}
    arrays.update(_flatten(state.params, "params/"))
    arrays.update(_flatten(state.batch_stats, "batch_stats/"))
    arrays.update(_flatten(state.opt_state, "opt_state/"))
    arrays["counter"] = _to_host(state.counter)
    arrays["rng_key_data"] = _to_host(jax.random.key_data(state.rng))
    meta = {"config": config.to_dict(), "extra": dict(extra or {}, epoch=epoch)}
    arrays[_CONFIG_KEY] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    _write_npz(Path(path), arrays)


def load_train_state(path: str | Path, trainer):
    """Rebuild a TrainState for ``trainer`` from a save_train_state file.

    Returns (state, epoch, extra).
    """
    from ..train.trainer import TrainState

    with np.load(path, allow_pickle=False) as z:
        arrays = {k: z[k] for k in z.files}
    meta = json.loads(bytes(arrays.pop(_CONFIG_KEY)).decode("utf-8"))
    template = trainer.init_state()
    params = unflatten_into(
        template.params,
        {k[len("params/"):]: v for k, v in arrays.items() if k.startswith("params/")})
    stats = unflatten_into(
        template.batch_stats,
        {k[len("batch_stats/"):]: v for k, v in arrays.items()
         if k.startswith("batch_stats/")})
    opt_state = unflatten_into(
        template.opt_state,
        {k[len("opt_state/"):]: v for k, v in arrays.items()
         if k.startswith("opt_state/")})
    state = TrainState(
        params=jax.tree.map(jnp_asarray, params),
        batch_stats=jax.tree.map(jnp_asarray, stats),
        opt_state=jax.tree.map(jnp_asarray, opt_state),
        counter=jnp_asarray(arrays["counter"]),
        rng=jax.random.wrap_key_data(jnp_asarray(arrays["rng_key_data"])),
    )
    extra = meta.get("extra", {})
    return state, int(extra.get("epoch", 0)), extra


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def unflatten_into(template: Any, flat: Dict[str, np.ndarray]) -> Any:
    """Pour a flat {path: array} dict into a pytree with template's structure."""
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path, leaf in leaves_with_paths:
        key = "/".join(_path_str(p) for p in path)
        if key not in flat:
            raise KeyError(f"Checkpoint missing leaf {key!r}")
        arr = flat[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"Checkpoint leaf {key!r} has shape {arr.shape}, expected {np.shape(leaf)}"
            )
        new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
