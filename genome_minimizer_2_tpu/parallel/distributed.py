"""Multi-host initialization helpers.

The reference has no distributed backend at all (SURVEY.md §2.3). Here
multi-host runs use JAX's single-controller model: call
:func:`maybe_initialize` once at process start on every host of the pod
slice; afterwards ``jax.devices()`` spans the slice, the trainer's mesh
covers all chips (psum over ICI within a slice, DCN across slices), data
loading shards by ``jax.process_index()``, and FASTA writers shard/merge per
host (genome/minimizer.py::process_sharded, pipeline.py).
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger(__name__)

_ENV_HINTS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "TPU_WORKER_HOSTNAMES",
)


def running_under_multihost_env() -> bool:
    """Heuristic: does the environment describe a multi-host TPU job?"""
    if any(os.environ.get(k) for k in _ENV_HINTS[:3]):
        return True
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return "," in hostnames


def maybe_initialize(force: bool = False) -> bool:
    """Call jax.distributed.initialize() when a multi-host environment is
    detected (or forced). Safe no-op on single host / repeated calls.

    Returns True when distributed mode is active.
    """
    # NB: must not touch jax.process_count()/devices() before initialize —
    # that would instantiate the backends and make initialize a hard error
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    if not (force or running_under_multihost_env()):
        return False
    # Explicit coordinator config (manual pods / CPU gloo multi-controller);
    # TPU pods auto-detect all three and need no env.
    kwargs = {}
    coord = (os.environ.get("JAX_COORDINATOR_ADDRESS")
             or os.environ.get("COORDINATOR_ADDRESS"))
    if coord:
        kwargs["coordinator_address"] = coord
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(**kwargs)
        logger.info("jax.distributed initialized: process %d/%d, %d devices",
                    jax.process_index(), jax.process_count(),
                    len(jax.devices()))
        return True
    except RuntimeError as e:  # already initialized
        logger.debug("jax.distributed.initialize: %s", e)
        return jax.process_count() > 1


def host_shard(n: int) -> tuple[int, int]:
    """Contiguous [lo, hi) sample range owned by this host."""
    pi, pc = jax.process_index(), jax.process_count()
    return pi * n // pc, (pi + 1) * n // pc
