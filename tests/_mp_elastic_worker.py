"""Worker for the multi-controller crash-restart drill
(tests/test_multiprocess.py::test_crash_restart_drill).

One host of an N-process gloo cluster running the elastic recipe
utils/elastic.py documents for pods: resume from the newest shared atomic
checkpoint if one exists, train with per-epoch checkpointing, and (when
``crash_epoch`` >= 0) process 1 dies MID-TRAIN with os._exit at that epoch —
the supervisor (the test) then kills the surviving process and relaunches
the whole cluster, which must re-form and resume bit-exactly.

Usage: _mp_elastic_worker.py <pid> <nproc> <port> <shared_dir> <crash_epoch>
"""

import json
import os
import sys

pid, nproc, port, shared_dir, crash_epoch = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    int(sys.argv[5]))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = str(nproc)
os.environ["JAX_PROCESS_ID"] = str(pid)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from genome_minimizer_2_tpu.parallel import distributed as DIST  # noqa: E402

assert DIST.maybe_initialize(), "distributed init did not activate"

from genome_minimizer_2_tpu.parallel import mesh as MESH  # noqa: E402
from genome_minimizer_2_tpu.train import trainer as T  # noqa: E402
from genome_minimizer_2_tpu.utils import elastic  # noqa: E402
from genome_minimizer_2_tpu.utils.config import ExperimentConfig  # noqa: E402

D = 70
rng = np.random.RandomState(0)
train_x = rng.rand(44, D).round().astype(np.float32)
val_x = rng.rand(13, D).round().astype(np.float32)

cfg = ExperimentConfig(hidden_dim=16, latent_dim=4, n_epochs=4, batch_size=8,
                       trainer_version="v3", print_every=1000)
mesh = MESH.make_mesh(data=2 * nproc, model=1)
trainer = T.create_trainer("v3", cfg, input_dim=D, mesh=mesh)

pattern = os.path.join(shared_dir, "es_{epoch}.npz")
ck = elastic.latest_checkpoint(pattern)
if ck is not None:
    state, start_epoch = trainer.resume_from(ck)
    state = trainer.shard_state(state)
else:
    state, start_epoch = trainer.shard_state(trainer.init_state()), 0


def crash_cb(epoch, tr, vl):
    # dies between this epoch's compute and its checkpoint write — the
    # surviving host errors/hangs in the next collective and the supervisor
    # relaunches everyone
    if crash_epoch >= 0 and pid == 1 and epoch == crash_epoch:
        os._exit(17)


tl, vl_hist, epochs = trainer.train(
    train_x, val_x, state=state, start_epoch=start_epoch,
    checkpoint_path=pattern, checkpoint_every=1, progress_cb=crash_cb)

print(json.dumps({"pid": pid, "resumed_from": start_epoch, "epochs": epochs,
                  "train": tl, "val": vl_hist}), flush=True)
