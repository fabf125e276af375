"""Worker for the real multi-controller test (tests/test_multiprocess.py).

Runs as one of N coordinated processes on the CPU backend with gloo TCP
collectives — the same single-controller-per-process model a real TPU pod
uses (jax.distributed.initialize -> global devices -> mesh spanning hosts).
Trains the tiny v3 model data-parallel over the global mesh through the real
VAETrainer.train path and prints the loss histories as one JSON line.

Usage: python tests/_mp_worker.py <process_id> <num_processes> <port>
"""

import json
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
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

# initialize BEFORE anything touches a JAX backend (real pods do the same:
# maybe_initialize at process start)
assert DIST.maybe_initialize(), "distributed init did not activate"

from genome_minimizer_2_tpu.parallel import mesh as MESH  # noqa: E402
from genome_minimizer_2_tpu.train import trainer as T  # noqa: E402
from genome_minimizer_2_tpu.utils.config import ExperimentConfig  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert jax.process_index() == pid

D = 70
rng = np.random.RandomState(0)
train_x = rng.rand(44, D).round().astype(np.float32)
val_x = rng.rand(13, D).round().astype(np.float32)

lo, hi = DIST.host_shard(44)
assert 0 <= lo <= hi <= 44

results = {"pid": pid}
n_dev = 2 * nproc
# DP over all global devices, then TP with the model axis spanning processes
# (cross-process placement of model-sharded params via put_global)
for label, (data, model) in (("dp", (n_dev, 1)), ("tp", (n_dev // 2, 2))):
    cfg = ExperimentConfig(hidden_dim=16, latent_dim=4, n_epochs=2,
                           batch_size=8, trainer_version="v3",
                           print_every=1000)
    mesh = MESH.make_mesh(data=data, model=model)
    assert mesh.size == n_dev
    trainer = T.create_trainer("v3", cfg, input_dim=D, mesh=mesh)
    state = trainer.shard_state(trainer.init_state())
    tl, vl, epochs = trainer.train(train_x, val_x, state=state)
    results[label] = {"train": tl, "val": vl, "epochs": epochs}
print(json.dumps(results), flush=True)
