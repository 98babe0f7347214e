"""Multi-host data-parallel training: REAL multi-process coordination.

Two coordinated processes (jax.distributed.initialize over a local
coordinator port), each exposing 4 virtual CPU devices, form one 8-device
global mesh; each process feeds its own local batch shard
(DistributedSampler equivalent) and runs the SAME jit-SPMD train step
(parallel/mesh.py + train/trainer.py). This is the framework's answer to
the reference's torch.distributed.launch + DDP/NCCL multi-process story
(ref train.py:176-179) — verified, not just documented.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys

sys.path.insert(0, os.getcwd())  # repo root (python adds the script's dir,
#                                  not the cwd, and the script lives in /tmp)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

coordinator, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

from sgtapose_tpu.utils.cache import enable_persistent_compile_cache

enable_persistent_compile_cache()  # subprocesses don't inherit conftest's

from sgtapose_tpu.parallel import mesh as mesh_lib

mesh_lib.initialize_multihost(coordinator, n_proc, pid)
assert jax.process_count() == n_proc, jax.process_count()
assert len(jax.devices()) == 4 * n_proc, len(jax.devices())
assert len(jax.local_devices()) == 4

import jax.numpy as jnp

from sgtapose_tpu.config import Config, ModelConfig, TrainConfig
from sgtapose_tpu.data import pipeline, synthetic
from sgtapose_tpu.train import trainer

cfg = Config(
    model=ModelConfig(input_res=(64, 64), kernel_list=(3, 3, 3, 1, 1, 1),
                      dla_node="conv"),
    train=TrainConfig(batch_size_per_device=1),
)
mesh = mesh_lib.make_mesh()  # all 8 global devices
state = trainer.create_train_state(cfg, jax.random.PRNGKey(0), max_iters=10)

# per-process LOCAL batch: this process's 4 samples of the global 8
# (every process uses a process-dependent data key — distinct shards)
raw = synthetic.make_raw_batch(jax.random.fold_in(jax.random.PRNGKey(1), pid), 4)
batch = pipeline.make_batch_fn(cfg, synthetic.camera_K())(
    jax.random.PRNGKey(2), raw
)
batch = mesh_lib.shard_batch(batch, mesh)  # global assembly across processes
assert batch["cur_img"].shape[0] == 8  # global batch dim

step = trainer.make_parallel_train_step(mesh)
state, stats = step(state, batch, jax.random.PRNGKey(3))
tot = float(stats["tot"])
assert tot == tot and tot > 0.0, stats
print(f"proc{pid}: loss={tot:.6f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_data_parallel(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coordinator, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0].decode(errors="replace") for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-3000:]}"
    # both processes computed the SAME global loss (one SPMD program)
    losses = []
    for out in outs:
        line = [l for l in out.splitlines() if "loss=" in l][-1]
        losses.append(float(line.split("loss=")[1]))
    assert abs(losses[0] - losses[1]) < 1e-6, losses
