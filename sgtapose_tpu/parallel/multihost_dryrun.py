"""Two-process multi-host data-parallel dry run, shared by the test suite
(tests/test_multihost.py) and the driver artifact (__graft_entry__.py
dryrun_multichip) so EVERY round certifies the multi-process launch path —
jax.distributed coordination over a local port, global-mesh assembly from
per-process local shards, one SPMD step — not just the single-process mesh.

This is the framework's answer to the reference's torch.distributed.launch +
DDP/NCCL multi-process story (ref train.py:176-179): each worker process
exposes 4 virtual CPU devices, joins an 8-device global mesh via
`parallel/mesh.py:initialize_multihost`, feeds its own local batch shard
(DistributedSampler equivalent), and both must compute the identical global
loss (one SPMD program).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

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

# On a 1-core host (this container) process spawn + jax import serialize, so
# ranks can be >30s apart — beyond Gloo's hardcoded context-init KV timeout.
# The coordinator-service barrier takes an explicit timeout; sync ranks HERE
# so the first collective below sees lockstep peers.
from jax._src import distributed as _dist

_dist.global_state.client.wait_at_barrier("sgta_mh_imports", 600_000)

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
# AOT-compile, then barrier, THEN execute: compiles timeslice ~equally on a
# busy 1-core host but can still finish skewed; the barrier guarantees the
# Gloo collective inside the step starts in lockstep on both ranks.
step_c = step.lower(state, batch, jax.random.PRNGKey(3)).compile()
_dist.global_state.client.wait_at_barrier("sgta_mh_compiled", 600_000)
state, stats = step_c(state, batch, jax.random.PRNGKey(3))
tot = float(stats["tot"])
assert tot == tot and tot > 0.0, stats
print(f"proc{pid}: loss={tot:.6f}", flush=True)
"""


def run_two_process_dryrun(workdir: str, timeout: int = 900,
                           attempts: int = 2) -> float:
    """Launch the 2-process coordinated run; returns the agreed global loss.

    Raises AssertionError (with the failing worker's tail) on any worker
    failure or on loss disagreement between the two ranks. One retry by
    default: a first attempt can lose the race against Gloo's hardcoded 30s
    context-init timeout on a loaded 1-core host, but it still populates the
    persistent compile cache, so the retry runs skew-free.
    """
    last = None
    for i in range(attempts):
        try:
            return _run_once(workdir, timeout)
        except AssertionError as e:  # worker failure; retry with warm cache
            last = e
    raise last


def _run_once(workdir: str, timeout: int) -> float:
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    worker = os.path.join(workdir, "mh_worker.py")
    with open(worker, "w") as f:
        f.write(_WORKER)
    # strip the caller's XLA_FLAGS (e.g. the driver's 8-virtual-device flag);
    # each worker sets its own 4-device flag before importing jax
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=repo_root,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=timeout)[0].decode(errors="replace")
            for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-3000:]}"
    losses = []
    for out in outs:
        line = [l for l in out.splitlines() if "loss=" in l][-1]
        losses.append(float(line.split("loss=")[1]))
    # both processes computed the SAME global loss (one SPMD program)
    assert abs(losses[0] - losses[1]) < 1e-6, losses
    return losses[0]
