import time, sys, jax, jax.numpy as jnp
from sgtapose_tpu.config import Config, ModelConfig
from sgtapose_tpu.train import trainer
from sgtapose_tpu.data import pipeline, synthetic

fused = sys.argv[1] == "fused"
B = 4
cfg = Config(model=ModelConfig(fused_attention=fused))
state = trainer.create_train_state(cfg, jax.random.PRNGKey(0), max_iters=1000)
raw = synthetic.make_raw_batch(jax.random.PRNGKey(1), B)
batch = pipeline.make_batch_fn(cfg, synthetic.camera_K())(jax.random.PRNGKey(2), raw)
step = jax.jit(trainer.train_step, donate_argnums=0)
state, stats = step(state, batch, jax.random.PRNGKey(3))
jax.block_until_ready(stats["tot"])
t0 = time.perf_counter()
N = 20
for _ in range(N):
    state, stats = step(state, batch, jax.random.PRNGKey(3))
jax.block_until_ready(stats["tot"])
dt = (time.perf_counter()-t0)/N
print(f"fused={fused}: {dt*1000:.2f} ms/step (B={B})  loss={float(stats['tot']):.4f}")
