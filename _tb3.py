import sys, time, jax, numpy as np
from sgtapose_tpu.config import Config, ModelConfig
from sgtapose_tpu.train import trainer
from sgtapose_tpu.data import pipeline, synthetic
mode = sys.argv[1]
kw = {}
if "conv" in mode: kw["dla_node"] = "conv"
if "fused" in mode: kw["fused_attention"] = True
cfg = Config(model=ModelConfig(**kw))
state = trainer.create_train_state(cfg, jax.random.PRNGKey(0), max_iters=1000)
raw = synthetic.make_raw_batch(jax.random.PRNGKey(1), 4)
batch = pipeline.make_batch_fn(cfg, synthetic.camera_K())(jax.random.PRNGKey(2), raw)
step = jax.jit(trainer.train_step, donate_argnums=0)
state, stats = step(state, batch, jax.random.PRNGKey(3))
_ = np.asarray(stats["tot"])
t0 = time.perf_counter()
N = 5
for _ in range(N):
    state, stats = step(state, batch, jax.random.PRNGKey(3))
    _ = np.asarray(stats["tot"])
print(f"{mode}: {(time.perf_counter()-t0)/N*1000:.1f} ms/step  loss={float(stats['tot']):.4f}")
