import time, jax, numpy as np, functools
from sgtapose_tpu.config import Config, ModelConfig
from sgtapose_tpu.train import trainer
from sgtapose_tpu.data import pipeline, synthetic
cfg = Config(model=ModelConfig())
state = trainer.create_train_state(cfg, jax.random.PRNGKey(0), max_iters=1000)
raw = synthetic.make_raw_batch(jax.random.PRNGKey(1), 4)
batch = pipeline.make_batch_fn(cfg, synthetic.camera_K())(jax.random.PRNGKey(2), raw)
step = jax.jit(functools.partial(trainer.train_step, bf16=True), donate_argnums=0)
state, stats = step(state, batch, jax.random.PRNGKey(3))
_ = np.asarray(stats["tot"])
t0 = time.perf_counter()
for _ in range(5):
    state, stats = step(state, batch, jax.random.PRNGKey(3))
    _ = np.asarray(stats["tot"])
print(f"dcn bf16: {(time.perf_counter()-t0)/5*1000:.1f} ms/step  loss={float(stats['tot']):.4f}")
