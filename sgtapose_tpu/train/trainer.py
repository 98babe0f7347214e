"""Data-parallel trainer: jit-SPMD train step over a device mesh + orbax
checkpointing.

Replaces the reference's torch machinery (ref train.py:171-278,
trainer_parallel.py:129-427):
  * DDP/NCCL gradient all-reduce      -> XLA SPMD over the mesh's data axis
  * SyncBatchNorm                     -> global-batch reductions under jit
    SPMD (batch stats are computed over the full sharded batch; XLA inserts
    the collectives — exactly SyncBatchNorm's semantics, for free)
  * per-epoch model_{e}.pth           -> orbax checkpoints {params,
    batch_stats, opt_state, step}
  * adapt_lr warmup+poly              -> optax schedule (train/schedule.py)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from sgtapose_tpu.config import Config
from sgtapose_tpu.models.sgta import SGTAPose, create_model
from sgtapose_tpu.parallel import mesh as mesh_lib
from sgtapose_tpu.train.loss import sgta_loss
from sgtapose_tpu.train.schedule import warmup_poly_schedule


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Any = struct.field(pytree_node=False)
    tx: Any = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def example_batch(cfg: Config, batch_size: int = 1) -> Dict[str, jnp.ndarray]:
    """Zero batch with the training pipeline's shapes (for init/compile)."""
    H, W = cfg.model.input_res
    Ho, Wo = cfg.model.output_res
    C = cfg.model.num_classes
    B = batch_size
    f32 = jnp.float32
    return {
        "cur_img": jnp.zeros((B, H, W, 3), f32),
        "pre_img": jnp.zeros((B, H, W, 3), f32),
        "pre_hm": jnp.zeros((B, H, W, 1), f32),
        "repro_hm": jnp.zeros((B, H, W, 1), f32),
        "pre_hm_cls": jnp.zeros((B, Ho, Wo, C), f32),
        "repro_hm_cls": jnp.zeros((B, Ho, Wo, C), f32),
        "pre_origin_hm": jnp.zeros((B, H, W, 1), f32),
        "ppre_img": jnp.zeros((B, H, W, 3), f32),
        "ppre_hm": jnp.zeros((B, H, W, 1), f32),
        "ppre_hm_cls": jnp.zeros((B, Ho, Wo, C), f32),
        "gt_belief_maps": jnp.zeros((B, Ho, Wo, C), f32),
        "kp_int": jnp.zeros((B, C, 2), jnp.int32),
        "reg_target": jnp.zeros((B, C, 2), f32),
        "tracking_target": jnp.zeros((B, C, 2), f32),
    }


def create_train_state_for_phase(
    cfg: Config, rng: jax.Array, phase: str, max_iters: int = 100000,
    schedule=None,
) -> TrainState:
    from sgtapose_tpu.train.phases import model_inputs

    model = create_model(cfg.model)
    batch = example_batch(cfg)
    variables = model.init(rng, *model_inputs(phase, batch), train=False)
    if schedule is None:
        schedule = warmup_poly_schedule(
            cfg.train.lr, max_iters, cfg.train.warmup_iters,
            power=cfg.train.poly_power,
        )
    tx = optax.adam(schedule)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )


def create_train_state(
    cfg: Config, rng: jax.Array, max_iters: int = 100000
) -> TrainState:
    return create_train_state_for_phase(cfg, rng, "PlanA_win", max_iters)


def resume_schedule_state(state: TrainState, step: int) -> TrainState:
    """Preemption resume for params-only warm starts (train_demo
    --resume_step): advance state.step and the optax lr-schedule count to
    `step`, so the SAME compiled train-step executable — schedule constants
    are baked at trace time but the count is runtime data — replays the
    parent run's lr tail verbatim with zero recompile.

    ScaleByAdamState.count intentionally stays 0: its bias correction must
    match the fresh (zero) moments of a params-only restart. Advancing it
    too would skip the correction and run a ~3.2x-lr update transient for
    the first ~100 steps (measured: first-update magnitude lr*0.1/sqrt(1e-3)
    with stale count vs lr with count 0)."""
    new_opt = tuple(
        s._replace(count=jnp.asarray(step, s.count.dtype))
        if type(s).__name__ == "ScaleByScheduleState" else s
        for s in state.opt_state
    )
    return state.replace(
        step=jnp.asarray(step, jnp.int32), opt_state=new_opt
    )


def model_forward(
    state: TrainState, params, batch, train: bool, rngs=None,
    phase: str = "PlanA_win",
):
    from sgtapose_tpu.train.phases import model_inputs

    variables = {"params": params, "batch_stats": state.batch_stats}
    inputs = model_inputs(phase, batch)
    if train:
        out, mutated = state.apply_fn(
            variables, *inputs, mutable=["batch_stats"], rngs=rngs, train=True
        )
        return out, mutated["batch_stats"]
    out = state.apply_fn(variables, *inputs, train=False)
    return out, state.batch_stats


def train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    dropout_rng: jax.Array,
    hm_weight: float = 1.0,
    reg_weight: float = 0.01,
    tracking_weight: float = 0.0,
    bf16: bool = False,
    phase: str = "PlanA_win",
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimizer step. bf16=True runs the model compute (params,
    activations, image inputs) in bfloat16 with f32 master params, f32 loss
    targets, and f32 gradients — standard loss-scale-free TPU mixed
    precision (~2.4x at this chip's bf16/f32 roofline ratio).
    `phase` selects the model-input wiring + loss terms (train/phases.py)."""
    from sgtapose_tpu.train.phases import input_names, loss_weights

    dropout_rng = jax.random.fold_in(dropout_rng, state.step)
    model_inputs = input_names(phase)
    weights = loss_weights(phase, hm_weight, reg_weight, tracking_weight)

    def loss_fn(params):
        if bf16:
            from sgtapose_tpu.utils.precision import cast_floating

            fwd_params = cast_floating(params, jnp.bfloat16)
            # batch_stats stay f32: in train mode they are only READ by the
            # EMA update (normalization uses the batch's own statistics), so
            # casting them to bf16 would re-quantize the running stats every
            # step with no compute benefit.
            fwd_state = state
            fwd_batch = dict(batch)
            for k in model_inputs:
                fwd_batch[k] = batch[k].astype(jnp.bfloat16)
        else:
            fwd_params, fwd_batch, fwd_state = params, batch, state
        out, new_stats = model_forward(
            fwd_state, fwd_params, fwd_batch, train=True,
            rngs={"dropout": dropout_rng}, phase=phase,
        )
        out = {k: v.astype(jnp.float32) for k, v in out.items()}
        total, stats = sgta_loss(out, batch, **weights)
        return total, (stats, new_stats)

    (_, (stats, new_batch_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    if bf16:
        # keep running stats in f32 regardless of compute dtype
        new_batch_stats = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32), new_batch_stats
        )
    new_state = state.apply_gradients(grads, new_batch_stats)
    return new_state, stats


def eval_step(
    state: TrainState, batch, phase: str = "PlanA_win"
) -> Dict[str, jnp.ndarray]:
    """Validation forward + loss for the given phase (ref valid_epoch,
    trainer_parallel.py:153-217, which dispatches on opt.phase like
    run_epoch does)."""
    from sgtapose_tpu.train.phases import loss_weights

    out, _ = model_forward(state, state.params, batch, train=False, phase=phase)
    _, stats = sgta_loss(out, batch, **loss_weights(phase))
    return stats


def _prediction_heads(out) -> Dict[str, jnp.ndarray]:
    """Sigmoided heatmaps + reg/tracking (zeros when the arch has no such
    head, e.g. Dream baselines)."""
    hm = jax.nn.sigmoid(out["hm"].astype(jnp.float32))
    zeros = jnp.zeros(hm.shape[:3] + (2,), jnp.float32)
    reg = out.get("reg", zeros).astype(jnp.float32)
    tracking = out.get("tracking", zeros).astype(jnp.float32)
    return {"hm": hm, "reg": reg, "tracking": tracking}


def predict_step(state: TrainState, batch, phase: str = "PlanA_win"):
    """Inference forward for observability/validation decoding."""
    out, _ = model_forward(state, state.params, batch, train=False, phase=phase)
    return _prediction_heads(out)


def eval_predict_step(
    state: TrainState, batch, phase: str = "PlanA_win"
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Validation loss AND decodable prediction heads from ONE forward
    (the per-epoch val loop needs both; running eval_step + predict_step
    separately doubles validation compute)."""
    from sgtapose_tpu.train.phases import loss_weights

    out, _ = model_forward(state, state.params, batch, train=False, phase=phase)
    out_f32 = {k: v.astype(jnp.float32) for k, v in out.items()}
    _, stats = sgta_loss(out_f32, batch, **loss_weights(phase))
    return stats, _prediction_heads(out)


def make_parallel_train_step(mesh, bf16: bool = False, phase: str = "PlanA_win", **loss_weights):
    """jit the train step over the mesh: batch sharded on the data axis,
    state replicated. XLA SPMD inserts the gradient all-reduce (psum over ICI)
    and the global batch-stat reductions."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))

    step = functools.partial(train_step, bf16=bf16, phase=phase, **loss_weights)
    return jax.jit(
        step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


# -----------------------------------------------------------------------------
# Checkpointing (replaces save_model/load_model, ref lib/model/model.py:43-114)
# -----------------------------------------------------------------------------


def save_checkpoint(path: str, state: TrainState):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, state: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    restored = ckptr.restore(path, target)
    return state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
