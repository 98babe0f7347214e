"""Training-loss parity against the LIVING reference Loss.

Feeds one identical batch through the reference `Loss.forward`
(ref lib/trainer_parallel.py:22-127, torch CPU) and our
`train/loss.py:sgta_loss`; asserts total and per-term agreement.
Closes the last untested numeric surface in training (VERDICT r2 item 6).
"""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from sgtapose_tpu.train.loss import sgta_loss  # noqa: E402

import ref_oracle  # noqa: E402

B, C, H, W = 3, 7, 24, 24  # output-res tensors (shape-agnostic losses)


def _make_batch(seed=317):
    rng = np.random.RandomState(seed)
    hm_logits = rng.randn(B, C, H, W).astype(np.float32)
    reg = rng.randn(B, 2, H, W).astype(np.float32)
    tracking = rng.randn(B, 2, H, W).astype(np.float32)
    gt_hm = rng.rand(B, C, H, W).astype(np.float32)
    kp_int = rng.randint(0, min(H, W), size=(B, C, 2)).astype(np.int64)
    reg_target = rng.randn(B, C, 2).astype(np.float32) * 0.5
    tracking_target = rng.randn(B, C, 2).astype(np.float32) * 2.0
    return hm_logits, reg, tracking, gt_hm, kp_int, reg_target, tracking_target


def _ref_losses(hm_logits, reg, tracking, gt_hm, kp_int, reg_t, trk_t,
                phase="PlanA_win"):
    ref_oracle.ensure_ref_detector_importable()
    from lib.trainer_parallel import Loss  # noqa: E402

    opt = types.SimpleNamespace(
        heads={"hm": C, "reg": 2, "wh": 2, "tracking": 2},
        num_stacks=1,
        device=torch.device("cpu"),
    )
    crit = Loss(opt)
    # copies: the reference _sigmoid is IN-PLACE (lib/model/utils.py:15-17
    # `x.sigmoid_()`) and from_numpy shares memory with the caller's arrays
    outputs = [{
        "hm": torch.from_numpy(hm_logits.copy()),
        "reg": torch.from_numpy(reg.copy()),
        "tracking": torch.from_numpy(tracking.copy()),
    }]
    batch = {
        "next_belief_maps": torch.from_numpy(gt_hm),
        "reg": torch.from_numpy(reg_t),
        "tracking": torch.from_numpy(trk_t),
        "next_keypoint_projections_output_int": torch.from_numpy(kp_int),
    }
    with torch.no_grad():
        tot, losses = crit(outputs, batch, phase)
    return float(tot), {k: float(v) for k, v in losses.items()
                        if k in ("hm", "reg", "tracking")}


def test_loss_parity_planawin():
    hm_logits, reg, tracking, gt_hm, kp_int, reg_t, trk_t = _make_batch()
    ref_tot, ref_terms = _ref_losses(
        hm_logits, reg, tracking, gt_hm, kp_int, reg_t, trk_t
    )

    nhwc = lambda a: jnp.asarray(np.transpose(a, (0, 2, 3, 1)))
    outputs = {"hm": nhwc(hm_logits), "reg": nhwc(reg),
               "tracking": nhwc(tracking)}
    batch = {
        "gt_belief_maps": nhwc(gt_hm),
        "kp_int": jnp.asarray(kp_int.astype(np.int32)),
        "reg_target": jnp.asarray(reg_t),
        "tracking_target": jnp.asarray(trk_t),
    }
    tot, terms = sgta_loss(outputs, batch)

    assert abs(float(tot) - ref_tot) < 1e-6, (float(tot), ref_tot)
    for k in ("hm", "reg", "tracking"):
        assert abs(float(terms[k]) - ref_terms[k]) < 1e-6, (
            k, float(terms[k]), ref_terms[k]
        )


def test_loss_parity_dream_phase():
    """Dream phase: heatmap-only (ref Loss.forward :89-97)."""
    hm_logits, _, _, gt_hm, *_ = _make_batch(seed=99)
    ref_oracle.ensure_ref_detector_importable()
    from lib.trainer_parallel import Loss  # noqa: E402

    opt = types.SimpleNamespace(
        heads={"hm": C}, num_stacks=1, device=torch.device("cpu")
    )
    crit = Loss(opt)
    # Dream nets emit probabilities directly (no sigmoid in ref Loss Dream
    # branch); feed the same already-activated maps to both sides
    prob = 1.0 / (1.0 + np.exp(-hm_logits))
    with torch.no_grad():
        ref_tot, _ = crit(
            [{"hm": torch.from_numpy(prob)}],
            {"next_belief_maps": torch.from_numpy(gt_hm)},
            "Dream",
        )

    our = float(jnp.mean(
        (jnp.asarray(np.transpose(prob, (0, 2, 3, 1)))
         - jnp.asarray(np.transpose(gt_hm, (0, 2, 3, 1)))) ** 2
    ))
    assert abs(our - float(ref_tot)) < 1e-6
