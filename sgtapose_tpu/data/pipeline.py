"""On-device training-batch construction: shared random affine augmentation,
GT heatmaps, PnP structure prior, and prior-heatmap rendering — the work the
reference does per sample in python dataloader workers
(ref sgtapose/datasets.py:61-213 CenterTrackSeqDataset.__getitem__) runs here
as one jitted, vmapped XLA program on TPU.

Host side only decodes PNGs and parses JSON; everything else (warp, noise,
PnP, gaussian splats) is device compute. This removes the reference's main
training-input bottleneck (per-sample cv2.solvePnP + YAML parse + numpy
gaussian loops on CPU workers).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sgtapose_tpu.config import IMAGE_MEAN, IMAGE_STD, Config
from sgtapose_tpu.core import geometry, pnp


class RawSample(NamedTuple):
    """Host-provided raw inputs for one (prev, next) frame pair."""

    prev_img: jnp.ndarray  # (H_raw, W_raw, 3) uint8
    next_img: jnp.ndarray  # (H_raw, W_raw, 3) uint8
    prev_projs: jnp.ndarray  # (K, 2) raw-pixel GT projections
    next_projs: jnp.ndarray  # (K, 2)
    prev_x3d_rob: jnp.ndarray  # (K, 3) FK keypoints in robot frame
    next_x3d_rob: jnp.ndarray  # (K, 3)


def _border(border: int, size: int) -> int:
    """ref utilities.py:855-859 _get_border."""
    i = 1
    while size - border // i <= border // i:
        i *= 2
    return border // i


def _derive_affine(rng: jax.Array, H_raw: int, W_raw: int, cfg: Config, augment: bool):
    """Shared random-affine derivation (ref datasets.py:109-119,
    utilities.py:861-868). Splits `rng` exactly as augment_and_render's
    stream expects and returns (trans_input, trans_output, k_prior, k_prevhm)
    — the single source of truth for the window's transform, so the
    three-frame path can rebuild the SAME warp for the ppre frame without
    duplicating (and risking desynchronizing) this logic."""
    in_h, in_w = cfg.model.input_res
    out_h, out_w = cfg.model.output_res
    k_aug_s, k_aug_c, k_prior, k_prevhm = jax.random.split(rng, 4)

    s_base = jnp.float32(max(H_raw, W_raw))
    if augment:
        aug_s = jax.random.choice(
            k_aug_s, jnp.arange(0.6, 1.4, 0.1, dtype=jnp.float32)
        )
        wb = _border(128, W_raw)
        hb = _border(128, H_raw)
        cx = jax.random.randint(k_aug_c, (), wb, W_raw - wb).astype(jnp.float32)
        cy = jax.random.randint(jax.random.fold_in(k_aug_c, 1), (), hb, H_raw - hb).astype(
            jnp.float32
        )
        center = jnp.stack([cx, cy])
    else:
        aug_s = jnp.float32(1.0)
        center = jnp.array([W_raw / 2.0, H_raw / 2.0], jnp.float32)
    s = s_base * aug_s

    trans_input = geometry.get_affine_transform(center, s, 0.0, (in_w, in_h))
    trans_output = geometry.get_affine_transform(center, s, 0.0, (out_w, out_h))
    return trans_input, trans_output, k_prior, k_prevhm


def augment_and_render(
    rng: jax.Array,
    sample: RawSample,
    camera_K: jnp.ndarray,
    cfg: Config,
    augment: bool = True,
    cache_prior: bool = False,
) -> Dict[str, jnp.ndarray]:
    """One sample's full train-input construction. jit/vmap-safe.

    cache_prior=True conditions the pre pass on a PnP-reprojection prior
    instead of the detection prior — the feature-cache serving path's input
    distribution (see infer/detector.py _build_cached_video_runner)."""
    H_raw, W_raw = sample.prev_img.shape[0], sample.prev_img.shape[1]
    in_h, in_w = cfg.model.input_res
    out_h, out_w = cfg.model.output_res

    trans_input, trans_output, k_prior, k_prevhm = _derive_affine(
        rng, H_raw, W_raw, cfg, augment
    )

    # --- warp + normalize both frames with the SAME transform ---------------
    mean = jnp.asarray(IMAGE_MEAN, jnp.float32)
    std = jnp.asarray(IMAGE_STD, jnp.float32)
    prev_in = geometry.normalize_image(
        geometry.warp_affine(sample.prev_img.astype(jnp.float32), trans_input, (in_h, in_w)),
        mean, std,
    )
    next_in = geometry.normalize_image(
        geometry.warp_affine(sample.next_img.astype(jnp.float32), trans_input, (in_h, in_w)),
        mean, std,
    )

    # --- GT targets at output res (ref datasets.py:127-176) -----------------
    next_out = geometry.affine_transform_and_clip(
        sample.next_projs, trans_output, out_w, out_h, W_raw, H_raw
    )
    prev_out = geometry.affine_transform_and_clip(
        sample.prev_projs, trans_output, out_w, out_h, W_raw, H_raw
    )
    next_int = jnp.stack(
        [
            jnp.clip(next_out[:, 0], 0, out_w - 1).astype(jnp.int32),
            jnp.clip(next_out[:, 1], 0, out_h - 1).astype(jnp.int32),
        ],
        axis=1,
    )
    gt_belief = geometry.render_gt_heatmap(next_int, out_w, out_h)  # (K,Ho,Wo)

    # --- CenterTrack-phase origin prior (noised prev GT at input res,
    # ref datasets.py:181-183 prev_origin_belief_maps) --------------------
    pre_origin_hm = geometry.render_noised_prior_heatmap(
        k_prevhm, sample.prev_projs, trans_input, in_w, in_h, W_raw, H_raw,
        cfg.train.hm_disturb, cfg.train.lost_disturb,
        cfg.train.fp_disturb if cfg.train.fp_disturb_active else 0.0,
    )

    # --- PnP structure prior with fault injection (ref datasets.py:189-211) -
    ok, next_est, prev_noised, prior_pose = pnp.noised_pnp_prior(
        k_prior,
        sample.prev_x3d_rob,
        sample.prev_projs,
        sample.next_x3d_rob,
        camera_K,
        cfg.train.hm_disturb,
        cfg.train.lost_disturb,
    )
    okf = ok.astype(jnp.float32)

    if cache_prior:
        # Feature-cache fine-tune mode (infer/detector.py
        # _build_cached_video_runner): on the fast path the previous-pass
        # trunk features were conditioned on repro_hm_{t-1} — a PnP
        # REPROJECTION of the prev frame's 3D points — not on the
        # detection-rendered pre_hm. Train the pre pass on that distribution:
        # project prev_x3d under the solved prior pose and render it where
        # pre_hm would go. pre_hm_cls stays detection-rendered (the fuse
        # stage's cls maps come from detections on the fast path too).
        R_prior = geometry.quat_to_matrix(prior_pose.quat)
        prev_est = geometry.project_points(
            sample.prev_x3d_rob, R_prior, prior_pose.trans, camera_K
        )
        pre_hm = geometry.render_prior_heatmap(
            prev_est, trans_input, in_w, in_h, W_raw, H_raw
        ) * okf
    else:
        pre_hm = geometry.render_prior_heatmap(
            prev_noised, trans_input, in_w, in_h, W_raw, H_raw
        ) * okf
    repro_hm = geometry.render_prior_heatmap(
        next_est, trans_input, in_w, in_h, W_raw, H_raw
    ) * okf
    pre_hm_cls = geometry.render_prior_heatmap_cls(
        prev_noised, trans_output, out_w, out_h, W_raw, H_raw
    ) * okf
    repro_hm_cls = geometry.render_prior_heatmap_cls(
        next_est, trans_output, out_w, out_h, W_raw, H_raw
    ) * okf

    return {
        "cur_img": next_in,
        "pre_img": prev_in,
        "pre_origin_hm": pre_origin_hm[..., None],
        "pre_hm": pre_hm[..., None],
        "repro_hm": repro_hm[..., None],
        "pre_hm_cls": jnp.moveaxis(pre_hm_cls, 0, -1),  # (Ho, Wo, K)
        "repro_hm_cls": jnp.moveaxis(repro_hm_cls, 0, -1),
        "gt_belief_maps": jnp.moveaxis(gt_belief, 0, -1),
        "kp_int": next_int,
        "reg_target": next_out - next_int.astype(jnp.float32),
        # Reference-faithful quirk (ref datasets.py:176): prev_out is zeroed
        # for out-of-raw-frame prev keypoints by affine_transform_and_clip,
        # so their tracking target is 0 - next_int (a large bogus
        # displacement). Harmless at the shipping tracking_weight=0.0; anyone
        # enabling the tracking head should mask these rows first.
        "tracking_target": prev_out - next_int.astype(jnp.float32),
    }


def make_batch_fn(cfg: Config, camera_K, augment: bool = True,
                  cache_prior: bool = False):
    """Returns jitted fn(rng, batched RawSample) -> model batch dict."""
    K = jnp.asarray(camera_K, jnp.float32)

    def batch_fn(rng, samples: RawSample):
        B = samples.prev_img.shape[0]
        rngs = jax.random.split(rng, B)
        return jax.vmap(
            lambda r, s: augment_and_render(r, s, K, cfg, augment, cache_prior)
        )(rngs, samples)

    return jax.jit(batch_fn)


class RawSampleThree(NamedTuple):
    """Three-frame window (ppre, pre, next) — ref CenterTrackThreeDataset
    (datasets.py:215-440)."""

    ppre_img: jnp.ndarray
    pre_img: jnp.ndarray
    next_img: jnp.ndarray
    ppre_projs: jnp.ndarray
    pre_projs: jnp.ndarray
    next_projs: jnp.ndarray
    ppre_x3d_rob: jnp.ndarray
    pre_x3d_rob: jnp.ndarray
    next_x3d_rob: jnp.ndarray


def augment_and_render_three(
    rng: jax.Array,
    sample: RawSampleThree,
    camera_K: jnp.ndarray,
    cfg: Config,
    augment: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Three-frame training inputs: one shared affine for all frames, two
    noised PnP prior chains (ppre->pre and pre->next)."""
    pair_pn = RawSample(
        prev_img=sample.pre_img,
        next_img=sample.next_img,
        prev_projs=sample.pre_projs,
        next_projs=sample.next_projs,
        prev_x3d_rob=sample.pre_x3d_rob,
        next_x3d_rob=sample.next_x3d_rob,
    )
    k_pair, k_pp = jax.random.split(rng, 3)[:2]  # 3-way split kept for RNG-stream compat
    # base pair (pre -> next) reuses the two-frame construction, which fixes
    # the shared affine for the whole window
    out = augment_and_render(k_pair, pair_pn, camera_K, cfg, augment)

    # rebuild the SAME transforms for the ppre frame via the shared helper
    # (re-derives from the identical rng the pair consumed)
    H_raw, W_raw = sample.pre_img.shape[0], sample.pre_img.shape[1]
    in_h, in_w = cfg.model.input_res
    out_h, out_w = cfg.model.output_res
    trans_input, trans_output, _, _ = _derive_affine(
        k_pair, H_raw, W_raw, cfg, augment
    )

    mean = jnp.asarray(IMAGE_MEAN, jnp.float32)
    std = jnp.asarray(IMAGE_STD, jnp.float32)
    ppre_in = geometry.normalize_image(
        geometry.warp_affine(sample.ppre_img.astype(jnp.float32), trans_input, (in_h, in_w)),
        mean, std,
    )

    # ppre -> pre prior chain
    ok2, pre_est, ppre_noised, _ = pnp.noised_pnp_prior(
        k_pp, sample.ppre_x3d_rob, sample.ppre_projs, sample.pre_x3d_rob,
        camera_K, cfg.train.hm_disturb, cfg.train.lost_disturb,
    )
    ok2f = ok2.astype(jnp.float32)
    ppre_hm = geometry.render_prior_heatmap(
        ppre_noised, trans_input, in_w, in_h, W_raw, H_raw
    ) * ok2f
    ppre_hm_cls = geometry.render_prior_heatmap_cls(
        ppre_noised, trans_output, out_w, out_h, W_raw, H_raw
    ) * ok2f

    out.update(
        ppre_img=ppre_in,
        ppre_hm=ppre_hm[..., None],
        ppre_hm_cls=jnp.moveaxis(ppre_hm_cls, 0, -1),
    )
    return out


def make_batch_fn_three(cfg: Config, camera_K, augment: bool = True):
    K = jnp.asarray(camera_K, jnp.float32)

    def batch_fn(rng, samples: RawSampleThree):
        B = samples.pre_img.shape[0]
        rngs = jax.random.split(rng, B)
        return jax.vmap(
            lambda r, s: augment_and_render_three(r, s, K, cfg, augment)
        )(rngs, samples)

    return jax.jit(batch_fn)
