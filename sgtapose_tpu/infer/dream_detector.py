"""DREAM-mode single-frame detector (the --is_ct false comparison path).

Rebuild of the reference's DREAM lineage inference (ref sgta_detector.py
is_ct=False branches :50-52, :608-651; inference.py:215-220 shrink-and-crop
preprocessing; network.py keypoints_from_image interface idea): a
single-frame belief-map network (DreamHourglass / ResnetSimple), no temporal
priors, peaks decoded by the weighted-average sub-pixel rule (no reg head),
coordinates mapped back to the raw frame through the shrink-and-crop inverse.

The whole batch of frames runs as ONE vmapped device program (frames are
independent in this mode — no recurrence to scan)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sgtapose_tpu.config import IMAGE_MEAN, IMAGE_STD, Config
from sgtapose_tpu.data import image_space
from sgtapose_tpu.decode import peaks as decode_lib


def make_dream_detector(model_apply, variables, cfg: Config, raw_wh: Tuple[int, int],
                        flip_test: bool = False):
    """Returns fn(raw uint8 images (T, H_raw, W_raw, 3)) -> (kps_raw (T, K, 2)
    with sentinels, scores (T, K)). Host-side shrink-and-crop math; device
    forward + decode; raw-coordinate conversion on host (exact reference
    conversion semantics, data/image_space.py).

    flip_test: horizontal-flip test-time augmentation for this single-frame
    mode — forward the mirrored image too and average the un-mirrored belief
    maps (CenterTrack's `average_flips` rule for 'hm',
    ref lib/model/utils.py:35-36 flip_tensor + sgta_detector.py:864-871
    _flip_output; no left-right keypoint swap — robot links have no mirror
    pairs, the reference's flip_idx machinery is for human pose). The
    reference's own --flip_test flag is BROKEN on its detector (see
    PARITY.md); this is the working equivalent where TTA is well-defined.
    Both passes run as one doubled batch so the MXU sees one program."""
    in_h, in_w = cfg.model.input_res
    raw_w, raw_h = raw_wh

    def device_fn(images_netin):
        if flip_test:
            T = images_netin.shape[0]
            doubled = jnp.concatenate(
                [images_netin, images_netin[:, :, ::-1, :]], axis=0
            )
            out = model_apply(variables, doubled)
            hm2 = jnp.clip(jax.nn.sigmoid(out["hm"]), 1e-4, 1 - 1e-4)
            hm = (hm2[:T] + hm2[T:, :, ::-1, :]) / 2.0
        else:
            out = model_apply(variables, images_netin)
            hm = jnp.clip(jax.nn.sigmoid(out["hm"]), 1e-4, 1 - 1e-4)
        zeros = jnp.zeros(hm.shape[:3] + (2,), hm.dtype)

        def decode_one(h):
            return decode_lib.decode_heatmaps(
                h, zeros[0], zeros[0],
                max_peaks=cfg.infer.max_peaks,
                peak_thresh=cfg.infer.peak_thresh,
                ambiguity_gap=cfg.infer.ambiguity_gap,
                peak_offset=cfg.infer.peak_offset,
                sigma=cfg.infer.peak_sigma,
                use_reg=False,
                ref_sort=cfg.infer.ref_sort,
                # no reg head here: "logquad" is honored, reg-dependent
                # modes fall back to the DREAM windowed average (see decode)
                coord_mode=cfg.infer.decode_coord,
            )

        dec = jax.vmap(decode_one)(hm)
        return dec.coords, dec.scores, hm.shape[1:3]

    device_fn = jax.jit(device_fn)

    def run(raw_images: np.ndarray):
        from PIL import Image

        mean = np.asarray(IMAGE_MEAN, np.float32)
        std = np.asarray(IMAGE_STD, np.float32)
        netin = []
        for img in np.asarray(raw_images):
            pil = Image.fromarray(np.asarray(img, np.uint8))
            pre = image_space.preprocess_image(pil, (in_w, in_h), "shrink-and-crop")
            netin.append((np.asarray(pre, np.float32) / 255.0 - mean) / std)
        images_netin = jnp.asarray(np.stack(netin))

        coords_netout, scores, (out_h, out_w) = device_fn(images_netin)
        coords_netout = np.asarray(coords_netout)
        scores = np.asarray(scores)

        missing = coords_netout[..., 0] < -999.0
        netin_pts = image_space.convert_keypoints_to_netin_from_netout(
            coords_netout.reshape(-1, 2), (int(out_w), int(out_h)), (in_w, in_h)
        )
        raw_pts = image_space.convert_keypoints_to_raw_from_netin(
            netin_pts, (in_w, in_h), (raw_w, raw_h), "shrink-and-crop"
        ).reshape(coords_netout.shape)
        raw_pts[missing] = -999.999 * 4
        return raw_pts, scores

    return run
