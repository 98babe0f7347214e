"""Flagship SGTAPose model: DLA-34 + l3new windowed temporal cross-attention.

Re-design of ref DLA_PlanAWindow_l3new (lib/model/networks/dla.py:1458-1554)
+ BaseModelPlanA heads (lib/model/networks/base_model.py:102-200):

  * Siamese shared backbone over (pre_img, pre_hm) and (cur_img, repro_hm) —
    both passes use the SAME stems and trunk weights (ref dla.py:1506-1507),
    so we stack the two frames along batch and run the trunk ONCE (2B batch):
    half the kernel launches, larger MXU-friendly shapes.
  * levels 0-2: per-class top-k of the 120^2 prior cls heatmaps -> window
    gather -> 3x weight-tied cross-attention (current queries attend previous
    keys) -> cat_layer MLP write-back.
  * levels 3-5: top-k gather from previous features substituted directly
    through the cat_layer (no transformer) (ref dla.py:1536-1543).
  * DLAUp + IDAUp decode to 64ch @ output res; heads hm(7)/reg(2)/tracking(2),
    hm head bias initialized to prior_bias=-4.6 (ref base_model.py:62);
    the `wh` head is omitted (ref base_model.py:114-115).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from sgtapose_tpu.config import ModelConfig
from sgtapose_tpu.models import attention as attn_lib
from sgtapose_tpu.models.dla import DLA34Backbone, DLAUp, IDAUp, Stem
from sgtapose_tpu.models.layers import Conv


class HeadConv(nn.Module):
    """Per-head conv stack: 3x3 (64->head_conv) + ReLU + 1x1 (->classes)
    (ref base_model.py:121-154 with head_conv=[256])."""

    classes: int
    head_conv: int = 256
    out_bias_init: float = 0.0

    @nn.compact
    def __call__(self, x):
        # the 3x3 is quantizable; the 1x1 output conv stays full-precision
        # (hm/reg values feed sub-pixel decode directly)
        x = Conv(self.head_conv, kernel_size=(3, 3), padding=1, use_bias=True)(x)
        x = nn.relu(x)
        return nn.Conv(
            self.classes,
            kernel_size=(1, 1),
            use_bias=True,
            bias_init=nn.initializers.constant(self.out_bias_init),
        )(x)


class SGTAPose(nn.Module):
    """DLA_PlanAWindow_l3new equivalent. NHWC inputs:
      cur_img     (B, H, W, 3)    current frame, normalized
      pre_img     (B, H, W, 3)    previous frame, normalized
      pre_hm      (B, H, W, 1)    previous-detection prior heatmap
      repro_hm    (B, H, W, 1)    PnP-reprojection prior heatmap
      pre_hm_cls  (B, H/4, W/4, C) per-class previous prior
      repro_hm_cls(B, H/4, W/4, C) per-class reprojection prior
    Returns {"hm": (B, H/4, W/4, C), "reg": (B, H/4, W/4, 2),
             "tracking": (B, H/4, W/4, 2)} raw logits (hm pre-sigmoid).

    setup()-style so `trunk` and `fuse` are separately applicable
    (model.apply(..., method=SGTAPose.trunk)) — the streaming detector's
    feature-cache fast path reuses frame t-1's current-pass trunk features
    as frame t's previous-pass features, halving Siamese FLOPs
    (docs/PERF.md; infer/detector.py make_cached_video_detector).
    """

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        channels = (16, 32, 64, 128, 256, 512)
        self._channels = channels
        self.pre_img_stem = Stem(channels[0])
        self.pre_hm_stem = Stem(channels[0])
        self.base = DLA34Backbone(channels)
        for i in range(3):
            K = cfg.k_list[i]
            kernel = cfg.kernel_list[i]
            n_tokens = cfg.num_classes * K * (1 + 2 * (kernel // 2)) ** 2
            setattr(
                self,
                f"transformer_{i}",
                attn_lib.TransformerEncoder(
                    d_inp=16 * (2 ** i),
                    d_model=4 * (2 ** i),
                    n_tokens=n_tokens,
                    num_layers=cfg.num_decoder_layers,
                    n_heads=cfg.n_heads,
                    pos_embed=cfg.pos_embed,
                    use_fused=cfg.fused_attention,
                    fused_interpret=cfg.fused_attention_interpret,
                ),
            )
        for i in range(6):
            setattr(self, f"cat_layer_{i}", attn_lib.CatLayer(channels[i]))

        first_level, last_level = 2, 5
        dla_channels = channels[first_level:]
        scales = tuple(2 ** i for i in range(len(dla_channels)))
        self.dla_up = DLAUp(first_level, dla_channels, scales, cfg.dla_node, dcn_chunks=cfg.dcn_chunks, dcn_remat=cfg.dcn_remat)
        self.ida_up = IDAUp(
            dla_channels[0],
            tuple(dla_channels[: last_level - first_level]),
            tuple(2 ** i for i in range(last_level - first_level)),
            cfg.dla_node,
            dcn_chunks=cfg.dcn_chunks,
            dcn_remat=cfg.dcn_remat,
        )
        self.hm = HeadConv(cfg.num_classes, cfg.head_conv, cfg.prior_bias)
        self.reg = HeadConv(2, cfg.head_conv)
        self.tracking = HeadConv(2, cfg.head_conv)

    def trunk(self, imgs, hms, train: bool = False) -> List[jnp.ndarray]:
        """One backbone pass: img stem + prior-hm stem summed, 6 levels out
        (ref dla.py:314-337 base forward fusion)."""
        stem_out = self.pre_img_stem(imgs, train) + self.pre_hm_stem(hms, train)
        return self.base(stem_out, train)

    def fuse(
        self,
        pre_feats: List[jnp.ndarray],
        cur_feats: List[jnp.ndarray],
        pre_hm_cls: jnp.ndarray,
        repro_hm_cls: jnp.ndarray,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Temporal fusion + decode + heads over precomputed trunk features."""
        cfg = self.cfg
        channels = self._channels

        fused: List[jnp.ndarray] = []
        for i in range(6):
            K = cfg.k_list[i]
            kernel = cfg.kernel_list[i]
            scale = cfg.scale_list[i]
            Hf, Wf = pre_feats[i].shape[1], pre_feats[i].shape[2]

            pre_xy = attn_lib.topk_class_indices(pre_hm_cls, K)
            cur_xy = attn_lib.topk_class_indices(repro_hm_cls, K)
            pre_ids = attn_lib.window_feat_ids(pre_xy, scale, kernel, Hf, Wf)
            cur_ids = attn_lib.window_feat_ids(cur_xy, scale, kernel, Hf, Wf)
            pre_key = attn_lib.gather_window_features(pre_feats[i], pre_ids)
            cur_query = attn_lib.gather_window_features(cur_feats[i], cur_ids)

            if i < 3:
                out = getattr(self, f"transformer_{i}")(
                    cur_query, pre_key, pre_key, train
                )
            else:
                out = pre_key

            merged = getattr(self, f"cat_layer_{i}")(
                jnp.concatenate([out, cur_query], axis=-1)
            )
            fused.append(
                attn_lib.scatter_window_features(cur_feats[i], cur_ids, merged)
            )

        first_level, last_level = 2, 5
        outs = self.dla_up(fused[first_level:], train)
        y = [outs[i] for i in range(last_level - first_level)]
        y = self.ida_up(y, 0, len(y), train)
        feat = y[-1]  # (B, H/4, W/4, 64)

        # wh omitted, ref base_model.py:114-115
        return {
            "hm": self.hm(feat),
            "reg": self.reg(feat),
            "tracking": self.tracking(feat),
        }

    def __call__(
        self,
        cur_img: jnp.ndarray,
        pre_img: jnp.ndarray,
        pre_hm: jnp.ndarray,
        repro_hm: jnp.ndarray,
        pre_hm_cls: jnp.ndarray,
        repro_hm_cls: jnp.ndarray,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        B = cur_img.shape[0]
        # Siamese trunk, batched: [prev; cur] along batch (same weights, one
        # pass, larger MXU-friendly shapes; ref dla.py:1506-1507 runs twice)
        imgs = jnp.concatenate([pre_img, cur_img], axis=0)
        hms = jnp.concatenate([pre_hm, repro_hm], axis=0)
        feats = self.trunk(imgs, hms, train)
        pre_feats = [f[:B] for f in feats]
        cur_feats = [f[B:] for f in feats]
        return self.fuse(pre_feats, cur_feats, pre_hm_cls, repro_hm_cls, train)


class CenterNetSingle(nn.Module):
    """Single-frame baseline (vanilla DLASeg / CenterNet path, ref
    dla.py:626-674) — used for the `CenterNet` training phase and as a
    no-temporal-context ablation."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, cur_img, pre_img=None, pre_hm=None, train: bool = False):
        cfg = self.cfg
        channels = (16, 32, 64, 128, 256, 512)
        stem = Stem(channels[0], name="base_stem")(cur_img, train)
        if pre_img is not None:
            # CenterTrack conditioning (ref dla.py:314-331: base + pre_img
            # + pre_hm stems summed)
            stem = stem + Stem(channels[0], name="pre_img_stem")(pre_img, train)
        if pre_hm is not None:
            stem = stem + Stem(channels[0], name="pre_hm_stem")(pre_hm, train)
        feats = DLA34Backbone(channels, name="base")(stem, train)
        first_level, last_level = 2, 5
        dla_channels = channels[first_level:]
        scales = tuple(2 ** i for i in range(len(dla_channels)))
        outs = DLAUp(first_level, dla_channels, scales, cfg.dla_node, dcn_chunks=cfg.dcn_chunks, dcn_remat=cfg.dcn_remat, name="dla_up")(
            feats[first_level:], train
        )
        y = [outs[i] for i in range(last_level - first_level)]
        y = IDAUp(
            dla_channels[0],
            tuple(dla_channels[: last_level - first_level]),
            tuple(2 ** i for i in range(last_level - first_level)),
            cfg.dla_node,
            dcn_chunks=cfg.dcn_chunks,
            dcn_remat=cfg.dcn_remat,
            name="ida_up",
        )(y, 0, len(y), train)
        feat = y[-1]
        return {
            "hm": HeadConv(cfg.num_classes, cfg.head_conv, cfg.prior_bias, name="hm")(feat),
            "reg": HeadConv(2, cfg.head_conv, name="reg")(feat),
            "tracking": HeadConv(2, cfg.head_conv, name="tracking")(feat),
        }


def create_model(cfg: ModelConfig):
    """Arch factory (ref model.py:14-29 _network_factory + create_model).
    Every reference _network_factory name maps to its TRUE architecture —
    unknown or unimplemented names raise instead of silently routing to the
    flagship. Names: dlapawdl3new_34 (flagship), dlapa_34 (global attention),
    dlapawd_34 (window + dense tail), dlapawd3_34 (3-frame,
    dlapawd3shared_34 with shared CA), dlapacat_34 (concat baseline),
    dlaabla_34 (ablations via cfg.ablation_mode), dreamhourglass,
    resnetsimple, dlaseg/centernet (single-frame)."""
    arch = cfg.arch.split("_")[0]
    if arch == "dlapawdl3new":
        return SGTAPose(cfg)
    if arch == "dlapa":
        from sgtapose_tpu.models.variants import SGTAPoseGlobal

        return SGTAPoseGlobal(cfg)
    if arch == "dlapawd":
        from sgtapose_tpu.models.variants import SGTAPoseWindowDense

        return SGTAPoseWindowDense(cfg)
    if arch == "dlaabla":
        from sgtapose_tpu.models.variants import SGTAPoseAblation

        return SGTAPoseAblation(cfg)
    if arch in ("dlapawd3", "dlapawthree"):
        from sgtapose_tpu.models.variants import SGTAPoseThree

        return SGTAPoseThree(cfg)
    if arch in ("dlapawd3shared",):
        from sgtapose_tpu.models.variants import SGTAPoseThree

        return SGTAPoseThree(cfg, shared_ca=True)
    if arch in ("dlapacat",):
        from sgtapose_tpu.models.variants import SGTAPoseCat

        return SGTAPoseCat(cfg)
    if arch in ("dreamhourglass",):
        from sgtapose_tpu.models.dream_baselines import DreamHourglass

        return DreamHourglass(cfg.num_classes)
    if arch in ("resnetsimple",):
        from sgtapose_tpu.models.dream_baselines import ResnetSimple

        return ResnetSimple(cfg.num_classes)
    if arch in ("dlaseg", "centernet", "dla"):
        return CenterNetSingle(cfg)
    raise ValueError(f"unknown arch: {cfg.arch}")
