"""Additional model variants (the reference's arch zoo, C12).

Rebuilds of ref lib/model/networks/dla.py variants:
  * SGTAPoseThree  — 3-frame window model (DLA_PlanAWindow_Three :1349-1456,
    BaseModelPlanA_Three base_model.py:203-299): Siamese trunk over
    (ppre, pre, cur), two cross-attention stages (ppre->pre, pre->cur) with
    optionally SHARED attention weights (--shared_ca)
  * SGTAPoseCat    — channel-concat temporal baseline (DLA_PlanACAT
    :1106-1156): no attention, previous+current features concatenated and
    mixed by a 1x1 conv per level
  * SGTAPoseGlobal — DLA_PlanA (:1021-1104): global top-K=28 attention on all
    6 levels, tokens selected by flat-index fractions of the FULL-RES
    1-channel priors (get_topk_pairs :889-896), plain MHA without position
    bias (TransformerEncoderLayerOri/MHCA :745-846)
  * SGTAPoseWindowDense — DLA_PlanAWindow (:1252-1346): levels 0-2 windowed
    attention like the flagship, levels 3-5 DENSE per-pixel concat+cat_layer
    MLP fusion
  * SGTAPoseAblation — DLA_PlanAAblation (:1158-1248): dense cat_layer fusion
    at every level; trunk sharing / prior wiring selected by ablation_mode
    (ref opt.phase: ablation_wo_shared / ablation_shared /
    ablation_shared_repro)
All reuse the same trunk/decoder/head modules as the flagship.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import flax.linen as nn

from sgtapose_tpu.config import ModelConfig
from sgtapose_tpu.models import attention as attn_lib
from sgtapose_tpu.models.dla import DLA34Backbone, DLAUp, IDAUp, Stem
from sgtapose_tpu.models.sgta import HeadConv


class _DecoderHeads(nn.Module):
    """Shared DLAUp+IDAUp+heads tail. width_mult widens every decoder level
    (DLA_PlanACAT runs the decoder at 2x width over channel-concatenated
    features, ref dla.py:1125-1133)."""

    cfg: ModelConfig
    width_mult: int = 1

    @nn.compact
    def __call__(self, fused: List[jnp.ndarray], train: bool = False):
        cfg = self.cfg
        channels = tuple(c * self.width_mult for c in (16, 32, 64, 128, 256, 512))
        first_level, last_level = 2, 5
        dla_channels = channels[first_level:]
        scales = tuple(2 ** i for i in range(len(dla_channels)))
        outs = DLAUp(first_level, dla_channels, scales, cfg.dla_node, dcn_chunks=cfg.dcn_chunks, dcn_remat=cfg.dcn_remat, name="dla_up")(
            fused[first_level:], train
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


class _WindowAttention(nn.Module):
    """One level's windowed cross-attention + substitution (shared machinery
    of all PlanA variants)."""

    cfg: ModelConfig
    level: int

    @nn.compact
    def __call__(self, key_feats, query_feats, key_hm_cls, query_hm_cls, train=False):
        cfg = self.cfg
        i = self.level
        K = cfg.k_list[i]
        kernel = cfg.kernel_list[i]
        scale = cfg.scale_list[i]
        Hf, Wf, C = query_feats.shape[1], query_feats.shape[2], query_feats.shape[3]

        key_xy = attn_lib.topk_class_indices(key_hm_cls, K)
        query_xy = attn_lib.topk_class_indices(query_hm_cls, K)
        key_ids = attn_lib.window_feat_ids(key_xy, scale, kernel, Hf, Wf)
        query_ids = attn_lib.window_feat_ids(query_xy, scale, kernel, Hf, Wf)
        key_tokens = attn_lib.gather_window_features(key_feats, key_ids)
        query_tokens = attn_lib.gather_window_features(query_feats, query_ids)

        if i < 3:
            n_tokens = cfg.num_classes * K * (1 + 2 * (kernel // 2)) ** 2
            out = attn_lib.TransformerEncoder(
                d_inp=16 * (2 ** i),
                d_model=4 * (2 ** i),
                n_tokens=n_tokens,
                num_layers=cfg.num_decoder_layers,
                n_heads=cfg.n_heads,
                pos_embed=cfg.pos_embed,
                use_fused=cfg.fused_attention,
                fused_interpret=cfg.fused_attention_interpret,
                name="transformer",
            )(query_tokens, key_tokens, key_tokens, train)
        else:
            out = key_tokens
        merged = attn_lib.CatLayer(C, name="cat_layer")(
            jnp.concatenate([out, query_tokens], axis=-1)
        )
        return attn_lib.scatter_window_features(query_feats, query_ids, merged)


class SGTAPoseThree(nn.Module):
    """Three-frame variant (ref DLA_PlanAWindow_Three dla.py:1349-1456):
    levels 0-2, the CURRENT frame's windowed queries attend BOTH the ppre and
    pre frames' keys in parallel (two transformer stacks, optionally shared
    via --shared_ca), then cat([ppre_out, pre_out, cur_query]) goes through a
    3C->6C->C cat_layer and substitutes back at the current windows; levels
    3-5 fuse densely per pixel through the same-shaped cat_layer.

    Reproduced reference quirk (dla.py:1443): the dense path assigns
    `ppre_f = pre_feats...` — the ppre features are NEVER used at levels 3-5;
    pre is concatenated twice. Kept for checkpoint parity.
    """

    cfg: ModelConfig
    shared_ca: bool = False  # share attention weights between the two keys

    @nn.compact
    def __call__(
        self,
        cur_img, ppre_img, pre_img,
        ppre_hm, pre_hm, repro_hm,
        ppre_hm_cls, pre_hm_cls, repro_hm_cls,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        B = cur_img.shape[0]
        channels = (16, 32, 64, 128, 256, 512)

        stem_img = Stem(channels[0], name="pre_img_stem")
        stem_hm = Stem(channels[0], name="pre_hm_stem")
        imgs = jnp.concatenate([ppre_img, pre_img, cur_img], axis=0)
        hms = jnp.concatenate([ppre_hm, pre_hm, repro_hm], axis=0)
        feats = DLA34Backbone(channels, name="base")(
            stem_img(imgs, train) + stem_hm(hms, train), train
        )
        ppre = [f[:B] for f in feats]
        pre = [f[B : 2 * B] for f in feats]
        cur = [f[2 * B :] for f in feats]

        fused = []
        for i in range(6):
            C = channels[i]
            if i < 3:
                K = cfg.k_list[i]
                kernel = cfg.kernel_list[i]
                scale = cfg.scale_list[i]
                Hf, Wf = cur[i].shape[1], cur[i].shape[2]
                ppre_xy = attn_lib.topk_class_indices(ppre_hm_cls, K)
                pre_xy = attn_lib.topk_class_indices(pre_hm_cls, K)
                cur_xy = attn_lib.topk_class_indices(repro_hm_cls, K)
                ppre_ids = attn_lib.window_feat_ids(ppre_xy, scale, kernel, Hf, Wf)
                pre_ids = attn_lib.window_feat_ids(pre_xy, scale, kernel, Hf, Wf)
                cur_ids = attn_lib.window_feat_ids(cur_xy, scale, kernel, Hf, Wf)
                ppre_key = attn_lib.gather_window_features(ppre[i], ppre_ids)
                pre_key = attn_lib.gather_window_features(pre[i], pre_ids)
                cur_query = attn_lib.gather_window_features(cur[i], cur_ids)

                n_tokens = cfg.num_classes * K * (1 + 2 * (kernel // 2)) ** 2
                mk_tr = lambda name: attn_lib.TransformerEncoder(
                    d_inp=16 * (2 ** i),
                    d_model=4 * (2 ** i),
                    n_tokens=n_tokens,
                    num_layers=cfg.num_decoder_layers,
                    n_heads=cfg.n_heads,
                    pos_embed=cfg.pos_embed,
                    use_fused=cfg.fused_attention,
                    fused_interpret=cfg.fused_attention_interpret,
                    name=name,
                )
                pre_tr = mk_tr(f"prev_transformer_{i}")
                ppre_tr = pre_tr if self.shared_ca else mk_tr(f"pprev_transformer_{i}")
                ppre_out = ppre_tr(cur_query, ppre_key, ppre_key, train)
                pre_out = pre_tr(cur_query, pre_key, pre_key, train)
                merged = attn_lib.CatLayer(C, hidden=C * 6, name=f"cat_layer_{i}")(
                    jnp.concatenate([ppre_out, pre_out, cur_query], axis=-1)
                )
                fused.append(
                    attn_lib.scatter_window_features(cur[i], cur_ids, merged)
                )
            else:
                # ref quirk: pre concatenated twice, ppre unused (dla.py:1443)
                dense = jnp.concatenate([pre[i], pre[i], cur[i]], axis=-1)
                fused.append(
                    attn_lib.CatLayer(C, hidden=C * 6, name=f"cat_layer_{i}")(dense)
                )

        return _DecoderHeads(cfg, name="decoder")(fused, train)


class _DenseCatFusion(nn.Module):
    """Per-pixel 2-layer MLP fusion of (pre, cur) features — the reference's
    cat_layer applied DENSELY over the whole map (DLA_PlanAWindow levels 3-5
    dla.py:1330-1336; DLA_PlanAAblation all levels :1205-1240). Channel order
    is cat([pre, cur])."""

    features: int

    @nn.compact
    def __call__(self, pre_f, cur_f):
        x = jnp.concatenate([pre_f, cur_f], axis=-1)
        return attn_lib.CatLayer(self.features, name="mlp")(x)


class SGTAPoseGlobal(nn.Module):
    """DLA_PlanA (ref dla.py:1021-1104): global top-K attention on all 6
    levels. Tokens come from the top-K=28 flat indices of the FULL-RES
    1-channel pre/repro priors, renormalized into each level's flat index
    space (the reference's idx/(H*W) fraction quirk). Attention is plain MHA
    (no learned position bias), 3 weight-tied layers per level. The cls
    priors are accepted for interface parity but unused (as in the ref)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self, cur_img, pre_img, pre_hm, repro_hm,
        pre_hm_cls=None, repro_hm_cls=None, train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        B = cur_img.shape[0]
        channels = (16, 32, 64, 128, 256, 512)

        stem_img = Stem(channels[0], name="pre_img_stem")
        stem_hm = Stem(channels[0], name="pre_hm_stem")
        imgs = jnp.concatenate([pre_img, cur_img], axis=0)
        hms = jnp.concatenate([pre_hm, repro_hm], axis=0)
        feats = DLA34Backbone(channels, name="base")(
            stem_img(imgs, train) + stem_hm(hms, train), train
        )

        pre_frac = attn_lib.topk_flat_fractions(pre_hm, cfg.topk_global)
        cur_frac = attn_lib.topk_flat_fractions(repro_hm, cfg.topk_global)

        fused = []
        for i in range(6):
            pre_f, cur_f = feats[i][:B], feats[i][B:]
            Hf, Wf, C = pre_f.shape[1], pre_f.shape[2], pre_f.shape[3]
            pre_ids = attn_lib.flat_ids_from_fractions(pre_frac, Hf, Wf)
            cur_ids = attn_lib.flat_ids_from_fractions(cur_frac, Hf, Wf)
            pre_key = attn_lib.gather_window_features(pre_f, pre_ids)
            cur_query = attn_lib.gather_window_features(cur_f, cur_ids)
            out = attn_lib.TransformerEncoder(
                d_inp=16 * (2 ** i),
                d_model=4 * (2 ** i),
                n_tokens=cfg.topk_global,
                num_layers=cfg.num_decoder_layers,
                n_heads=cfg.n_heads,
                pos_embed=False,  # TransformerEncoderLayerOri uses plain MHCA
                name=f"transformer_{i}",
            )(cur_query, pre_key, pre_key, train)
            merged = attn_lib.CatLayer(C, name=f"cat_layer_{i}")(
                jnp.concatenate([out, cur_query], axis=-1)
            )
            fused.append(attn_lib.scatter_window_features(cur_f, cur_ids, merged))

        return _DecoderHeads(cfg, name="decoder")(fused, train)


class SGTAPoseWindowDense(nn.Module):
    """DLA_PlanAWindow (ref dla.py:1252-1346): levels 0-2 windowed
    cross-attention (same machinery as the flagship), levels 3-5 dense
    per-pixel concat + cat_layer MLP fusion (no top-k substitution)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self, cur_img, pre_img, pre_hm, repro_hm,
        pre_hm_cls, repro_hm_cls, train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        B = cur_img.shape[0]
        channels = (16, 32, 64, 128, 256, 512)

        stem_img = Stem(channels[0], name="pre_img_stem")
        stem_hm = Stem(channels[0], name="pre_hm_stem")
        imgs = jnp.concatenate([pre_img, cur_img], axis=0)
        hms = jnp.concatenate([pre_hm, repro_hm], axis=0)
        feats = DLA34Backbone(channels, name="base")(
            stem_img(imgs, train) + stem_hm(hms, train), train
        )

        fused = []
        for i in range(6):
            pre_f, cur_f = feats[i][:B], feats[i][B:]
            if i < 3:
                fused.append(
                    _WindowAttention(cfg, i, name=f"attn_{i}")(
                        pre_f, cur_f, pre_hm_cls, repro_hm_cls, train
                    )
                )
            else:
                fused.append(
                    _DenseCatFusion(channels[i], name=f"cat_layer_{i}")(pre_f, cur_f)
                )
        return _DecoderHeads(cfg, name="decoder")(fused, train)


class SGTAPoseAblation(nn.Module):
    """DLA_PlanAAblation (ref dla.py:1158-1248): dense cat_layer fusion at
    every level; ablation_mode selects trunk sharing + prior wiring:
      wo_shared    — separate trunks; cur pass gets NO prior heatmap
      shared       — shared trunk;   cur pass gets NO prior heatmap
      shared_repro — shared trunk;   cur pass conditioned on repro_hm
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self, cur_img, pre_img, pre_hm, repro_hm,
        pre_hm_cls=None, repro_hm_cls=None, train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        mode = cfg.ablation_mode
        if mode not in ("wo_shared", "shared", "shared_repro"):
            raise ValueError(f"unknown ablation_mode: {mode}")
        B = cur_img.shape[0]
        channels = (16, 32, 64, 128, 256, 512)

        stem_img = Stem(channels[0], name="pre_img_stem")
        stem_hm = Stem(channels[0], name="pre_hm_stem")
        if mode == "wo_shared":
            # two trunks: base (prev, with prior) and base1 (cur, no prior)
            pre_stem = stem_img(pre_img, train) + stem_hm(pre_hm, train)
            pre_feats = DLA34Backbone(channels, name="base")(pre_stem, train)
            cur_stem = Stem(channels[0], name="cur_img_stem")(cur_img, train)
            cur_feats = DLA34Backbone(channels, name="base1")(cur_stem, train)
            pre = pre_feats
            cur = cur_feats
        else:
            if mode == "shared_repro":
                imgs = jnp.concatenate([pre_img, cur_img], axis=0)
                hms = jnp.concatenate([pre_hm, repro_hm], axis=0)
                stem = stem_img(imgs, train) + stem_hm(hms, train)
            else:  # shared: cur pass without any prior heatmap stem
                imgs = jnp.concatenate([pre_img, cur_img], axis=0)
                stem = stem_img(imgs, train)
                stem = jnp.concatenate(
                    [stem[:B] + stem_hm(pre_hm, train), stem[B:]], axis=0
                )
            feats = DLA34Backbone(channels, name="base")(stem, train)
            pre = [f[:B] for f in feats]
            cur = [f[B:] for f in feats]

        fused = [
            _DenseCatFusion(channels[i], name=f"cat_layer_{i}")(pre[i], cur[i])
            for i in range(6)
        ]
        return _DecoderHeads(cfg, name="decoder")(fused, train)


class SGTAPoseCat(nn.Module):
    """Channel-concat temporal baseline (no attention). Matches the
    reference's structure exactly: per-level concat([pre, cur]) with NO
    mixing layer, then DLAUp/IDAUp at DOUBLE width (channels_up = 2*channels,
    ref dla.py:1125-1133, 1142-1147)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self, cur_img, pre_img, pre_hm, repro_hm,
        pre_hm_cls=None, repro_hm_cls=None, train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        B = cur_img.shape[0]
        channels = (16, 32, 64, 128, 256, 512)
        stem_img = Stem(channels[0], name="pre_img_stem")
        stem_hm = Stem(channels[0], name="pre_hm_stem")
        imgs = jnp.concatenate([pre_img, cur_img], axis=0)
        hms = jnp.concatenate([pre_hm, repro_hm], axis=0)
        feats = DLA34Backbone(channels, name="base")(
            stem_img(imgs, train) + stem_hm(hms, train), train
        )
        fused = [
            jnp.concatenate([feats[i][:B], feats[i][B:]], axis=-1)
            for i in range(6)
        ]
        return _DecoderHeads(cfg, width_mult=2, name="decoder")(fused, train)
