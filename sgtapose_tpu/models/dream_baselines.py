"""DREAM baseline model family (single-frame belief-map networks).

Capability rebuild of ref lib/model/networks/hourglass.py:
  * DreamHourglass (:240-576): VGG19-style encoder + upsampling decoder
    emitting per-keypoint belief maps (used when --is_ct is false, the DREAM
    comparison mode — ref model.py:31-41, sgta_detector.py:50-52)
  * ResnetSimple (:97-237): ResNet trunk + deconv decoder
  * embedded soft-argmax head option (:14-94; standalone module
    sgtapose/spatial_softmax.py — see spatial_softmax() below)

Flax/NHWC re-designs, not translations: the VGG encoder keeps the reference's
channel schedule (64, 128, 256, 512) and output stride, the decoder upsamples
back to 1/4 resolution with conv-relu stages.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


class VGGBlock(nn.Module):
    features: int
    convs: int

    @nn.compact
    def __call__(self, x):
        for _ in range(self.convs):
            x = nn.Conv(self.features, kernel_size=(3, 3), padding=1)(x)
            x = nn.relu(x)
        return nn.max_pool(x, (2, 2), strides=(2, 2))


class DreamHourglass(nn.Module):
    """VGG19-ish encoder-decoder -> (B, H/4, W/4, n_keypoints) belief maps."""

    n_keypoints: int
    deconv_decoder: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # encoder: strides 2, 4, 8, 16
        x = VGGBlock(64, 2, name="enc1")(x)
        x = VGGBlock(128, 2, name="enc2")(x)
        x = VGGBlock(256, 4, name="enc3")(x)
        x = VGGBlock(512, 4, name="enc4")(x)

        # decoder: two 2x upsample stages back to stride 4
        for i, ch in enumerate((256, 128)):
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, H * 2, W * 2, C), "bilinear")
            x = nn.Conv(ch, kernel_size=(3, 3), padding=1, name=f"dec{i}_conv1")(x)
            x = nn.relu(x)
            x = nn.Conv(ch, kernel_size=(3, 3), padding=1, name=f"dec{i}_conv2")(x)
            x = nn.relu(x)

        x = nn.Conv(64, kernel_size=(3, 3), padding=1, name="head_conv")(x)
        x = nn.relu(x)
        return {"hm": nn.Conv(self.n_keypoints, kernel_size=(1, 1), name="hm")(x)}


class ResBottleneck(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        resid = x
        y = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if resid.shape != y.shape:
            resid = nn.Conv(self.features * 4, (1, 1),
                            strides=(self.stride, self.stride), use_bias=False)(x)
            resid = nn.BatchNorm(use_running_average=not train)(resid)
        return nn.relu(y + resid)


class ResnetSimple(nn.Module):
    """ResNet trunk + upsample decoder -> belief maps at 1/4 res."""

    n_keypoints: int
    blocks: Sequence[int] = (2, 3, 4, 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = (64, 128, 256, 512)
        for stage, (f, n) in enumerate(zip(feats, self.blocks)):
            for b in range(n):
                stride = 2 if (b == 0 and stage > 0) else 1
                x = ResBottleneck(f, stride, name=f"s{stage}_b{b}")(x, train)
        # stride 32 -> 4: three 2x upsample stages
        for i, ch in enumerate((256, 128, 64)):
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, H * 2, W * 2, C), "bilinear")
            x = nn.Conv(ch, (3, 3), padding=1, name=f"up{i}")(x)
            x = nn.relu(x)
        return {"hm": nn.Conv(self.n_keypoints, (1, 1), name="hm")(x)}


def spatial_softmax(
    belief_maps: jnp.ndarray, beta: float = 25.0, smooth_pool: int = 7
) -> jnp.ndarray:
    """Soft-argmax keypoint decoder (ref sgtapose/spatial_softmax.py:15-95
    SoftArgmaxPavlo: 7x7 average smoothing, temperature-beta spatial softmax,
    expectation over the coordinate grid).

    belief_maps: (B, H, W, K) -> (B, K, 2) float (x, y) in map coords.
    """
    B, H, W, K = belief_maps.shape
    x = belief_maps
    if smooth_pool > 1:
        x = nn.avg_pool(
            x, (smooth_pool, smooth_pool), strides=(1, 1),
            padding=((smooth_pool // 2,) * 2, (smooth_pool // 2,) * 2),
        )
    logits = (x * beta).transpose(0, 3, 1, 2).reshape(B, K, H * W)
    probs = jax.nn.softmax(logits, axis=-1).reshape(B, K, H, W)
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    ex = jnp.einsum("bkhw,w->bk", probs, xs)
    ey = jnp.einsum("bkhw,h->bk", probs, ys)
    return jnp.stack([ex, ey], axis=-1)
