"""DREAM baseline model family (single-frame belief-map networks).

Reference-EXACT rebuilds of ref lib/model/networks/hourglass.py (selected
when --is_ct is false, the DREAM comparison mode — ref model.py:31-41,
sgta_detector.py:50-52):

  * DreamHourglass (:240-576): VGG19-features encoder (torchvision cfg-E
    slice, the first conv replaced to accept n_image_input_channels) with the
    reference's own MaxPool2d(2) between stages, plus BOTH decoder options —
    nearest-upsample (default; note the reference's quirk of NO ReLU after
    the last conv of each upsample stage) and deconv (ConvTranspose k3 s2 p1
    outp1 stages), plus the full_output extra-upsample option. Output at
    input/4 (default) or input/1 (full_output / deconv).
  * ResnetSimple (:97-237): torchvision resnet101 trunk (bottleneck layers
    [3, 4, 23, 3], stride on the 3x3 conv) + 4x [ConvTranspose k4 s2 p1 +
    BN + ReLU] decoder + 1x1 head. Output at input/2 (`full`: input/1 via a
    fifth deconv stage in upsample2).
  * spatial soft-argmax decoder (:14-94; standalone module
    sgtapose/spatial_softmax.py — see spatial_softmax() below).

Flax/NHWC; torch ConvTranspose2d is expressed as an lhs-dilated
conv_general_dilated (XLA's native form). Parameter layout maps 1:1 onto the
reference state_dicts via utils/torch_convert.convert_dream_state_dict, and
randomized-weight forward parity is asserted in tests/test_parity_dream.py.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

BN_MOMENTUM = 0.1


class TorchDeconv(nn.Module):
    """torch.nn.ConvTranspose2d(k, stride=2, padding=p, output_padding=op)
    as an lhs-dilated regular conv. Kernel stored (kh, kw, in, out); the
    converter writes the torch weight transposed + rot180."""

    features: int
    kernel: int
    padding: int
    output_padding: int = 0

    @nn.compact
    def __call__(self, x):
        k, p, op = self.kernel, self.padding, self.output_padding
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        lo = k - 1 - p
        hi = k - 1 - p + op
        out = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(1, 1),
            padding=[(lo, hi), (lo, hi)],
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + b.astype(out.dtype)


class VGGStage(nn.Module):
    """Consecutive VGG19 conv+relu pairs (no pooling — the reference pools
    with its own down_sample between stages)."""

    features: int
    convs: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.convs):
            x = nn.Conv(self.features, (3, 3), padding=1, name=f"conv{i}")(x)
            x = nn.relu(x)
        return x


class DreamHourglass(nn.Module):
    """ref hourglass.py:240-576 (exact structure, see module docstring)."""

    n_keypoints: int
    deconv_decoder: bool = False
    full_output: bool = False
    skip_connections: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        pool = lambda t: nn.max_pool(t, (2, 2), strides=(2, 2))

        # encoder (VGG19 features slices; ref :270-299)
        x_0_1 = VGGStage(64, 2, name="layer_0_1_down")(x)
        x_0_1_d = pool(x_0_1)
        x_0_2 = VGGStage(128, 2, name="layer_0_2_down")(x_0_1_d)
        x_0_2_d = pool(x_0_2)
        x_0_3 = VGGStage(256, 4, name="layer_0_3_down")(x_0_2_d)
        x_0_3_d = pool(x_0_3)
        x_0_4 = VGGStage(512, 4, name="layer_0_4_down")(x_0_3_d)
        x_0_4_d = pool(x_0_4)
        x_0_5 = VGGStage(512, 4, name="layer_0_5_down")(x_0_4_d)

        y = x_0_5 + x_0_4_d if self.skip_connections else x_0_5

        if self.deconv_decoder:
            # ref :302-371: 4x [ConvT(3,2,1,op=1) + ReLU + Conv3x3 + ReLU],
            # last stage deconv-only
            for name, ch, has_conv in (
                ("deconv_0_4", 256, True),
                ("deconv_0_3", 128, True),
                ("deconv_0_2", 64, True),
                ("deconv_0_1", 64, False),
            ):
                skip = {"deconv_0_3": x_0_3_d, "deconv_0_2": x_0_2_d,
                        "deconv_0_1": x_0_1_d}.get(name)
                if self.skip_connections and skip is not None:
                    y = y + skip
                y = TorchDeconv(ch, kernel=3, padding=1, output_padding=1,
                                name=f"{name}_deconv")(y)
                y = nn.relu(y)
                if has_conv:
                    y = nn.Conv(ch, (3, 3), padding=1, name=f"{name}_conv")(y)
                    y = nn.relu(y)
            if self.skip_connections:
                y = y + x_0_1
        else:
            # ref :383-440: nearest x2 + conv + relu + conv (NO trailing relu)
            def up_stage(t, mid, out, name):
                B, H, W, C = t.shape
                t = jax.image.resize(t, (B, H * 2, W * 2, C), "nearest")
                t = nn.Conv(mid, (3, 3), padding=1, name=f"{name}_conv1")(t)
                t = nn.relu(t)
                return nn.Conv(out, (3, 3), padding=1, name=f"{name}_conv2")(t)

            y = up_stage(y, 256, 256, "upsample_0_4")
            if self.skip_connections:
                y = y + x_0_3_d
            y = up_stage(y, 128, 64, "upsample_0_3")

            if self.full_output:
                def full_stage(t, name):
                    B, H, W, C = t.shape
                    t = jax.image.resize(t, (B, H * 2, W * 2, C), "nearest")
                    t = nn.Conv(64, (3, 3), padding=1, name=f"{name}_conv1")(t)
                    t = nn.relu(t)
                    t = nn.Conv(64, (3, 3), padding=1, name=f"{name}_conv2")(t)
                    return nn.relu(t)

                y = full_stage(y, "upsample_0_2")
                y = full_stage(y, "upsample_0_1")

        # output head (ref :442-454)
        y = nn.Conv(64, (3, 3), padding=1, name="heads_0_conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(32, (3, 3), padding=1, name="heads_0_conv2")(y)
        y = nn.relu(y)
        hm = nn.Conv(self.n_keypoints, (3, 3), padding=1, name="heads_0_out")(y)
        return {"hm": hm}


class Bottleneck(nn.Module):
    """torchvision ResNet Bottleneck (stride on the 3x3 conv)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, name=name
        )
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=False, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = bn("bn3")(y)
        if self.has_downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               name="downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(y + identity)


class ResnetSimple(nn.Module):
    """ref hourglass.py:97-237: resnet101 trunk + deconv decoder."""

    n_keypoints: int
    full: bool = False
    # torchvision resnet101 layout; smaller values make cheap test instances
    blocks: Sequence[int] = (3, 4, 23, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for stage, (planes, n) in enumerate(zip((64, 128, 256, 512),
                                                self.blocks)):
            for b in range(n):
                stride = 2 if (b == 0 and stage > 0) else 1
                x = Bottleneck(
                    planes, stride, has_downsample=(b == 0),
                    name=f"layer{stage + 1}_{b}",
                )(x, train)

        # decoder: 4x [ConvT(4,2,1) + BN + ReLU] (ref :116-160)
        for i in range(4):
            x = TorchDeconv(256, kernel=4, padding=1, name=f"up{i}_deconv")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM, name=f"up{i}_bn")(x)
            x = nn.relu(x)
        if self.full:
            # ref :163-216 full variant: fifth deconv stage (upsample2)
            x = TorchDeconv(256, kernel=4, padding=1, name="up4_deconv")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM, name="up4_bn")(x)
            x = nn.relu(x)
        hm = nn.Conv(self.n_keypoints, (1, 1), name="head")(x)
        return {"hm": hm}


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
