"""DLA-34 backbone + iterative deep aggregation decoder, in Flax (NHWC).

Re-design of the reference's torch DLA (ref: lib/model/networks/dla.py:41-363
backbone; :470-624 DLAUp/IDAUp decoder) for TPU:
  * NHWC layout throughout (XLA's native conv layout on TPU)
  * conditioning stems (7x7 convs for pre_img / pre_hm / repro_hm summed into
    the level-0 features — ref dla.py:259-276, 314-337)
  * decoder nodes are modulated deformable convs (DCNv2 equivalent) or plain
    convs, selected by `node_type` (ref DLA_NODE dla.py:620-624)
  * depthwise transposed-conv upsampling with bilinear initialization
    (ref fill_up_weights dla.py:486-495), expressed as lhs-dilated
    conv_general_dilated (XLA-friendly form of ConvTranspose)

The backbone __call__ takes an already-summed stem input so the Siamese
two-frame pass can be batched: both frames use the same (pre_img, pre_hm) stem
weights (ref dla.py:1506-1507), so we stack them along batch and run the
backbone ONCE — twice the batch, half the kernel launches, better MXU shapes.
"""

from __future__ import annotations

import math
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from sgtapose_tpu.models.deform_conv import DeformConv2d
from sgtapose_tpu.models.layers import Conv

BN_MOMENTUM = 0.9  # flax momentum = 1 - torch momentum(0.1)


class ConvBnAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(
            self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=self.dilation * (self.kernel // 2),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM)(x)
        if self.act:
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    """Two 3x3 convs + residual (ref dla.py:41-69)."""

    features: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        out = ConvBnAct(self.features, 3, self.stride, self.dilation)(x, train)
        out = Conv(
            self.features,
            kernel_size=(3, 3),
            padding=self.dilation,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
        )(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM)(out)
        return nn.relu(out + residual)


class Root(nn.Module):
    """1x1 conv over concatenated children (ref dla.py:157-175)."""

    features: int
    residual: bool = False

    @nn.compact
    def __call__(self, children: Sequence[jnp.ndarray], train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = Conv(self.features, kernel_size=(1, 1), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM)(x)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    """Hierarchical aggregation tree (ref dla.py:178-231).

    Note the reference's `Tree.forward` always overwrites any passed-in
    residual with its own projected bottom, so nested trees each use their own
    projection; we mirror that by computing the residual internally. The
    reference also instantiates (dead) projection convs on levels>1 trees whose
    output is never consumed — we simply don't create those parameters.
    """

    levels: int
    in_features: int
    features: int
    stride: int = 1
    level_root: bool = False
    root_residual: bool = False

    @nn.compact
    def __call__(self, x, children=None, train: bool = False):
        children = [] if children is None else list(children)
        bottom = (
            nn.max_pool(x, (self.stride, self.stride), strides=(self.stride, self.stride))
            if self.stride > 1
            else x
        )
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            if self.in_features != self.features:
                proj = Conv(
                    self.features, kernel_size=(1, 1), use_bias=False, name="project_conv"
                )(bottom)
                proj = nn.BatchNorm(
                    use_running_average=not train, momentum=BN_MOMENTUM, name="project_bn"
                )(proj)
            else:
                proj = bottom
            x1 = BasicBlock(self.features, self.stride, name="tree1")(x, proj, train)
            x2 = BasicBlock(self.features, 1, name="tree2")(x1, None, train)
            out = Root(self.features, self.root_residual, name="root")(
                [x2, x1] + children, train
            )
        else:
            x1 = Tree(
                self.levels - 1,
                self.in_features,
                self.features,
                self.stride,
                root_residual=self.root_residual,
                name="tree1",
            )(x, None, train)
            children.append(x1)
            out = Tree(
                self.levels - 1,
                self.features,
                self.features,
                1,
                root_residual=self.root_residual,
                name="tree2",
            )(x1, children, train)
        return out


class Stem(nn.Module):
    """7x7 conv-bn-relu conditioning stem (ref dla.py:241-276)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.features, kernel_size=(7, 7), padding=3, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM)(x)
        return nn.relu(x)


class DLA34Backbone(nn.Module):
    """DLA-34 trunk: 6 levels, channels (16, 32, 64, 128, 256, 512)
    (ref dla34() dla.py:354-363). `__call__` takes the stem-summed level-0
    input (see module docstring) and returns all 6 level features.
    """

    channels: Tuple[int, ...] = (16, 32, 64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        ch = self.channels
        y = []
        # level0: one conv block at full res; level1: strided conv block
        x = ConvBnAct(ch[0], 3, 1, name="level0")(x, train)
        y.append(x)
        x = ConvBnAct(ch[1], 3, 2, name="level1")(x, train)
        y.append(x)
        x = Tree(1, ch[1], ch[2], 2, level_root=False, name="level2")(x, None, train)
        y.append(x)
        x = Tree(2, ch[2], ch[3], 2, level_root=True, name="level3")(x, None, train)
        y.append(x)
        x = Tree(2, ch[3], ch[4], 2, level_root=True, name="level4")(x, None, train)
        y.append(x)
        x = Tree(1, ch[4], ch[5], 2, level_root=True, name="level5")(x, None, train)
        y.append(x)
        return y


# -----------------------------------------------------------------------------
# Decoder: deformable nodes + bilinear-initialized depthwise upsample
# -----------------------------------------------------------------------------


def _bilinear_upsample_kernel(factor: int) -> jnp.ndarray:
    """(2f, 2f) bilinear kernel (ref fill_up_weights dla.py:486-495)."""
    k = 2 * factor
    f = math.ceil(k / 2)
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    w = jnp.zeros((k, k), jnp.float32)
    iv = jnp.arange(k, dtype=jnp.float32)
    wx = 1 - jnp.abs(iv / f - c)
    return wx[:, None] * wx[None, :]


class DepthwiseUpsample(nn.Module):
    """Trainable depthwise 2f x 2f transposed conv, stride f, bilinear init.

    Implemented as lhs-dilated conv_general_dilated with feature_group_count=C
    (jax.lax has no grouped conv_transpose; this is the equivalent form).
    """

    features: int
    factor: int

    @nn.compact
    def __call__(self, x):
        f = self.factor
        if f == 1:
            return x
        k = 2 * f
        init = _bilinear_upsample_kernel(f)

        def kernel_init(key, shape, dtype=jnp.float32):
            # shape (k, k, 1, C): same bilinear kernel per channel
            return jnp.broadcast_to(init[:, :, None, None], shape).astype(dtype)

        w = self.param("kernel", kernel_init, (k, k, 1, self.features))
        pad = k - 1 - f // 2
        out = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            lhs_dilation=(f, f),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.features,
        )
        return out


class DeformNode(nn.Module):
    """DCN + BN + ReLU decoder node (ref DeformConv dla.py:538-550).

    `dcn_chunks`/`dcn_remat` are large-batch training memory knobs (see
    models/deform_conv.py and docs/PERF.md): slab-chunked sampling bounds the
    gather temps; remat drops the (B,H,W,9C) sampled-activation residual the
    1x1 kernel contraction would otherwise save for its backward.
    """

    features: int
    node_type: str = "dcn"
    dcn_chunks: int = 1
    dcn_remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.node_type == "dcn":
            cls = nn.remat(DeformConv2d) if self.dcn_remat else DeformConv2d
            x = cls(self.features, chunks=self.dcn_chunks, name="conv")(x)
        else:
            x = Conv(self.features, kernel_size=(1, 1), use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM)(x)
        return nn.relu(x)


class IDAUp(nn.Module):
    """Iterative deep aggregation step (ref IDAUp dla.py:552-577):
    for each finer level, project -> upsample -> merge with previous level via
    a node conv, mutating the feature list in place.
    """

    features: int
    in_channels: Tuple[int, ...]
    up_factors: Tuple[int, ...]
    node_type: str = "dcn"
    dcn_chunks: int = 1
    dcn_remat: bool = False

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray], startp: int, endp: int, train: bool = False):
        kw = dict(dcn_chunks=self.dcn_chunks, dcn_remat=self.dcn_remat)
        for i in range(startp + 1, endp):
            j = i - startp
            x = DeformNode(self.features, self.node_type, name=f"proj_{j}", **kw)(
                layers[i], train
            )
            x = DepthwiseUpsample(self.features, int(self.up_factors[j]), name=f"up_{j}")(x)
            layers[i] = DeformNode(self.features, self.node_type, name=f"node_{j}", **kw)(
                x + layers[i - 1], train
            )
        return layers


class DLAUp(nn.Module):
    """Full decoder pyramid (ref DLAUp dla.py:581-606)."""

    startp: int
    channels: Tuple[int, ...]
    scales: Tuple[int, ...]
    node_type: str = "dcn"
    dcn_chunks: int = 1
    dcn_remat: bool = False

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray], train: bool = False):
        layers = list(layers)
        channels = list(self.channels)
        in_channels = list(self.channels)
        scales = list(self.scales)
        out = [layers[-1]]
        for i in range(len(channels) - 1):
            j = -i - 2
            up_f = tuple(s // scales[j] for s in scales[j:])
            ida = IDAUp(
                channels[j],
                tuple(in_channels[j:]),
                up_f,
                self.node_type,
                dcn_chunks=self.dcn_chunks,
                dcn_remat=self.dcn_remat,
                name=f"ida_{i}",
            )
            # operate on the tail of the full layer list, like the reference
            ida(layers, len(layers) - i - 2, len(layers), train)
            out.insert(0, layers[-1])
            scales[j + 1 :] = [scales[j] for _ in scales[j + 1 :]]
            in_channels[j + 1 :] = [channels[j] for _ in in_channels[j + 1 :]]
        return out
