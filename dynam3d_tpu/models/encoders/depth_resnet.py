"""DDPPO depth encoder: GroupNorm ResNet-50 over 256x256 depth maps.

Port of ``VlnResnetDepthEncoder`` (resnet_encoders.py:15-109), which wraps
habitat-baselines' DDPPO ``ResNetEncoder`` (gibson-2plus-resnet50.pth):
conv7x7/2 -> GN -> ReLU -> maxpool/2 -> 4 bottleneck stages -> 3x3
compression conv to a 2048-element feature map.  The waypoint predictor
flattens it (TRM_net.py:27-31), so the exact [C,H,W] split ([32,8,8] here,
reinterpreted as [128,4,4] by the reference) is irrelevant downstream.

Also ports ``preprocess_depth`` (Policy_Dynam3D_VLN.py:171-186): zero pixels
filled with their row-wise... column-wise max, then affine-mapped to the
[min_depth, max_depth] metric range.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from dynam3d_tpu.config import DepthEncoderConfig

Params = Dict[str, Any]


def preprocess_depth(
    depth: jnp.ndarray, depth_scale: Tuple[float, float] = (0.0, 10.0)
) -> jnp.ndarray:
    """``[B,H,W,1]`` normalized depth -> metric depth (R2R settings).

    Zero (invalid) pixels take the column-wise max of their column
    (Policy_Dynam3D_VLN.py:178-182), then map to metres.
    """
    lo, hi = depth_scale
    cmax = jnp.max(depth, axis=1, keepdims=True)
    d = jnp.where(depth == 0, jnp.broadcast_to(cmax, depth.shape), depth)
    return lo + d * (hi - lo)


def _gn(p: Params, x: jnp.ndarray, groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over NHWC."""
    B, H, W, C = x.shape
    xf = x.astype(jnp.float32).reshape(B, H, W, groups, C // groups)
    mu = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(B, H, W, C)
    return (xf * p["scale"] + p["bias"]).astype(x.dtype)


def _conv(p: Params, x: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    kh = p["w"].shape[0]
    pad = (kh - 1) // 2
    return jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _bottleneck(p: Params, x: jnp.ndarray, stride: int, ngroups: int) -> jnp.ndarray:
    out = jax.nn.relu(_gn(p["gn1"], _conv(p["conv1"], x), ngroups))
    out = jax.nn.relu(_gn(p["gn2"], _conv(p["conv2"], out, stride), ngroups))
    out = _gn(p["gn3"], _conv(p["conv3"], out), ngroups)
    if "down_conv" in p:
        x = _gn(p["down_gn"], _conv(p["down_conv"], x, stride), ngroups)
    return jax.nn.relu(out + x)


_STAGES = [3, 4, 6, 3]  # resnet50


def encode_depth(params: Params, cfg: DepthEncoderConfig, depth: jnp.ndarray) -> jnp.ndarray:
    """``[B,256,256,1]`` -> flattened ``[B,2048]`` spatial features."""
    ng = cfg.ngroups
    x = _conv(params["stem_conv"], depth, stride=2)
    x = jax.nn.relu(_gn(params["stem_gn"], x, ng))
    x = -jax.lax.reduce_window(
        -x, jnp.inf, jax.lax.min, (1, 3, 3, 1), (1, 2, 2, 1), "SAME"
    )  # maxpool 3x3/2
    for si, blocks in enumerate(_STAGES):
        for bi in range(blocks):
            stride = 2 if (bi == 0 and si > 0) else 1
            x = _bottleneck(params["stages"][si][bi], x, stride, ng)
    x = _conv(params["compress_conv"], x)
    x = jax.nn.relu(_gn(params["compress_gn"], x, 1))
    return x.reshape(x.shape[0], -1)


def init_depth_params(key: jax.Array, cfg: DepthEncoderConfig) -> Params:
    ks = iter(jax.random.split(key, 64))

    def conv(k, kh, cin, cout):
        fan = kh * kh * cin
        return {"w": jax.random.normal(k, (kh, kh, cin, cout), jnp.float32) * (2.0 / fan) ** 0.5}

    def gn(c):
        return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}

    bp = cfg.base_planes
    params: Params = {
        "stem_conv": conv(next(ks), 7, 1, bp),
        "stem_gn": gn(bp),
        "stages": [],
    }
    inplanes = bp
    for si, blocks in enumerate(_STAGES):
        planes = bp * (2 ** si)
        stage = []
        for bi in range(blocks):
            blk = {
                "conv1": conv(next(ks), 1, inplanes, planes),
                "gn1": gn(planes),
                "conv2": conv(next(ks), 3, planes, planes),
                "gn2": gn(planes),
                "conv3": conv(next(ks), 1, planes, planes * 4),
                "gn3": gn(planes * 4),
            }
            if bi == 0:
                blk["down_conv"] = conv(next(ks), 1, inplanes, planes * 4)
                blk["down_gn"] = gn(planes * 4)
                inplanes = planes * 4
            stage.append(blk)
        params["stages"].append(stage)
    # 2048-element compression (habitat resnet_policy.py): 8x8 spatial -> 32ch
    params["compress_conv"] = conv(next(ks), 3, inplanes, 32)
    params["compress_gn"] = gn(32)
    return params
