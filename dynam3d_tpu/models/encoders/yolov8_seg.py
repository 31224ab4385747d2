"""FastSAM (YOLOv8-seg) inference in functional JAX.

Port of the reference's vendored FastSAM stack (models/fastsam/{model,predict,
prompt}.py over ultralytics' YOLOv8): a CSPDarknet/C2f backbone + PAN neck +
decoupled Detect head with DFL box regression + Segment head with 32
prototype masks.  Inference settings from the reference call site:
``retina_masks=True, imgsz=576, conf=0.4, iou=0.8`` (feature_fields.py:757),
single "object" class (everything prompt).

TPU design notes:
  - all shapes static; NMS keeps a fixed ``max_masks`` set with a validity
    mask instead of ultralytics' dynamic filtering;
  - ``segment_id_map`` reproduces ``FastSAMPrompt.everything_prompt`` +
    ``get_patch_segm`` (feature_fields.py:400-430): masks overlaid in index
    order (later masks win), downsampled nearest to the 24x24 patch grid,
    then renumbered consecutively by first occurrence.

Weights convert 1:1 from the FastSAM-x checkpoint (see runtime/checkpoint.py);
a ``width=0.25``-style tiny config drives tests.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

REG_MAX = 16  # DFL bins


# --------------------------------------------------------------------------
# building blocks
# --------------------------------------------------------------------------
def _conv(p: Params, x: jnp.ndarray, stride: int = 1, act: bool = True) -> jnp.ndarray:
    """Conv2d(+folded BN) + SiLU over NHWC."""
    kh = p["w"].shape[0]
    pad = (kh - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = (y + p["b"]).astype(x.dtype)
    return jax.nn.silu(y) if act else y


def _bottleneck(p: Params, x: jnp.ndarray, shortcut: bool) -> jnp.ndarray:
    y = _conv(p["cv2"], _conv(p["cv1"], x))
    return x + y if shortcut else y


def _c2f(p: Params, x: jnp.ndarray, shortcut: bool) -> jnp.ndarray:
    y = _conv(p["cv1"], x)
    a, b = jnp.split(y, 2, axis=-1)
    outs = [a, b]
    for bp in p["m"]:
        outs.append(_bottleneck(bp, outs[-1], shortcut))
    return _conv(p["cv2"], jnp.concatenate(outs, axis=-1))


def _sppf(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = _conv(p["cv1"], x)
    pools = [y]
    for _ in range(3):
        pools.append(
            -jax.lax.reduce_window(
                -pools[-1], jnp.inf, jax.lax.min, (1, 5, 5, 1), (1, 1, 1, 1), "SAME"
            )
        )
    return _conv(p["cv2"], jnp.concatenate(pools, axis=-1))


def _upsample2(x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    return jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C)).reshape(
        B, 2 * H, 2 * W, C
    )


# --------------------------------------------------------------------------
# model
# --------------------------------------------------------------------------
def channels(width: float, max_ch: int = 512) -> List[int]:
    base = [64, 128, 256, 512, max_ch]
    return [max(16, int(round(c * width / 16)) * 16) if c * width >= 16 else int(c * width) for c in base]


class SegOutput(NamedTuple):
    boxes: jnp.ndarray     # [B,A,4] xyxy (input-pixel coords)
    scores: jnp.ndarray    # [B,A]
    coeffs: jnp.ndarray    # [B,A,np] mask coefficients
    protos: jnp.ndarray    # [B,Hp,Wp,np] prototype masks (input/4)


def forward(p: Params, x: jnp.ndarray, depth_n: Sequence[int] = (3, 6, 6, 3)) -> SegOutput:
    """Full backbone+neck+heads.  ``x``: normalized [B,H,W,3] in [0,1]."""
    n1, n2, n3, n4 = depth_n
    x = _conv(p["stem"], x, 2)                     # P1/2
    x = _conv(p["down1"], x, 2)                    # P2/4
    x = _c2f(p["c2f1"], x, True)
    x = _conv(p["down2"], x, 2)                    # P3/8
    p3 = _c2f(p["c2f2"], x, True)
    x = _conv(p["down3"], p3, 2)                   # P4/16
    p4 = _c2f(p["c2f3"], x, True)
    x = _conv(p["down4"], p4, 2)                   # P5/32
    x = _c2f(p["c2f4"], x, True)
    p5 = _sppf(p["sppf"], x)

    # PAN neck
    u = jnp.concatenate([_upsample2(p5), p4], axis=-1)
    n_p4 = _c2f(p["neck1"], u, False)
    u = jnp.concatenate([_upsample2(n_p4), p3], axis=-1)
    n_p3 = _c2f(p["neck2"], u, False)
    d = _conv(p["pan1"], n_p3, 2)
    n_p4b = _c2f(p["neck3"], jnp.concatenate([d, n_p4], axis=-1), False)
    d = _conv(p["pan2"], n_p4b, 2)
    n_p5 = _c2f(p["neck4"], jnp.concatenate([d, p5], axis=-1), False)

    feats = [n_p3, n_p4b, n_p5]
    strides = [8, 16, 32]

    # prototypes from P3
    pr = _conv(p["proto"]["cv1"], n_p3)
    pr = _upsample2(pr)
    pr = _conv(p["proto"]["cv2"], pr)
    protos = _conv(p["proto"]["cv3"], pr, act=False)  # [B,H/4,W/4,np]

    boxes_all, scores_all, coeffs_all = [], [], []
    for i, (f, s) in enumerate(zip(feats, strides)):
        B, H, W, _ = f.shape
        box = _conv(
            p["det"][i]["box2"],
            _conv(p["det"][i]["box1"], _conv(p["det"][i]["box0"], f)),
            act=False,
        )  # [B,H,W,4*REG_MAX]
        cls = _conv(
            p["det"][i]["cls2"],
            _conv(p["det"][i]["cls1"], _conv(p["det"][i]["cls0"], f)),
            act=False,
        )  # [B,H,W,1]
        mc = _conv(
            p["det"][i]["m2"],
            _conv(p["det"][i]["m1"], _conv(p["det"][i]["m0"], f)),
            act=False,
        )  # [B,H,W,np]

        # DFL: softmax expectation over REG_MAX bins per side
        d4 = box.reshape(B, H * W, 4, REG_MAX)
        dist = jnp.sum(
            jax.nn.softmax(d4, axis=-1) * jnp.arange(REG_MAX, dtype=jnp.float32),
            axis=-1,
        )  # [B,HW,4] (l,t,r,b) in stride units
        cx = (jnp.arange(W, dtype=jnp.float32) + 0.5)[None, :]
        cy = (jnp.arange(H, dtype=jnp.float32) + 0.5)[:, None]
        cxg = jnp.broadcast_to(cx, (H, W)).reshape(-1)
        cyg = jnp.broadcast_to(cy, (H, W)).reshape(-1)
        x1 = (cxg[None] - dist[..., 0]) * s
        y1 = (cyg[None] - dist[..., 1]) * s
        x2 = (cxg[None] + dist[..., 2]) * s
        y2 = (cyg[None] + dist[..., 3]) * s
        boxes_all.append(jnp.stack([x1, y1, x2, y2], axis=-1))
        scores_all.append(jax.nn.sigmoid(cls.reshape(B, H * W)))
        coeffs_all.append(mc.reshape(B, H * W, -1))

    return SegOutput(
        boxes=jnp.concatenate(boxes_all, axis=1),
        scores=jnp.concatenate(scores_all, axis=1),
        coeffs=jnp.concatenate(coeffs_all, axis=1),
        protos=protos,
    )


# --------------------------------------------------------------------------
# postprocess: fixed-capacity NMS + mask composition
# --------------------------------------------------------------------------
def _iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    return inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)


def nms_select(
    boxes: jnp.ndarray, scores: jnp.ndarray, conf: float, iou_thr: float,
    max_masks: int, pre_topk: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with static shapes: top-``pre_topk`` by score, suppress by
    IoU, keep <= max_masks.  Returns (indices into A, keep_mask)."""
    pre_topk = min(pre_topk, scores.shape[-1])
    sc = jnp.where(scores >= conf, scores, -1.0)
    top_sc, top_idx = jax.lax.top_k(sc, pre_topk)
    bx = boxes[top_idx]
    iou = _iou_matrix(bx)
    order_better = (top_sc[None, :] > top_sc[:, None]) | (
        (top_sc[None, :] == top_sc[:, None])
        & (jnp.arange(pre_topk)[None, :] < jnp.arange(pre_topk)[:, None])
    )

    def body(i, keep):
        suppressed = jnp.any(keep & order_better[i] & (iou[i] > iou_thr))
        ok = (top_sc[i] >= conf) & ~suppressed
        return keep.at[i].set(ok)

    keep = jax.lax.fori_loop(0, pre_topk, body, jnp.zeros((pre_topk,), bool))
    # cap to max_masks highest-score kept
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    keep = keep & (rank < max_masks)
    kidx = jnp.where(keep, jnp.arange(pre_topk), pre_topk - 1)
    # compact: first max_masks kept, in score order (top_idx is score-sorted)
    sortk = jnp.sort(jnp.where(keep, jnp.arange(pre_topk), pre_topk))[:max_masks]
    valid = sortk < pre_topk
    sortk = jnp.minimum(sortk, pre_topk - 1)
    del kidx
    return top_idx[sortk], valid


def segment_id_map(
    out: SegOutput,
    img_hw: Tuple[int, int],
    grid_hw: Tuple[int, int],
    conf: float = 0.4,
    iou_thr: float = 0.8,
    max_masks: int = 64,
) -> jnp.ndarray:
    """Final FastSAM contract: ``[B, gh*gw] int32`` patch segment ids.

    Composition matches get_patch_segm (feature_fields.py:410-420): start
    from mask 0's footprint, overwrite with each subsequent mask's footprint,
    nearest-downsample, renumber consecutively.  Pixels covered by no mask
    keep mask-0's id (the reference clones mask 0 as the canvas).
    """
    H, W = img_hw
    gh, gw = grid_hw
    B = out.boxes.shape[0]

    def per_image(boxes, scores, coeffs, protos):
        idx, valid = nms_select(boxes, scores, conf, iou_thr, max_masks)
        bx = boxes[idx]
        cf = coeffs[idx]                        # [M,np]
        # mask logits at proto res
        m = jnp.einsum("hwc,mc->mhw", protos, cf, preferred_element_type=jnp.float32)
        m = jax.nn.sigmoid(m)
        # crop to boxes (proto res = H/4)
        Hp, Wp = protos.shape[0], protos.shape[1]
        ys = (jnp.arange(Hp, dtype=jnp.float32) + 0.5) * (H / Hp)
        xs = (jnp.arange(Wp, dtype=jnp.float32) + 0.5) * (W / Wp)
        inbox = (
            (xs[None, None, :] >= bx[:, None, None, 0])
            & (xs[None, None, :] <= bx[:, None, None, 2])
            & (ys[None, :, None] >= bx[:, None, None, 1])
            & (ys[None, :, None] <= bx[:, None, None, 3])
        )
        binm = (m > 0.5) & inbox & valid[:, None, None]     # [M,Hp,Wp]
        # overlay in index order: later masks overwrite (":412-413")
        mid = jnp.arange(binm.shape[0], dtype=jnp.int32)
        canvas = jnp.zeros((Hp, Wp), jnp.int32)
        canvas = jnp.max(
            jnp.where(binm, mid[:, None, None] + 1, 0), axis=0
        )  # 0 = background / mask0 canvas; later idx wins on overlap via max?
        # NOTE: the reference overwrites sequentially (last wins); max(id)
        # equals last-wins because ids increase with index.
        # downsample nearest to the patch grid
        ri = jnp.floor(jnp.arange(gh) * (Hp / gh)).astype(jnp.int32)
        ci = jnp.floor(jnp.arange(gw) * (Wp / gw)).astype(jnp.int32)
        small = canvas[ri][:, ci].reshape(-1)
        # renumber consecutively by first occurrence of sorted unique ids
        # (torch.unique is sorted — feature_fields.py:418)
        uniq = jnp.unique(small, size=max_masks + 1, fill_value=jnp.int32(1 << 30))
        ranks = jnp.searchsorted(uniq, small)
        return ranks.astype(jnp.int32)

    return jax.vmap(per_image)(out.boxes, out.scores, out.coeffs, out.protos)


def segment_views(
    params: Params,
    seg_cfg,                  # config.SegmenterConfig
    rgb: jnp.ndarray,         # [N,H,W,3] uint8 views
    grid_hw: Tuple[int, int],
    max_segments: int,
) -> jnp.ndarray:
    """rgb views -> ``[N, gh*gw] int32`` patch segment ids (the live
    perception provider).

    Mirrors the reference FastSAM invocation (feature_fields.py:750-780):
    bilinear resize to ``imgsz`` (square->square, so ultralytics' letterbox
    degenerates to a plain resize), /255 normalization, everything-prompt
    inference at conf/iou from config, then ``get_patch_segm``-style id-map
    composition (segment_id_map).  Ids are clamped into the memory's
    ``max_segments`` id space.
    """
    s = seg_cfg.imgsz
    x = jnp.asarray(rgb).astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (x.shape[0], s, s, 3), method="bilinear")
    out = forward(params, x, depth_n=seg_cfg.depth_layers())
    ids = segment_id_map(
        out, (s, s), grid_hw,
        conf=seg_cfg.conf, iou_thr=seg_cfg.iou, max_masks=seg_cfg.max_masks,
    )
    return jnp.minimum(ids, max_segments - 1)


# --------------------------------------------------------------------------
# params
# --------------------------------------------------------------------------
def init_yolov8_params(
    key: jax.Array, width: float = 1.0, depth_n: Sequence[int] = (3, 6, 6, 3),
    num_protos: int = 32, max_ch: int = 512,
) -> Params:
    ch = channels(width, max_ch)  # [c1..c5]
    ks = iter(jax.random.split(key, 256))

    def conv(cin, cout, k=3):
        fan = k * k * cin
        return {
            "w": jax.random.normal(next(ks), (k, k, cin, cout), jnp.float32)
            * (2.0 / fan) ** 0.5,
            "b": jnp.zeros((cout,), jnp.float32),
        }

    def c2f(cin, cout, n, e=0.5):
        hidden = int(cout * e)
        return {
            "cv1": conv(cin, 2 * hidden, 1),
            "m": [
                {"cv1": conv(hidden, hidden, 3), "cv2": conv(hidden, hidden, 3)}
                for _ in range(n)
            ],
            "cv2": conv((2 + n) * hidden, cout, 1),
        }

    c1, c2, c3, c4, c5 = ch
    n1, n2, n3, n4 = depth_n
    npr = num_protos
    p: Params = {
        "stem": conv(3, c1),
        "down1": conv(c1, c2),
        "c2f1": c2f(c2, c2, n1),
        "down2": conv(c2, c3),
        "c2f2": c2f(c3, c3, n2),
        "down3": conv(c3, c4),
        "c2f3": c2f(c4, c4, n3),
        "down4": conv(c4, c5),
        "c2f4": c2f(c5, c5, n4),
        "sppf": {"cv1": conv(c5, c5 // 2, 1), "cv2": conv(c5 * 2, c5, 1)},
        "neck1": c2f(c5 + c4, c4, n1),
        "neck2": c2f(c4 + c3, c3, n1),
        "pan1": conv(c3, c3),
        "neck3": c2f(c3 + c4, c4, n1),
        "pan2": conv(c4, c4),
        "neck4": c2f(c4 + c5, c5, n1),
        "proto": {
            "cv1": conv(c3, c3, 3),
            "cv2": conv(c3, c3, 3),
            "cv3": conv(c3, npr, 1),
        },
        "det": [],
    }
    for cf in (c3, c4, c5):
        cbox = max(16, 4 * REG_MAX)
        ccls = max(c3, 16)
        cm = max(c3 // 4, npr)
        p["det"].append(
            {
                "box0": conv(cf, cbox),
                "box1": conv(cbox, cbox),
                "box2": conv(cbox, 4 * REG_MAX, 1),
                "cls0": conv(cf, ccls),
                "cls1": conv(ccls, ccls),
                "cls2": conv(ccls, 1, 1),
                "m0": conv(cf, cm),
                "m1": conv(cm, cm),
                "m2": conv(cm, npr, 1),
            }
        )
    return p
