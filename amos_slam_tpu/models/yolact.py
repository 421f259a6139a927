"""YOLACT instance segmentation in JAX/Flax.

TPU-native rebuild of the reference's PyTorch YOLACT (src/python/yolact.py:
ResNet-FPN backbone, ProtoNet mask prototypes, shared PredictionModule
heads, Detect fast-NMS). Everything after the backbone keeps static shapes:
detection returns fixed-size (top_k,) padded results with validity masks,
and fast-NMS is the batched triangular-IoU trick (one (N, N) IoU matrix,
no sequential suppression loop) -- the same algorithm the paper introduced,
which happens to be exactly the TPU-friendly formulation.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .resnet import ResNet

# COCO config of the reference (src/python/config.py yolact_base_config)
IMG_SIZE = 550
NUM_CLASSES = 81          # 80 + background
PROTO_DIM = 32
FPN_DIM = 256
SCALES = (24, 48, 96, 192, 384)
ASPECT_RATIOS = (1.0, 0.5, 2.0)
MEANS = np.array([103.94, 116.78, 123.68], np.float32)   # BGR means
STD = np.array([57.38, 57.12, 58.40], np.float32)


class FPN(nn.Module):
    """Feature pyramid (reference yolact.py:265): laterals on C3..C5,
    3x3 smoothing, plus two stride-2 extra levels P6, P7."""

    dim: int = FPN_DIM

    @nn.compact
    def __call__(self, c3, c4, c5):
        p5 = nn.Conv(self.dim, (1, 1), name="lat2")(c5)
        up4 = jax.image.resize(p5, c4.shape[:-1] + (self.dim,), "bilinear")
        p4 = nn.Conv(self.dim, (1, 1), name="lat1")(c4) + up4
        up3 = jax.image.resize(p4, c3.shape[:-1] + (self.dim,), "bilinear")
        p3 = nn.Conv(self.dim, (1, 1), name="lat0")(c3) + up3

        p3 = nn.relu(nn.Conv(self.dim, (3, 3), padding=1, name="pred0")(p3))
        p4 = nn.relu(nn.Conv(self.dim, (3, 3), padding=1, name="pred1")(p4))
        p5 = nn.relu(nn.Conv(self.dim, (3, 3), padding=1, name="pred2")(p5))
        p6 = nn.Conv(self.dim, (3, 3), strides=(2, 2), padding=1, name="down0")(p5)
        p7 = nn.Conv(self.dim, (3, 3), strides=(2, 2), padding=1, name="down1")(p6)
        return p3, p4, p5, p6, p7


class ProtoNet(nn.Module):
    """Mask prototype branch on P3 (reference yolact.py ProtoNet config)."""

    dim: int = PROTO_DIM

    @nn.compact
    def __call__(self, p3):
        y = p3
        for i in range(3):
            y = nn.relu(
                nn.Conv(256, (3, 3), padding=1, name=f"conv{i}")(y)
            )
        h, w = y.shape[-3] * 2, y.shape[-2] * 2
        y = jax.image.resize(y, y.shape[:-3] + (h, w, y.shape[-1]), "bilinear")
        y = nn.relu(nn.Conv(256, (3, 3), padding=1, name="conv3")(y))
        y = nn.Conv(self.dim, (1, 1), name="conv4")(y)
        return nn.relu(y)


class PredictionHead(nn.Module):
    """Shared head applied to every FPN level (reference yolact.py:47)."""

    num_classes: int = NUM_CLASSES
    num_anchors: int = len(ASPECT_RATIOS)
    proto_dim: int = PROTO_DIM

    @nn.compact
    def __call__(self, x):
        y = nn.relu(nn.Conv(256, (3, 3), padding=1, name="upfeature")(x))
        a = self.num_anchors
        loc = nn.Conv(4 * a, (3, 3), padding=1, name="bbox")(y)
        conf = nn.Conv(self.num_classes * a, (3, 3), padding=1, name="conf")(y)
        coef = jnp.tanh(
            nn.Conv(self.proto_dim * a, (3, 3), padding=1, name="mask")(y)
        )
        B = x.shape[0]
        loc = loc.reshape(B, -1, 4)
        conf = conf.reshape(B, -1, self.num_classes)
        coef = coef.reshape(B, -1, self.proto_dim)
        return loc, conf, coef


class Yolact(nn.Module):
    num_classes: int = NUM_CLASSES
    backbone_layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, images):
        """images: (B, H, W, 3) normalized. Returns (loc, conf, coef, proto)."""
        c2, c3, c4, c5 = ResNet(self.backbone_layers, name="backbone")(images)
        p3, p4, p5, p6, p7 = FPN(name="fpn")(c3, c4, c5)
        proto = ProtoNet(name="proto_net")(p3)
        head = PredictionHead(self.num_classes, name="pred_head")
        locs, confs, coefs = [], [], []
        for p in (p3, p4, p5, p6, p7):
            l, c, m = head(p)
            locs.append(l)
            confs.append(c)
            coefs.append(m)
        return (
            jnp.concatenate(locs, axis=1),
            jnp.concatenate(confs, axis=1),
            jnp.concatenate(coefs, axis=1),
            proto,
        )


def make_priors(img_size: int = IMG_SIZE) -> np.ndarray:
    """Anchor boxes (cx, cy, w, h) normalized, matching the reference's
    PredictionModule.make_priors (yolact.py): square-rooted aspect ratios,
    one scale per level."""
    priors = []
    for lvl, scale in enumerate(SCALES):
        stride = 2 ** (lvl + 3)          # P3 stride 8 ... P7 stride 128
        fs = (img_size + stride - 1) // stride
        for y in range(fs):
            for x in range(fs):
                cx = (x + 0.5) / fs
                cy = (y + 0.5) / fs
                for ar in ASPECT_RATIOS:
                    r = np.sqrt(ar)
                    w = scale * r / img_size
                    h = scale / r / img_size
                    priors.append([cx, cy, w, h])
    return np.asarray(priors, np.float32)


def decode_boxes(loc: jax.Array, priors: jax.Array) -> jax.Array:
    """SSD-style decode with variances (0.1, 0.2) -> (x1, y1, x2, y2)."""
    cxy = priors[:, :2] + loc[..., :2] * 0.1 * priors[:, 2:]
    wh = priors[:, 2:] * jnp.exp(loc[..., 2:] * 0.2)
    return jnp.concatenate([cxy - wh * 0.5, cxy + wh * 0.5], axis=-1)


def _iou_matrix(boxes: jax.Array) -> jax.Array:
    """(N, 4) xyxy -> (N, N) IoU."""
    x1 = jnp.maximum(boxes[:, None, 0], boxes[None, :, 0])
    y1 = jnp.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x2 = jnp.minimum(boxes[:, None, 2], boxes[None, :, 2])
    y2 = jnp.minimum(boxes[:, None, 3], boxes[None, :, 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    area = jnp.clip(boxes[:, 2] - boxes[:, 0], 0) * jnp.clip(
        boxes[:, 3] - boxes[:, 1], 0
    )
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


class Detections(NamedTuple):
    boxes: jax.Array    # (K, 4) normalized xyxy
    scores: jax.Array   # (K,)
    classes: jax.Array  # (K,) int32 (0-based, background removed)
    coefs: jax.Array    # (K, PROTO_DIM)
    valid: jax.Array    # (K,)


def detect(
    loc: jax.Array, conf: jax.Array, coef: jax.Array, priors: jax.Array,
    top_k: int = 100, pre_nms: int = 200, conf_th: float = 0.05,
    nms_iou: float = 0.5,
) -> Detections:
    """Fast-NMS detection for ONE image (vmap for batches).

    Reference Detect (yolact.py:379-470): per-class top-200, fast NMS
    (upper-triangular IoU max), global top-k. Static shapes throughout.
    """
    boxes = decode_boxes(loc, priors)                       # (P, 4)
    probs = jax.nn.softmax(conf, axis=-1)[:, 1:]            # drop background
    P, C = probs.shape

    # class-agnostic candidate pool: take pre_nms highest class-scores
    best_cls = jnp.argmax(probs, axis=-1)
    best_score = jnp.max(probs, axis=-1)
    top_score, top_idx = jax.lax.top_k(best_score, pre_nms)
    cand_boxes = boxes[top_idx]
    cand_cls = best_cls[top_idx]
    cand_coef = coef[top_idx]
    ok = top_score > conf_th

    # fast NMS: suppress a box if a higher-scored SAME-CLASS box overlaps
    iou = _iou_matrix(cand_boxes)
    same = cand_cls[:, None] == cand_cls[None, :]
    upper = jnp.triu(jnp.ones((pre_nms, pre_nms), bool), k=1)
    max_iou = jnp.max(
        jnp.where(upper.T & same, iou, 0.0), axis=1
    )  # for each i, max IoU vs higher-ranked same-class j < i
    keep = ok & (max_iou <= nms_iou)

    score = jnp.where(keep, top_score, 0.0)
    sel_score, sel = jax.lax.top_k(score, top_k)
    return Detections(
        boxes=cand_boxes[sel],
        scores=sel_score,
        classes=cand_cls[sel].astype(jnp.int32),
        coefs=cand_coef[sel],
        valid=sel_score > conf_th,
    )


def assemble_masks(
    proto: jax.Array, det: Detections, mask_th: float = 0.5
) -> jax.Array:
    """(Hp, Wp, PROTO) prototypes + detections -> (K, Hp, Wp) binary masks,
    cropped to their boxes (reference postprocess, layers/output_utils)."""
    m = jax.nn.sigmoid(
        jnp.einsum("hwc,kc->khw", proto, det.coefs)
    )
    Hp, Wp = proto.shape[:2]
    ys = jnp.linspace(0, 1, Hp)[None, :, None]
    xs = jnp.linspace(0, 1, Wp)[None, None, :]
    b = det.boxes
    inside = (
        (xs >= b[:, 0, None, None]) & (xs <= b[:, 2, None, None])
        & (ys >= b[:, 1, None, None]) & (ys <= b[:, 3, None, None])
    )
    return (m > mask_th) & inside & det.valid[:, None, None]
