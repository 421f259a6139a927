"""YOLACT training: multibox loss + data-parallel train step.

Replaces the reference's training stack (src/python/train.py:172 SGD with
CustomDataParallel multi-GPU DP; layers/modules/multibox_loss.py). The JAX
form: one pure loss over static-shaped padded ground truth, `jax.grad`, an
optax SGD-momentum step, and data parallelism as a batch-axis sharding over
a Mesh -- XLA inserts the gradient all-reduce (the NCCL allreduce of
CustomDataParallel) automatically.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .yolact import Yolact, make_priors, decode_boxes, PROTO_DIM


class GTBatch(NamedTuple):
    """Padded ground truth for a batch.

    images: (B, S, S, 3) normalized;
    boxes: (B, G, 4) normalized xyxy; labels: (B, G) int32 (-1 pad, 0-based
    foreground classes); masks: (B, G, Hp, Wp) float32 {0,1} at proto res.
    """

    images: jax.Array
    boxes: jax.Array
    labels: jax.Array
    masks: jax.Array


def _encode(matched: jax.Array, priors: jax.Array) -> jax.Array:
    """xyxy gt -> SSD offsets wrt priors (variances 0.1/0.2)."""
    g_c = (matched[..., :2] + matched[..., 2:]) * 0.5
    g_wh = jnp.maximum(matched[..., 2:] - matched[..., :2], 1e-6)
    d_c = (g_c - priors[:, :2]) / (0.1 * priors[:, 2:])
    d_wh = jnp.log(g_wh / priors[:, 2:]) / 0.2
    return jnp.concatenate([d_c, d_wh], axis=-1)


def _prior_gt_iou(priors: jax.Array, boxes: jax.Array) -> jax.Array:
    """(P,4 cxcywh) x (G,4 xyxy) -> (P,G) IoU."""
    p = jnp.concatenate(
        [priors[:, :2] - priors[:, 2:] * 0.5, priors[:, :2] + priors[:, 2:] * 0.5],
        axis=-1,
    )
    x1 = jnp.maximum(p[:, None, 0], boxes[None, :, 0])
    y1 = jnp.maximum(p[:, None, 1], boxes[None, :, 1])
    x2 = jnp.minimum(p[:, None, 2], boxes[None, :, 2])
    y2 = jnp.minimum(p[:, None, 3], boxes[None, :, 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    ap = (p[:, 2] - p[:, 0]) * (p[:, 3] - p[:, 1])
    ag = jnp.clip(boxes[:, 2] - boxes[:, 0], 0) * jnp.clip(
        boxes[:, 3] - boxes[:, 1], 0
    )
    return inter / jnp.maximum(ap[:, None] + ag[None, :] - inter, 1e-9)


def multibox_loss(
    model: Yolact,
    params,
    priors: jax.Array,
    batch: GTBatch,
    pos_iou: float = 0.5,
    neg_ratio: int = 3,
    mask_weight: float = 6.125,
    box_weight: float = 1.5,
):
    """Reference multibox_loss.py contract: smooth-L1 loc on positives,
    OHEM cross-entropy conf (neg:pos = 3), BCE on assembled+cropped masks."""
    loc, conf, coef, proto = model.apply(params, batch.images)
    B, P = loc.shape[:2]
    G = batch.boxes.shape[1]

    def per_image(loc_i, conf_i, coef_i, proto_i, boxes, labels, masks):
        gt_valid = labels >= 0
        iou = jnp.where(gt_valid[None, :], _prior_gt_iou(priors, boxes), -1.0)
        best_gt = jnp.argmax(iou, axis=1)                     # (P,)
        best_iou = jnp.max(iou, axis=1)
        # force: each gt's best prior is positive with that gt
        best_prior = jnp.argmax(iou, axis=0)                  # (G,)
        forced = jnp.zeros(P, bool).at[best_prior].set(gt_valid)
        forced_gt = jnp.zeros(P, jnp.int32).at[best_prior].set(
            jnp.where(gt_valid, jnp.arange(G), 0)
        )
        pos = (best_iou > pos_iou) | forced
        gt_idx = jnp.where(forced, forced_gt, best_gt)
        n_pos = jnp.maximum(jnp.sum(pos), 1)

        # localization
        target = _encode(boxes[gt_idx], priors)
        diff = jnp.abs(loc_i - target)
        sl1 = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
        loss_loc = jnp.sum(jnp.sum(sl1, -1) * pos) / n_pos

        # classification with OHEM (labels are 0-based foreground; +1 makes
        # room for background class 0)
        cls_target = jnp.where(pos, labels[gt_idx] + 1, 0)
        logp = jax.nn.log_softmax(conf_i, axis=-1)
        ce = -jnp.take_along_axis(logp, cls_target[:, None], axis=-1)[:, 0]
        # hard negatives: rank background losses
        neg_score = jnp.where(pos, -jnp.inf, -logp[:, 0])
        k = jnp.minimum(neg_ratio * n_pos, P - n_pos)
        thresh = jnp.sort(neg_score)[::-1][jnp.clip(k, 1, P) - 1]
        neg = (~pos) & (neg_score >= thresh) & jnp.isfinite(neg_score)
        loss_conf = jnp.sum(ce * (pos | neg)) / n_pos

        # mask: BCE of sigmoid(proto @ coef) vs the matched gt mask
        m_pred = jnp.einsum("hwc,pc->phw", proto_i, coef_i)
        m_gt = masks[gt_idx]                                  # (P, Hp, Wp)
        bce = optax.sigmoid_binary_cross_entropy(m_pred, m_gt)
        # crop to gt box like the reference (mask loss inside box only)
        Hp, Wp = proto_i.shape[:2]
        ys = jnp.linspace(0, 1, Hp)[None, :, None]
        xs = jnp.linspace(0, 1, Wp)[None, None, :]
        b = boxes[gt_idx]
        inside = (
            (xs >= b[:, 0, None, None]) & (xs <= b[:, 2, None, None])
            & (ys >= b[:, 1, None, None]) & (ys <= b[:, 3, None, None])
        )
        area = jnp.maximum(jnp.sum(inside, axis=(1, 2)), 1)
        m_loss = jnp.sum(bce * inside, axis=(1, 2)) / area
        loss_mask = jnp.sum(m_loss * pos) / n_pos
        return loss_loc, loss_conf, loss_mask

    ll, lc, lm = jax.vmap(per_image)(
        loc, conf, coef, proto, batch.boxes, batch.labels, batch.masks
    )
    return (
        box_weight * jnp.mean(ll)
        + jnp.mean(lc)
        + mask_weight * jnp.mean(lm)
    ), {"loc": jnp.mean(ll), "conf": jnp.mean(lc), "mask": jnp.mean(lm)}


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def make_train_step(model: Yolact, priors: jax.Array, lr: float = 1e-3,
                    momentum: float = 0.9, weight_decay: float = 5e-4):
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(lr, momentum=momentum),
    )

    def init(params) -> TrainState:
        return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    def step(state: TrainState, batch: GTBatch):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: multibox_loss(model, p, priors, batch), has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss, aux

    return init, step
