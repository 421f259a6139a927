"""Stage-1 semantic segmenter: RGB frame -> dynamic-object (person) mask.

Replaces the reference's embedded-interpreter bridge (src/yolact.cc:203-318
+ src/python/yolact_interface.py:806-890: resize to the net size, forward,
postprocess at score 0.15 / top-15, sum class-0 "person" masks into one
uint8 mask). Here the whole thing is ONE jitted XLA program on the same
device as the SLAM front end -- the cross-runtime per-frame hop the
reference pays (SURVEY.md section 2d P6) does not exist.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .yolact import (
    IMG_SIZE, MEANS, STD, Yolact, make_priors, detect, assemble_masks,
)


class Segmenter:
    """YOLACT wrapper producing per-frame dynamic masks.

    Args:
      params: a Yolact parameter pytree (e.g. from models.port_torch or a
        JAX checkpoint). Random init (for shape/pipeline testing) if None.
      person_classes: class ids treated as dynamic (reference: person = 0).
    """

    def __init__(
        self,
        params=None,
        key: Optional[jax.Array] = None,
        num_classes: int = 81,
        person_classes: Tuple[int, ...] = (0,),
        score_th: float = 0.15,
        top_k: int = 15,
        compute_dtype=jnp.bfloat16,
        img_size: int = IMG_SIZE,
    ):
        """img_size: network input resolution. 550 is the reference's
        yolact_base; 400 matches its yolact_im400 config
        (src/python/config.py) at ~2x the stage-1 throughput -- priors,
        boxes, and masks are all resolution-normalized, so the SAME ported
        weights serve either size (as in the reference)."""
        self.model = Yolact(num_classes=num_classes)
        self.score_th = score_th
        self.top_k = top_k
        self.person_classes = person_classes
        self.img_size = img_size
        self.priors = jnp.asarray(make_priors(img_size))
        if params is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            dummy = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
            params = self.model.init(key, dummy)
        self.params = params

        pc = jnp.asarray(np.asarray(person_classes, np.int32))
        means = jnp.asarray(MEANS)
        std = jnp.asarray(STD)

        @jax.jit
        def _mask_fn(params, rgb):
            """rgb: (H, W, 3) RGB (any dtype, [0,255]) -> (H, W) bool mask.

            The whole net runs in ``compute_dtype`` (default bfloat16: the
            convs then ride the MXU at twice the f32 rate and half the HBM
            traffic); params are cast inside the program (a free fused
            element-wise op), detection/mask assembly run in float32. The
            input cast also lives here -- an eager cast outside jit is a
            per-frame dispatch, which on the remote-tunnel link costs more
            than the entire backbone."""
            rgb = rgb.astype(jnp.float32)
            H, W = rgb.shape[0], rgb.shape[1]
            img = jax.image.resize(rgb, (img_size, img_size, 3), "bilinear")
            bgr = img[..., ::-1]
            x = ((bgr - means) / std)[None].astype(compute_dtype)
            p_c = jax.tree.map(
                lambda p: p.astype(compute_dtype)
                if p.dtype == jnp.float32 else p,
                params,
            )
            loc, conf, coef, proto = self.model.apply(p_c, x)
            loc, conf, coef, proto = (
                t.astype(jnp.float32) for t in (loc, conf, coef, proto)
            )
            det = detect(
                loc[0], conf[0], coef[0], self.priors,
                top_k=self.top_k, conf_th=self.score_th,
            )
            is_person = jnp.any(
                det.classes[:, None] == pc[None, :], axis=-1
            )
            masks = assemble_masks(proto[0], det)
            masks = masks & (is_person & det.valid)[:, None, None]
            union = jnp.any(masks, axis=0).astype(jnp.float32)
            out = jax.image.resize(union, (H, W), "bilinear")
            return out > 0.5

        self._mask_fn = _mask_fn

        @jax.jit
        def _mask_batch_fn(params, rgbs):
            """(B, H, W, 3) -> (B, H, W) bool. One program for the whole
            batch: the backbone/FPN convs run batched (better MXU
            utilization than B single-image programs) and the per-frame
            dispatch overhead is paid once. Used by the chunked tracking
            path (System.track_rgbd_chunk) to segment a whole chunk ahead
            of the dynamics scan -- the reference sketches exactly this
            async produce-ahead mode for its segmenter thread
            (src/yolact.cc:123-172)."""
            B, H, W = rgbs.shape[0], rgbs.shape[1], rgbs.shape[2]
            rgbs = rgbs.astype(jnp.float32)
            img = jax.image.resize(
                rgbs, (B, img_size, img_size, 3), "bilinear"
            )
            bgr = img[..., ::-1]
            x = ((bgr - means) / std).astype(compute_dtype)
            p_c = jax.tree.map(
                lambda p: p.astype(compute_dtype)
                if p.dtype == jnp.float32 else p,
                params,
            )
            loc, conf, coef, proto = self.model.apply(p_c, x)
            loc, conf, coef, proto = (
                t.astype(jnp.float32) for t in (loc, conf, coef, proto)
            )

            def one(loc_i, conf_i, coef_i, proto_i):
                det = detect(
                    loc_i, conf_i, coef_i, self.priors,
                    top_k=self.top_k, conf_th=self.score_th,
                )
                is_person = jnp.any(
                    det.classes[:, None] == pc[None, :], axis=-1
                )
                masks = assemble_masks(proto_i, det)
                masks = masks & (is_person & det.valid)[:, None, None]
                return jnp.any(masks, axis=0).astype(jnp.float32)

            union = jax.vmap(one)(loc, conf, coef, proto)
            out = jax.image.resize(union, (B, H, W), "bilinear")
            return out > 0.5

        self._mask_batch_fn = _mask_batch_fn

    def person_mask(self, rgb) -> jax.Array:
        """(H, W, 3) RGB image (uint8 or float [0,255]) -> (H, W) bool."""
        return self._mask_fn(self.params, jnp.asarray(rgb))

    def person_mask_batch(self, rgbs) -> jax.Array:
        """(B, H, W, 3) RGB images -> (B, H, W) bool masks, one dispatch."""
        return self._mask_batch_fn(self.params, jnp.asarray(rgbs))
