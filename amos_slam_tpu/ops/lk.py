"""Batched pyramidal Lucas-Kanade optical flow.

TPU-native replacement for cv::calcOpticalFlowPyrLK as used by the dynamic
stage (reference src/Tracking.cc:896: 5 pyramid levels, 22x22 windows) and
the LK helper (include/LK.h:32). All N tracks advance together; a fixed
number of GN updates per level solves the 2x2 flow systems for the whole
batch in parallel.

Sampling strategy (the part that decides TPU performance): bilinear window
sampling is expressed as TWO BATCHED MATMULS against the whole level image
-- a per-track row-interpolation matrix (N, P, H) carrying the (1-fy, fy)
bilinear weights at rows (floor(y)+i, +1), then the transposed analogue for
columns:

    win = Ry @ I @ Cx^T        (einsum 'nph,hw,nqw->npq')

This keeps the entire iteration loop on the MXU with zero gathers. The
previous design (one block gather per GN iteration) spent ~0.55 ms per
lax.gather on dispatch-level latency -- 24+ gathers made LK the most
expensive program in the two-stage pipeline (16.8 ms measured on v5e);
the dense formulation is ~60 GMAC + ~0.6 GB of streamed traffic for the
default config, an order of magnitude faster. Interpolation matrices are
built in bfloat16 (weights quantize at ~2^-8, moving samples < 0.004 px);
accumulation is float32.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def _dyadic_pyramid(img: jax.Array, levels: int):
    """List of (H/2^l, W/2^l) images, 2x2 average-pool downsampling."""
    out = [img]
    for _ in range(levels - 1):
        p = out[-1]
        h, w = p.shape
        h2, w2 = h // 2, w // 2
        p = p[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2).mean(axis=(1, 3))
        out.append(p)
    return out


def _interp_matrix(pos: jax.Array, P: int, size: int) -> jax.Array:
    """(N, P, size) bf16 bilinear interpolation matrix.

    Row [n, i] carries weight (1-f) at index clip(floor(pos[n])+i) and f at
    clip(floor(pos[n])+i+1): multiplying against the image axis evaluates
    the linear interpolant at pos[n]+i. Index clipping reproduces
    edge-clamp border semantics (both taps collapse onto the edge texel and
    the weights still sum to 1).
    """
    base = jnp.floor(pos)
    f = (pos - base).astype(jnp.float32)[:, None, None]          # (N,1,1)
    b = base.astype(jnp.int32)[:, None] + jnp.arange(P, dtype=jnp.int32)[None]
    idx0 = jnp.clip(b, 0, size - 1)[:, :, None]                  # (N,P,1)
    idx1 = jnp.clip(b + 1, 0, size - 1)[:, :, None]
    cols = jnp.arange(size, dtype=jnp.int32)[None, None, :]      # (1,1,size)
    m = (
        (cols == idx0).astype(jnp.float32) * (1.0 - f)
        + (cols == idx1).astype(jnp.float32) * f
    )
    return m.astype(jnp.bfloat16)


def _sample_window(img: jax.Array, cy: jax.Array, cx: jax.Array, half: int,
                   extra: int = 0):
    """Bilinear samples on the (2*(half+extra)+1)^2 grid centred at the
    float positions (cy, cx), via the dense two-matmul formulation."""
    P = 2 * (half + extra) + 1
    H, W = img.shape
    Ry = _interp_matrix(cy - (half + extra), P, H)               # (N,P,H)
    Cx = _interp_matrix(cx - (half + extra), P, W)               # (N,P,W)
    rows = jnp.einsum(
        "nph,hw->npw", Ry, img.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return jnp.einsum(
        "npw,nqw->npq", rows.astype(jnp.bfloat16), Cx,
        preferred_element_type=jnp.float32,
    )


class FlowResult(NamedTuple):
    pts1: jax.Array     # (N, 2) tracked (x, y) positions in image 2
    valid: jax.Array    # (N,) bool: converged, in-bounds, low residual
    err: jax.Array      # (N,) mean |I1 - I2| over the window (SAD/px)


def lk_flow(
    img0: jax.Array,
    img1: jax.Array,
    pts0: jax.Array,          # (N, 2) float32 (x, y) in img0
    pts_valid: jax.Array,     # (N,) bool
    levels: int = 4,
    win_half: int = 7,
    iters: int = 6,
    max_err: float = 20.0,
    min_eig: float = 1.0,
) -> FlowResult:
    """Track pts0 from img0 to img1. Returns positions in img1.

    Window is (2*win_half+1)^2 (15x15 default; the reference uses 22x22 --
    configure win_half=10 for parity). The validity gate folds in the
    reference's neighborhood-SAD and border filters (src/Tracking.cc:902-924).

    Images are expected in [0, 255] intensity units (the repo convention):
    ``min_eig`` and ``max_err`` are in squared-intensity / intensity units
    respectively, so [0, 1]-normalized frames would silently fail the
    texture gate (lam_min scales by ~255^2) -- scale such inputs by 255
    or pass min_eig ~ 1/255**2.
    """
    pyr0 = _dyadic_pyramid(img0, levels)
    pyr1 = _dyadic_pyramid(img1, levels)
    N = pts0.shape[0]
    w = win_half

    # flow estimate in level-0 coordinates, refined coarse-to-fine
    g = jnp.zeros((N, 2), jnp.float32)   # accumulated displacement (x, y)
    I_last = None

    for lvl in range(levels - 1, -1, -1):
        scale = 0.5 ** lvl
        I0, I1 = pyr0[lvl], pyr1[lvl]
        cy = pts0[:, 1] * scale
        cx = pts0[:, 0] * scale

        # template + central-difference gradients from ONE padded sample
        Tfull = _sample_window(I0, cy, cx, w, extra=1)       # (N, P+2, P+2)
        T = Tfull[:, 1:-1, 1:-1]
        Tx = 0.5 * (Tfull[:, 1:-1, 2:] - Tfull[:, 1:-1, :-2])
        Ty = 0.5 * (Tfull[:, 2:, 1:-1] - Tfull[:, :-2, 1:-1])
        Gxx = jnp.sum(Tx * Tx, axis=(1, 2))
        Gxy = jnp.sum(Tx * Ty, axis=(1, 2))
        Gyy = jnp.sum(Ty * Ty, axis=(1, 2))
        det = Gxx * Gyy - Gxy * Gxy
        inv_ok = det > 1e-6
        det = jnp.where(inv_ok, det, 1.0)

        def body(_, carry):
            gl, _I = carry
            I = _sample_window(
                I1, cy + gl[:, 1] * scale, cx + gl[:, 0] * scale, w
            )
            It = I - T
            bx = jnp.sum(It * Tx, axis=(1, 2))
            by = jnp.sum(It * Ty, axis=(1, 2))
            dxe = (Gyy * bx - Gxy * by) / det
            dye = (Gxx * by - Gxy * bx) / det
            step = jnp.stack([-dxe, -dye], axis=-1) / scale
            step = jnp.where(inv_ok[:, None], step, 0.0)
            step = jnp.clip(step, -32.0, 32.0)
            return gl + step, I

        g, I_last = jax.lax.fori_loop(
            0, iters, body, (g, jnp.zeros_like(T))
        )

    # Texture gate (cv::calcOpticalFlowPyrLK's minEigThreshold): the GN
    # system's min eigenvalue at the FINEST level, per window pixel. A flat
    # or 1-D-textured window lets the solution slide along the weak
    # direction -- the track lands somewhere plausible with a LOW residual,
    # so the SAD gate cannot catch it; only the gradient conditioning can.
    # (Gxx/Gxy/Gyy hold the level-0 values after the loop above.)
    P2 = float((2 * w + 1) ** 2)
    lam_min = 0.5 * ((Gxx + Gyy) - jnp.sqrt((Gxx - Gyy) ** 2 + 4.0 * Gxy ** 2))
    texture_ok = lam_min / P2 > min_eig

    # Final validity: residual + bounds. The residual window is the LAST GN
    # iteration's sample (position error vs the final point <= the last
    # sub-pixel step, well under the max_err gate's granularity) against
    # the level-0 template -- the two extra whole-image samples the
    # previous formulation spent here carried no decision the pipeline
    # ever consumed differently.
    H, W = img0.shape
    p1 = pts0 + g
    err = jnp.mean(jnp.abs(I_last - T), axis=(1, 2))
    inb = (
        (p1[:, 0] >= w + 1) & (p1[:, 0] < W - w - 1)
        & (p1[:, 1] >= w + 1) & (p1[:, 1] < H - w - 1)
    )
    valid = pts_valid & inb & (err < max_err) & texture_ok
    return FlowResult(pts1=p1, valid=valid, err=err)
