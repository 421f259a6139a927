"""Batched pyramidal Lucas-Kanade optical flow.

TPU-native replacement for cv::calcOpticalFlowPyrLK as used by the dynamic
stage (reference src/Tracking.cc:896: 5 pyramid levels, 22x22 windows) and
the LK helper (include/LK.h:32). All N tracks advance together: per level,
template patch + gradients come from ONE block gather, then a fixed number
of GN updates solve the 2x2 flow systems for the whole batch in parallel.

Gather strategy: a bilinear sample grid over a window shares a single
integer corner per track (the fractional part is constant across the
window), so each (N, P, P) sampling is ONE contiguous (N, P+1, P+1) block
gather + four statically-shifted views blended by per-track weights --
instead of 4 scattered gathers per sample. Gathers dominate this stage's
cost on TPU, so this restructuring is worth ~10x.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

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


def _block(img: jax.Array, y0: jax.Array, x0: jax.Array, size: int):
    """Gather (N, size, size) edge-clamped blocks at corners (y0, x0).

    One lax.gather with slice_sizes=(size, size): XLA lowers whole-slice
    gathers to block copies, ~100x cheaper than the equivalent elementwise
    index gather on TPU (the same finding as ops/orb_descriptor's patch
    path). Border semantics: the image is edge-padded by `size` and the
    starts offset, which reproduces the per-element coordinate clamp of an
    elementwise gather for any window within `size` of the image (gather's
    own 'clip' mode would instead SHIFT out-of-range windows, silently
    corrupting coarse-pyramid-level residuals for every track near a
    border). XLA CSEs the pad across the calls inside one program.
    """
    imgp = jnp.pad(img, size, mode="edge")
    starts = jnp.stack([y0 + size, x0 + size], axis=-1)      # (N, 2)
    return jax.lax.gather(
        imgp, starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0, 1)),
        slice_sizes=(size, size), mode="clip",
    )


def _sample_window(img: jax.Array, cy: jax.Array, cx: jax.Array, half: int,
                   extra: int = 0):
    """Bilinear samples on the (2*(half+extra)+1)^2 grid centred at the
    float positions (cy, cx): one block gather + 4 shifted views."""
    P = 2 * (half + extra) + 1
    yf = jnp.floor(cy)
    xf = jnp.floor(cx)
    fy = (cy - yf)[:, None, None]
    fx = (cx - xf)[:, None, None]
    y0 = yf.astype(jnp.int32) - half - extra
    x0 = xf.astype(jnp.int32) - half - extra
    B = _block(img, y0, x0, P + 1)                           # (N, P+1, P+1)
    return (
        B[:, :P, :P] * (1 - fy) * (1 - fx)
        + B[:, :P, 1:] * (1 - fy) * fx
        + B[:, 1:, :P] * fy * (1 - fx)
        + B[:, 1:, 1:] * fy * fx
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

        def body(_, gl):
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
            return gl + step

        g = jax.lax.fori_loop(0, iters, body, g)

    # Texture gate (cv::calcOpticalFlowPyrLK's minEigThreshold): the GN
    # system's min eigenvalue at the FINEST level, per window pixel. A flat
    # or 1-D-textured window lets the solution slide along the weak
    # direction -- the track lands somewhere plausible with a LOW residual,
    # so the SAD gate cannot catch it; only the gradient conditioning can.
    # (Gxx/Gxy/Gyy hold the level-0 values after the loop above.)
    P2 = float((2 * w + 1) ** 2)
    lam_min = 0.5 * ((Gxx + Gyy) - jnp.sqrt((Gxx - Gyy) ** 2 + 4.0 * Gxy ** 2))
    texture_ok = lam_min / P2 > min_eig

    # final validity: residual + bounds
    H, W = img0.shape
    p1 = pts0 + g
    I = _sample_window(img1, p1[:, 1], p1[:, 0], w)
    T0 = _sample_window(img0, pts0[:, 1], pts0[:, 0], w)
    err = jnp.mean(jnp.abs(I - T0), axis=(1, 2))
    inb = (
        (p1[:, 0] >= w + 1) & (p1[:, 0] < W - w - 1)
        & (p1[:, 1] >= w + 1) & (p1[:, 1] < H - w - 1)
    )
    valid = pts_valid & inb & (err < max_err) & texture_ok
    return FlowResult(pts1=p1, valid=valid, err=err)
