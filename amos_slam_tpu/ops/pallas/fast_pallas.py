"""Pallas TPU kernel: fused FAST-9 corner margin + 3x3 NMS.

The XLA formulation (ops/fast.py) materializes a (16, H, W) shifted stack
and re-reads it ~9x for the arc-min chain -- several GB of HBM traffic per
frame. This kernel tiles the image through VMEM: each grid step DMAs one
(TILE + 2*HALO, W) row band ONCE, computes the 16 circle differences as
static in-VMEM slices, the bright/dark 9-arc margins, and the 3x3
non-maximum suppression, and writes the (TILE, W) suppressed-margin band.
HBM traffic drops to one image read + one margin write.

Batching: pallas_call's automatic vmap rule can't batch the manually-DMA'd
ANY-space input (Mosaic rejects the squeezed block spec), so ``vmap`` over
images -- the multi-stream step's shape -- routes through a custom_vmap
rule to an explicit batched grid (ops batch dim = leading grid dim).

Equivalence: same contract as fast.nms3x3(fast.fast_margin(img)) away from
the wrap-around columns (detection masks borders anyway); verified in tests
against the XLA version (including the vmapped form).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fast import CIRCLE16

HALO = 4          # circle radius 3 + NMS radius 1


def _band_compute(img, tile_h: int, width: int):
    """(tile_h + 2*HALO, W) VMEM band -> (tile_h, W) NMS'd margin."""
    mh = tile_h + 2
    c = img[HALO - 1 : HALO - 1 + mh, :]

    def shifted(dy, dx):
        rows = img[HALO - 1 + dy : HALO - 1 + dy + mh, :]
        return pltpu.roll(rows, (-dx) % width, axis=1)

    d = [shifted(dy, dx) - c for (dy, dx) in CIRCLE16]

    def arc_margin(diffs):
        best = None
        for s in range(16):
            m = diffs[s]
            for k in range(1, 9):
                m = jnp.minimum(m, diffs[(s + k) % 16])
            best = m if best is None else jnp.maximum(best, m)
        return best

    bright = arc_margin(d)
    dark = arc_margin([-x for x in d])
    margin = jnp.maximum(jnp.maximum(bright, dark), 0.0)   # (mh, W)

    center = margin[1 : 1 + tile_h, :]
    neigh = None
    for dy in (-1, 0, 1):
        rows = margin[1 + dy : 1 + dy + tile_h, :]
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            v = pltpu.roll(rows, (-dx) % width, axis=1)
            neigh = v if neigh is None else jnp.maximum(neigh, v)
    return jnp.where(center >= neigh, center, 0.0)


def _kernel(img_hbm, out_ref, *, tile_h: int, width: int):
    i = pl.program_id(0)
    Hb = tile_h + 2 * HALO

    def body(band, sem):
        cp = pltpu.make_async_copy(
            img_hbm.at[pl.ds(i * tile_h, Hb), :], band, sem
        )
        cp.start()
        cp.wait()
        out_ref[:] = _band_compute(band[:], tile_h, width)

    pl.run_scoped(
        body,
        band=pltpu.VMEM((Hb, width), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def _kernel_batched(img_hbm, out_ref, *, tile_h: int, width: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    Hb = tile_h + 2 * HALO

    def body(band, sem):
        cp = pltpu.make_async_copy(
            img_hbm.at[b, pl.ds(i * tile_h, Hb), :], band, sem
        )
        cp.start()
        cp.wait()
        out_ref[0] = _band_compute(band[:], tile_h, width)

    pl.run_scoped(
        body,
        band=pltpu.VMEM((Hb, width), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def _impl_single(img: jax.Array, tile_h: int,
                 interpret: bool = False) -> jax.Array:
    H, W = img.shape
    Hp = -(-H // tile_h) * tile_h
    padded = jnp.pad(img.astype(jnp.float32), ((HALO, Hp - H + HALO), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, width=W),
        out_shape=jax.ShapeDtypeStruct((Hp, W), jnp.float32),
        grid=(Hp // tile_h,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tile_h, W), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(padded)
    return out[:H]


def _impl_batched(imgs: jax.Array, tile_h: int,
                  interpret: bool = False) -> jax.Array:
    B, H, W = imgs.shape
    Hp = -(-H // tile_h) * tile_h
    padded = jnp.pad(
        imgs.astype(jnp.float32), ((0, 0), (HALO, Hp - H + HALO), (0, 0))
    )
    out = pl.pallas_call(
        functools.partial(_kernel_batched, tile_h=tile_h, width=W),
        out_shape=jax.ShapeDtypeStruct((B, Hp, W), jnp.float32),
        grid=(B, Hp // tile_h),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, tile_h, W), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(padded)
    return out[:, :H]


@functools.lru_cache(maxsize=None)
def _fmn_fn(tile_h: int):
    """custom_vmap-wrapped margin+NMS for one tile height.

    Every tile_h gets the explicit batched-grid batching rule -- never
    pallas_call's automatic vmap, which Mosaic rejects at runtime for the
    manually-DMA'd ANY-space input. Nested vmap (any number of leading
    batch axes) collapses to one grid batch dim and reshapes back."""

    @jax.custom_batching.custom_vmap
    def fmn(img):
        return _impl_single(img, tile_h)

    @fmn.def_vmap
    def _fmn_vmap(axis_size, in_batched, img):
        del axis_size
        assert in_batched[0], "fast_margin_nms: input must carry the vmap axis"
        lead = img.shape[:-2]
        flat = img.reshape((-1,) + img.shape[-2:])
        out = _impl_batched(flat, tile_h)
        return out.reshape(lead + out.shape[-2:]), True

    return fmn


@functools.partial(jax.jit, static_argnames=("tile_h",))
def fast_margin_nms(img: jax.Array, tile_h: int = 64) -> jax.Array:
    """(H, W) image -> (H, W) NMS'd FAST-9 margin (Pallas TPU kernel).

    H is padded internally to a multiple of tile_h. vmap-safe at every
    tile (routes to the explicit batched grid, nested vmap included).
    """
    return _fmn_fn(tile_h)(img)
