"""Raster warp kernels (pure numpy, PIL-free).

Behavioral parity with the reference's imwarp module
(``/root/reference/transformio/imwarp.py``), operating on RGBA uint8
numpy arrays (h, w, 4) instead of PIL Images (PIL is unavailable
here; the reference's own fast path converts to numpy immediately,
imwarp.py:278-281).

Parity-critical semantics preserved:

- ``imbounds`` samples a 100x100 linspace grid plus edge pixels, and
  REPLICATES THE REFERENCE BUG where the bottom and right "edge"
  samples are ``np.zeros(...)*dim`` ≡ 0 — i.e. they duplicate the
  top/left edges (imwarp.py:58, 63).  Output bounds feed output size
  feed every tile assignment, so this must match exactly.
- ``fitbounds`` flips the y axis when bounds[1] < bounds[3]
  (imwarp.py:19-21).
- ``warp`` uses the diagonal-preserving size heuristic
  (imwarp.py:160-164), the UNCONDITIONAL y-flip output affine
  (yoff=ymax, yscale negated — imwarp.py:172-177), backward mapping
  through chain.inverse(), ``np.around`` (banker's rounding) nearest
  -pixel gather with NaN+bounds masking (imwarp.py:285-300), and the
  crop-to-relevant-input optimization + coordinate offsets when user
  bounds are given (imwarp.py:234-251).
- only resample='nearest' exists (imwarp.py:363-364), like the
  reference.
"""

from __future__ import annotations

import math

import numpy as np

from .transforms import Chain, Polynomial

__all__ = ["fitbounds", "imbounds", "warp", "as_chain"]


def fitbounds(width: int, height: int, bounds) -> Polynomial:
    """Pixel→coordinate affine for an image with known corner bounds
    (reference imwarp.py:10-28)."""
    img_corners = [(0, 0), (width, 0), (width, height), (0, height)]
    bx1, by1, bx2, by2 = bounds
    if bounds[1] < bounds[3]:
        bx1, by1, bx2, by2 = bx2, by2, bx1, by1
    geo_corners = [(bx1, by1), (bx2, by1), (bx2, by2), (bx1, by2)]
    x1, y1 = zip(*img_corners)
    x2, y2 = zip(*geo_corners)
    return Polynomial(order=1).fit(x1, y1, x2, y2)


def imbounds(width: int, height: int, transform):
    """Forward-projected output bounds from sampled pixels (reference
    imwarp.py:30-86, including the duplicated bottom/right edge bug)."""
    cols = np.linspace(0, width, 100)
    rows = np.linspace(0, height, 100)
    cols, rows = np.meshgrid(cols, rows)
    cols, rows = cols.flatten(), rows.flatten()

    allcols = np.linspace(0, width, width + 1)
    allrows = np.linspace(0, height, height + 1)
    # top edge
    cols = np.append(cols, allcols)
    rows = np.append(rows, np.zeros(allcols.shape))
    # "bottom" edge — REFERENCE BUG: zeros*imh ≡ 0 (imwarp.py:58)
    cols = np.append(cols, allcols)
    rows = np.append(rows, np.zeros(allcols.shape) * height)
    # left edge
    cols = np.append(cols, np.zeros(allrows.shape))
    rows = np.append(rows, allrows)
    # "right" edge — REFERENCE BUG: zeros*imw ≡ 0 (imwarp.py:63)
    cols = np.append(cols, np.zeros(allrows.shape) * width)
    rows = np.append(rows, allrows)

    predx, predy = transform.predict(cols, rows)
    predx = predx[~np.isnan(predx)]
    predy = predy[~np.isnan(predy)]
    predx = predx[~np.isinf(predx)]
    predy = predy[~np.isinf(predy)]
    return predx.min(), predy.min(), predx.max(), predy.max()


def as_chain(transform) -> Chain:
    """Normalize a transform | list | Chain to a Chain copy
    (imwarp.py:100-106)."""
    if isinstance(transform, list):
        return Chain(transforms=transform)
    if isinstance(transform, Chain):
        return transform.copy()
    return Chain(transforms=[transform])


def _to_rgba(im: np.ndarray) -> tuple[np.ndarray, int]:
    """Normalize (h,w), (h,w,3) or (h,w,4) uint8 input; returns the
    array and its band count (mirrors imwarp.py:271-277 mode logic)."""
    if im.ndim == 2:
        im = np.stack([im, im, im], axis=-1)
    if im.shape[2] not in (3, 4):
        raise ValueError(f"unexpected band count: {im.shape[2]}")
    return im, im.shape[2]


def warp(im: np.ndarray, transform, resample: str = "nearest",
         size=None, bounds=None):
    """Backward-mapping nearest-neighbour warp (reference
    imwarp.py:88-381 fast path).  ``im`` is a (h, w, 3|4) uint8 array;
    returns (out_rgba (H, W, 4) uint8, affine6 list)."""
    chain = as_chain(transform)
    im, nbands = _to_rgba(np.asarray(im))
    imh, imw = im.shape[:2]

    if bounds:
        xmin, ymin, xmax, ymax = bounds
    else:
        xmin, ymin, xmax, ymax = imbounds(imw, imh, chain)

    dx, dy = xmax - xmin, ymax - ymin
    if size:
        w, h = size
        xscale = dx / w
        yscale = dy / h
    else:
        # diagonal-preserving heuristic (imwarp.py:160-164)
        diag = math.hypot(dx, dy)
        xscale = yscale = diag / float(math.hypot(imw, imh))
        w, h = int(dx / xscale), int(dy / yscale)

    # unconditional y-flip output affine (imwarp.py:172-177)
    xoff, yoff = xmin, ymin
    yoff = ymax
    yscale = -abs(yscale) if yscale > 0 else yscale
    affine = [xscale, 0, xoff, 0, yscale, yoff]

    if resample != "nearest":
        raise ValueError(f"Unknown resample arg: {resample}")

    cols = np.linspace(0, w - 1, w)
    rows = np.linspace(0, h - 1, h)
    cols, rows = np.meshgrid(cols, rows)
    cols, rows = cols.flatten(), rows.flatten()
    xs = xoff + (cols * xscale)
    ys = yoff + (rows * yscale)
    invchain = chain.inverse()
    backpredx, backpredy = invchain.predict(xs, ys)

    if bounds:
        # crop-to-relevant-input (imwarp.py:234-251): slice the source
        # to the backpredicted bbox and offset coords accordingly
        xvalid, yvalid = ~np.isnan(backpredx), ~np.isnan(backpredy)
        bxmin, bymin = backpredx[xvalid].min(), backpredy[yvalid].min()
        bxmax, bymax = backpredx[xvalid].max(), backpredy[yvalid].max()
        crop = (
            int(round(max(bxmin, 0))), int(round(max(bymin, 0))),
            int(round(min(bxmax, imw - 1))), int(round(min(bymax, imh - 1))),
        )
        # PIL.crop(l,u,r,low) keeps [l:r) x [u:low); replicate by slicing
        left, upper, right, lower = crop
        im = im[max(upper, 0):max(lower, 0), max(left, 0):max(right, 0)]
        imh, imw = im.shape[:2]
        if bxmin > 0:
            backpredx = backpredx - bxmin
        if bymin > 0:
            backpredy = backpredy - bymin

    outarr = np.zeros((h, w, 4), dtype=np.uint8)
    bp_cols = backpredx.reshape((h, w))
    bp_rows = backpredy.reshape((h, w))
    valid = ~(np.isnan(bp_cols) | np.isnan(bp_rows))
    # np.around = banker's rounding, parity with imwarp.py:287-288
    bp_cols = np.around(bp_cols, 0).astype(int)
    bp_rows = np.around(bp_rows, 0).astype(int)
    inbounds = (bp_cols >= 0) & (bp_cols < imw) & (bp_rows >= 0) & (bp_rows < imh)
    mask = valid & inbounds
    if nbands == 4:
        outarr[mask] = im[bp_rows[mask], bp_cols[mask], :]
    else:
        outarr[mask, :3] = im[bp_rows[mask], bp_cols[mask], :]
        outarr[mask, -1] = 255
    return outarr, affine
