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

from .transforms import Chain, MapProjection, Polynomial

__all__ = [
    "fitbounds", "imbounds", "warp", "as_chain",
    "area_resize", "prepare_chain", "output_geometry", "load_image",
]


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


def area_weights(n_src: int, n_out: int, out0: int = 0, out1: int | None = None):
    """Row-stochastic box-integration weights for 1-D area-average
    resampling: output cell i averages the source interval
    [i*n/m, (i+1)*n/m).  ``out0:out1`` selects an output-row window
    (for tiled evaluation against GLOBAL coordinates — weights are
    identical to the full matrix's rows, so windowed resizes are
    bit-consistent with the whole-image resize for dyadic ratios).
    Returns (W of shape (out1-out0, j1-j0), j0, j1) where [j0, j1) is
    the source span the window touches."""
    if out1 is None:
        out1 = n_out
    scale = n_src / n_out
    j0 = int(math.floor(out0 * scale))
    j1 = min(int(math.ceil(out1 * scale)), n_src)
    W = np.zeros((out1 - out0, j1 - j0))
    for i in range(out0, out1):
        a = i * scale
        b = min((i + 1) * scale, n_src)
        for j in range(int(math.floor(a)), min(int(math.ceil(b)), n_src)):
            W[i - out0, j - j0] = min(b, j + 1) - max(a, j)
        W[i - out0] /= (b - a)
    return W, j0, j1


def area_resize(im: np.ndarray, nw: int, nh: int) -> np.ndarray:
    """Separable area-average downsample of a (h, w[, bands]) uint8
    array, returned as uint8 (np.around, clipped).

    DOCUMENTED DEVIATION: the reference resizes with
    PIL.Image.ANTIALIAS (Lanczos, imwarp.py:119); PIL is unavailable
    in this sandbox so pixel-level parity is untestable.  Area
    averaging is the standard antialiased downsample (cv2 INTER_AREA);
    the observable geometry (output dims, prepended scale transform,
    output affine) matches the reference exactly."""
    im = np.asarray(im)
    squeeze = im.ndim == 2
    if squeeze:
        im = im[:, :, None]
    h, w, b = im.shape
    Wh, _, _ = area_weights(h, nh)
    Ww, _, _ = area_weights(w, nw)
    tmp = Wh @ im.reshape(h, w * b).astype(np.float64)  # (nh, w*b)
    tmp = tmp.reshape(nh, w, b).transpose(1, 0, 2).reshape(w, nh * b)
    out = (Ww @ tmp).reshape(nw, nh, b).transpose(1, 0, 2)
    out = np.clip(np.around(out, 0), 0, 255).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


def prepare_chain(chain: Chain, src_size, maxdim=None, fromcrs=None,
                  tocrs=None) -> tuple[Chain, tuple[int, int], float]:
    """Driver-side warp planning shared by the single-array kernel and
    the distributed tiled warp: applies the reference's ``maxdim``
    downsample-prepend (imwarp.py:111-127) and ``fromcrs``/``tocrs``
    MapProjection append (imwarp.py:132-135) to a COPY of the chain.
    Returns (chain, effective_src_size, ratio); ratio < 1 means the
    caller must resize the source image/tiles to effective_src_size
    before warping."""
    chain = chain.copy()
    imw, imh = src_size
    ratio = 1.0
    if maxdim:
        longest = max(imw, imh)
        r = maxdim / float(longest)
        if r < 1:
            ratio = r
            imw, imh = int(imw * r), int(imh * r)
            # prepend small->big pixel scale, exactly the reference's
            # big2small naming/matrix (imwarp.py:120-126)
            big2small = Polynomial(
                order=1, A=[[1 / r, 0, 0], [0, 1 / r, 0], [0, 0, 1]]
            )
            chain.transforms.insert(0, big2small)
    if fromcrs and tocrs:
        chain.add(MapProjection(fromcrs=fromcrs, tocrs=tocrs))
    return chain, (imw, imh), ratio


def output_geometry(src_size, chain, size=None, bounds=None):
    """Output affine + dims exactly as the reference derives them
    (imwarp.py:141-177): user bounds or imbounds; user size or the
    diagonal-preserving heuristic; unconditional y-flip.  Shared by
    the single-array kernel and the distributed tiled warp so both
    produce bit-identical pixel centers."""
    imw, imh = src_size
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
    return [xscale, 0, xoff, 0, yscale, yoff], (w, h)


def _parse_pnm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) decoder — public Netpbm format,
    pure python (no codec libs in this sandbox)."""
    tokens = []
    i = 0
    while len(tokens) < 4:
        if data[i:i + 1] == b"#":  # comment to end of line
            i = data.index(b"\n", i) + 1
            continue
        if data[i:i + 1].isspace():
            i += 1
            continue
        j = i
        while not data[j:j + 1].isspace():
            j += 1
        tokens.append(data[i:j])
        i = j
    magic, w, h, maxval = tokens[0], int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval > 255:
        raise ValueError("16-bit PNM unsupported")
    raw = np.frombuffer(data, dtype=np.uint8, offset=i + 1)
    if magic == b"P6":
        return raw[: w * h * 3].reshape((h, w, 3)).copy()
    if magic == b"P5":
        return raw[: w * h].reshape((h, w)).copy()
    raise ValueError(f"unsupported PNM magic {magic!r}")


def load_image(src: str) -> np.ndarray:
    """Resolve a string image source for warp (reference imwarp.py:
    92-96 accepts http URLs and decodes via PIL).  PIL is unavailable
    here, so self-describing PUBLIC formats are decoded natively:
    numpy .npy, binary PPM/PGM, PNG (kernels/png.py — 8-bit
    gray/palette/RGB(A), the reference's land_shallow_topo_2048.png
    fixture decodes end-to-end), baseline TIFF (kernels/tiff.py —
    8-bit strip LZW/uncompressed, covers the .tif sibling fixture),
    and baseline JPEG (kernels/jpeg.py — SOF0 YCbCr, covers every
    scanned-map fixture: china/argentina/burkina_pol96.jpg etc.).
    http(s)/file URLs fetch via urllib; plain paths open directly
    (a superset of the reference, which only special-cases http)."""
    import io
    import urllib.request

    if src.startswith(("http://", "https://", "file://")):
        with urllib.request.urlopen(src) as fobj:
            data = fobj.read()
    else:
        with open(src, "rb") as f:
            data = f.read()
    if data[:6] == b"\x93NUMPY":
        return np.load(io.BytesIO(data), allow_pickle=False)
    if data[:2] in (b"P6", b"P5"):
        return _parse_pnm(data)
    from . import jpeg, png, tiff

    if png.is_png(data):
        return png.decode_png(data)
    if tiff.is_tiff(data):
        return tiff.decode_tiff(data)
    if jpeg.is_jpeg(data):
        return jpeg.decode_jpeg(data)
    raise ValueError(
        "unsupported image format (PIL is not available in this "
        "environment) — provide .npy, binary PPM/PGM, PNG, "
        "baseline TIFF, or baseline JPEG"
    )


def _to_rgba(im: np.ndarray) -> tuple[np.ndarray, int]:
    """Normalize (h,w), (h,w,3) or (h,w,4) uint8 input; returns the
    array and its band count (mirrors imwarp.py:271-277 mode logic)."""
    if im.ndim == 2:
        im = np.stack([im, im, im], axis=-1)
    if im.shape[2] not in (3, 4):
        raise ValueError(f"unexpected band count: {im.shape[2]}")
    return im, im.shape[2]


def warp(im: np.ndarray, transform, resample: str = "nearest",
         size=None, bounds=None, maxdim=None, fromcrs=None, tocrs=None):
    """Backward-mapping nearest-neighbour warp (reference
    imwarp.py:88-381 fast path).  ``im`` is a (h, w, 3|4) uint8 array;
    returns (out_rgba (H, W, 4) uint8, affine6 list).

    ``maxdim`` downsamples the source first and prepends the inverse
    pixel scale to the chain (imwarp.py:111-127); ``fromcrs``/``tocrs``
    appends a MapProjection reprojection step (imwarp.py:132-135).
    ``im`` may be a URL or path string (imwarp.py:92-96; see
    load_image for the supported PIL-free formats)."""
    if isinstance(im, str):
        im = load_image(im)
    chain = as_chain(transform)
    im, nbands = _to_rgba(np.asarray(im))
    imh, imw = im.shape[:2]
    chain, (imw, imh), ratio = prepare_chain(
        chain, (imw, imh), maxdim=maxdim, fromcrs=fromcrs, tocrs=tocrs
    )
    if ratio < 1:
        im = area_resize(im, imw, imh)

    affine, (w, h) = output_geometry((imw, imh), chain, size=size, bounds=bounds)
    xscale, _, xoff, _, yscale, yoff = affine

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
