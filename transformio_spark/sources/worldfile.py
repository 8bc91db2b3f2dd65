"""World-file (.wld) sidecar support (reference README.md:607-620).

The reference reads six whitespace-separated floats ``a b c d e f``
and builds the pixel->geo affine ``[[a,b,c],[d,e,f],[0,0,1]]`` —
note this is ROW-MAJOR reading order, not the ESRI 6-line column
order; the vendored ``land_shallow_topo_2048.wld`` is one line in
exactly this order.  ``split()`` accepts both one-line and six-line
layouts, matching the reference's parsing."""

from __future__ import annotations

from ..kernels import Affine


def read_worldfile(path: str) -> Affine:
    """Six floats -> Affine, exactly the reference README recipe."""
    with open(path) as f:
        a, b, c, d, e, ff = map(float, f.read().split())
    return Affine(A=[[a, b, c], [d, e, ff], [0, 0, 1]])


def write_worldfile(path: str, affine6: list) -> None:
    """Persist a warp-output affine6 ``[xscale, xskew, xoff, yskew,
    yscale, yoff]`` — the same (a..f) order read_worldfile parses."""
    if len(affine6) != 6:
        raise ValueError(f"affine6 must have 6 entries, got {len(affine6)}")
    with open(path, "w") as f:
        f.write(" ".join(repr(float(v)) for v in affine6))
