"""Layout / reading-order algebra (SURVEY §2.4 L1–L3, §7.4 #2).

Fresh implementations of the reference's geometric post-processing
semantics (``core/pipelines/postprocessor/simple.py``):

- L1 corner canonicalization (``sort_vertices_order``, simple.py:156-175)
- L2 document deskew: rotate all boxes by −mean(top-edge angle) around
  the document centroid (``rotate_polygon_boxes``, simple.py:16-60)
- L3 reading-order sort: pre-sort by x-center, then a bubble sort with
  the *non-transitive* comparator "if |Δy_center| > 0.6·median(height)
  order by y, else order by x" (``sort_polygon_box_indices`` +
  ``sort_two_boxes``, simple.py:62-101,184-193).

The bubble sort is kept literal: a naive ``sorted(key=…)`` is NOT
equivalent because the comparator is non-transitive (SURVEY §7.4).
These run in-batch per document inside the extraction kernel — all of a
page's blocks live in one row, so no cross-row shuffle is ever needed.
"""

from __future__ import annotations

import math
from typing import Sequence

Point = tuple[float, float]
Quad = list[Point]  # 4 corners


def canonical_corners(box: Sequence[Sequence[float]]) -> Quad:
    """Order 4 points as TL, TR, BR, BL (L1).

    TL = argmin(x+y), BR = argmax(x+y), TR = argmin(x−y), BL = argmax(x−y)
    — the reference's argmin/argmax rule (simple.py:156-175), transcribed
    with np.diff's (y−x)? No: np.diff over (x, y) gives y−x; argmin(y−x)
    == argmax(x−y) — careful reading: the reference computes
    ``diff = np.diff(bbox, axis=1)`` = y−x, then takes ``top_right =
    bbox[np.argmin(diff)]`` (smallest y−x ⇒ largest x−y ⇒ rightmost-top)
    and ``bottom_left = bbox[np.argmax(diff)]``.  Same rule here.
    """
    pts = [(float(x), float(y)) for x, y in box]
    s = [x + y for x, y in pts]
    d = [y - x for x, y in pts]
    tl = pts[s.index(min(s))]
    br = pts[s.index(max(s))]
    tr = pts[d.index(min(d))]
    bl = pts[d.index(max(d))]
    return [tl, tr, br, bl]


def _top_edge_angle(quad: Quad) -> float:
    """Angle (radians) of the TL→TR edge (simple.py:21-31)."""
    (x0, y0), (x1, y1) = quad[0], quad[1]
    return math.atan2(y1 - y0, x1 - x0)


def _rotate_points(
    quad: Quad, angle: float, center: Point
) -> Quad:
    """Rotate points by *angle* in image coords (Y down) about *center*
    (simple.py:34-48 semantics: x' = cos·dx + sin·dy, y' = −sin·dx + cos·dy).
    """
    ca, sa = math.cos(angle), math.sin(angle)
    cx, cy = center
    return [
        (ca * (x - cx) + sa * (y - cy) + cx, -sa * (x - cx) + ca * (y - cy) + cy)
        for x, y in quad
    ]


def deskew(quads: Sequence[Quad]) -> list[Quad]:
    """L2: straighten all boxes by the mean top-edge angle about the
    document centroid (mean of all corner points), simple.py:50-59.
    """
    if not quads:
        return []
    mean_angle = sum(_top_edge_angle(q) for q in quads) / len(quads)
    n_pts = sum(len(q) for q in quads)
    cx = sum(x for q in quads for x, _ in q) / n_pts
    cy = sum(y for q in quads for _, y in q) / n_pts
    return [_rotate_points(q, mean_angle, (cx, cy)) for q in quads]


def _center(quad: Quad) -> Point:
    n = len(quad)
    return (sum(x for x, _ in quad) / n, sum(y for _, y in quad) / n)


def _height(quad: Quad) -> float:
    ys = [y for _, y in quad]
    return max(ys) - min(ys)


def _median(vals: Sequence[float]) -> float:
    s = sorted(vals)
    n = len(s)
    mid = n // 2
    return s[mid] if n % 2 else (s[mid - 1] + s[mid]) / 2.0


def _boxes_out_of_order(a: Quad, b: Quad, threshold: float) -> bool:
    """True if box *a* should come after box *b* (simple.py:184-193)."""
    ax, ay = _center(a)
    bx, by = _center(b)
    if abs(ay - by) > threshold:
        return ay > by
    return ax > bx


def reading_order(quads: Sequence[Quad], y_thresh: float = 0.6) -> list[int]:
    """L3: return original indices in reading order.

    Deskew, threshold = y_thresh · median(height), stable pre-sort by
    x-center, then the literal bubble sort with the non-transitive
    comparator (simple.py:62-101).  O(n²) worst case — fine: n is the
    number of blocks on ONE page, and pages are the parallel unit.
    """
    if not quads:
        return []
    straight = deskew(quads)
    heights = [_height(q) for q in straight]
    threshold = y_thresh * _median(heights)

    # centers are pure functions of the deskewed quads: compute once,
    # compare cached values inside the (kept-literal) bubble sort —
    # identical comparator, identical swaps (_boxes_out_of_order inlined)
    centers = [_center(q) for q in straight]
    order = sorted(range(len(straight)), key=lambda i: centers[i][0])

    last = len(order) - 1
    swapped = True
    while swapped:
        swapped = False
        for i in range(last):
            ax, ay = centers[order[i]]
            bx, by = centers[order[i + 1]]
            if (ay > by) if abs(ay - by) > threshold else (ax > bx):
                order[i], order[i + 1] = order[i + 1], order[i]
                swapped = True
    return order


def axis_rect(x: float, y: float, w: float, h: float) -> Quad:
    """Axis-aligned quad (TL, TR, BR, BL) from origin + size."""
    return [(x, y), (x + w, y), (x + w, y + h), (x, y + h)]
