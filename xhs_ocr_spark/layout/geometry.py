"""Block geometry: rotation estimation + normalized bboxes.

Semantics of tbpu/parser_tools/line_preprocessing.py:8-95 (G6): estimate
page rotation as the median of per-box angles; skip rotation when
|angle| <= 3 degrees; otherwise rotate all corners by -angle, axis-align,
and shift so coordinates stay non-negative. Blocks end sorted by top edge.
"""

from __future__ import annotations

import math
from statistics import median

ANGLE_LIMIT_RAD = math.radians(3)


def _box_angle(box) -> float:
    (x0, y0), (x1, y1), (x2, y2), _ = box
    w = math.hypot(x1 - x0, y1 - y0)
    h = math.hypot(x2 - x1, y2 - y1)
    # measure along the longer edge
    if w < h:
        a = math.atan2(y2 - y1, x2 - x1)
    else:
        a = math.atan2(y1 - y0, x1 - x0)
    # fold into [-pi/2, pi/2) with the threshold as slack
    if a < -math.pi / 2 + ANGLE_LIMIT_RAD:
        a += math.pi
    elif a >= math.pi / 2 + ANGLE_LIMIT_RAD:
        a -= math.pi
    return a


def estimate_rotation(blocks) -> float:
    return median(_box_angle(b["box"]) for b in blocks)


def normalize_blocks(blocks):
    """Attach an axis-aligned 'nbox' = (x0, y0, x1, y1) to each block and
    sort by top edge."""
    rot = estimate_rotation(blocks)
    if abs(rot) <= ANGLE_LIMIT_RAD:
        for b in blocks:
            xs = [p[0] for p in b["box"]]
            ys = [p[1] for p in b["box"]]
            b["nbox"] = (min(xs), min(ys), max(xs), max(ys))
    else:
        c, s = math.cos(-rot), math.sin(-rot)
        shift_x = shift_y = math.inf
        for b in blocks:
            pts = [(c * x - s * y, s * x + c * y) for x, y in b["box"]]
            xs, ys = zip(*pts)
            b["nbox"] = (min(xs), min(ys), max(xs), max(ys))
            shift_x = min(shift_x, b["nbox"][0])
            shift_y = min(shift_y, b["nbox"][1])
        if shift_x < 0 or shift_y < 0:
            for b in blocks:
                x0, y0, x1, y1 = b["nbox"]
                b["nbox"] = (x0 - shift_x, y0 - shift_y, x1 - shift_x, y1 - shift_y)
    blocks.sort(key=lambda b: b["nbox"][1])
    return blocks
