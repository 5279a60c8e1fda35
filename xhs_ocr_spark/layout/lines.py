"""Greedy line clustering (G1) + code-mode line merge / indent (G4, G5).

Semantics of tbpu/parser_single_line.py:13-62 and
tbpu/parser_single_code.py:13-67. The clustering is order-dependent greedy
absorption (the absorber's right edge advances as it eats), so it stays a
per-document Python function — a relational session-window would change
results.
"""

from __future__ import annotations

from bisect import bisect_left

from .separators import word_separator


def cluster_lines(blocks):
    """Group normalized blocks into visual lines.

    Seed = leftmost unclaimed block; absorb blocks to its right whose
    vertical overlap is within half the seed height, whose height differs
    by less than 50% of the smaller, and whose left edge is not before the
    current right frontier minus one line height. Sets 'end' separators
    inside the line ('\\n' on the last block). Returns lines sorted by top.
    """
    work = sorted(blocks, key=lambda b: b["nbox"][0])
    claimed = [False] * len(work)
    lines = []
    for i, seed in enumerate(work):
        if claimed[i]:
            continue
        x0, top, right, bottom = seed["nbox"]
        h = bottom - top
        line = [seed]
        for j in range(i + 1, len(work)):
            if claimed[j]:
                continue
            bx0, btop, bx1, bbottom = work[j]["nbox"]
            bh = bbottom - btop
            if bx0 < right - h:
                continue  # starts too far left of the frontier
            if btop < top - h * 0.5 or bbottom > bottom + h * 0.5:
                continue  # vertically out of band
            if abs(h - bh) > min(h, bh) * 0.5:
                continue  # height mismatch
            line.append(work[j])
            claimed[j] = True
            right = bx1  # frontier advances
        # separators within the line (gap > 1.5x of the local height
        # forces a space; tbpu/parser_single_line.py:46-56 — including its
        # height formula, which mixes bottom2 and left2)
        for k in range(len(line) - 1):
            a0, at, a1, ab = line[k]["nbox"]
            b0, bt, b1, bb = line[k + 1]["nbox"]
            local_h = (ab + bb - at - b0) * 0.5
            if b0 - a1 > local_h * 1.5:
                line[k]["end"] = " "
            else:
                line[k]["end"] = word_separator(line[k]["text"][-1], line[k + 1]["text"][0])
        line[-1]["end"] = "\n"
        lines.append(line)
        claimed[i] = True
    lines.sort(key=lambda ln: ln[0]["nbox"][1])
    return lines


def merge_code_lines(line):
    """Merge a line's blocks into one: texts joined with two spaces per
    line-height of gap, boxes unioned, scores averaged
    (tbpu/parser_single_code.py:13-42)."""
    head = line[0]
    box = head["box"]
    h = box[3][1] - box[0][1]
    total_score = head["score"]
    for nxt in line[1:]:
        nbox = nxt["box"]
        h = (h + nbox[3][1] - nbox[0][1]) / 2
        spaces = 0
        if nbox[0][0] > box[1][0]:
            spaces = round((nbox[0][0] - box[1][0]) / h)
        head["text"] += "  " * spaces + nxt["text"]
        top = min(box[0][1], box[1][1], nbox[0][1], nbox[1][1])
        bot = max(box[2][1], box[3][1], nbox[2][1], nbox[3][1])
        left = min(box[0][0], box[3][0], nbox[0][0], nbox[3][0])
        right = max(box[1][0], box[2][0], nbox[1][0], nbox[2][0])
        box[0][1] = box[1][1] = top
        box[2][1] = box[3][1] = bot
        box[0][0] = box[3][0] = left
        box[1][0] = box[2][0] = right
        total_score += nxt["score"]
    head["score"] = total_score / len(line)
    head.pop("nbox", None)
    head["end"] = "\n"
    return head


def apply_indent(merged_blocks):
    """Indent levels: mean line height defines the level grid from the
    minimum left edge; each line gets two leading spaces per level
    (tbpu/parser_single_code.py:44-67)."""
    mean_h = 0.0
    left_min, left_max = float("inf"), float("-inf")
    for b in merged_blocks:
        box = b["box"]
        mean_h += box[3][1] - box[0][1]
        left_min = min(left_min, box[0][0])
        left_max = max(left_max, box[0][0])
    mean_h /= len(merged_blocks)
    levels = []
    x = left_min
    while x < left_max:
        levels.append(x)
        x += mean_h
    half = mean_h / 2
    for b in merged_blocks:
        box = b["box"]
        level = bisect_left(levels, box[0][0] + half) - 1
        b["text"] = "  " * level + b["text"]
        box[0][0] = box[3][0] = left_min
