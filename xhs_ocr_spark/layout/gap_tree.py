"""Gap-tree reading-order sort (O6) — multi-column layout analysis.

Semantics of tbpu/parser_tools/gap_tree.py:19-330 (the published
GapTree_Sort_Algorithm): scan rows top-to-bottom; the vertical gaps that
persist across consecutive rows become cut lines; cut lines partition rows
into column intervals; intervals chain into layout-tree nodes; preorder
DFS over the tree (children left-to-right) yields human reading order
across columns.

All numeric details (page-edge padding, the x_right-2 probe, the 1e-4
epsilon, parent selection by lowest-then-rightmost completed node) are
preserved — they are observable in the output order.
"""

from __future__ import annotations


def _collect_rows_and_cuts(units, page_left, page_right):
    """units: [(bbox, block)] sorted by top. Returns (cuts, rows) where a
    cut is (x_left, x_right, first_row, last_row) and rows is [[unit]]."""
    page_left -= 1
    page_right += 1
    rows = []
    finished_cuts = []
    active = []  # (x_left, x_right, first_row)
    idx = 0
    row_no = 0
    n = len(units)
    while idx < n:
        anchor_bottom = units[idx][0][3]
        row = [units[idx]]
        for j in range(idx + 1, n):
            if units[j][0][1] > anchor_bottom:
                break
            row.append(units[j])
            idx = j
        row.sort(key=lambda u: (u[0][0], u[0][2]))
        # horizontal gaps of this row (left-to-right sweep)
        row_gaps = []
        sweep = page_left
        for u in row:
            left, right = u[0][0], u[0][2]
            if left > sweep:
                row_gaps.append((sweep, left, row_no))
            if right > sweep:
                sweep = right
        row_gaps.append((sweep, page_right, row_no))
        # intersect active gaps with this row's gaps
        keep_old = [False] * len(active)
        consumed_new = [False] * len(row_gaps)
        next_active = []
        for i1, (l1, r1, born) in enumerate(active):
            for i2, (l2, r2, _) in enumerate(row_gaps):
                lo, hi = max(l1, l2), min(r1, r2)
                if lo <= hi:
                    next_active.append((lo, hi, born))
                    keep_old[i1] = True
                    consumed_new[i2] = True
        for i2, used in enumerate(consumed_new):
            if not used:
                next_active.append(row_gaps[i2])
        for i1, kept in enumerate(keep_old):
            if not kept:
                finished_cuts.append((*active[i1], row_no - 1))
        active = next_active
        rows.append(row)
        idx += 1
        row_no += 1
    last = len(rows) - 1
    for g in active:
        finished_cuts.append((*g, last))
    finished_cuts.sort(key=lambda c: c[0])
    return finished_cuts, rows


def _build_tree(cuts, rows):
    per_row_gaps = [[] for _ in rows]
    for x_l, x_r, first, last in cuts:
        for r in range(first, last + 1):
            per_row_gaps[r].append((x_l, x_r))

    root = {
        "x_left": cuts[0][0] - 1,
        "x_right": cuts[-1][1] + 1,
        "r_top": -1,
        "r_bottom": -1,
        "units": [],
        "children": [],
    }
    done = [root]
    open_nodes = []

    def close(node):
        probe = node["x_right"] - 2
        best, best_bottom = [], -2
        for cand in done:
            if probe < cand["x_left"] or probe > cand["x_right"] + 0.0001:
                continue
            if cand["r_bottom"] >= node["r_top"]:
                continue
            if cand["r_bottom"] > best_bottom:
                best_bottom, best = cand["r_bottom"], [cand]
            elif cand["r_bottom"] == best_bottom:
                best.append(cand)
        parent = max(best, key=lambda c: c["x_right"])
        parent["children"].append(node)
        done.append(node)

    for r_i, row in enumerate(rows):
        gaps = per_row_gaps[r_i]
        # close open nodes whose edges are not continued by this row's gaps
        survivors = []
        for node in open_nodes:
            left_ok = right_ok = False
            broken = False
            for g_l, g_r in gaps:
                if g_r == node["x_left"]:
                    left_ok = True
                if g_l == node["x_right"]:
                    right_ok = True
                if node["x_left"] < g_l < node["x_right"] or node["x_left"] < g_r < node["x_right"]:
                    broken = True
                    break
            if broken or not left_ok or not right_ok:
                close(node)
            else:
                node["r_bottom"] = r_i
                survivors.append(node)
        open_nodes = survivors
        # slot units into the column intervals between consecutive gaps
        u_i = g_i = 0
        while u_i < len(row):
            unit = row[u_i]
            col_l = gaps[g_i][1]
            col_r = gaps[g_i + 1][0]
            if unit[0][0] + 0.0001 > col_r:
                g_i += 1
                continue
            placed = False
            for node in open_nodes:
                if node["x_left"] == col_l and node["x_right"] == col_r:
                    node["units"].append(unit)
                    placed = True
                    break
            if not placed:
                open_nodes.append(
                    {
                        "x_left": col_l,
                        "x_right": col_r,
                        "r_top": r_i,
                        "r_bottom": r_i,
                        "units": [unit],
                        "children": [],
                    }
                )
            u_i += 1
    for node in open_nodes:
        close(node)
    for node in done:
        node["children"].sort(key=lambda c: c["x_left"])
        node["units"].sort(key=lambda u: u[0][1])
    return root


def _preorder(root):
    out, stack = [], [root]
    while stack:
        node = stack.pop()
        out.append(node)
        stack.extend(reversed(node["children"]))
    return out


def _sorted_nodes(blocks):
    units = [(b["nbox"], b) for b in blocks]
    page_l = min(u[0][0] for u in units)
    page_r = max(u[0][2] for u in units)
    units.sort(key=lambda u: u[0][1])
    cuts, rows = _collect_rows_and_cuts(units, page_l, page_r)
    root = _build_tree(cuts, rows)
    return _preorder(root)


def gap_tree_sort(blocks):
    """Blocks in reading order."""
    return [u[1] for node in _sorted_nodes(blocks) for u in node["units"]]


def gap_tree_nodes(blocks):
    """(ordered blocks, [node block-lists]) — the per-column grouping the
    multi_para parser analyzes paragraph structure within."""
    nodes = _sorted_nodes(blocks)
    ordered = [u[1] for node in nodes for u in node["units"]]
    groups = [[u[1] for u in node["units"]] for node in nodes if node["units"]]
    return ordered, groups
