"""Paragraph detection + separator assignment (G2, G3).

Semantics of tbpu/parser_tools/paragraph_parse.py:39-173: a top-down scan
groups units into paragraphs when left AND right edges stay within
1.2 line-heights and line spacing stays consistent (running averages of
edges/height/spacing); then single-line paragraphs are merged into the
neighbor they align with (alignment + spacing rules, closer neighbor wins
on ties); finally separators: word_separator inside a paragraph, '\\n' at
paragraph end.
"""

from __future__ import annotations

from .separators import word_separator

EDGE_TH = 1.2  # line-height multiplier for edge-alignment checks


def assign_paragraph_ends(items: list, get_info, set_end) -> None:
    units = [(get_info(it)[0], (get_info(it)[1][0], get_info(it)[1][-1]), it) for it in items]
    units.sort(key=lambda u: u[0][1])

    # --- phase 1: sequential paragraph grouping with running averages ---
    p_left, p_top, p_right, p_bottom = units[0][0]
    p_height = p_bottom - p_top
    p_spacing = None
    current = [units[0]]
    paras: list[list] = []
    spacings: list = []
    for u in units[1:]:
        left, top, right, bottom = u[0]
        spacing = top - p_bottom
        same = (
            abs(p_left - left) <= p_height * EDGE_TH
            and abs(p_right - right) <= p_height * EDGE_TH
            and (p_spacing is None or spacing < p_spacing + p_height * 0.5)
        )
        if same:
            p_left = (p_left + left) / 2
            p_right = (p_right + right) / 2
            p_height = (p_height + (bottom - top)) / 2
            p_spacing = spacing if p_spacing is None else (p_spacing + spacing) / 2
            current.append(u)
        else:
            paras.append(current)
            spacings.append(p_spacing)
            current = [u]
            p_left, p_right, p_height = left, right, bottom - top
            p_spacing = None
        p_bottom = bottom
    paras.append(current)
    spacings.append(p_spacing)

    # --- phase 2: merge orphan single-line paragraphs into neighbors ---
    for i in reversed(range(len(paras))):
        if len(paras[i]) != 1:
            continue
        left, top, right, bottom = paras[i][0][0]
        join_up = join_down = False
        if i > 0:
            ul, ut, ur, ub = paras[i - 1][-1][0]
            uh = ub - ut
            join_up = abs(ul - left) <= uh * EDGE_TH and right <= ur + uh * EDGE_TH
            if spacings[i - 1] is not None and top - ub > spacings[i - 1] + uh * 0.5:
                join_up = False
        if i < len(paras) - 1:
            dl, dt, dr, db = paras[i + 1][0][0]
            dh = db - dt
            if dl - dh * EDGE_TH <= left <= dl + dh * (1 + EDGE_TH):
                if len(paras[i + 1]) > 1:
                    join_down = abs(dr - right) <= dh * EDGE_TH
                else:
                    join_down = dr - dh * EDGE_TH < right
            if spacings[i + 1] is not None and dt - bottom > spacings[i + 1] + dh * 0.5:
                join_down = False
        if join_up and join_down:
            # closer vertical neighbor wins
            if top - paras[i - 1][-1][0][3] < paras[i + 1][0][0][1] - bottom:
                paras[i - 1].append(paras[i][0])
            else:
                paras[i + 1].insert(0, paras[i][0])
        elif join_up:
            paras[i - 1].append(paras[i][0])
        elif join_down:
            paras[i + 1].insert(0, paras[i][0])
        if join_up or join_down:
            del paras[i]
            del spacings[i]

    # --- phase 3: separators ---
    for para in paras:
        for k in range(len(para) - 1):
            set_end(para[k][2], word_separator(para[k][1][1], para[k + 1][1][0]))
        set_end(para[-1][2], "\n")
