"""Document-layout analysis library (reading order, lines, paragraphs).

From-scratch re-implementation of the reference's tbpu package semantics
(/root/reference/tbpu/*, a general OCR post-processing library): block
geometry normalization with rotation estimation, greedy line clustering,
paragraph detection, multi-column gap-tree reading order, code-block
formatting.

Everything here is pure Python on one document's block list — inherently
sequential algorithms (greedy absorption, chained thresholds, persistent
gap intersection) that would change results if re-expressed relationally.
They are embarrassingly parallel ACROSS documents: spark_udfs.apply_layout
runs them per document inside mapInPandas (Arrow batches, zero shuffle).

Parser registry mirrors tbpu/__init__.py:14-23.
"""

from .geometry import normalize_blocks
from .lines import cluster_lines, merge_code_lines, apply_indent
from .paragraphs import assign_paragraph_ends
from .separators import word_separator
from .gap_tree import gap_tree_sort, gap_tree_nodes


def parser_none(blocks):
    """tbpu/parser_none.py:11-14: default '\\n' ends, no reordering."""
    for b in blocks:
        b.setdefault("end", "\n")
    return blocks


def parser_single_line(blocks):
    """tbpu/parser_single_line.py: normalize -> line clustering; every
    line ends with '\\n', intra-line separators by gap/word rules."""
    blocks = normalize_blocks(blocks)
    lines = cluster_lines(blocks)
    out = []
    for line in lines:
        for b in line:
            b.pop("nbox", None)
            out.append(b)
    return out


def parser_single_none(blocks):
    """tbpu/parser_single_none.py: single_line, then newline ends replaced
    with word-separators (continuous text)."""
    out = parser_single_line(blocks)
    for i in range(len(out) - 1):
        if out[i]["end"] == "\n":
            out[i]["end"] = word_separator(out[i]["text"][-1], out[i + 1]["text"][0])
    return out


def parser_single_para(blocks):
    """tbpu/parser_single_para.py: line clustering, then paragraph
    analysis over line-level pseudo-blocks."""
    blocks = normalize_blocks(blocks)
    lines = cluster_lines(blocks)
    pseudo = []
    for line in lines:
        x0, y0, x1, y1 = line[0]["nbox"]
        # NB: replicates the reference's union quirk (parser_single_para.py
        # :31-34 folds over b1 instead of each coordinate) for output parity
        for b in line[1:]:
            nb = b["nbox"]
            y0 = min(y0, nb[1])
            x1 = max(y0, nb[2])
            y1 = max(y0, nb[3])
        pseudo.append(
            {
                "nbox": (x0, y0, x1, y1),
                "text": line[0]["text"][0] + line[-1]["text"][-1],
                "line": line,
            }
        )
    assign_paragraph_ends(
        pseudo,
        get_info=lambda p: (p["nbox"], p["text"]),
        set_end=lambda p, end: p["line"][-1].__setitem__("end", end),
    )
    out = []
    for p in pseudo:
        for b in p["line"]:
            b.pop("nbox", None)
            out.append(b)
    return out


def parser_single_code(blocks):
    """tbpu/parser_single_code.py: line clustering -> merge each line into
    one block with gap-proportional spaces -> indent levels."""
    blocks = normalize_blocks(blocks)
    lines = cluster_lines(blocks)
    merged = [merge_code_lines(line) for line in lines]
    apply_indent(merged)
    return merged


def parser_multi_line(blocks):
    """tbpu/parser_multi_line.py: gap-tree reading order, '\\n' ends."""
    blocks = normalize_blocks(blocks)
    blocks = gap_tree_sort(blocks)
    for b in blocks:
        b["end"] = "\n"
        b.pop("nbox", None)
    return blocks


def parser_multi_none(blocks):
    """tbpu/parser_multi_none.py: gap-tree order, word-separator ends."""
    blocks = normalize_blocks(blocks)
    blocks = gap_tree_sort(blocks)
    for i, b in enumerate(blocks):
        if i < len(blocks) - 1:
            b["end"] = word_separator(b["text"][-1], blocks[i + 1]["text"][0])
        else:
            b["end"] = "\n"
        b.pop("nbox", None)
    return blocks


def parser_multi_para(blocks):
    """tbpu/parser_multi_para.py: gap-tree order, then paragraph analysis
    within each layout-tree node."""
    blocks = normalize_blocks(blocks)
    ordered, nodes = gap_tree_nodes(blocks)
    for tbs in nodes:
        assign_paragraph_ends(
            tbs,
            get_info=lambda b: (b["nbox"], b["text"]),
            set_end=lambda b, end: b.__setitem__("end", end),
        )
        for b in tbs:
            b.pop("nbox", None)
    return ordered


PARSERS = {
    "none": parser_none,
    "single_line": parser_single_line,
    "single_none": parser_single_none,
    "single_para": parser_single_para,
    "single_code": parser_single_code,
    "multi_line": parser_multi_line,
    "multi_none": parser_multi_none,
    "multi_para": parser_multi_para,
}


def get_parser(mode: str):
    return PARSERS[mode]
