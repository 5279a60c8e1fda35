"""Differential parity: our reading_order vs the REFERENCE's
sort_text_lines_by_paddle_position (loaded file-direct from
/root/reference/core/ocr.py, which has no live imports), across many
randomized-but-deterministic block layouts including the chained-anchor
edge cases."""

import hashlib
import importlib.util

import pytest

from xhs_ocr_spark.extraction.semantics import reading_order, reading_order_anchor


def _ref_module():
    try:
        spec = importlib.util.spec_from_file_location("ref_ocr", "/root/reference/core/ocr.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:  # pragma: no cover
        pytest.skip("reference core/ocr.py not loadable")


def _h(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:10], 16)


def synth(seed: int):
    n = 3 + _h(f"n{seed}") % 12
    blocks = []
    for i in range(n):
        h = _h(f"{seed}:{i}")
        # y jitter straddling the 20px threshold to exercise chaining
        x, y = h % 600, (h >> 8) % 25 * 9
        w, hh = 40 + h % 80, 18 + h % 8
        blocks.append(
            {"box": [[x, y], [x + w, y], [x + w, y + hh], [x, y + hh]],
             "score": 0.9, "text": f"b{i}"}
        )
    return blocks


def test_paddle_sort_parity_with_reference():
    ref = _ref_module()
    for seed in range(200):
        blocks = synth(seed)
        ours = [b["text"] for b in reading_order(list(blocks))]
        theirs = [b["text"] for b in ref.sort_text_lines_by_paddle_position(list(blocks))]
        assert ours == theirs, f"seed {seed}: {ours} vs {theirs}"


class _FakeLine:
    def __init__(self, b):
        xs = [p[0] for p in b["box"]]
        ys = [p[1] for p in b["box"]]
        self.bbox = [min(xs), min(ys), max(xs), max(ys)]
        self.text = b["text"]


def test_surya_sort_parity_with_reference():
    ref = _ref_module()
    for seed in range(200):
        blocks = synth(seed)
        ours = [b["text"] for b in reading_order_anchor(list(blocks), threshold=5)]
        theirs = [
            ln.text
            for ln in ref.sort_text_lines_by_surya_position([_FakeLine(b) for b in blocks])
        ]
        assert ours == theirs, f"seed {seed}: {ours} vs {theirs}"
