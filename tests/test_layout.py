"""Layout library tests.

The strongest parity evidence available: run the REFERENCE tbpu package
itself (imported read-only from /root/reference, pure stdlib) on synthetic
block sets and require identical (text, end) sequences from our
re-implementation, across all parser modes and many seeds.
"""

import copy
import hashlib
import sys

import pytest

from xhs_ocr_spark import layout as L

REF_PATH = "/root/reference"


def _ref_parsers():
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    try:
        from tbpu import GetParser  # reference library, test-only import
    except Exception:  # pragma: no cover
        pytest.skip("reference tbpu not importable")
    return GetParser


MODES = [
    "none",
    "single_line",
    "single_none",
    "single_para",
    "single_code",
    "multi_line",
    "multi_none",
    "multi_para",
]


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def synth_blocks(seed: int):
    """Deterministic page: 1-3 columns, rows of 1-2 blocks, jitter, and an
    occasional rotated layout to exercise the rotation path."""
    h = _h(f"page:{seed}")
    n_cols = 1 + h % 3
    blocks = []
    rot = (h % 7 == 0) * 0.1  # ~5.7deg -> triggers rotation branch
    idx = 0
    for col in range(n_cols):
        col_x = 40 + col * 320
        n_rows = 3 + _h(f"r:{seed}:{col}") % 5
        for r in range(n_rows):
            hh = _h(f"b:{seed}:{col}:{r}")
            x = col_x + hh % 15
            y = 30 + r * 34 + hh % 6
            w = 120 + hh % 120
            ht = 20 + hh % 4
            import math

            def rp(px, py):
                if not rot:
                    return [px, py]
                c, s = math.cos(rot), math.sin(rot)
                return [c * px - s * py, s * px + c * py]

            box = [rp(x, y), rp(x + w, y), rp(x + w, y + ht), rp(x, y + ht)]
            texts = ["Alpha beta", "gamma-", "中文文本", "(note)", "x = f(y)", "delta."]
            blocks.append(
                {
                    "box": box,
                    "score": round(0.8 + (hh % 20) / 100, 2),
                    "text": texts[hh % len(texts)] + str(idx),
                }
            )
            idx += 1
    return blocks


@pytest.mark.parametrize("mode", MODES)
def test_parity_with_reference_tbpu(mode):
    GetParser = _ref_parsers()
    mismatches = []
    for seed in range(25):
        blocks = synth_blocks(seed)
        ours = L.get_parser(mode)(copy.deepcopy(blocks))
        ref = GetParser(mode).run(copy.deepcopy(blocks))
        got = [(b["text"], b.get("end")) for b in ours]
        exp = [(b["text"], b.get("end")) for b in ref]
        if got != exp:
            mismatches.append((seed, got, exp))
    assert not mismatches, f"{len(mismatches)} seeds mismatched; first: {mismatches[0]}"


def test_spark_layout_stage(spark):
    from pyspark.sql import Row

    from xhs_ocr_spark.layout.spark_udfs import apply_layout, render_text

    rows = [
        Row(doc_id=f"d{seed}", blocks=[Row(box=[[float(c) for c in p] for p in b["box"]],
                                           score=float(b["score"]), text=b["text"])
                                       for b in synth_blocks(seed)])
        for seed in range(6)
    ]
    from xhs_ocr_spark.layout.spark_udfs import layout_schema  # noqa
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("blocks", T.ArrayType(T.StructType([
            T.StructField("box", T.ArrayType(T.ArrayType(T.DoubleType()))),
            T.StructField("score", T.DoubleType()),
            T.StructField("text", T.StringType()),
        ]))),
    ])
    df = spark.createDataFrame(rows, schema=schema)
    out = {r["doc_id"]: r["blocks"] for r in apply_layout(df, "multi_para").collect()}
    assert set(out) == {f"d{s}" for s in range(6)}
    # distributed result == local result, per doc
    for seed in range(6):
        local = L.get_parser("multi_para")(copy.deepcopy(synth_blocks(seed)))
        got_text = render_text([{"text": b["text"], "end": b["end"]} for b in out[f"d{seed}"]])
        exp_text = render_text([{"text": b["text"], "end": b.get("end", "\n")} for b in local])
        assert got_text == exp_text
