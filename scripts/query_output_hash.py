#!/usr/bin/env python
"""Print (rows, md5-of-sorted-rows) per query — for old-vs-new output
equality checks across trees during optimization rounds.

    python scripts/query_output_hash.py q29_embedding_neardup --sf /root/testdata/sf1.0
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xhs_ocr_spark import queries as Q  # noqa: E402
from xhs_ocr_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    spark = get_spark("query-output-hash")
    qs = Q.queries()
    for name in args.queries:
        df = qs[name](spark, args.sf)
        rows = df.collect()
        keyed = sorted(tuple(repr(v) for v in r) for r in rows)
        h = hashlib.md5()
        for r in keyed:
            h.update("\x1f".join(r).encode())
            h.update(b"\x1e")
        print(f"{name} rows={len(rows)} md5={h.hexdigest()}")
    spark.stop()


if __name__ == "__main__":
    main()
