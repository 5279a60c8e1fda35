#!/usr/bin/env python
"""Per-query measurement harness for optimization work (guide §1).

NOT the driver bench — bench.py is frozen for measurement. This tool
isolates single queries so optimization A/Bs are fast:

    python bench_extra.py q29_embedding_neardup q27_ngram_jaccard \
        --sf /root/testdata/sf1.0 --rounds 3 [--noop] [--explain-dir plans/r07]

- times `.count()` by default (the frozen bench's methodology, so the
  numbers predict the driver's), `--noop` additionally times the
  noop-sink write (computes every column — guide §1.4);
- one warm-up pass per query before the timed rounds;
- labels jobs via setJobDescription;
- `--explain-dir` dumps .explain("formatted") per query;
- prints one JSON line {query: {count: [..], noop: [..]}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from xhs_ocr_spark import queries as Q  # noqa: E402
from xhs_ocr_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: all bench queries)")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--explain-dir", default=None)
    args = ap.parse_args()

    qs = Q.queries()
    names = args.queries or list(qs)
    for n in names:
        if n not in qs:
            sys.exit(f"unknown query {n}; have {sorted(qs)}")

    spark = get_spark("bench-extra")
    out: dict[str, dict] = {}
    for name in names:
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = qs[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain_dir, f"{name}.txt"), "w") as fh:
                fh.write(plan)
        rec: dict[str, list[float]] = {"count": []}
        if not args.no_warmup:
            spark.sparkContext.setJobDescription(f"{name}: warmup")
            qs[name](spark, args.sf).count()
        for r in range(args.rounds):
            spark.sparkContext.setJobDescription(f"{name}: count round {r}")
            t0 = time.time()
            qs[name](spark, args.sf).count()
            rec["count"].append(round(time.time() - t0, 3))
        if args.noop:
            rec["noop"] = []
            for r in range(args.rounds):
                spark.sparkContext.setJobDescription(f"{name}: noop round {r}")
                t0 = time.time()
                qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
                rec["noop"].append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = rec
        print(f"## {name}: {rec}", file=sys.stderr)
    print(json.dumps({"sf": args.sf, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
