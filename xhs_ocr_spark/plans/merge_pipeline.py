"""The reference's 4-stage merge DAG (db/pipeline.py:8-76) as one plan.

Stages (related_key = account/device/date/link tuple throughout):
  1.  video top  ⋈ video bottom   (related)   -> video overview
  1.1 note  top  ⋈ note  bottom   (related)   -> note overview
  2.  note overview ∪ video overview (unrelated) -> data overview
  3.  note traffic  ∪ video traffic  (unrelated) -> traffic analysis
  4.  data overview ⋈ traffic analysis (related) -> final

The reference runs each stage as a separate driver-side read-merge-write
round trip; here the whole DAG is one lazy DataFrame plan, so Catalyst
dedups scans and pipelines stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.merges import related_merge, unrelated_merge

RELATED_KEYS = ["account_id", "device_ip", "collect_date", "url"]


def run_merge_pipeline(
    video_top: DataFrame,
    video_bottom: DataFrame,
    note_top: DataFrame,
    note_bottom: DataFrame,
    note_traffic: DataFrame,
    video_traffic: DataFrame,
    keys: list[str] | None = None,
) -> DataFrame:
    keys = keys or RELATED_KEYS
    video_overview = related_merge([video_top, video_bottom], keys)
    note_overview = related_merge([note_top, note_bottom], keys)
    data_overview = unrelated_merge([note_overview, video_overview])
    traffic = unrelated_merge([note_traffic, video_traffic])
    return related_merge([data_overview, traffic], keys)
