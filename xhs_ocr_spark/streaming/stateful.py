"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming state at all (its "state" is DB
idempotency); this is the Spark-native building block the brief calls for
("applyInPandasWithState for custom stateful operators"): a per-user
running aggregate that survives across microbatches — the pattern a
streaming dedup / rate-limit / session operator builds on.

Emits, per microbatch and per user seen in it, the CUMULATIVE
(n_events, value_sum_x100) including all prior batches. The final row per
user therefore equals the batch groupBy — which is exactly what the test
asserts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum_x100", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("v100", T.LongType()),
    ]
)


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    n, v100 = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        v100 += int(round(pdf["value"].sum() * 100))
    state.update((n, v100))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "value_sum_x100": [v100]})


def stateful_user_totals(events_stream: DataFrame) -> DataFrame:
    """Streaming (user_id, cumulative n_events, cumulative value cents)."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
