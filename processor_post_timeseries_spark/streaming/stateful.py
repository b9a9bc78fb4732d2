"""Custom stateful streaming operator via ``applyInPandasWithState``.

Streaming channel-extent tracking (operator A1's streaming twin): per
key, maintain ``(start_us, end_us, n_samples, min_v, max_v)`` across
micro-batches in the state store, emitting the updated extents each
batch. The reference computes extents once per file
(``/root/reference/processor/reader.py:146-175``); a continuously-fed
table needs them maintained incrementally — state survives restarts via
the streaming checkpoint (exercised in tests by two availableNow passes
over a growing directory).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EXTENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("start_us", T.LongType(), False),
        T.StructField("end_us", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("min_v", T.DoubleType(), False),
        T.StructField("max_v", T.DoubleType(), False),
    ]
)

_STATE_SCHEMA = "start_us LONG, end_us LONG, n_samples LONG, min_v DOUBLE, max_v DOUBLE"


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    start = end = None
    n = 0
    mn = mx = None
    if state.exists:
        start, end, n, mn, mx = state.get
    for pdf in pdfs:
        ts = pdf["ts_us"]
        v = pdf["value"]
        start = int(ts.min()) if start is None else min(start, int(ts.min()))
        end = int(ts.max()) if end is None else max(end, int(ts.max()))
        n += len(pdf)
        mn = float(v.min()) if mn is None else min(mn, float(v.min()))
        mx = float(v.max()) if mx is None else max(mx, float(v.max()))
    state.update((start, end, n, mn, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "start_us": [start],
            "end_us": [end],
            "n_samples": [n],
            "min_v": [mn],
            "max_v": [mx],
        }
    )


def streaming_channel_extents(events_stream: DataFrame) -> DataFrame:
    """events (ts timestamp, user_id, value) stream -> per-key running
    extents, state maintained across micro-batches."""
    keyed = events_stream.select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"), "value"
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=EXTENT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_extents_available_now(
    spark, in_dir: str, out_dir: str, checkpoint_dir: str, schema: T.StructType
):
    """availableNow pass: process the backlog, persist state, stop."""
    src = spark.readStream.schema(schema).parquet(in_dir)

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        # update-mode output: the file sink is append-only, so land each
        # micro-batch's updated extents via foreachBatch
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        streaming_channel_extents(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    return q
