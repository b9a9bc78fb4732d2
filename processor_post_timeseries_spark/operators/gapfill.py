"""Gap-fill of missing sample indices (north-rule operator W2).

The reference only *detects* gaps (``/root/reference/processor/reader.py:181-225``);
the north rule requires the inverse: reconstruct a dense sample frame over
``[0, n_tok)`` with a forward-fill policy (leading gap -> ``fill_first``).

Two physical strategies, same semantics:

``gapfill_tokens``
    Input is block-form ``tokens`` with nulls marking missing samples.
    Pure narrow map (Arrow batch + numpy ffill) — zero shuffle; this is
    the 100 TB path when ingest already landed arrays.

``gapfill_samples``
    Input is long-form observed samples ``(doc_id, source, n_tok, idx,
    value)``. One shuffle (groupBy doc) to re-block, then the same numpy
    fill. Long-form -> block-form is the *only* shuffle, sized by the
    observed data, and AQE coalesces it; after this, everything stays
    block-form.

A SQL-expressible equivalent (``gapfill_samples_sql``) exists for oracle
parity: sequence()-explode full frame, left join, last(ignorenulls) over
an ordered window. It shuffles twice and explodes to one row per sample —
kept for correctness cross-checks, not the production path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..sources.synth import SEQ_SCHEMA


def _ffill(n: int, idx: np.ndarray, val: np.ndarray, fill_first: int) -> np.ndarray:
    """Vectorized forward fill: scatter observed, propagate last seen."""
    present = np.zeros(n, dtype=bool)
    out = np.zeros(n, dtype=np.int64)
    present[idx] = True
    out[idx] = val
    # index of most recent present position, or -1
    pos = np.where(present, np.arange(n), -1)
    np.maximum.accumulate(pos, out=pos)
    filled = np.where(pos >= 0, out[np.clip(pos, 0, None)], fill_first)
    return filled.astype(np.int32)


def gapfill_tokens(seq_df: DataFrame, fill_first: int = 0) -> DataFrame:
    """Block-form gap-fill: nulls inside ``tokens`` forward-filled. Narrow map."""

    def fill(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks_out = []
            for toks in pdf["tokens"]:
                a = pd.array(toks)
                vals = np.asarray(a, dtype=object)
                mask = pd.isna(vals)
                n = len(vals)
                idx = np.nonzero(~mask)[0]
                filled = _ffill(n, idx, vals[~mask].astype(np.int64), fill_first)
                toks_out.append(filled)
            pdf = pdf.copy()
            pdf["tokens"] = toks_out
            yield pdf

    return seq_df.mapInPandas(fill, schema=seq_df.schema)


def gapfill_samples(obs_df: DataFrame, fill_first: int = 0) -> DataFrame:
    """Long-form observed samples -> dense block-form sequences.

    Output schema == input_hint sequences schema. One shuffle (re-block by
    doc), then numpy fill per group.
    """

    def fill(key, pdf):
        n = int(pdf["n_tok"].iloc[0])
        idx = pdf["idx"].to_numpy(np.int64)
        val = pdf["value"].to_numpy(np.int64)
        order = np.argsort(idx, kind="stable")
        filled = _ffill(n, idx[order], val[order], fill_first)
        return pd.DataFrame(
            {
                "doc_id": [key[0]],
                "tokens": [filled],
                "n_tok": [n],
                "source": [pdf["source"].iloc[0]],
            }
        )

    return obs_df.groupBy("doc_id").applyInPandas(fill, schema=SEQ_SCHEMA)


def gapfill_samples_sql(obs_df: DataFrame, fill_first: int = 0) -> DataFrame:
    """Oracle-parity long-form gap-fill, pure Spark SQL primitives.

    Returns the dense long form ``(doc_id, source, idx, value)``. Used to
    cross-check the vectorized path and as the driver-oracle query shape.
    """
    docs = obs_df.groupBy("doc_id").agg(
        F.first("source").alias("source"), F.first("n_tok").alias("n_tok")
    )
    frame = docs.select(
        "doc_id", "source", F.explode(F.sequence(F.lit(0), F.col("n_tok") - 1)).alias("idx")
    )
    joined = frame.join(obs_df.select("doc_id", "idx", "value"), ["doc_id", "idx"], "left")
    w = Window.partitionBy("doc_id").orderBy("idx").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "doc_id",
        "source",
        "idx",
        F.coalesce(F.last("value", ignorenulls=True).over(w), F.lit(fill_first))
        .cast("int")
        .alias("value"),
    )
