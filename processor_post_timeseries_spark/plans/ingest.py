"""Single-pass fused ingest: blocks + ALL retention tiers from ONE scan.

The modular pipeline runs ``to_blocks`` and the tier cascade as two jobs,
each scanning the raw sequences and shipping every token through Arrow.
At trillion-token scale the raw scan IS the cost — so the production
plan computes both artifacts in one ``mapInPandas`` pass: per Arrow
batch, cut + DoD-encode the blocks AND window-reduce the tier cascade,
emitting a union-schema frame tagged ``kind`` ('block' | 'tier').

The sink partitions by (kind, source, bucket); consumers read
``kind=block`` / ``kind=tier`` slices with partition pruning, so the
mixed schema costs nothing (parquet stores the unused columns as nulls).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.codec import dod_encode_array
from ..operators.rollup import DEFAULT_TIERS, _batch_window_stats, _window_starts

INGEST_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        # block columns
        T.StructField("block_no", T.IntegerType(), True),
        T.StructField("start_idx", T.LongType(), True),
        T.StructField("end_idx", T.LongType(), True),
        T.StructField("n", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
        # tier columns
        T.StructField("tier", T.StringType(), True),
        T.StructField("window", T.LongType(), True),
        T.StructField("n_windows", T.IntegerType(), True),
        T.StructField("mins", T.ArrayType(T.LongType()), True),
        T.StructField("maxs", T.ArrayType(T.LongType()), True),
        T.StructField("sums", T.ArrayType(T.LongType()), True),
        T.StructField("cnts", T.ArrayType(T.LongType()), True),
    ]
)

_COLS = [f.name for f in INGEST_SCHEMA.fields]


def fused_ingest(
    seq_df: DataFrame,
    tiers: tuple[tuple[str, int], ...] = DEFAULT_TIERS,
    block_size: int = 131_072,
) -> DataFrame:
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            docs = pdf["doc_id"].values
            srcs = pdf["source"].values
            arrays = [np.asarray(t, dtype=np.int32) for t in pdf["tokens"]]

            # ---- blocks ------------------------------------------------
            brows = []
            for doc, src, a in zip(docs, srcs, arrays):
                n = len(a)
                for b, start in enumerate(range(0, n, block_size)):
                    end = min(start + block_size, n)
                    brows.append(
                        ("block", doc, src, b, start, end, end - start,
                         dod_encode_array(a[start:end]))
                    )
            bdf = pd.DataFrame(
                brows,
                columns=["kind", "doc_id", "source", "block_no", "start_idx",
                         "end_idx", "n", "payload"],
            )

            # ---- tier cascade (one reduceat per column per tier) --------
            tframes = []
            window = 1
            cur = None
            for name, factor in tiers:
                window *= factor
                if cur is None:
                    cur = _batch_window_stats(arrays, factor)
                else:
                    mins0, maxs0, sums0, cnts0, nws0 = cur
                    starts, nws, total = _window_starts(nws0, factor)
                    cur = (
                        np.minimum.reduceat(mins0, starts) if total else mins0[:0],
                        np.maximum.reduceat(maxs0, starts) if total else maxs0[:0],
                        np.add.reduceat(sums0, starts) if total else sums0[:0],
                        np.add.reduceat(cnts0, starts) if total else cnts0[:0],
                        nws,
                    )
                mins, maxs, sums, cnts, nws = cur
                bounds = np.cumsum(nws)[:-1] if len(nws) else []
                tframes.append(
                    pd.DataFrame(
                        {
                            "kind": "tier",
                            "doc_id": docs,
                            "source": srcs,
                            "tier": name,
                            "window": np.int64(window),
                            "n_windows": nws.astype(np.int32) if len(nws) else nws,
                            "mins": np.split(mins, bounds),
                            "maxs": np.split(maxs, bounds),
                            "sums": np.split(sums, bounds),
                            "cnts": np.split(cnts, bounds),
                        }
                    )
                )
            # fill the other kind's columns with None BEFORE concat —
            # pd.concat would otherwise insert float NaN, which Arrow
            # rejects for array/int columns
            frames = [bdf, *tframes]
            for f in frames:
                for c in _COLS:
                    if c not in f.columns:
                        f[c] = pd.Series([None] * len(f), dtype=object)
            out = pd.concat([f[_COLS] for f in frames], ignore_index=True)
            yield out

    return seq_df.mapInPandas(kernel, schema=INGEST_SCHEMA)
