"""Explicit per-sample timestamps for the token-sequence model — the
irregular-rate channel path the reference reads from stored
``timestamps`` arrays (``/root/reference/processor/reader.py:62-64,
108-136``) instead of synthesizing an implicit index.

Sequences carry an OPTIONAL ``ts: array<long>`` column (epoch-µs,
position-aligned with ``tokens``). Because a doc's whole stream lives in
one row, every per-doc computation here is a **narrow map over array
expressions** — segmentation, segment extents, and block bounds need no
shuffle at all (contrast ``operators/segments.py``, which sessionizes
row-per-sample tables and must shuffle on the key). At 100 TB that is
the difference between a scan and a sort.

Semantics mirror the reference reader exactly:

* a stream splits where the timestamp delta exceeds the gap threshold,
  default ``2 × (1/rate)`` (``reader.py:199``);
* segments are emitted half-open ``[start_us, end_us)`` with
  ``end_us = last_ts + 1`` (``reader.py:222-225``);
* blocks are cut WITHIN segments into fixed sample-count chunks
  (``writer.py:46-48``), each keyed by its first/last sample's REAL
  µs bounds (``writer.py:90-95``) — not synthetic indices.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def gap_threshold_us(rate_hz: float) -> int:
    """The reference's segmentation threshold: 2 sample periods
    (``/root/reference/processor/reader.py:199``)."""
    return int(round(2.0 * 1_000_000.0 / rate_hz))


def _boundary_positions(ts: Column, gap_us: Column) -> Column:
    """1-based positions p where a NEW segment starts (ts[p]-ts[p-1] >
    gap), prefixed with 1 and suffixed with n+1 — i.e. half-open
    position bounds of every segment. Guarded for n < 2 (sequence(2, n)
    would count DOWN in Spark, not return empty)."""
    n = F.size(ts)
    gaps = F.when(
        n >= 2,
        F.filter(
            F.sequence(F.lit(2), n),
            lambda i: F.element_at(ts, i) - F.element_at(ts, i - 1) > gap_us,
        ),
    ).otherwise(F.array().cast("array<int>"))
    return F.concat(F.array(F.lit(1)), gaps, F.array(n + 1))


def segments_from_ts_arrays(
    seq: DataFrame,
    ts_col: str = "ts",
    gap_us: int | Column = 4000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-segment extents from array-typed timestamps: one output row
    per (doc, segment) with ``seg_id`` (0-based), half-open µs bounds
    and the sample count. Zero shuffles — pure array expressions +
    one explode."""
    gap = gap_us if isinstance(gap_us, Column) else F.lit(gap_us)
    ts = F.col(ts_col)
    bounds = _boundary_positions(ts, gap)
    # slice+zip, not transform-over-sequence with element_at: the lambda
    # would re-evaluate the computed ``bounds`` (an O(n) filter) once
    # PER SEGMENT — O(segments * n) per row (see word_ngram_array for
    # the same trap). Zipping bounds with its own 1-shifted slice gives
    # the identical (p0, p1) pairs with bounds evaluated ~3x per row.
    nb = F.size(bounds) - 1
    zb = F.arrays_zip(
        F.slice(bounds, 1, nb).alias("p0"),
        F.slice(bounds, 2, nb).alias("p1"),
        F.sequence(F.lit(1), nb).alias("j"),
    )
    segs = F.transform(
        zb,
        lambda s: F.struct(
            (s["j"] - 1).cast("long").alias("seg_id"),
            s["p0"].alias("p0"),
            s["p1"].alias("p1"),
        ),
    )
    keep = [c for c in seq.columns if c not in (ts_col, "tokens")]
    return (
        seq.filter(F.size(ts) > 0)
        .select(*keep, ts.alias("_ts"), F.explode(segs).alias("_s"))
        .select(
            *keep,
            F.col("_s.seg_id").alias("seg_id"),
            F.element_at("_ts", F.col("_s.p0")).alias("seg_start_us"),
            (F.element_at("_ts", F.col("_s.p1") - 1) + F.lit(1)).alias("seg_end_us"),
            (F.col("_s.p1") - F.col("_s.p0")).cast("long").alias("n_samples"),
        )
    )


def block_bounds_from_ts_arrays(
    seq: DataFrame,
    ts_col: str = "ts",
    gap_us: int | Column = 4000,
    block_size: int = 131_072,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size block bounds cut WITHIN gap-delimited segments, keyed
    with the real µs extents of each chunk's first/last sample —
    ``{doc}_{start_us}_{end_us}.bin``. NOTE: this is an INTENTIONAL
    deviation from the reference's object naming, not interop with it:
    the reference keys chunks ``channel-{i:05d}_{start}_{end}`` with the
    INCLUSIVE last-sample timestamp, unpadded (``writer.py:90-95``,
    implemented faithfully in ``functions/legacy.py``); this engine
    keys every extent HALF-OPEN (``end_us = last_ts + 1``, zero-padded
    for lexicographic listing order) for consistency with every other
    bound it emits. Returns one row per (doc, seg_id, block_no) with
    (start_us, end_us half-open, start_pos 0-based, n, key). Narrow map
    + one explode; payload encoding is orthogonal
    (``operators/blocks.py`` codecs apply per slice)."""
    gap = gap_us if isinstance(gap_us, Column) else F.lit(gap_us)
    ts = F.col(ts_col)
    bounds = _boundary_positions(ts, gap)
    # same slice+zip shape as segments_from_ts_arrays: keep the computed
    # ``bounds`` out of lambda bodies so it is not re-evaluated per
    # segment (the inner lambda now only touches its own struct fields)
    nb = F.size(bounds) - 1
    zb = F.arrays_zip(
        F.slice(bounds, 1, nb).alias("p0"),
        F.slice(bounds, 2, nb).alias("p1"),
        F.sequence(F.lit(1), nb).alias("j"),
    )
    blocks = F.flatten(
        F.transform(
            zb,
            lambda s: F.transform(
                F.sequence(s["p0"], s["p1"] - 1, F.lit(block_size)),
                lambda b, k: F.struct(
                    (s["j"] - 1).cast("long").alias("seg_id"),
                    k.cast("int").alias("block_no"),
                    b.alias("p0"),
                    F.least(b + block_size, s["p1"]).alias("p1"),
                ),
            ),
        )
    )
    keep = [c for c in seq.columns if c not in (ts_col, "tokens")]
    out = (
        seq.filter(F.size(ts) > 0)
        .select(*keep, ts.alias("_ts"), F.explode(blocks).alias("_b"))
        .select(
            *keep,
            F.col("_b.seg_id").alias("seg_id"),
            F.col("_b.block_no").alias("block_no"),
            F.element_at("_ts", F.col("_b.p0")).alias("start_us"),
            (F.element_at("_ts", F.col("_b.p1") - 1) + F.lit(1)).alias("end_us"),
            # 0-based, numpy-slice convention — the SAME base as
            # irregular_to_blocks and NWB_CHUNK_SCHEMA (a consumer doing
            # tokens[start_pos : start_pos+n] must get the same slice
            # from every emitter)
            (F.col("_b.p0") - 1).cast("long").alias("start_pos"),
            (F.col("_b.p1") - F.col("_b.p0")).cast("int").alias("n"),
        )
    )
    return out.withColumn(
        "key",
        F.format_string("%s_%012d_%012d.bin", id_col, "start_us", "end_us"),
    )


def explode_ts_samples(
    seq: DataFrame, ts_col: str = "ts", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pos, ts_us, v) row-per-sample view of an explicit-ts
    sequence — the bridge into the row-oriented operators (resample,
    asof, interval joins). ``arrays_zip`` + ``posexplode`` keep it a
    narrow map; positions are 0-based."""
    return seq.select(
        F.col(id_col),
        F.posexplode(F.arrays_zip(F.col(ts_col).alias("ts_us"), F.col("tokens").alias("v"))),
    ).select(
        id_col,
        F.col("pos").cast("long").alias("pos"),
        F.col("col.ts_us").alias("ts_us"),
        F.col("col.v").alias("v"),
    )


def irregular_to_blocks(
    seq: DataFrame,
    ts_col: str = "ts",
    gap_us: int = 4000,
    block_size: int = 131_072,
) -> DataFrame:
    """The full explicit-ts write path: segment on the gap rule, cut
    fixed-size chunks within segments, DoD-compress each chunk's tokens
    AND its timestamp array (delta-of-delta is the natural codec for
    near-regular timestamps — gaps land as single large deltas), key by
    real µs bounds. One Arrow-batched kernel, no shuffle; the numpy
    boundary math (``np.diff > gap``) is vectorized per doc.

    Output: (doc_id, source, seg_id, block_no, start_us, end_us,
    start_pos, n, payload, ts_payload, key). Round-trip via
    ``irregular_from_blocks``. Keys use the engine's half-open
    zero-padded convention, NOT the reference's inclusive-end unpadded
    naming — see ``block_bounds_from_ts_arrays``.

    Precondition (asserted, matching ``tier_from_ts_arrays``):
    timestamps sorted within each doc — unsorted input would silently
    yield wrong segment boundaries and negative-span keys.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..functions.codec import dod_encode_array

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("source", T.StringType(), False),
            T.StructField("seg_id", T.LongType(), False),
            T.StructField("block_no", T.IntegerType(), False),
            T.StructField("start_us", T.LongType(), False),
            T.StructField("end_us", T.LongType(), False),  # half-open
            T.StructField("start_pos", T.LongType(), False),  # 0-based
            T.StructField("n", T.IntegerType(), False),
            T.StructField("payload", T.BinaryType(), False),
            T.StructField("ts_payload", T.BinaryType(), False),
        ]
    )

    def cut(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc, src, toks, tss in zip(
                pdf["doc_id"], pdf["source"], pdf["tokens"], pdf[ts_col]
            ):
                t = np.asarray(toks, dtype=np.int32)
                ts = np.asarray(tss, dtype=np.int64)
                if len(ts) == 0:
                    continue
                deltas = np.diff(ts)
                if (deltas < 0).any():
                    raise ValueError(
                        f"timestamps not sorted within doc {doc!r}"
                    )
                # segment boundaries: positions AFTER a gap (0-based)
                brk = np.flatnonzero(deltas > gap_us) + 1
                bounds = np.concatenate(([0], brk, [len(ts)]))
                for sid in range(len(bounds) - 1):
                    s0, s1 = int(bounds[sid]), int(bounds[sid + 1])
                    for bno, b0 in enumerate(range(s0, s1, block_size)):
                        b1 = min(b0 + block_size, s1)
                        if int(ts[b1 - 1]) - int(ts[b0]) > np.iinfo(np.int32).max:
                            # rebased deltas are stored int32; a slower
                            # stream with a huge block span would WRAP
                            # silently — refuse instead (shrink
                            # block_size or raise gap granularity)
                            raise ValueError(
                                f"block span {int(ts[b1-1]) - int(ts[b0])} µs "
                                f"exceeds int32 ts-delta encoding (doc {doc}); "
                                f"reduce block_size (= {block_size})"
                            )
                        rows.append(
                            (
                                doc,
                                src,
                                sid,
                                bno,
                                int(ts[b0]),
                                int(ts[b1 - 1]) + 1,
                                b0,
                                b1 - b0,
                                dod_encode_array(t[b0:b1]),
                                dod_encode_array(
                                    # ts deltas fit int32 after subtracting
                                    # the block start (bounded by block span)
                                    (ts[b0:b1] - ts[b0]).astype(np.int32)
                                ),
                            )
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    out = seq.mapInPandas(cut, schema=schema)
    return out.withColumn(
        "key",
        F.format_string("%s_%012d_%012d.bin", "doc_id", "start_us", "end_us"),
    )


def irregular_from_blocks(blocks: DataFrame) -> DataFrame:
    """Inverse of ``irregular_to_blocks``: decode + reassemble per doc in
    (seg_id, block_no) order -> (doc_id, tokens, ts, n_tok, source).
    One shuffle (regroup a doc's blocks), deterministic in-group sort —
    the same ordered-assembly contract as ``blocks.from_blocks``."""
    import numpy as np
    import pandas as pd

    from ..functions.codec import dod_decode_array

    def assemble(key, pdf):
        pdf = pdf.sort_values(["seg_id", "block_no"])
        toks = [dod_decode_array(bytes(p)) for p in pdf["payload"]]
        tss = [
            dod_decode_array(bytes(p)).astype(np.int64) + int(s)
            for p, s in zip(pdf["ts_payload"], pdf["start_us"])
        ]
        t = np.concatenate(toks) if toks else np.empty(0, np.int32)
        ts = np.concatenate(tss) if tss else np.empty(0, np.int64)
        return pd.DataFrame(
            {
                "doc_id": [key[0]],
                "tokens": [t.astype(np.int32)],
                "ts": [ts],
                "n_tok": [len(t)],
                "source": [pdf["source"].iloc[0]],
            }
        )

    return blocks.groupBy("doc_id").applyInPandas(
        assemble,
        schema="doc_id string, tokens array<int>, ts array<long>, n_tok int, source string",
    )


def rate_from_ts_arrays(
    seq: DataFrame,
    ts_col: str = "ts",
    first_k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Operator A2 for the array model — sampling-rate inference from
    stored timestamps: median delta of the first ``first_k`` samples,
    rate = 1e6/median (reference ``utils.py:6-13`` slices the first 10
    timestamps; ``segments.infer_rate_hz`` is the row-per-sample twin).
    ZERO shuffle: the deltas, their sort, and the median are array
    expressions inside the row. Docs with fewer than 2 samples have no
    deltas and are absent (the reference would divide by nothing).
    Median of an even count is the mean of the middle two — matching
    both ``F.median`` and DuckDB ``MEDIAN`` interpolation."""
    ts = F.col(ts_col)
    n = F.size(ts)
    k = F.least(n, F.lit(first_k))
    deltas = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(2), k),
            lambda i: F.element_at(ts, i) - F.element_at(ts, i - 1),
        ),
    ).otherwise(F.array().cast("array<long>"))
    d = F.array_sort(deltas)
    m = F.size(d)
    median = F.when(
        m == 0, F.lit(None).cast("double")  # guard BEFORE element_at: ANSI
        # mode raises on index 0, and branch order is the only protection
    ).when(
        m % 2 == 1, F.element_at(d, ((m + 1) / 2).cast("int")).cast("double")
    ).otherwise(
        (
            F.element_at(d, (m / 2).cast("int"))
            + F.element_at(d, (m / 2).cast("int") + 1)
        )
        / F.lit(2.0)
    )
    return (
        seq.select(F.col(id_col), median.alias("median_delta_us"))
        .filter(F.col("median_delta_us").isNotNull())
        .select(
            id_col,
            "median_delta_us",
            F.round(F.lit(1e6) / F.nullif(F.col("median_delta_us"), F.lit(0.0)), 9)
            .cast("double")
            .alias("inferred_rate_hz"),
        )
    )


def tier_from_ts_arrays(
    seq: DataFrame,
    window_us: int,
    ts_col: str = "ts",
) -> DataFrame:
    """Time-windowed tier aggregates for explicit-ts sequences — the
    array-model twin of ``rollup.tier1_from_tokens`` (which windows by
    sample COUNT): per (doc, ``ts div window_us``) min/max/sum/count/
    mean over token values. The reference's tiers aggregate per real
    time window when timestamps are stored (``reader.py:108-136`` feeds
    real µs into the chunk bounds).

    Batch-vectorized kernel, zero shuffle: all docs in an Arrow batch
    are concatenated once, window boundaries found with one ``np.diff``
    over (doc, window) keys, and every aggregate is one ``ufunc.reduceat``
    over the combined array — no per-doc Python loop (the rollup.py
    discipline). Timestamps are sorted within a doc by construction
    (stored streams are time-ordered), which the kernel asserts."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("source", T.StringType(), False),
            T.StructField("win_us", T.LongType(), False),  # window start
            T.StructField("min_v", T.IntegerType(), False),
            T.StructField("max_v", T.IntegerType(), False),
            T.StructField("sum_v", T.LongType(), False),
            T.StructField("cnt", T.LongType(), False),
            T.StructField("mean_v", T.DoubleType(), False),
        ]
    )

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = [np.asarray(x, dtype=np.int32) for x in pdf["tokens"]]
            tss = [np.asarray(x, dtype=np.int64) for x in pdf[ts_col]]
            lens = np.array([len(x) for x in toks], dtype=np.int64)
            if lens.sum() == 0:
                yield pd.DataFrame({f.name: [] for f in schema.fields})
                continue
            t = np.concatenate([x for x in toks if len(x)])
            ts = np.concatenate([x for x in tss if len(x)])
            nz = lens > 0
            doc_idx = np.repeat(np.flatnonzero(nz), lens[nz])
            # enforce the documented precondition: timestamps sorted
            # within each doc (boundary detection silently fragments
            # windows otherwise)
            unsorted = (np.diff(ts) < 0) & (np.diff(doc_idx) == 0)
            if unsorted.any():
                bad = pdf["doc_id"].to_numpy()[doc_idx[np.flatnonzero(unsorted)[0]]]
                raise ValueError(f"timestamps not sorted within doc {bad!r}")
            w = ts // window_us
            change = (np.diff(doc_idx) != 0) | (np.diff(w) != 0)
            starts = np.concatenate(([0], np.flatnonzero(change) + 1))
            docs = pdf["doc_id"].to_numpy()[doc_idx[starts]]
            srcs = pdf["source"].to_numpy()[doc_idx[starts]]
            sums = np.add.reduceat(t.astype(np.int64), starts)
            cnts = np.diff(np.append(starts, len(t)))
            yield pd.DataFrame(
                {
                    "doc_id": docs,
                    "source": srcs,
                    "win_us": w[starts] * window_us,
                    "min_v": np.minimum.reduceat(t, starts),
                    "max_v": np.maximum.reduceat(t, starts),
                    "sum_v": sums,
                    "cnt": cnts,
                    "mean_v": np.round(sums / cnts, 6),
                }
            )

    return seq.mapInPandas(kern, schema=schema)


def time_weighted_mean(
    obs: DataFrame,
    window_us: int,
    part_col: str = "part",
    ts_col: str = "t",
    val_col: str = "v",
) -> DataFrame:
    """(part, win, twa_num, covered_us) — time-weighted average over an
    irregular row-per-sample series, as an exact integer fraction.

    The irregular-rate complement to the tumbling mean (W5): a plain
    AVG over-weights burst periods; the time-weighted form (the
    hypertable ``time_weight('locf')`` aggregate) weights each
    observation by how long it was current. Each observation ``v_i``
    holds from ``t_i`` until the next observation — or, for a channel's
    final point, until the end of its own window (nothing is invented
    past the observed extent, the engine's reference-derived rule,
    reader.py:222-225). A holding interval spanning multiple windows
    contributes its clipped overlap to each.

    Consumers divide ``twa_num / covered_us`` at display time; both are
    exact int64 (``val_col`` integral — cents; ``twa_num <= v_max *
    window_us`` per window, ~1e5 * 3.6e9 = 3.6e14 for 1h windows).
    ``covered_us < window_us`` exposes leading/gap-free coverage
    honestly instead of silently renormalizing.

    Plan: one lead() window per channel (the only per-sample ordered
    pass), an interval explode bounded by windows-per-holding-interval,
    one map-side-combined groupBy (part, win). Linear in samples plus
    covered windows — no corpus sort, no per-window subqueries.
    """
    from pyspark.sql import Window

    # value tiebreak: with duplicate timestamps, which observation owns
    # the zero-length (dropped) segment must not depend on engine sort
    # stability
    w = Window.partitionBy(part_col).orderBy(ts_col, val_col)
    t = F.col(ts_col).cast("bigint")
    W = F.lit(window_us).cast("bigint")
    seg = obs.select(
        F.col(part_col).alias("part"),
        t.alias("t0"),
        F.col(val_col).cast("bigint").alias("v"),
        F.coalesce(
            F.lead(ts_col).over(w).cast("bigint"),
            (t - (t % W)) + W,
        ).alias("t1"),
    ).filter(F.col("t1") > F.col("t0"))
    # timestamps are epoch-µs (non-negative), so truncating integer
    # division == floor in every engine — no double arithmetic anywhere
    w0 = F.expr(f"t0 div {window_us}L")
    w1 = F.expr(f"(t1 - 1) div {window_us}L")
    e = seg.select(
        "part", "t0", "t1", "v", F.explode(F.sequence(w0, w1)).alias("win")
    )
    lo = F.greatest(F.col("t0"), F.col("win") * W)
    hi = F.least(F.col("t1"), (F.col("win") + 1) * W)
    ov = (hi - lo).alias("ov")
    return (
        e.select("part", "win", "v", ov)
        .groupBy("part", "win")
        .agg(
            F.sum(F.col("v") * F.col("ov")).alias("twa_num"),
            F.sum("ov").alias("covered_us"),
        )
    )
