"""Heavy hitters (frequent items) with certified exactness — the
sketch-side companion to ``agg_sketches``' HLL++/percentile bounds.

Two-pass design (Misra-Gries '82, merged per Agarwal et al.,
"Mergeable Summaries", PODS'12):

1. **Candidate pass** — every partition folds its Arrow batches into a
   capacity-``m`` Misra-Gries summary (batch-vectorized: per-batch
   ``value_counts`` merged into a vocab-sized counter table, then one
   decrement step — no per-row Python) and also emits its exact item
   total, so N needs no separate corpus scan. MG guarantees any item
   with global frequency > N/(m+1) survives in at least one partition's
   summary (pigeonhole over partition totals), so the union of
   candidates provably contains every such item. Shuffle cost: at most
   ``m`` items + one counter row per partition — corpus-size-independent.
2. **Recount pass** — exact counts for the candidate set only, via a
   broadcast semi-join + one aggregation over candidate rows.

The result is **certified exact** when the k-th recounted frequency
exceeds N/(m+1): every non-candidate then has a strictly smaller count
than all reported items, so the top-k is the true top-k. If the
certificate fails (flat distributions / tiny corpora), the operator
falls back to the exact full aggregation — output is exact either way;
only the cost model changes. At 100 TB with Zipfian token data and a
sane ``capacity`` the certificate holds and the fallback never runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = "item string, n_occ long, rank int, certified boolean"


def _mg_summaries(df: DataFrame, item_col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries candidate rows plus one total row per
    partition (item=NULL, n=partition item count)."""

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cnt = pd.Series(dtype="int64")
        total = 0
        for pdf in batches:
            if not len(pdf):
                continue
            total += len(pdf)
            vc = pdf[item_col].value_counts()
            cnt = cnt.add(vc, fill_value=0).astype("int64")
            if len(cnt) > capacity:
                # batch decrement: subtract the (m+1)-th largest count
                # from everyone and drop the non-positive — removes
                # >= (m+1)*delta total mass per round, so cumulative
                # decrements stay <= N/(m+1) (the MG invariant)
                thresh = cnt.nlargest(capacity + 1).iloc[-1]
                cnt = cnt[cnt > thresh] - thresh
        yield pd.DataFrame(
            {
                item_col: list(cnt.index.astype(str)) + [None],
                "n": [0] * len(cnt) + [total],
            }
        )

    return df.select(F.col(item_col).cast("string").alias(item_col)).mapInPandas(
        mg, schema=f"{item_col} string, n long"
    )


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    k: int = 20,
    capacity: int = 1024,
) -> DataFrame:
    """Exact top-``k`` items by frequency: (item, n_occ, rank, certified).

    ``certified`` reports whether the sketch path alone proved
    exactness (k-th count > N/(capacity+1)); when false the exact
    fallback aggregation produced the result. Ties rank by item
    ascending, so output is fully deterministic. The returned frame is
    materialized (<= k rows), so no lineage pins executor storage."""
    spark = df.sparkSession
    items = df.select(F.col(item_col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    summ = _mg_summaries(items, "item", capacity)
    summ.persist()  # tiny: <= capacity+1 rows per partition
    n_total = summ.filter(F.col("item").isNull()).agg(F.sum("n")).collect()[0][0] or 0
    cand = summ.filter(F.col("item").isNotNull()).select("item").distinct()
    threshold = n_total / (capacity + 1)

    counts = (
        items.join(F.broadcast(cand), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    # TakeOrdered: only k rows ever reach the driver
    rows = counts.orderBy(F.desc("n_occ"), F.asc("item")).limit(k).collect()
    summ.unpersist()
    kth = min((r["n_occ"] for r in rows), default=0)
    # the threshold certificate needs a FULL top-k candidate slate: with
    # fewer than k recounted candidates, kth is the min over a short list
    # and an evicted true top-k item could be silently missing — so a
    # short slate always falls through to the secondary check / fallback
    certified = len(rows) >= k and kth > threshold
    if not certified and rows:
        # secondary certificate: if the whole vocabulary fits the
        # capacity, no partition can ever have evicted, so the recount
        # saw the full truth. (Checked as a partition-INVARIANT property
        # — never "did candidates happen to cover everything", which
        # would make `certified` depend on data layout.)
        certified = items.distinct().count() <= capacity
    if not certified:
        # exact fallback: full aggregation (one shuffle over distinct
        # items); correctness never depends on the certificate
        counts = items.groupBy("item").agg(F.count(F.lit(1)).alias("n_occ"))
        rows = counts.orderBy(F.desc("n_occ"), F.asc("item")).limit(k).collect()
    data = [
        (r["item"], int(r["n_occ"]), i + 1, bool(certified))
        for i, r in enumerate(rows)
    ]
    return spark.createDataFrame(data, _OUT_SCHEMA)
