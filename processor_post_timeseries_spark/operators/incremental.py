"""Incremental (append-only) tier maintenance — merge late-arriving
token appends into already-materialized tier aggregates WITHOUT
re-reading the raw history.

The tier layout (``rollup.TIER_SCHEMA``) stores per-window
``(min, max, sum, cnt)`` arrays — partial aggregates, mergeable by
construction (that is why tiers never store means). An append of
``k`` tokens to a doc whose stream already holds ``offset`` tokens
touches exactly the windows from ``offset div window`` on: the boundary
window (when ``offset % window != 0``) merges element-wise, every later
window is appended verbatim. Cost: one shuffle of the (small) delta +
one of the touched docs' tier rows — the raw corpus is never rescanned,
which is the only affordable maintenance shape at 100 TB.

Correctness contract (certified by ``w10_incremental_append``):
ingest(first half) then append(second half) produces BIT-IDENTICAL tier
rows to one-shot ingest(full stream).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rollup import TIER_SCHEMA


def _delta_stats(tokens: np.ndarray, offset: int, w: int):
    """Window (min,max,sum,cnt) arrays for an append starting at global
    token position ``offset``: the first boundary is phase-aligned to
    the global window grid, later ones every ``w``."""
    n = len(tokens)
    phase = offset % w
    first_cap = w - phase if phase else w
    starts = np.concatenate([[0], np.arange(first_cap, n, w)]) if n else np.empty(0, np.int64)
    starts = starts.astype(np.int64)
    vals = tokens.astype(np.int64, copy=False)
    mins = np.minimum.reduceat(vals, starts) if n else np.empty(0, np.int64)
    maxs = np.maximum.reduceat(vals, starts) if n else np.empty(0, np.int64)
    sums = np.add.reduceat(vals, starts) if n else np.empty(0, np.int64)
    ends = np.concatenate([starts[1:], [n]]) if n else np.empty(0, np.int64)
    cnts = ends - starts
    return mins, maxs, sums, cnts


def append_tokens_to_tiers(
    existing: DataFrame,
    delta: DataFrame,
    window: int,
    tier: str = "1s",
) -> DataFrame:
    """Merge token appends into tier-1 aggregate rows.

    * ``existing`` — TIER_SCHEMA rows (one per doc) for this ``tier``.
    * ``delta`` — (doc_id, tokens, source, offset): ``offset`` is the
      doc's already-ingested token count (0 for brand-new docs). An
      ``offset`` that disagrees with the existing row's ingested count
      raises inside the kernel — silent double-ingest corrupts sums.
    * Docs without a delta pass through untouched; brand-new docs get
      fresh rows. Output is TIER_SCHEMA again, so the result can be
      written back over the touched partitions or fed to cascade_tier.
    """
    e = existing.select(
        F.col("doc_id"),
        F.col("source").alias("e_source"),
        F.col("n_windows").alias("e_nw"),
        F.col("mins").alias("e_mins"),
        F.col("maxs").alias("e_maxs"),
        F.col("sums").alias("e_sums"),
        F.col("cnts").alias("e_cnts"),
    )
    d = delta.select(
        F.col("doc_id"),
        F.col("source").alias("d_source"),
        F.col("tokens").alias("d_tokens"),
        F.col("offset").cast("long").alias("d_offset"),
    )
    joined = e.join(d, "doc_id", "full_outer")

    def merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = {f.name: [] for f in TIER_SCHEMA.fields}
            for row in pdf.itertuples(index=False):
                has_e = row.e_nw is not None and not pd.isna(row.e_nw)
                # a missing list lands as None or scalar NaN depending on
                # the Arrow<->pandas path — treat both as absent
                has_d = row.d_tokens is not None and not (
                    isinstance(row.d_tokens, float) and pd.isna(row.d_tokens)
                )
                if has_e and not has_d:
                    mins = np.asarray(row.e_mins, np.int64)
                    maxs = np.asarray(row.e_maxs, np.int64)
                    sums = np.asarray(row.e_sums, np.int64)
                    cnts = np.asarray(row.e_cnts, np.int64)
                    src = row.e_source
                else:
                    toks = np.asarray(row.d_tokens, np.int64)
                    off = int(row.d_offset)
                    dm, dx, ds, dc = _delta_stats(toks, off, window)
                    if has_e:
                        em = np.asarray(row.e_mins, np.int64)
                        ex = np.asarray(row.e_maxs, np.int64)
                        es = np.asarray(row.e_sums, np.int64)
                        ec = np.asarray(row.e_cnts, np.int64)
                        ingested = int(ec.sum())
                        if off != ingested:
                            raise ValueError(
                                f"append_tokens_to_tiers: doc {row.doc_id} "
                                f"offset {off} != ingested {ingested}"
                            )
                        src = row.e_source
                    else:
                        if off != 0:
                            raise ValueError(
                                f"append_tokens_to_tiers: doc {row.doc_id} "
                                f"has offset {off} but no existing tier row"
                            )
                        em = ex = es = ec = np.empty(0, np.int64)
                        src = row.d_source
                    w0 = off // window  # first window the delta touches
                    n_out = max(len(em), w0 + len(dm))
                    mins = np.full(n_out, np.iinfo(np.int64).max)
                    maxs = np.full(n_out, np.iinfo(np.int64).min)
                    sums = np.zeros(n_out, np.int64)
                    cnts = np.zeros(n_out, np.int64)
                    mins[: len(em)] = em
                    maxs[: len(ex)] = ex
                    sums[: len(es)] = es
                    cnts[: len(ec)] = ec
                    sl = slice(w0, w0 + len(dm))
                    mins[sl] = np.minimum(mins[sl], dm)
                    maxs[sl] = np.maximum(maxs[sl], dx)
                    sums[sl] += ds
                    cnts[sl] += dc
                out["doc_id"].append(row.doc_id)
                out["source"].append(src)
                out["tier"].append(tier)
                out["window"].append(window)
                out["n_windows"].append(np.int32(len(mins)))
                out["mins"].append(mins)
                out["maxs"].append(maxs)
                out["sums"].append(sums)
                out["cnts"].append(cnts)
            yield pd.DataFrame(out)

    return joined.mapInPandas(merge, schema=TIER_SCHEMA)
