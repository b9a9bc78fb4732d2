"""Fixed-size block assembly + binary block sink (operators W3/W4/S5/P7).

Reference semantics: contiguous segments are cut into fixed row-count
chunks (``/root/reference/processor/writer.py:46-48``), each chunk gets
frame bounds from its first/last sample (``:50-51``) and lands as one
binary object keyed ``channel-NNNNN_{start}_{end}`` (``:90-95``).

Here a "channel" is a doc's token stream; a block is ``block_size``
consecutive samples, compressed with the delta-of-delta codec
(functions/codec.py) into a ``BinaryType`` column. Block assembly is a
**narrow map** (slices within one row's array) — no shuffle; blocks of a
doc never span rows. The sink partitions by ``(source, bucket)`` so scans
prune by source and the bucket count bounds task skew.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.codec import dod_decode_array, dod_encode_array
from ..sources.synth import SEQ_SCHEMA

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("block_no", T.IntegerType(), False),
        T.StructField("start_idx", T.LongType(), False),
        T.StructField("end_idx", T.LongType(), False),  # half-open, ref convention
        T.StructField("n", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def to_blocks(seq_df: DataFrame, block_size: int = 131_072) -> DataFrame:
    """Sequences -> one row per (doc, block), payload = DoD-compressed.

    Default block_size mirrors the reference default chunk of
    CHUNK_SIZE_MB·2^20/8 = 131072 samples (``/root/reference/processor/main.py:18-20``).
    Adds the reference-shaped object key via ``block_key``.
    """

    def cut(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc, src, toks in zip(pdf["doc_id"], pdf["source"], pdf["tokens"]):
                a = np.asarray(toks, dtype=np.int32)
                n = len(a)
                for b, start in enumerate(range(0, n, block_size)):
                    end = min(start + block_size, n)
                    rows.append(
                        (doc, src, b, start, end, end - start, dod_encode_array(a[start:end]))
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in BLOCK_SCHEMA.fields])

    return seq_df.mapInPandas(cut, schema=BLOCK_SCHEMA)


def block_key(blocks_df: DataFrame) -> DataFrame:
    """Operator P7: reference-shaped object key
    ``{doc}_{start}_{end}.bin`` (cf. channel-%05d_%d_%d naming,
    ``/root/reference/processor/writer.py:90-95``)."""
    return blocks_df.withColumn(
        "key", F.format_string("%s_%012d_%012d.bin", "doc_id", "start_idx", "end_idx")
    )


def from_blocks(blocks_df: DataFrame) -> DataFrame:
    """Decode + reassemble blocks -> sequences (round-trip/read path).

    One shuffle (regroup blocks of a doc), deterministic in-group order by
    block_no before concatenation (SURVEY §7 determinism rule).

    r6 shape: collect_list + ONE batched decode kernel instead of
    per-group ``applyInPandas`` — the grouped form built a pandas frame
    per doc (~1 ms of pure overhead each; 5000 docs cost more than the
    decode itself). ``sort_array`` over (block_no, payload) structs
    gives the same block_no order (block_no is unique per doc), the
    group state is bounded by one doc's payload either way, and the
    kernel loops docs of a whole Arrow batch.
    """
    g = blocks_df.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("block_no", "payload"))).alias("_blocks"),
        F.first("source").alias("source"),
    )

    def assemble(batches):
        for pdf in batches:
            docs, toks_out, ntoks, srcs = [], [], [], []
            for doc, src, blocks in zip(pdf["doc_id"], pdf["source"], pdf["_blocks"]):
                parts = [dod_decode_array(bytes(b["payload"])) for b in blocks]
                toks = np.concatenate(parts) if parts else np.empty(0, np.int32)
                docs.append(doc)
                toks_out.append(toks.astype(np.int32))
                ntoks.append(len(toks))
                srcs.append(src)
            yield pd.DataFrame(
                {"doc_id": docs, "tokens": toks_out, "n_tok": ntoks, "source": srcs}
            )

    return g.mapInPandas(assemble, schema=SEQ_SCHEMA)
