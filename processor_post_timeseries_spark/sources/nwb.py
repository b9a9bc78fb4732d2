"""NWB (HDF5) ingestion seam — the reference's front-door input
(``/root/reference/processor/main.py:28-34`` opens an ``.nwb`` file;
``reader.py:227-274`` wraps its acquisition ElectricalSeries).

Optional-dependency adapter: ``h5py`` is NOT installed in this sandbox
(verified), so every entry point degrades to the same documented
``NotImplementedError`` convention ``functions/multimodal.py`` uses,
and the unit tests skip cleanly. On a real cluster with ``h5py``
available the reader is fully distributed:

* the DRIVER opens the file once, only to enumerate shape — channels,
  sample count, rate, explicit-timestamps presence (an O(bytes-of-
  metadata) read, never data);
* a plan DataFrame of ``(channel_idx, start, end)`` slice tasks is
  built (``samples_per_task`` rows each) and ``mapInPandas`` workers
  each open the file THEMSELVES and read only their slice — HDF5
  supports unlimited concurrent readers, so scan parallelism =
  slices, exactly how a 100 TB NWB store should be chunked;
* explicit ``timestamps`` (NWB stores seconds; reference multiplies
  to µs) ride along per-slice, feeding ``operators/irregular.py``;
  implicit-rate series synthesize nothing — downstream operators use
  the implicit-index model (SURVEY §1.3).

The emitted chunk schema is the engine's sequence shape with
``start_pos`` offsets, so ``operators/incremental.py`` can fold chunks
into tiers without ever holding a whole channel in one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

try:  # optional dependency — see module docstring
    import h5py  # type: ignore
except ImportError:  # pragma: no cover - exercised when h5py is absent
    h5py = None

NWB_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),  # "ch-{idx:05d}"
        T.StructField("source", T.StringType(), False),  # file path
        T.StructField("start_pos", T.LongType(), False),  # 0-based sample offset
        T.StructField("values", T.ArrayType(T.DoubleType()), False),
        T.StructField("ts_us", T.ArrayType(T.LongType()), True),  # explicit ts only
    ]
)

_ERR = (
    "NWB ingestion requires h5py, which is not installed in this "
    "environment; install the 'nwb' extra on a real cluster"
)


def _require_h5py() -> None:
    if h5py is None:
        raise NotImplementedError(_ERR)


def _find_series(f):
    """First acquisition group holding a 2-D ``data`` dataset (the NWB
    ElectricalSeries layout: samples × channels, ``reader.py:41``)."""
    acq = f.get("acquisition")
    if acq is None:
        raise ValueError("no /acquisition group — not an NWB file?")
    for name, grp in acq.items():
        if hasattr(grp, "get") and grp.get("data") is not None:
            return name, grp
    raise ValueError("no ElectricalSeries-like group under /acquisition")


def nwb_series_info(path: str) -> dict:
    """Driver-side metadata probe (no sample data read): shape, rate,
    explicit-timestamp presence. Mirrors the reference reader's
    constructor checks (``reader.py:36-58``)."""
    _require_h5py()
    with h5py.File(path, "r") as f:
        name, grp = _find_series(f)
        data = grp["data"]
        n_samples, n_channels = data.shape
        has_ts = grp.get("timestamps") is not None
        rate = None
        st = grp.get("starting_time")
        if st is not None and "rate" in st.attrs:
            rate = float(st.attrs["rate"])
        if rate is None and "rate" in data.attrs:
            rate = float(data.attrs["rate"])
        return {
            "series": name,
            "n_samples": int(n_samples),
            "n_channels": int(n_channels),
            "rate_hz": rate,
            "has_explicit_timestamps": bool(has_ts),
        }


def read_nwb_chunks(
    spark: SparkSession,
    path: str,
    samples_per_task: int = 1 << 20,
) -> DataFrame:
    """Distributed NWB scan -> chunk rows (NWB_CHUNK_SCHEMA). Each task
    opens the file independently and slices ``[start, end)`` of its
    channel column; explicit timestamps (NWB seconds -> µs, the
    reference's conversion) ride along when stored."""
    _require_h5py()
    import pandas as pd

    info = nwb_series_info(path)
    n, c = info["n_samples"], info["n_channels"]
    plan_rows = [
        (ch, start, min(start + samples_per_task, n))
        for ch in range(c)
        for start in range(0, n, samples_per_task)
    ]
    plan = spark.createDataFrame(plan_rows, "ch int, start long, end long")
    # one slice per task: partition count = slice count so every worker
    # owns whole slices (HDF5 readers are per-process; no shared handles)
    plan = plan.repartition(max(len(plan_rows), 1))

    def scan(batches):
        with h5py.File(path, "r") as f:
            _name, grp = _find_series(f)
            data = grp["data"]
            tsd = grp.get("timestamps")
            for pdf in batches:
                out = []
                for ch, start, end in zip(pdf["ch"], pdf["start"], pdf["end"]):
                    vals = data[start:end, ch].astype("float64")
                    ts = None
                    if tsd is not None:
                        ts = (tsd[start:end] * 1_000_000.0).round().astype("int64")
                    out.append(
                        (
                            f"ch-{ch:05d}",
                            path,
                            int(start),
                            vals,
                            ts,
                        )
                    )
                yield pd.DataFrame(
                    out, columns=[f.name for f in NWB_CHUNK_SCHEMA.fields]
                )

    return plan.mapInPandas(scan, schema=NWB_CHUNK_SCHEMA)


def nwb_chunks_to_sequences(chunks: DataFrame, scale: float = 1.0) -> DataFrame:
    """Chunk rows -> input_hint sequences (doc_id, tokens:array<int>,
    n_tok, source): values are affine-scaled then rounded to int32
    tokens (operator P1's scale step), chunks reassembled in
    ``start_pos`` order — the same ordered-assembly contract as
    ``operators/blocks.from_blocks``. One shuffle on doc_id."""
    from pyspark.sql import functions as F

    toks = F.transform(
        F.col("values"), lambda v: F.round(v * F.lit(scale)).cast("int")
    )
    per_chunk = chunks.select(
        "doc_id", "source", "start_pos", toks.alias("toks")
    )
    assembled = (
        per_chunk.groupBy("doc_id")
        .agg(
            F.first("source").alias("source"),
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("start_pos", "toks"))
                    ),
                    lambda s: s["toks"],
                )
            ).alias("tokens"),
        )
        .select(
            "doc_id",
            "tokens",
            F.size("tokens").alias("n_tok"),
            "source",
        )
    )
    return assembled
