"""Driver-contract queries: one per implemented operator (SURVEY.md §2),
each paired with an ANSI-SQL oracle DuckDB runs on the same parquet.

Determinism policy (so order-insensitive value hashes match exactly):
* times -> integer epoch micros (``unix_micros`` / ``epoch_us``), never
  raw timestamps (tz-naive vs tz-aware hashing hazards);
* float aggregates -> exact DECIMAL accumulation, then ``round(…, N)``
  cast to DOUBLE (sum order can't perturb a decimal);
* integer sums cast to BIGINT (DuckDB sums ints into HUGEINT);
* integer division via a dialect placeholder (Spark ``div`` / DuckDB
  ``//``) — never CAST(double AS BIGINT), which truncates on Spark but
  ROUNDS on DuckDB;
* regex char classes written ``[0-9]`` (single-quote escaping differs);
* forward-fill via the portable gaps-and-islands idiom (IGNORE NULLS
  window syntax diverges between the engines);
* ties in window orders broken by a unique id column;
* every computed column aliased identically on both sides.

``_REGISTRY`` maps name -> (spark_fn, oracle_sql | None). A ``None``
oracle marks genuinely non-SQL-expressible ops (codec bit-packing,
simhash) — the driver then records a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def load_views(spark: SparkSession, sf_dir: str) -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for t in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        # parquet timestamps land as TIMESTAMP_NTZ in Spark 4; cast to
        # session-UTC timestamps so unix_micros() == DuckDB's epoch_us()
        for f in df.schema.fields:
            if isinstance(f.dataType, T.TimestampNTZType):
                df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
        df.createOrReplaceTempView(t)


_SPARK_DIALECT = {"{EPOCH_US}": "unix_micros", "{IDIV}": " div ", "{SEQ_GRID}": "explode(sequence(0, 43200))"}
_DUCK_DIALECT = {"{EPOCH_US}": "epoch_us", "{IDIV}": "//", "{SEQ_GRID}": "unnest(range(0, 43201))"}


def _render(template: str, dialect: dict[str, str]) -> str:
    out = template
    for k, v in dialect.items():
        out = out.replace(k, v)
    return out


def _shared(template: str, oracle_override: str | None = None) -> tuple[Callable, str | None]:
    """One SQL text for both engines (dialect placeholders substituted) —
    a single source of truth kills semantic drift."""
    spark_sql = _render(template, _SPARK_DIALECT)
    duck_sql = oracle_override if oracle_override is not None else _render(template, _DUCK_DIALECT)

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_views(spark, sf_dir)
        return spark.sql(spark_sql)

    return run, duck_sql


# --------------------------------------------------------------------------
# W1 — sessionization: gap > threshold splits a stream into segments.
# Reference semantics: /root/reference/processor/reader.py:181-225
# (threshold 2×(1/rate) at :199). 30-minute gap on the events stream.
# --------------------------------------------------------------------------

_W1_SESSIONIZE = """
WITH e AS (
  SELECT user_id, event_id, {EPOCH_US}(ts) AS ts_us FROM events
), d AS (
  SELECT user_id, ts_us, event_id,
         CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                   > 1800000000 THEN 1 ELSE 0 END AS brk
  FROM e
), s AS (
  SELECT user_id, ts_us,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg_id
  FROM d
)
SELECT user_id, CAST(seg_id AS BIGINT) AS seg_id,
       MIN(ts_us) AS seg_start_us, MAX(ts_us) AS seg_end_us,
       COUNT(*) AS n_samples
FROM s GROUP BY user_id, seg_id
"""

_W1_GAP_COUNT = """
WITH e AS (
  SELECT user_id, event_id, {EPOCH_US}(ts) AS ts_us FROM events
), d AS (
  SELECT user_id,
         ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS delta
  FROM e
)
SELECT user_id,
       CAST(SUM(CASE WHEN delta > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
       MAX(delta) AS max_gap_us
FROM d WHERE delta IS NOT NULL
GROUP BY user_id
"""

# --------------------------------------------------------------------------
# A1 — channel extents (reference reader.channels min/max,
# /root/reference/processor/reader.py:146-175)
# --------------------------------------------------------------------------

_A1_EXTENTS = """
SELECT user_id,
       MIN({EPOCH_US}(ts)) AS start_us,
       MAX({EPOCH_US}(ts)) AS end_us,
       COUNT(*) AS n_samples,
       MIN(value) AS min_v,
       MAX(value) AS max_v
FROM events GROUP BY user_id
"""

# --------------------------------------------------------------------------
# A2 — sampling-rate inference: median delta of the first 10 samples
# (reference /root/reference/processor/utils.py:6-13, reader.py:85-106)
# --------------------------------------------------------------------------

_A2_RATE = """
WITH first10 AS (
  SELECT user_id, ts_us FROM (
    SELECT user_id, {EPOCH_US}(ts) AS ts_us, event_id,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
  ) x WHERE rn <= 10
), deltas AS (
  SELECT user_id,
         ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS d
  FROM first10
)
SELECT user_id,
       CAST(median(d) AS DOUBLE) AS median_delta_us,
       CAST(ROUND(1e6 / median(d), 9) AS DOUBLE) AS inferred_rate_hz
FROM deltas WHERE d IS NOT NULL GROUP BY user_id
"""

# --------------------------------------------------------------------------
# W5/A6 — tumbling tier aggregates + cascade (north-rule caggs).
# Cascade oracle computes the 1h tier DIRECT from raw: proves cascade
# composition == direct aggregation.
# --------------------------------------------------------------------------

_W5_TUMBLING_1M = """
SELECT event_type,
       {EPOCH_US}(ts) {IDIV} 60000000 AS win_1m,
       MIN(value) AS min_v, MAX(value) AS max_v, COUNT(*) AS cnt,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_v
FROM events
GROUP BY event_type, {EPOCH_US}(ts) {IDIV} 60000000
"""

_W5_CASCADE_1H = """
WITH t1m AS (
  SELECT event_type,
         {EPOCH_US}(ts) {IDIV} 60000000 AS win_1m,
         MIN(value) AS min_v, MAX(value) AS max_v, COUNT(*) AS cnt,
         SUM(CAST(value AS DECIMAL(18,6))) AS sum_d
  FROM events
  GROUP BY event_type, {EPOCH_US}(ts) {IDIV} 60000000
)
SELECT event_type, win_1m {IDIV} 60 AS win_1h,
       MIN(min_v) AS min_v, MAX(max_v) AS max_v,
       CAST(SUM(cnt) AS BIGINT) AS cnt,
       CAST(ROUND(SUM(sum_d), 6) AS DOUBLE) AS sum_v,
       CAST(ROUND(SUM(sum_d) / SUM(cnt), 6) AS DOUBLE) AS mean_v
FROM t1m GROUP BY event_type, win_1m {IDIV} 60
"""

_W5_CASCADE_1H_ORACLE = """
SELECT event_type,
       epoch_us(ts) // 3600000000 AS win_1h,
       MIN(value) AS min_v, MAX(value) AS max_v,
       COUNT(*) AS cnt,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_v,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))) / COUNT(*), 6) AS DOUBLE) AS mean_v
FROM events
GROUP BY event_type, epoch_us(ts) // 3600000000
"""

# --------------------------------------------------------------------------
# W2 — gap-fill onto a 1-minute grid with forward fill (north rule; the
# reference only detects gaps — this is the required inverse). Forward
# fill via gaps-and-islands (portable; IGNORE NULLS syntax diverges).
# --------------------------------------------------------------------------

_W2_GAPFILL = """
WITH b AS (
  SELECT user_id,
         MIN({EPOCH_US}(ts) {IDIV} 60000000) AS w0,
         MAX({EPOCH_US}(ts) {IDIV} 60000000) AS w1
  FROM events WHERE user_id < 30 GROUP BY user_id
), grid AS (
  SELECT user_id, w0 + g.win AS win
  FROM b JOIN (SELECT {SEQ_GRID} AS win) g ON g.win <= w1 - w0
), obs AS (
  SELECT user_id, {EPOCH_US}(ts) {IDIV} 60000000 AS win,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS v
  FROM events WHERE user_id < 30 GROUP BY user_id, {EPOCH_US}(ts) {IDIV} 60000000
), joined AS (
  SELECT g.user_id, g.win, o.v,
         COUNT(o.v) OVER (PARTITION BY g.user_id ORDER BY g.win
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.win = o.win
), filled AS (
  SELECT user_id, win, v,
         MAX(v) OVER (PARTITION BY user_id, grp) AS v_filled
  FROM joined
)
SELECT user_id,
       COUNT(*) AS n_grid,
       CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
       CAST(ROUND(SUM(CAST(COALESCE(v_filled, 0) AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_filled
FROM filled GROUP BY user_id
"""

# --------------------------------------------------------------------------
# W3/W4 — fixed-size chunking with per-chunk frame bounds
# (reference /root/reference/processor/writer.py:46-51)
# --------------------------------------------------------------------------

_W3_BLOCKS = """
WITH numbered AS (
  SELECT user_id, event_id, {EPOCH_US}(ts) AS ts_us,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
  FROM events
)
SELECT user_id, rn {IDIV} 25 AS block_no,
       MIN(ts_us) AS start_us, MAX(ts_us) AS end_us, COUNT(*) AS n
FROM numbered GROUP BY user_id, rn {IDIV} 25
"""

# --------------------------------------------------------------------------
# P1/P2 — affine scaling + unit normalization
# (reference /root/reference/processor/reader.py:246-271: data * conversion
# * channel_conversion + offset; unit map lookup at :11-18)
# --------------------------------------------------------------------------

_P1_SCALE = """
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                      * CAST(1 - l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS revenue,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                      * CAST(1 - l_discount AS DECIMAL(18,4))
                      * CAST(1 + l_tax AS DECIMAL(18,4))), 4) AS DOUBLE) AS charged
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""

_P2_UNIT_NORM = """
SELECT event_type,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))
                      * CASE lower(event_type)
                          WHEN 'click' THEN 1000000
                          WHEN 'view' THEN 1000
                          ELSE 1 END), 6) AS DOUBLE) AS normalized_uv
FROM events GROUP BY event_type
"""

# --------------------------------------------------------------------------
# P4 — timestamp arithmetic (µs ints at boundaries,
# reference /root/reference/processor/reader.py:166-171)
# --------------------------------------------------------------------------

_P4_TS_MATH = """
SELECT event_id,
       {EPOCH_US}(ts) AS ts_us,
       {EPOCH_US}(ts) {IDIV} 1000000 AS ts_sec,
       ({EPOCH_US}(ts) {IDIV} 1000000) * 1000000 AS ts_us_trunc
FROM events WHERE event_id % 97 = 0
"""

# --------------------------------------------------------------------------
# P7/P8/P11 — key formatting, regex extract, string normalize
# (reference /root/reference/processor/writer.py:90-95, importer.py:70,99,
# timeseries_channel.py:26-33)
# --------------------------------------------------------------------------

_P7_KEY_FORMAT = """
SELECT user_id,
       printf('channel-%05d_%d_%d', user_id, MIN({EPOCH_US}(ts)), MAX({EPOCH_US}(ts))) AS key
FROM events GROUP BY user_id
"""

_P8_REGEX_EXTRACT = """
SELECT doc_id, regexp_extract(source, '([0-9]+)', 1) AS src_no
FROM documents
"""

_P11_STR_NORM = """
SELECT upper(trim(lang)) AS lang_norm, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY upper(trim(lang))
"""

# --------------------------------------------------------------------------
# P12 — JSON parse (reference JSON round-trip,
# /root/reference/processor/timeseries_channel.py:37-69)
# --------------------------------------------------------------------------

_P12_SPARK = """
SELECT event_type,
       CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
       MAX(CAST(get_json_object(props, '$.k') AS BIGINT)) AS k_max
FROM events GROUP BY event_type
"""

_P12_DUCK = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
FROM events GROUP BY event_type
"""


def _p12() -> tuple[Callable, str]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_views(spark, sf_dir)
        return spark.sql(_P12_SPARK)

    return run, _P12_DUCK


# --------------------------------------------------------------------------
# F4/J1 — fuzzy tolerance theta-join: channel reconciliation analog
# (reference /root/reference/processor/importer.py:76-91 with ±2% rate
# band, /root/reference/processor/timeseries_channel.py:71-80)
# --------------------------------------------------------------------------

_J1_RECONCILE = """
SELECT n.n_name AS nation,
       COUNT(*) AS n_matched_pairs
FROM supplier s
JOIN customer c
  ON s.s_nationkey = c.c_nationkey
 AND c.c_acctbal <> 0
 AND abs(1 - s.s_acctbal / c.c_acctbal) < 0.02
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY n.n_name
"""

_J1_ANTI = """
SELECT c.c_custkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""

_J2_LOOKUP = """
SELECT p.p_brand,
       COUNT(*) AS n_items,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))), 4) AS DOUBLE) AS total_price
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
"""

# --------------------------------------------------------------------------
# L1 — first-k sampling (reference limit-k prefixes,
# /root/reference/processor/utils.py:12, reader.py:85,104)
# --------------------------------------------------------------------------

_L1_FIRST_K = """
SELECT user_id, event_id, rn FROM (
  SELECT user_id, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
) x WHERE rn <= 3
"""

# --------------------------------------------------------------------------
# Relational headliners (scan/filter/agg/join/sort/limit coverage)
# --------------------------------------------------------------------------

_Q1_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                      * CAST(1 - l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

_Q3_TOPK = """
SELECT o.o_orderkey,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * CAST(1 - l.l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS revenue,
       {EPOCH_US}(o.o_orderdate) AS orderdate_us
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
"""


_REGISTRY: dict[str, tuple[Callable, str | None]] = {
    "w1_sessionize_events": _shared(_W1_SESSIONIZE),
    "w1_gap_count": _shared(_W1_GAP_COUNT),
    "a1_channel_extents": _shared(_A1_EXTENTS),
    "a2_rate_inference": _shared(_A2_RATE),
    "w5_tumbling_1m": _shared(_W5_TUMBLING_1M),
    "w5_cascade_1h_from_1m": _shared(_W5_CASCADE_1H, _W5_CASCADE_1H_ORACLE),
    "w2_gapfill_grid": _shared(_W2_GAPFILL),
    "w3_fixed_blocks": _shared(_W3_BLOCKS),
    "p1_affine_scale": _shared(_P1_SCALE),
    "p2_unit_normalization": _shared(_P2_UNIT_NORM),
    "p4_timestamp_math": _shared(_P4_TS_MATH),
    "p7_key_format": _shared(_P7_KEY_FORMAT),
    "p8_regex_extract": _shared(_P8_REGEX_EXTRACT),
    "p11_string_normalize": _shared(_P11_STR_NORM),
    "p12_json_extract": _p12(),
    "j1_reconcile_theta": _shared(_J1_RECONCILE),
    "j1_create_set_anti": _shared(_J1_ANTI),
    "j2_key_bind_lookup": _shared(_J2_LOOKUP),
    "l1_first_k": _shared(_L1_FIRST_K),
    "q1_pricing_summary": _shared(_Q1_PRICING),
    "q3_shipping_priority": _shared(_Q3_TOPK),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _s) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: s for name, (_fn, s) in _REGISTRY.items() if s is not None}
