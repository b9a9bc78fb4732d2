from __future__ import annotations

from pyspark.sql import functions as F

from processor_post_timeseries_spark.plans.pipeline import PipelineConfig, run_pipeline
from processor_post_timeseries_spark.sources.synth import sequences

TIERS = (("1s", 10), ("1m", 6), ("1h", 6))


def _xor_hash(df, cols):
    return (
        df.select(*cols)
        .withColumn("_h", F.xxhash64(*cols))
        .select(F.expr("bit_xor(_h)").alias("h"), F.count("*").alias("n"))
        .collect()[0]
    )


def test_fused_ingest_equals_modular_pipeline(spark, tmp_path):
    seq = sequences(spark, 50, seed=77, min_tok=5, max_tok=500, vocab=2000).cache()
    mod_dir, fus_dir = str(tmp_path / "mod"), str(tmp_path / "fus")
    run_pipeline(spark, seq, PipelineConfig(out_dir=mod_dir, block_size=64, n_buckets=4, tiers=TIERS))
    run_pipeline(
        spark,
        seq,
        PipelineConfig(out_dir=fus_dir, block_size=64, n_buckets=4, tiers=TIERS, fused_ingest=True),
    )

    bcols = ["doc_id", "source", "block_no", "start_idx", "end_idx", "n", "payload"]
    a = _xor_hash(spark.read.parquet(f"{mod_dir}/blocks"), bcols)
    b = _xor_hash(spark.read.parquet(f"{fus_dir}/ingest/kind=block"), bcols)
    assert (a["h"], a["n"]) == (b["h"], b["n"])

    tcols = ["doc_id", "source", "tier", "window", "n_windows", "mins", "maxs", "sums", "cnts"]
    a = _xor_hash(spark.read.parquet(f"{mod_dir}/tiers"), tcols)
    b = _xor_hash(spark.read.parquet(f"{fus_dir}/ingest/kind=tier"), tcols)
    assert (a["h"], a["n"]) == (b["h"], b["n"])


def test_fused_ingest_resume(spark, tmp_path):
    from processor_post_timeseries_spark.plans import lineage

    seq = sequences(spark, 40, seed=78, min_tok=5, max_tok=200).cache()
    half = seq.filter(F.pmod(F.xxhash64("doc_id"), F.lit(4)) < 2)
    out = str(tmp_path / "r")
    cfg = dict(block_size=64, n_buckets=4, tiers=TIERS, fused_ingest=True)
    run_pipeline(spark, half, PipelineConfig(out_dir=out, **cfg, run_id="ra"))
    run_pipeline(spark, seq, PipelineConfig(out_dir=out, **cfg, run_id="rb"))
    ck = lineage.read_checkpoint(spark, out)
    da = {r["partition_key"] for r in ck.filter("run_id='ra'").collect()}
    db = {r["partition_key"] for r in ck.filter("run_id='rb'").collect()}
    assert da and db and not (da & db)
    # full content present exactly once
    n = spark.read.parquet(f"{out}/ingest/kind=tier").count()
    one = str(tmp_path / "one")
    run_pipeline(spark, seq, PipelineConfig(out_dir=one, **cfg, run_id="r1"))
    assert n == spark.read.parquet(f"{one}/ingest/kind=tier").count()
