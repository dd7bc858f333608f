"""Watermark / late-data semantics: an append-mode windowed aggregation
with a watermark only emits windows the watermark has closed, and drops
rows arriving after their window's state was evicted.

Three micro-batches (maxFilesPerTrigger=1, modification-time ordered):
1. on-time rows up to 12:00  -> watermark becomes 11:30 AFTER this batch
   (the watermark lags one trigger — Spark computes it at batch end);
2. a tolerably-late 11:55 row -> accepted (its window is still open);
3. a too-late 10:10 row      -> dropped (the 10:00 window closed and its
   state was evicted when the watermark passed 11:00 in batch 2)."""

import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def test_watermark_drops_late_data(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    # other tests flip the nanos-as-long legacy conf; this test writes
    # microsecond timestamps and wants the normal reader
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 10:05", "2024-01-01 10:45", "2024-01-01 11:30",
                 "2024-01-01 12:00"]
            ),
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    ).to_parquet(os.path.join(src, "b1.parquet"), coerce_timestamps="us")
    pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-01 11:55"]), "v": [10.0]}
    ).to_parquet(os.path.join(src, "b2.parquet"), coerce_timestamps="us")
    pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-01 10:10"]), "v": [100.0]}
    ).to_parquet(os.path.join(src, "b3.parquet"), coerce_timestamps="us")

    # the file source orders micro-batches by modification time
    now = time.time()
    for i, f in enumerate(["b1.parquet", "b2.parquet", "b3.parquet"]):
        os.utime(os.path.join(src, f), (now - 120 + i * 60, now - 120 + i * 60))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        # parquet without UTC-adjust metadata reads as TIMESTAMP_NTZ;
        # event time must be TIMESTAMP
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.sum("v").alias("total"))
        .select(F.col("w.start").alias("ws"), "total")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["ws"].hour: r["total"] for r in spark.table("wm_out").collect()}

    # the 10:00 window closed with only its on-time rows — the too-late
    # 10:10/100.0 row from batch 3 must have been dropped
    assert rows.get(10) == 3.0
    assert all(v < 100 for v in rows.values())
    # the tolerably-late 11:55 row joined the (still-open) 11:00 window;
    # if the watermark closed that window during the run it must show both
    if 11 in rows:
        assert rows[11] == 13.0
