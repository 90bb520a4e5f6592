"""Windowed rollups: batch == streaming, watermark drops late data."""

import time

from pyspark.sql import functions as F

from debezium_incubator_spark.streaming.rollup import streaming_rollup, windowed_rollup

SCHEMA = "k string, ts timestamp, cents long"


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k string, ts string, cents long").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "cents"
    )


def _write(spark, rows, path):
    _rows(spark, rows).coalesce(1).write.mode("append").parquet(path)


def _pdf(df):
    pdf = df.select("window_start", "k", "n_events", "sum_cents").toPandas()
    return sorted(map(tuple, pdf.astype(str).values.tolist()))


def test_batch_rollup_tumbling(spark):
    out = windowed_rollup(
        _rows(
            spark,
            [
                ("a", "2024-01-01 00:10:00", 5),
                ("a", "2024-01-01 00:50:00", 7),
                ("a", "2024-01-01 01:10:00", 1),
                ("b", "2024-01-01 00:20:00", 2),
            ],
        ),
        "ts",
        "1 hour",
        group_cols=["k"],
        sum_cols=["cents"],
    )
    pdf = out.orderBy("window_start", "k").toPandas()
    assert pdf["n_events"].tolist() == [2, 1, 1]
    assert pdf["sum_cents"].tolist() == [12, 2, 1]
    assert str(pdf["window_start"][0]) == "2024-01-01 00:00:00"
    assert str(pdf["window_end"][0]) == "2024-01-01 01:00:00"


def test_sliding_windows_cover_each_event_twice(spark):
    out = windowed_rollup(
        _rows(spark, [("a", "2024-01-01 00:40:00", 3)]),
        "ts",
        "1 hour",
        sum_cols=["cents"],
        slide="30 minutes",
    )
    pdf = out.orderBy("window_start").toPandas()
    assert len(pdf) == 2  # 00:00-01:00 and 00:30-01:30
    assert pdf["sum_cents"].tolist() == [3, 3]


def test_streaming_matches_batch_and_drops_late(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    batch1 = [
        ("a", "2024-01-01 00:10:00", 5),
        ("a", "2024-01-01 00:50:00", 7),
        ("b", "2024-01-01 02:30:00", 2),  # advances watermark past hour 0
    ]
    _write(spark, batch1, src)

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    out = streaming_rollup(
        stream, "ts", "1 hour", "30 minutes", group_cols=["k"], sum_cols=["cents"]
    )
    q = (
        out.writeStream.format("memory")
        .queryName("rollup_sink")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # late event for the already-closed hour-0 window: watermark is
        # 02:30 - 30min = 02:00 > 01:00 end → dropped by contract
        _write(spark, [("a", "2024-01-01 00:55:00", 99)], src)
        # on-time event for hour 2 (not yet emitted — still open)
        _write(spark, [("b", "2024-01-01 02:45:00", 4)], src)
        q.processAllAvailable()
        # close hour 2 so its row flushes
        _write(spark, [("c", "2024-01-01 05:00:00", 1)], src)
        q.processAllAvailable()
        time.sleep(0.2)
    finally:
        q.stop()

    got = _pdf(spark.sql("SELECT * FROM rollup_sink"))
    batch_equiv = _pdf(
        windowed_rollup(
            _rows(spark, batch1 + [("b", "2024-01-01 02:45:00", 4)]),
            "ts",
            "1 hour",
            group_cols=["k"],
            sum_cols=["cents"],
        )
    )
    # hour-5 window is still open (nothing advanced the watermark past
    # it) so the batch equivalent drops it too
    assert got == batch_equiv
    # and the late 99-cent event is nowhere: hour-0 'a' kept sum 12
    assert any(r[1] == "a" and r[3] == "12" for r in got)


def test_streaming_rollup_rejects_batch_frame(spark):
    import pytest

    with pytest.raises(ValueError, match="streaming"):
        streaming_rollup(_rows(spark, [("a", "2024-01-01 00:00:00", 1)]),
                         "ts", "1 hour", "10 minutes")
