"""D1/D2 tests: offset-skip precision (≙ FileOffsetWriterTest.java:39-126)
and LWW dedup under out-of-order + duplicate offsets."""

from pyspark.sql import functions as F

from debezium_incubator_spark.operators.dedup import (
    filter_processed,
    lww_latest,
    lww_latest_window,
)


def _events(spark):
    rows = [
        # (bucket, offset, key, val) — deliberately out of order + dups
        (0, 5, "k1", "v5"),
        (0, 3, "k1", "v3"),
        (0, 5, "k1", "v5"),   # duplicate replay, same offset+payload
        (0, 9, "k1", "v9"),
        (1, 2, "k2", "w2"),
        (1, 8, "k2", "w8"),
        (1, 8, "k2", "w8"),
        (2, 1, "k3", "x1"),
    ]
    return spark.createDataFrame(rows, "_bucket int, offset long, key string, val string")


def test_filter_processed_per_bucket(spark):
    df = _events(spark)
    # bucket 0 processed through 5, bucket 1 through 1, bucket 2 unmarked
    out = filter_processed(df, {"0": 5, "1": 1}, num_buckets=3)
    got = sorted((r["_bucket"], r["offset"]) for r in out.collect())
    assert got == [(0, 9), (1, 2), (1, 8), (1, 8), (2, 1)]


def test_filter_processed_same_offset_is_processed(spark):
    """≙ FileOffsetWriterTest: record at exactly the stored position is
    'processed' (compareTo <= 0 skips, OffsetPosition.java:46-55)."""
    df = _events(spark)
    out = filter_processed(df, {"0": 9, "1": 8, "2": 1}, num_buckets=3)
    assert out.count() == 0


def test_filter_processed_unmarked_bucket_passes_low_offsets(spark):
    df = _events(spark)
    # bucket 2 has offset 1, below every mark; marks incomplete → must pass
    out = filter_processed(df, {"0": 100, "1": 100}, num_buckets=3)
    assert [(r["_bucket"], r["offset"]) for r in out.collect()] == [(2, 1)]


def test_lww_agg_and_window_agree(spark):
    df = _events(spark)
    a = lww_latest(df, ["key"], ["offset"], ["val", "offset"])
    b = lww_latest_window(df, ["key"], ["offset"]).select("key", "val", "offset")
    c = lww_latest_window(df, ["key"], ["offset"], salt_buckets=4).select(
        "key", "val", "offset"
    )
    expected = {("k1", "v9", 9), ("k2", "w8", 8), ("k3", "x1", 1)}
    for got in (a, b, c):
        assert {tuple(r) for r in got.select("key", "val", "offset").collect()} == expected


def test_lww_collapses_duplicate_offsets(spark):
    df = _events(spark).filter(F.col("key") == "k2")
    out = lww_latest(df, ["key"], ["offset"], ["val"])
    assert out.count() == 1
    assert out.first()["val"] == "w8"


def test_salted_repartition_preserves_rows(spark):
    from debezium_incubator_spark.operators.dedup import salted_repartition

    df = _events(spark)
    out = salted_repartition(df, ["key"], 4)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, df.collect()))


def test_hot_key_skew_all_lww_strategies_agree(spark, tmp_path):
    """One very hot key (80% of events) — agg, window and salted-window
    engines must all converge to the same final table."""
    from debezium_incubator_spark.plans.pipeline import CDCEngine
    from debezium_incubator_spark.sources.changelog import DataFrameChangelog
    from debezium_incubator_spark.sources.generator import gen_changelog, gen_source_table
    from tests.helpers import state_pdf

    src = gen_source_table(spark, n_keys=60, n_repos=3)
    # key_skew very high → hottest keys dominate
    log = gen_changelog(spark, n_keys=60, n_repos=3, n_slots=500, key_skew=4.0)
    states = []
    for s in ("agg", "window", "window_salted"):
        eng = CDCEngine(
            spark, str(tmp_path / s / "t"), str(tmp_path / s / "c"),
            num_buckets=4, lww_strategy=s, salt_buckets=4,
        )
        eng.create_target()
        eng.bootstrap(src)
        eng.run(DataFrameChangelog(log), offsets_per_epoch=800)
        states.append(state_pdf(eng))
    assert states[0].equals(states[1])
    assert states[0].equals(states[2])
