"""SCD2 history derivation + incremental apply (operators/history.py)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debezium_incubator_spark.operators.history import scd2_apply, scd2_history

ARGS = (["k"], "off", ["v"])


def _log(spark, rows):
    """rows: (k, off, op, v)"""
    return spark.createDataFrame(rows, "k int, off long, op string, v string")


def _pdf(df):
    pdf = (
        df.select("k", "valid_from", "valid_to", "is_current", "v")
        .orderBy("k", "valid_from")
        .toPandas()
    )
    # nullable bigint arrives as float64 (NaN for open intervals) —
    # normalize to int-or-None so expected literals read naturally
    import pandas as pd

    pdf["valid_to"] = pd.Series(
        [None if pd.isna(v) else int(v) for v in pdf["valid_to"]], dtype=object
    )
    return pdf


def test_versions_close_at_next_event(spark):
    hist = _pdf(
        scd2_history(
            _log(
                spark,
                [
                    (1, 10, "c", "a"),
                    (1, 20, "u", "b"),
                    (1, 30, "u", "c"),
                ],
            ),
            *ARGS,
        )
    )
    assert hist.values.tolist() == [
        [1, 10, 20, False, "a"],
        [1, 20, 30, False, "b"],
        [1, 30, None, True, "c"],
    ]


def test_delete_closes_and_leaves_no_current(spark):
    hist = _pdf(
        scd2_history(
            _log(spark, [(1, 10, "c", "a"), (1, 20, "d", None), (2, 5, "c", "x")]),
            *ARGS,
        )
    )
    # key 1: one closed version, no current row; key 2 current
    assert hist.values.tolist() == [
        [1, 10, 20, False, "a"],
        [2, 5, None, True, "x"],
    ]


def test_recreate_after_delete_opens_new_version(spark):
    hist = _pdf(
        scd2_history(
            _log(
                spark,
                [(1, 10, "c", "a"), (1, 20, "d", None), (1, 30, "c", "b")],
            ),
            *ARGS,
        )
    )
    assert hist.values.tolist() == [
        [1, 10, 20, False, "a"],
        [1, 30, None, True, "b"],
    ]


def test_duplicate_offset_replays_collapse(spark):
    hist = _pdf(
        scd2_history(
            _log(spark, [(1, 10, "c", "a"), (1, 10, "c", "a"), (1, 20, "u", "b")]),
            *ARGS,
        )
    )
    assert hist.values.tolist() == [
        [1, 10, 20, False, "a"],
        [1, 20, None, True, "b"],
    ]


@pytest.fixture(scope="module")
def gen_log(spark):
    """Deterministic multi-key log: per-key increasing offsets, op by
    hash (delete ~1 in 5, never first), values hash-derived."""
    n = spark.range(400).select(
        F.pmod(F.col("id"), F.lit(37)).cast("int").alias("k"),
        F.col("id").alias("off"),
        F.row_number()
        .over(Window.partitionBy(F.pmod(F.col("id"), F.lit(37))).orderBy("id"))
        .alias("seq"),
    )
    df = n.select(
        "k",
        "off",
        F.when(F.col("seq") == 1, F.lit("c"))
        .when(F.pmod(F.xxhash64("off", F.lit("op")), F.lit(5)) == 0, F.lit("d"))
        .otherwise(F.lit("u"))
        .alias("op"),
        F.sha2(F.concat_ws("|", "k", "off"), 256).substr(1, 8).alias("v"),
    )
    return df.localCheckpoint()


def _split(df, lo, hi):
    return df.filter((F.col("off") >= lo) & (F.col("off") < hi))


def test_incremental_apply_equals_full_rebuild(spark, gen_log):
    full = _pdf(scd2_history(gen_log, *ARGS))
    hist = scd2_history(_split(gen_log, 0, 150), *ARGS)
    hist = scd2_apply(hist, _split(gen_log, 150, 300), *ARGS)
    hist = scd2_apply(hist, _split(gen_log, 300, 400), *ARGS)
    assert _pdf(hist).values.tolist() == full.values.tolist()


def test_apply_without_closeout_is_wrong(spark, gen_log):
    """Mutation sanity: skipping the open-interval close-out (the thing
    scd2_apply exists to do) must NOT land on the full rebuild."""
    full = _pdf(scd2_history(gen_log, *ARGS))
    broken = scd2_history(_split(gen_log, 0, 200), *ARGS).unionByName(
        scd2_history(_split(gen_log, 200, 400), *ARGS)
    )
    assert _pdf(broken).values.tolist() != full.values.tolist()


def test_apply_batch_with_only_new_keys_keeps_history(spark):
    hist = scd2_history(_log(spark, [(1, 10, "c", "a")]), *ARGS)
    out = _pdf(scd2_apply(hist, _log(spark, [(2, 20, "c", "x")]), *ARGS))
    assert out.values.tolist() == [
        [1, 10, None, True, "a"],
        [2, 20, None, True, "x"],
    ]
