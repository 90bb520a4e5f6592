"""Incremental aggregate-view maintenance over the CDC feed.

The classic downstream of the reference's change stream: a per-group
aggregate (counts, sums, min/max) over the CURRENT table state, kept up
to date from change batches instead of re-scanning the table. The
maintenance algebra is the standard IVM one:

* inserts contribute ``+1`` / ``+measure`` to their group;
* retractions (the OLD current row of every updated/deleted key)
  contribute ``-1`` / ``-measure``;
* groups whose count reaches zero leave the view;
* ``min``/``max`` are NOT delta-maintainable under retraction (the
  retracted row may have been the extreme), so touched groups get a
  bounded recompute against current state — only those groups are ever
  rescanned, and at engine scale the group predicate prunes to their
  buckets.

Accumulators are EXACT (longs): floating-point delta-sums drift away
from a recompute after enough batches, so money-like doubles should be
scaled to integral units by the caller (the oracle query uses cents).
That is also what production IVM does at 100 TB — float accumulators
are an audit hazard.

Scale shape: each apply touches |batch| rows + |touched groups| view
rows. The delta side of every join is batch-sized and BROADCAST; the
view and the state never shuffle on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

COUNT_COL = "n_rows"


def _delta_aggs(measure_cols: list[str]):
    return [F.count(F.lit(1)).alias(COUNT_COL)] + [
        F.sum(c).cast("long").alias(f"sum_{c}") for c in measure_cols
    ]


def _extreme_aggs(extreme_cols: list[str]):
    out = []
    for c in extreme_cols:
        out.append(F.min(c).alias(f"min_{c}"))
        out.append(F.max(c).alias(f"max_{c}"))
    return out


def agg_view(
    state: DataFrame,
    group_cols: list[str],
    measure_cols: list[str],
    extreme_cols: list[str] | None = None,
) -> DataFrame:
    """Full rebuild: one partial-aggregated groupBy over current state."""
    return state.groupBy(*group_cols).agg(
        *_delta_aggs(measure_cols), *_extreme_aggs(extreme_cols or [])
    )


def agg_view_apply(
    view: DataFrame,
    inserted: DataFrame,
    retracted: DataFrame,
    group_cols: list[str],
    measure_cols: list[str],
    extreme_cols: list[str] | None = None,
    state: DataFrame | None = None,
) -> DataFrame:
    """Fold one batch's row-level effect into the view.

    ``inserted``/``retracted`` are the NEW current rows and the OLD
    current rows of the keys the batch touched (the merge path already
    materializes both — merge.py's matched-row fetch). ``state`` is the
    post-batch current state, required iff ``extreme_cols`` is set.
    """
    extreme_cols = extreme_cols or []
    if extreme_cols and state is None:
        raise ValueError("extreme_cols requires the post-batch state for recompute")

    # a column may be both a measure and an extreme — select it once
    cols = list(dict.fromkeys(group_cols + measure_cols + extreme_cols))
    signed = inserted.select(*cols, F.lit(1).alias("_sign")).unionByName(
        retracted.select(*cols, F.lit(-1).alias("_sign"))
    )
    delta = signed.groupBy(*group_cols).agg(
        F.sum("_sign").alias(COUNT_COL),
        *[
            F.sum(F.col(c) * F.col("_sign")).cast("long").alias(f"sum_{c}")
            for c in measure_cols
        ],
    )

    sum_cols = [f"sum_{c}" for c in measure_cols]
    merged = view.join(F.broadcast(delta), group_cols, "full").select(
        *group_cols,
        *[
            (F.coalesce(view[c], F.lit(0)) + F.coalesce(delta[c], F.lit(0))).alias(c)
            for c in [COUNT_COL, *sum_cols]
        ],
        *[
            view[name].alias(name)
            for c in extreme_cols
            for name in (f"min_{c}", f"max_{c}")
        ],
    )
    merged = merged.where(F.col(COUNT_COL) > 0)

    if not extreme_cols:
        return merged

    # touched groups: bounded recompute of min/max against post-batch
    # state — the one aggregate family retraction can't maintain.
    touched = delta.select(*group_cols)
    fresh = (
        state.join(F.broadcast(touched), group_cols, "semi")
        .groupBy(*group_cols)
        .agg(*_extreme_aggs(extreme_cols))
    )
    untouched = merged.join(F.broadcast(touched), group_cols, "anti")
    refreshed = merged.select(*group_cols, COUNT_COL, *sum_cols).join(
        F.broadcast(fresh), group_cols, "inner"
    )
    return untouched.select(refreshed.columns).unionByName(refreshed)
