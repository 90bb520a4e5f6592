"""K2 — offset flush policy: 'always' (interval=1, reference default)
vs 'periodic' (interval=N) with manifest-chain checkpoint recovery
(OffsetFlushPolicy.java:19-52 semantics on Spark's epoch model)."""

from debezium_incubator_spark.plans.pipeline import CDCEngine
from debezium_incubator_spark.sources.changelog import DataFrameChangelog
from debezium_incubator_spark.sources.generator import gen_changelog, gen_source_table
from tests.helpers import state_pdf


def _run(spark, base, interval, src, log):
    eng = CDCEngine(
        spark, f"{base}/t", f"{base}/c", num_buckets=4, checkpoint_interval=interval
    )
    eng.create_target()
    eng.bootstrap(src)
    eng.run(DataFrameChangelog(log), offsets_per_epoch=600)
    return eng


def test_periodic_flush_matches_always(spark, tmp_path):
    src = gen_source_table(spark, n_keys=120, n_repos=5)
    log = gen_changelog(spark, n_keys=120, n_repos=5, n_slots=700)
    always = _run(spark, str(tmp_path / "a"), 1, src, log)
    periodic = _run(spark, str(tmp_path / "p"), 3, src, log)
    assert state_pdf(periodic).equals(state_pdf(always))
    # periodic wrote FEWER checkpoint files but ends at the same epoch
    assert len(periodic.store.epochs()) < len(always.store.epochs())
    assert periodic.store.latest()["epoch"] == always.store.latest()["epoch"]


def test_manifest_chain_recovery_over_multiple_epochs(spark, tmp_path):
    """Checkpoint lost several epochs back (periodic policy + crash):
    _reconcile folds the manifest summary chain forward without
    re-applying data."""
    src = gen_source_table(spark, n_keys=120, n_repos=5)
    log = gen_changelog(spark, n_keys=120, n_repos=5, n_slots=700)
    eng = _run(spark, str(tmp_path / "r"), 1, src, log)
    final = state_pdf(eng)
    last_epoch = eng.store.latest()["epoch"]
    assert last_epoch >= 4
    v_before = eng.table.version()

    eng.store.rewind_to(0)  # checkpoint 4+ epochs behind the table
    eng2 = CDCEngine(
        spark, str(tmp_path / "r/t"), str(tmp_path / "r/c"), num_buckets=4
    )
    ck = eng2._reconcile(eng2.store.latest())
    assert ck["epoch"] == last_epoch  # fully rebuilt from summaries
    assert eng2.table.version() == v_before  # no data re-applied
    eng2.run(DataFrameChangelog(log), offsets_per_epoch=600)
    assert eng2.table.version() == v_before  # nothing left to do
    assert state_pdf(eng2).equals(final)
