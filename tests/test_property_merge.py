"""Property-based test: for ANY valid event sequence, the engine's final
state equals a trivial sequential reduction (python dict). Hypothesis
generates op sequences; one Spark round-trip per example keeps runtime
bounded (small example count, no shrink-time explosion)."""

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from debezium_incubator_spark.plans.pipeline import CDCEngine
from tests.helpers import mk_events

KEYS = ["a", "b", "c"]


@st.composite
def event_sequences(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    events = []
    alive = {}
    for off in range(n):
        key = draw(st.sampled_from(KEYS))
        if alive.get(key):
            op = draw(st.sampled_from(["u", "d", "u"]))
        else:
            op = "c"
        alive[key] = op != "d"
        events.append((off, key, op, draw(st.integers(0, 9))))
    # inject duplicate replays of a sample of offsets
    dup_of = draw(st.lists(st.integers(0, n - 1), max_size=3))
    return events, dup_of


def reduce_python(events):
    state = {}
    for off, key, op, v in sorted(events):
        if op == "d":
            state.pop(key, None)
        else:
            state[key] = f"v{v}\n"
    return state


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(event_sequences())
def test_engine_matches_sequential_reduction(spark, tmp_path_factory, seq):
    events, dup_of = seq
    rows = []
    for off, key, op, v in events:
        img = (
            {"commit": "c" * 40, "lang": "py", "content": f"v{v}\n"}
            if op != "d"
            else {"commit": None, "lang": None, "content": None}
        )
        rows.append({"offset": off, "op": op, "repo": "r", "path": key, "after": img})
    for d in dup_of:
        rows.append(dict(rows[d]))  # identical replay, same offset

    base = tmp_path_factory.mktemp("prop")
    eng = CDCEngine(spark, str(base / "t"), str(base / "c"), num_buckets=2)
    eng.create_target()
    eng.bootstrap(
        spark.createDataFrame(
            [], "repo string, path string, commit string, lang string, content string"
        )
    )
    # split into two epochs at an arbitrary midpoint to exercise D1
    mid = len(events) // 2
    ev_df1 = mk_events(spark, [r for r in rows if r["offset"] < mid])
    ev_df2 = mk_events(spark, [r for r in rows if r["offset"] >= mid])
    if [r for r in rows if r["offset"] < mid]:
        eng.apply_epoch(ev_df1, stream_pos=mid - 1)
    if [r for r in rows if r["offset"] >= mid]:
        eng.apply_epoch(ev_df2, stream_pos=len(events))

    got = {r["path"]: r["content"] for r in eng.final_state().collect()}
    assert got == reduce_python(events)
