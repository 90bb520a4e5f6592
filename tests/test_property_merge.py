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


FIELDS = ["commit", "lang", "content"]


@st.composite
def partial_event_sequences(draw):
    """Valid cell set-flag sequences (review r5-2 #1): per key, 'c' full
    images re-materialize the whole row, 'u' carries a random non-empty
    set list (values may be explicit None: the set-to-NULL case), 'd'
    kills the key. A dead key may ALSO receive a partial 'u' (Cassandra
    row updates re-create a deleted row with only the set cells —
    review r5-3 #1: the broadcast path back-filled the rest from the
    PRE-delete row). Multiple events per key per epoch happen
    naturally."""
    n = draw(st.integers(min_value=1, max_value=20))
    events = []
    alive: dict = {}
    for off in range(n):
        key = draw(st.sampled_from(KEYS))
        if alive.get(key):
            op = draw(st.sampled_from(["u", "u", "u", "d"]))
        else:
            op = draw(st.sampled_from(["c", "c", "u"]))
        alive[key] = op != "d"
        if op == "d":
            events.append((off, key, "d", None, None))
            continue
        if op == "c":
            vals = {f: f"{f}{draw(st.integers(0, 9))}" for f in FIELDS}
            events.append((off, key, "c", None, vals))
            continue
        set_list = draw(
            st.lists(st.sampled_from(FIELDS), min_size=1, max_size=3, unique=True)
        )
        vals = {f: None for f in FIELDS}
        for f in set_list:
            # ~1 in 4 set fields are EXPLICIT NULLs (set-to-null ≠ unset)
            vals[f] = (
                None
                if draw(st.integers(0, 3)) == 0
                else f"{f}{draw(st.integers(0, 9))}"
            )
        events.append((off, key, "u", sorted(set_list), vals))
    return events


def reduce_partial_python(events):
    state: dict = {}
    for off, key, op, set_list, vals in sorted(events, key=lambda e: e[0]):
        if op == "d":
            state.pop(key, None)
        elif op == "c" or set_list is None:
            state[key] = dict(vals)
        else:
            row = state.setdefault(key, {f: None for f in FIELDS})
            for f in set_list:
                row[f] = vals[f]
    return {k: (v["commit"], v["lang"], v["content"]) for k, v in state.items()}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(partial_event_sequences())
def test_engine_partial_images_match_sequential_reduction(
    spark, tmp_path_factory, events
):
    """For ANY valid set-flag sequence, the engine's field-wise fold
    (split across two epochs at an arbitrary midpoint) equals trivial
    per-event application — including multiple partial updates to one
    key inside one epoch and delete-resets."""
    rows = []
    sets = []
    for off, key, op, set_list, vals in events:
        img = vals if vals is not None else {"commit": None, "lang": None, "content": None}
        rows.append({"offset": off, "op": op, "repo": "r", "path": key, "after": img})
        sets.append((off, set_list))

    base = tmp_path_factory.mktemp("pprop")
    eng = CDCEngine(
        spark, str(base / "t"), str(base / "c"), num_buckets=2,
        normalize=False, after_set_col="after_set",
    )
    eng.create_target()
    eng.bootstrap(
        spark.createDataFrame(
            [], "repo string, path string, commit string, lang string, content string"
        )
    )
    sets_df = spark.createDataFrame(sets, "offset long, after_set array<string>")
    mid = len(events) // 2
    for lo, hi, pos in ((0, mid, mid - 1), (mid, len(events), len(events))):
        part = [r for r in rows if lo <= r["offset"] < hi]
        if part:
            ev_df = mk_events(spark, part).join(sets_df, "offset")
            eng.apply_epoch(ev_df, stream_pos=pos)

    got = {
        r["path"]: (r["commit"], r["lang"], r["content"])
        for r in eng.final_state().collect()
    }
    assert got == reduce_partial_python(events)
