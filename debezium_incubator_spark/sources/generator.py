"""Deterministic seeded generator: source table + change-event log.

Produces the engine's test/bench inputs per FIXTURES.md F1/F2 — an
Iceberg-shaped source table ``(repo, path, commit, lang, content)`` and
a changelog of envelopes — with:

* Zipf-ish hot-repo/hot-key skew (the salting story's raw material);
* valid per-key sequences: c before u/d, no double-delete
  (reference guarantee; ops per Record.java:42-61);
* PK-update expanded to a (d, t, c-new-key) triple
  (OracleConnectorIT.java:391-446 behavior);
* tombstone after every delete (RecordMaker.java:53-57);
* deliberate duplicate-offset replays (exactly-once tests;
  the at-least-once hazard of LcrEventHandler.java:53-65).

Everything is a pure function of (seed, id) computed with JVM-side
hash/string expressions — generation itself distributes, so the same
code that makes 10^4 events for pytest makes 10^10 on a cluster.
The per-row invariant holds by construction: ``content`` is
deterministic in (repo, path, commit), so sha256(content) is
independently recomputable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_incubator_spark.operators.envelope import SOURCE_TYPE

LANGS = ["py", "java", "ts", "go", "rs", "md"]
BASE_TS_MS = 1_700_000_000_000
PAYLOAD_DDL = "struct<commit:string,lang:string,content:string>"


def _u(col: Column, salt: str, seed: int) -> Column:
    """Deterministic uniform [0,1) from a column (hash-based, no rand())."""
    return (
        F.pmod(F.xxhash64(col, F.lit(salt), F.lit(seed)), F.lit(1_000_000)) / F.lit(1_000_000.0)
    )


def _commit(repo: Column, path: Column, version: Column) -> Column:
    """40-hex commit id, monotone-per-key via the version number."""
    return F.substring(
        F.sha2(F.concat_ws("|", F.lit("commit"), repo, path, version.cast("string")), 256), 1, 40
    )


def _content(repo: Column, path: Column, commit: Column) -> Column:
    """Deterministic pseudo-source. Already in normalized form (no
    trailing spaces, single trailing newline) so the engine's
    normalization is an identity on it — sha256 parity holds end to end.
    """
    n_lines = (F.pmod(F.xxhash64(commit), F.lit(24)) + F.lit(3)).cast("int")
    line = F.concat(
        F.lit("def fn_"), F.substring(commit, 1, 8), F.lit("(x):\n    return x ^ 0x"),
        F.substring(commit, 9, 6), F.lit("\n"),
    )
    header = F.concat(F.lit("// "), repo, F.lit("/"), path, F.lit(" @ "), commit, F.lit("\n"))
    return F.concat(header, F.array_join(F.array_repeat(line, n_lines), ""))


def _key_cols(key_id: Column, n_repos: int, repo_skew: float):
    """(repo, path, lang) for a key id, with Zipf-ish repo skew:
    repo 0 is the hottest (pow-transform of a hash-uniform)."""
    u = _u(key_id, "repo", 7)
    repo_id = F.floor(F.lit(n_repos) * F.pow(u, F.lit(repo_skew))).cast("int")
    repo = F.format_string("org%02d/repo-%04d", F.pmod(repo_id, F.lit(10)), repo_id)
    lang_arr = F.array(*[F.lit(x) for x in LANGS])
    lang = F.element_at(lang_arr, (F.pmod(key_id, F.lit(len(LANGS))) + 1).cast("int"))
    path = F.format_string(
        "src/d%02d/f%07d.%s", F.pmod(key_id, F.lit(13)), key_id, lang
    )
    return repo, path, lang


def _table_name(key_id: Column, n_tables: int) -> Column:
    """Deterministic table assignment for multi-table runs; the single-
    table default keeps the historical literal name."""
    if n_tables <= 1:
        return F.lit("files")
    return F.format_string("files_%02d", F.pmod(key_id, F.lit(n_tables)).cast("int"))


def gen_source_table(
    spark: SparkSession,
    n_keys: int = 2_000,
    n_repos: int = 50,
    repo_skew: float = 2.0,
    seed: int = 42,
    partitions: int | None = None,
    n_tables: int = 1,
) -> DataFrame:
    """F1 — the live source table (snapshot input), one row per key.
    With ``n_tables > 1`` a ``src_table`` column assigns each key to one
    of N CDC tables (the multi-table orchestration input; ≙ the agent
    snapshotting ALL CDC-enabled tables, SnapshotProcessor.java:132-137).
    """
    ids = spark.range(0, n_keys, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    key_id = F.col("id")
    repo, path, lang = _key_cols(key_id, n_repos, repo_skew)
    df = ids.select(
        repo.alias("repo"),
        path.alias("path"),
        lang.alias("lang"),
        _table_name(key_id, n_tables).alias("src_table"),
    )
    commit = _commit(F.col("repo"), F.col("path"), F.lit(0))
    out = df.select(
        "repo",
        "path",
        commit.alias("commit"),
        "lang",
        _content(F.col("repo"), F.col("path"), commit).alias("content"),
        "src_table",
    )
    if n_tables <= 1:
        out = out.drop("src_table")  # historical single-table schema
    return out


def gen_changelog(
    spark: SparkSession,
    n_keys: int = 2_000,
    n_repos: int = 50,
    repo_skew: float = 2.0,
    n_slots: int = 10_000,
    key_skew: float = 1.5,
    new_key_frac: float = 0.15,
    delete_pct: int = 8,
    pk_update_pct: int = 4,
    dup_per_mille: int = 20,
    tombstones: bool = True,
    seed: int = 42,
    segment_size: int = 1 << 20,
    ts_step_ms: int = 10,
    partitions: int | None = None,
    n_tables: int = 1,
) -> DataFrame:
    """F2 — the change-event log. Each logical *slot* touches one key and
    expands to 1–3 physical events (delete→+tombstone; PK-update→d,t,c).
    Offsets are ``slot*4 + idx``: globally unique, totally ordered,
    consistent with (segment, pos)."""
    n_ids = int(n_keys * (1.0 + new_key_frac))
    slots = spark.range(
        0, n_slots, numPartitions=partitions or spark.sparkContext.defaultParallelism
    ).select(F.col("id").alias("slot"))

    # skewed key pick: hot keys get many events
    ku = _u(F.col("slot"), "key", seed)
    key_id = F.floor(F.lit(n_ids) * F.pow(ku, F.lit(key_skew))).cast("long")
    df = slots.withColumn("key_id", key_id)
    df = df.withColumn("is_new_key", F.col("key_id") >= F.lit(n_keys))

    repo, path, lang = _key_cols(F.col("key_id"), n_repos, repo_skew)
    df = df.withColumn("repo", repo).withColumn("path", path).withColumn("lang", lang)

    # per-key sequence number in slot order (generation-side window; the
    # engine itself never needs this)
    from pyspark.sql.window import Window

    w = Window.partitionBy("key_id").orderBy("slot")
    df = df.withColumn("seq", F.row_number().over(w))

    # op decision — non-recursive so it stays a closed-form column:
    # deletes/PK-moves only at even seq, so consecutive destructive ops
    # are impossible and every post-delete event re-creates the key.
    h = F.pmod(F.xxhash64("slot", F.lit("op"), F.lit(seed)), F.lit(100))
    even = F.col("seq") % 2 == 0
    df = df.withColumn("is_d", (h < F.lit(delete_pct)) & even)
    df = df.withColumn(
        "is_pk", (h >= F.lit(delete_pct)) & (h < F.lit(delete_pct + pk_update_pct)) & even
    )
    prev_destructive = F.lag(F.col("is_d") | F.col("is_pk"), 1, False).over(w)
    df = df.withColumn(
        "op_base",
        F.when(F.col("is_d"), F.lit("d"))
        .when(F.col("is_pk"), F.lit("d"))  # the d leg of the PK triple
        .when((F.col("seq") == 1) & F.col("is_new_key"), F.lit("c"))
        .when((F.col("seq") == 1), F.lit("u"))  # first touch of a snapshotted key
        .when(prev_destructive, F.lit("c"))
        .otherwise(F.lit("u")),
    )

    # images are pure functions of (key, version): version = seq, the
    # snapshot carries version 0 — so before-images need no second window
    cur_commit = _commit(F.col("repo"), F.col("path"), F.col("seq"))
    prev_commit = _commit(F.col("repo"), F.col("path"), F.col("seq") - 1)
    cur_img = F.struct(
        cur_commit.alias("commit"),
        F.col("lang").alias("lang"),
        _content(F.col("repo"), F.col("path"), cur_commit).alias("content"),
    )
    prev_img = F.struct(
        prev_commit.alias("commit"),
        F.col("lang").alias("lang"),
        _content(F.col("repo"), F.col("path"), prev_commit).alias("content"),
    )
    null_img = F.lit(None).cast(PAYLOAD_DDL)
    nulls_img = F.struct(
        F.lit(None).cast("string").alias("commit"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("content"),
    )
    has_before = (F.col("seq") > 1) | ~F.col("is_new_key")
    before_img = F.when(
        (F.col("op_base") == "c") | ~has_before, null_img
    ).otherwise(prev_img)

    # PK-update target: a provably-fresh path (unique per slot)
    new_path = F.concat(F.col("path"), F.format_string(".moved-%06d", F.col("slot")))
    new_commit = _commit(F.col("repo"), new_path, F.lit(1))
    new_img = F.struct(
        new_commit.alias("commit"),
        F.col("lang").alias("lang"),
        _content(F.col("repo"), new_path, new_commit).alias("content"),
    )

    ev = f"struct<op:string,path:string,before:{PAYLOAD_DDL},after:{PAYLOAD_DDL}>"

    def mk(op, p, before, after):
        return F.struct(
            F.lit(op).alias("op") if isinstance(op, str) else op.alias("op"),
            p.alias("path"),
            before.alias("before"),
            after.alias("after"),
        ).cast(ev)

    ev_plain = mk(F.col("op_base"), F.col("path"), before_img, cur_img)
    ev_d = mk("d", F.col("path"), before_img, nulls_img)
    ev_t = mk("t", F.col("path"), null_img, null_img)
    ev_c_new = mk("c", new_path, null_img, new_img)

    events = (
        F.when(F.col("is_pk") & F.lit(tombstones), F.array(ev_d, ev_t, ev_c_new))
        .when(F.col("is_pk"), F.array(ev_d, ev_c_new))
        .when(F.col("is_d") & F.lit(tombstones), F.array(ev_d, ev_t))
        .when(F.col("is_d"), F.array(ev_d))
        .otherwise(F.array(ev_plain))
    )
    exploded = df.select(
        "slot",
        "repo",
        _table_name(F.col("key_id"), n_tables).alias("__tbl"),
        F.posexplode(events).alias("idx", "ev"),
    )

    offset = (F.col("slot") * 4 + F.col("idx")).cast("long")
    seg = F.floor(offset / F.lit(segment_size)).cast("long")
    pos = (offset % F.lit(segment_size)).cast("int")
    ts_ms = (F.lit(BASE_TS_MS) + offset * F.lit(ts_step_ms)).cast("long")
    src = F.struct(
        F.lit("0.10.0").alias("version"),
        F.lit("lake-cdc-generator").alias("connector"),
        F.lit("cluster-0").alias("cluster"),
        F.format_string("CommitLog-6-%d.log", seg).alias("file"),
        pos.alias("pos"),
        F.lit(False).alias("snapshot"),
        F.lit("repos").alias("keyspace"),
        F.col("__tbl").alias("table"),
        (ts_ms * 1000).cast("long").alias("ts_micro"),
        F.format_string("tx-%d", F.col("slot")).alias("txid"),
        offset.alias("scn"),
    ).cast(SOURCE_TYPE.simpleString())

    log = exploded.select(
        offset.alias("offset"),
        seg.alias("segment"),
        pos.alias("pos"),
        F.col("ev.op").alias("op"),
        ts_ms.alias("ts_ms"),
        F.col("repo"),
        F.col("ev.path").alias("path"),
        F.col("ev.before").alias("before"),
        F.col("ev.after").alias("after"),
        src.alias("source"),
    )

    if dup_per_mille > 0:
        # identical re-emission of a sample of events (same offset+payload):
        # the at-least-once delivery hazard the dedup stack must absorb
        dups = log.filter(
            F.pmod(F.xxhash64("offset", F.lit("dup"), F.lit(seed)), F.lit(1000))
            < F.lit(dup_per_mille)
        )
        log = log.unionByName(dups)
    return log


def gen_partial_updates(
    spark: SparkSession,
    n_keys: int = 200,
    n_epochs: int = 3,
    seed: int = 42,
    touch_pct: int = 55,
    events_per_epoch: int = 1,
    delete_pct: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """F3 — partial-image fixture for the cell set-flag merge path
    (null-vs-unset, CellData.java:27-87 'set' sub-field;
    CommitLogReadHandlerImpl.java:351-410 populates only the mutated
    cells of a row update).

    Returns ``(initial, events)``:

    * ``initial`` — one full row per key: (repo, path, commit, lang,
      content), the pre-stream table state.
    * ``events`` — per epoch, ≤``events_per_epoch`` events per key
      (offset = epoch*10_000 + rep*1_000 + key id: epochs are disjoint
      offset ranges and the no-delete semantics stay SQL-expressible as
      "last event that SET the field" — with ``events_per_epoch > 1``
      that requires the merge's intra-epoch field-wise fold, review
      r5-2 #1; the default 1 keeps the historical single-event form).
      Each update carries ``after_set`` (the list of payload fields the
      event actually sets); fields outside it are NULL in the event and
      must KEEP the current table value, while a field inside it may be
      explicitly set to NULL (~20% of set langs) — the very distinction
      the flag exists for. ~10% of events are full images
      (``after_set`` NULL); a third of those are op 'c' re-creates.
      With the default ``delete_pct=0`` there are no deletes
      (destructive paths are pinned by the replay queries; the plain
      fixture isolates field-wise coalescing) — the existing oracles
      stay byte-identical. ``delete_pct>0`` turns that share of events
      into row deletes (op 'd', all cells and ``after_set`` NULL):
      a later PARTIAL update then re-creates the row carrying ONLY its
      set cells (CommitLogReadHandlerImpl.java:351-410 — a Cassandra
      row update after a delete resurrects nothing), the d-then-u trap
      of review r5-3 #1.

    Pure function of (seed, key, epoch) — JVM-side expressions only.
    """
    lang_arr = F.array(*[F.lit(x) for x in LANGS])

    ids = spark.range(0, n_keys).select(F.col("id").cast("long").alias("kid"))
    repo = F.format_string("org%02d/repo-%04d", F.pmod(F.col("kid"), F.lit(10)), F.pmod(F.col("kid"), F.lit(25)))
    path = F.format_string("src/f%05d.py", F.col("kid"))
    init_commit = F.substring(F.sha2(F.concat(F.lit("pi0|"), path), 256), 1, 40)
    initial = ids.select(
        repo.alias("repo"),
        path.alias("path"),
        init_commit.alias("commit"),
        F.element_at(lang_arr, (F.pmod(F.col("kid"), F.lit(len(LANGS))) + 1).cast("int")).alias("lang"),
        F.concat(F.lit("init | "), path).alias("content"),
    )

    if not (n_keys <= 1000 and 1 <= events_per_epoch <= 10):
        raise ValueError("offset packing requires n_keys<=1000, events_per_epoch in 1..10")
    epochs = spark.range(0, n_epochs).select(F.col("id").cast("long").alias("ep"))
    reps = spark.range(0, events_per_epoch).select(F.col("id").cast("long").alias("rep"))
    grid = ids.crossJoin(epochs).crossJoin(reps)
    p, e = F.col("kid"), F.col("ep")
    pe = F.concat(
        F.format_string("src/f%05d.py", p),
        F.lit("|"), e.cast("string"),
        F.lit("|"), F.col("rep").cast("string"),
    )
    touched = F.pmod(F.xxhash64(pe, F.lit("pi_has"), F.lit(seed)), F.lit(100)) < F.lit(touch_pct)
    grid = grid.filter(touched)
    grid = grid.withColumn("repo", repo).withColumn("path", F.format_string("src/f%05d.py", p))

    mask = (F.pmod(F.xxhash64(pe, F.lit("pi_set"), F.lit(seed)), F.lit(7)) + 1).cast("int")
    full = F.pmod(F.xxhash64(pe, F.lit("pi_full"), F.lit(seed)), F.lit(10)) == 0
    op = F.when(
        full & (F.pmod(F.xxhash64(pe, F.lit("pi_op"), F.lit(seed)), F.lit(3)) == 0),
        F.lit("c"),
    ).otherwise(F.lit("u"))
    set_commit = full | (F.pmod(mask, F.lit(2)) == 1)
    set_lang = full | (F.pmod(F.floor(mask / 2), F.lit(2)) == 1)
    set_content = full | (F.pmod(F.floor(mask / 4), F.lit(2)) == 1)

    new_commit = F.substring(F.sha2(F.concat(F.lit("pi|"), pe), 256), 1, 40)
    lang_null = F.pmod(F.xxhash64(pe, F.lit("pi_lnull"), F.lit(seed)), F.lit(5)) == 0
    new_lang = F.when(lang_null, F.lit(None).cast("string")).otherwise(
        F.element_at(lang_arr, (F.pmod(F.xxhash64(pe, F.lit("pi_lang"), F.lit(seed)), F.lit(len(LANGS))) + 1).cast("int"))
    )
    new_content = F.format_string("v%d.%d of src/f%05d.py", e, F.col("rep"), p)

    isdel = F.pmod(F.xxhash64(pe, F.lit("pi_del"), F.lit(seed)), F.lit(100)) < F.lit(
        delete_pct
    )
    op = F.when(isdel, F.lit("d")).otherwise(op)
    ns = F.lit(None).cast("string")
    after_set = F.when(isdel | full, F.lit(None).cast("array<string>")).otherwise(
        F.filter(
            F.array(
                F.when(set_commit, F.lit("commit")).otherwise(ns),
                F.when(set_lang, F.lit("lang")).otherwise(ns),
                F.when(set_content, F.lit("content")).otherwise(ns),
            ),
            lambda x: x.isNotNull(),
        )
    )
    events = grid.select(
        "repo",
        "path",
        F.when(~isdel & set_commit, new_commit).otherwise(ns).alias("commit"),
        F.when(~isdel & set_lang, new_lang).otherwise(ns).alias("lang"),
        F.when(~isdel & set_content, new_content).otherwise(ns).alias("content"),
        op.alias("op"),
        (e * 10_000 + F.col("rep") * 1_000 + p).alias("offset"),
        after_set.alias("after_set"),
    )
    return initial, events
