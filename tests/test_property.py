"""Property-based correctness: random event streams vs the pure-Python
replay model (hypothesis). Catches semantic corners example tests miss —
duplicate seqs, delete-first streams, key collisions, mode differences."""

import os

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqoop_spark.cdc import CdcEngine
from sqoop_spark.cdc.merge import MergeMode, merge_frames, newest_wins_reduce

KEYS = [("r0", "a"), ("r0", "b"), ("r1", "a"), ("r1", "c"), ("r2", "z")]

EVENT = st.tuples(
    st.integers(0, 4),          # key index
    st.sampled_from(["upsert", "upsert", "upsert", "delete"]),
    st.text("xyz", min_size=0, max_size=4),  # payload
)
STREAM = st.lists(EVENT, min_size=0, max_size=25)

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("payload", T.StringType()),
        T.StructField("event_seq", T.LongType()),
        T.StructField("op", T.StringType()),
    ]
)


def _df(spark, events):
    rows = [
        (KEYS[k][0], KEYS[k][1], payload, seq, op)
        for seq, (k, op, payload) in enumerate(events)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _model_final(events):
    """The replay model: ascending seq, delete removes, upsert replaces."""
    state = {}
    for seq, (k, op, payload) in enumerate(events):
        if op == "delete":
            state.pop(KEYS[k], None)
        else:
            state[KEYS[k]] = (payload, seq)
    return {k: v for k, v in state.items()}


def _model_merge(old_events, new_events, mode):
    old = _model_final(old_events)
    # reduce new to winner per key (max seq), offset seqs after old's range
    winners = {}
    for seq, (k, op, payload) in enumerate(new_events):
        winners[KEYS[k]] = (op, payload, seq)
    out = dict(old)
    for key, (op, payload, seq) in winners.items():
        if mode is MergeMode.UPSERT:
            if op == "delete":
                out.pop(key, None)
            else:
                out[key] = (payload, seq)
        elif mode is MergeMode.UPDATE_ONLY:
            if key in old and op != "delete":
                out[key] = (payload, seq)
        else:  # ALLOW_INSERT
            if op != "delete":
                out[key] = (payload, seq)
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=STREAM)
def test_newest_wins_reduce_matches_model(spark, events):
    got = newest_wins_reduce(_df(spark, events), ["repo", "path"], "event_seq").toPandas()
    winners = {}
    for seq, (k, op, payload) in enumerate(events):
        winners[KEYS[k]] = (op, payload, seq)
    assert len(got) == len(winners)
    for r in got.itertuples():
        op, payload, seq = winners[(r.repo, r.path)]
        assert (r.op, r.payload, r.event_seq) == (op, payload, seq)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(old_events=STREAM, new_events=STREAM, mode=st.sampled_from(list(MergeMode)))
def test_merge_frames_matches_model(spark, old_events, new_events, mode):
    old_state = _model_final(old_events)
    old_rows = [
        (k[0], k[1], p, s, "upsert") for k, (p, s) in sorted(old_state.items())
    ]
    old_df = spark.createDataFrame(old_rows, SCHEMA).drop("op")
    # new stream seqs must sort after old snapshot seqs (in-order contract)
    base = len(old_events)
    new_rows = [
        (KEYS[k][0], KEYS[k][1], payload, base + seq, op)
        for seq, (k, op, payload) in enumerate(new_events)
    ]
    new_df = spark.createDataFrame(new_rows, SCHEMA)
    got = merge_frames(old_df, new_df, ["repo", "path"], "event_seq", mode).toPandas()
    expected = _model_merge(old_events, new_events, mode)
    got_map = {
        (r.repo, r.path): r.payload for r in got.itertuples()
    }
    exp_map = {k: p for k, (p, _s) in expected.items()}
    assert got_map == exp_map, f"mode={mode}"


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=STREAM, strategy=st.sampled_from(["cow", "mor"]))
def test_engine_replay_matches_model(spark, tmp_path_factory, events, strategy):
    """End-to-end engine replay (either strategy) equals the replay model
    for arbitrary streams, including delete-only and empty streams."""
    import os

    from sqoop_spark.cdc import CdcEngine

    d = str(tmp_path_factory.mktemp("prop"))
    # batch ids derive from seq ranges (never decrease along seq order —
    # the CoW in-order contract)
    n = max(1, len(events))
    df = _df(spark, events).withColumn(
        "batch_id", (F.col("event_seq") * 3 / n).cast("long")
    )
    eng = CdcEngine.create_table(
        spark,
        os.path.join(d, "t"),
        schema=df.drop("batch_id", "op").schema,
        key_columns=("repo", "path"),
        num_buckets=4,
        merge_strategy=strategy,
        fingerprint=False,
    )
    eng.replay(df)
    got = {
        (r.repo, r.path): (r.payload, r.event_seq)
        for r in eng.table.read().collect()
    }
    assert got == _model_final(events), strategy


DATA_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("payload", T.StringType()),
        T.StructField("event_seq", T.LongType()),
    ]
)


def _base_table(spark, tmp_path_factory, events):
    """A lake table holding the replay model's final state."""
    from sqoop_spark.lake import LakeTable

    d = str(tmp_path_factory.mktemp("prop_dml"))
    t = LakeTable.create(
        spark, os.path.join(d, "t"), DATA_SCHEMA, ["repo", "path"],
        num_buckets=4, properties={"order_column": "event_seq"},
    )
    base = _model_final(events)
    if base:
        t.append(spark.createDataFrame(
            [(r, p, v, s) for (r, p), (v, s) in base.items()], DATA_SCHEMA
        ))
    return t, base


def _table_state(t):
    return {
        (r.repo, r.path): (r.payload, r.event_seq) for r in t.read().collect()
    }


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=STREAM, c=st.sampled_from("xyz"))
def test_dml_matches_model(spark, tmp_path_factory, events, c):
    """delete_where/update_where equal the dict model for arbitrary final
    states: DELETE removes exactly the predicate-true keys, UPDATE rewrites
    exactly the predicate-true keys, empty matches are no-ops."""
    t, base = _base_table(spark, tmp_path_factory, events)

    t.delete_where(f"payload LIKE '%{c}%'")
    model = {k: v for k, v in base.items() if c not in v[0]}
    assert _table_state(t) == model

    t.update_where("payload = ''", {"payload": "'E'"})
    model = {k: (("E", s) if v == "" else (v, s)) for k, (v, s) in model.items()}
    assert _table_state(t) == model


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=STREAM, src_events=STREAM)
def test_merge_into_matches_model(spark, tmp_path_factory, events, src_events):
    """merge_into equals the clause model for arbitrary target states and
    arbitrary reduced sources: matched+delete-op removes, matched+longer
    payload updates (gated clause), matched otherwise carries, unmatched
    inserts — including empty target, empty source, all-delete sources."""
    t, base = _base_table(spark, tmp_path_factory, events)
    n = len(events)
    winners = {}
    for seq, (k, op, payload) in enumerate(src_events):
        winners[KEYS[k]] = (op, payload, seq + n)
    src_schema = T.StructType(
        DATA_SCHEMA.fields + [T.StructField("op", T.StringType())]
    )
    src = spark.createDataFrame(
        [(r, p, v, s, op) for (r, p), (op, v, s) in winners.items()], src_schema
    )
    t.merge_into(
        src,
        when_matched_delete="s.op = 'delete'",
        when_matched_update={
            "payload": "s.payload", "event_seq": "s.event_seq"
        },
        update_condition="length(s.payload) >= length(t.payload)",
        when_not_matched_insert={
            "payload": "s.payload", "event_seq": "s.event_seq"
        },
    )
    model = dict(base)
    for key, (op, payload, seq) in winners.items():
        if key in base:
            if op == "delete":
                model.pop(key)
            elif len(payload) >= len(base[key][0]):
                model[key] = (payload, seq)
        else:
            model[key] = (payload, seq)
    assert _table_state(t) == model


# ---------------------------------------------------------------------------
# scan-pruning soundness: scan(where) ≡ read().filter(where), randomized
# ---------------------------------------------------------------------------

SCAN_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
_LANGS = ["go", "java", "js", "md", "python", "rust"]


@pytest.fixture(scope="module")
def scan_table(spark, tmp_path_factory):
    """One clustered table with int/str/timestamp stats columns AND an
    unmerged MoR delta in one bucket — the full pruning surface (zone
    maps, temporal canonicalization, bucket prune, delta whole-or-drop)
    exercised by every example against the same fixture."""
    import datetime as dt

    from sqoop_spark.cdc.merge import merge_apply
    from sqoop_spark.lake import LakeTable

    path = str(tmp_path_factory.mktemp("scanprop") / "t")
    t = LakeTable.create(
        spark, path, SCAN_SCHEMA, ["k"], num_buckets=2,
        properties={"order_column": "seq", "stats_columns": "seq,k,lang,ts"},
    )
    base = dt.datetime(2024, 6, 1)
    t.append(
        spark.createDataFrame(
            [
                (k, k, _LANGS[k % len(_LANGS)], base + dt.timedelta(hours=k))
                for k in range(300)
            ],
            SCAN_SCHEMA,
        )
    )
    t.rewrite_clustered(column="ts", target_rows=40)
    merge_apply(
        t,
        spark.createDataFrame(
            [(7, 9000, "zz-delta", None, "upsert"),
             (11, 9001, None, None, "delete")],
            T.StructType(SCAN_SCHEMA.fields + [T.StructField("op", T.StringType())]),
        ),
        batch_id=1, order_col="seq", strategy="mor",
    )
    return t


def _term(draw):
    col = draw(st.sampled_from(["k", "seq", "lang", "ts"]))
    op = draw(st.sampled_from(["=", "<", "<=", ">", ">=", "in"]))
    if col in ("k", "seq"):
        v = draw(st.integers(min_value=-5, max_value=9500))
        lits = [str(v)] if op != "in" else [
            str(x) for x in draw(st.lists(st.integers(-5, 9500), min_size=1, max_size=3))
        ]
    elif col == "lang":
        pool = _LANGS + ["zzz", ""]
        if op == "in":
            lits = [f"'{x}'" for x in draw(st.lists(st.sampled_from(pool), min_size=1, max_size=3))]
        else:
            lits = [f"'{draw(st.sampled_from(pool))}'"]
    else:  # ts — spell with space, T, or date-only; in-range and out
        day = draw(st.integers(min_value=1, max_value=20))
        hour = draw(st.integers(min_value=0, max_value=23))
        form = draw(st.sampled_from(["space", "tee", "date"]))
        if form == "space":
            s = f"2024-06-{day:02d} {hour:02d}:00:00"
        elif form == "tee":
            s = f"2024-06-{day:02d}T{hour:02d}:00:00"
        else:
            s = f"2024-06-{day:02d}"
        if op == "in":
            op = "="  # IN over timestamps: keep one literal, same path
        lits = [f"'{s}'"]
    if op == "in":
        return f"{col} in ({', '.join(lits)})"
    return f"{col} {op} {lits[0]}"


@st.composite
def _where(draw):
    n = draw(st.integers(min_value=1, max_value=3))
    joiner = draw(st.sampled_from([" and ", " and ", " or "]))  # mostly AND
    return joiner.join(_term(draw) for _ in range(n))


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(where=_where())
def test_scan_pruning_sound_randomized(spark, scan_table, where):
    """Pruning may only SKIP provably-empty files — never change rows.
    Every randomized predicate (incl. space/T/date-spelled timestamp
    literals, out-of-range values, OR fall-open, IN lists) must make
    scan() row-identical to the unpruned read().filter()."""
    got = sorted(
        (r.k, r.seq) for r in scan_table.scan(where).select("k", "seq").collect()
    )
    want = sorted(
        (r.k, r.seq)
        for r in scan_table.read().filter(where).select("k", "seq").collect()
    )
    assert got == want, where
