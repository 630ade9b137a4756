"""JDBC source/sink wiring — predicate-plan parity with the reference's
split machinery (TestSplitBy/TestBoundaryQuery shapes) and end-to-end
batched export against in-process sqlite3 (the HSQLDB-in-memory pattern of
the reference's own suites, e.g. TestExportUpdate)."""

import json
import os
import sqlite3

import pytest

from sqoop_spark.errors import EngineError
from sqoop_spark.sources.jdbc import (
    DEFAULT_RECORDS_PER_STATEMENT,
    UNLIMITED_STATEMENTS_PER_TRANSACTION,
    bounding_query,
    build_import_plan,
    export_partition,
    insert_statement,
    jdbc_export,
    mysql_upsert_statement,
    oracle_merge_statement,
    sqlite_upsert_statement,
    update_statement,
)

URL = "jdbc:postgresql://db:5432/corp"


# -- import plan ------------------------------------------------------------


def test_plan_table_split_predicates():
    plan = build_import_plan(
        URL, table="orders", split_by="id", num_mappers=4, bounds=(0, 100)
    )
    assert plan.dbtable == "orders"
    # IntegerSplitter interval math: closed last split + IS NULL split
    assert plan.predicates == [
        "id >= 0 AND id < 25",
        "id >= 25 AND id < 50",
        "id >= 50 AND id < 75",
        "id >= 75 AND id <= 100",
        "id IS NULL",
    ]
    assert plan.bounds_sql == "SELECT MIN(id), MAX(id) FROM orders"
    assert plan.properties["fetchsize"] == "1000"


def test_plan_single_mapper_skips_probe():
    """-m 1: no bounding probe, no predicates (1=1 fast path)."""
    plan = build_import_plan(URL, table="orders", num_mappers=1)
    assert plan.predicates is None and plan.bounds_sql is None


def test_plan_columns_where_subquery():
    plan = build_import_plan(
        URL,
        table="orders",
        columns=["id", "total"],
        where="total > 10",
        num_mappers=1,
    )
    assert plan.dbtable == "(SELECT id, total FROM orders WHERE total > 10) AS SQOOP_SUBQUERY"


def test_plan_freeform_query_and_boundary_query():
    q = "SELECT o.id, c.name FROM o JOIN c ON o.cid = c.id WHERE $CONDITIONS"
    plan = build_import_plan(
        URL,
        query=q,
        split_by="id",
        num_mappers=2,
        bounds=(10, 20),
        boundary_query="SELECT 10, 20",
    )
    assert plan.dbtable.startswith("(SELECT o.id, c.name")
    assert "(1 = 1)" in plan.dbtable and "$CONDITIONS" not in plan.dbtable
    assert plan.bounds_sql == "SELECT 10, 20"  # user boundary query wins
    assert plan.predicates[0] == "id >= 10 AND id < 15"
    # derived (no --boundary-query) wraps the query as a subselect
    assert (
        bounding_query("id", query=q)
        == "SELECT MIN(id), MAX(id) FROM (SELECT o.id, c.name FROM o JOIN c "
        "ON o.cid = c.id WHERE (1 = 1)) AS t1"
    )


def test_plan_error_parity():
    with pytest.raises(EngineError, match="must contain '\\$CONDITIONS'"):
        build_import_plan(URL, query="SELECT * FROM t", num_mappers=1)
    with pytest.raises(EngineError, match="must specify --split-by"):
        build_import_plan(URL, table="t", num_mappers=4, bounds=(0, 10))
    with pytest.raises(EngineError, match="exactly one of"):
        build_import_plan(URL, table="t", query="SELECT 1 WHERE $CONDITIONS")
    with pytest.raises(EngineError, match="bounds required"):
        build_import_plan(URL, table="t", split_by="id", num_mappers=4)


def test_plan_null_bounds_single_null_split():
    plan = build_import_plan(
        URL, table="t", split_by="id", num_mappers=4, bounds=(None, None)
    )
    assert plan.predicates == ["id IS NULL"]


def test_plan_split_limit_rederives_count():
    plan = build_import_plan(
        URL, table="t", split_by="id", num_mappers=2, bounds=(0, 100), split_limit=10
    )
    ranged = [p for p in plan.predicates if "IS NULL" not in p]
    assert len(ranged) == 10  # 100-wide range / 10-row limit


# -- statement builders -----------------------------------------------------


def test_insert_statement_shapes():
    assert (
        insert_statement("t", ["a", "b"])
        == "INSERT INTO t (a, b) VALUES (?, ?)"
    )
    assert (
        insert_statement("t", ["a", "b"], num_rows=3)
        == "INSERT INTO t (a, b) VALUES (?, ?), (?, ?), (?, ?)"
    )


def test_update_statement_shape():
    # UpdateOutputFormat.getUpdateStatement:183-206 shape
    assert (
        update_statement("t", ["a", "b"], ["k1", "k2"])
        == "UPDATE t SET a=?, b=? WHERE k1=? AND k2=?"
    )


def test_mysql_upsert_statement_shape():
    # MySQLUpsertOutputFormat.getUpdateStatement:95-140 shape
    assert mysql_upsert_statement("t", ["a", "b"], num_rows=2) == (
        "INSERT INTO t (a, b) VALUES (?, ?), (?, ?) "
        "ON DUPLICATE KEY UPDATE a=VALUES(a), b=VALUES(b)"
    )


def test_oracle_merge_statement_shape():
    got = oracle_merge_statement("t", ["k", "v"], ["k"])
    assert got.startswith("MERGE INTO t USING dual ON (t.k=?)")
    assert "WHEN MATCHED THEN UPDATE SET t.v=?" in got
    assert "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (?, ?)" in got


# -- export executor (driver-side, spy connection) --------------------------


class _SpyConn:
    def __init__(self, real):
        self.real = real
        self.executes = []
        self.commits = 0

    def cursor(self):
        spy = self

        class _Cur:
            def execute(self, sql, params):
                spy.executes.append((sql, len(params)))
                return spy.real.cursor().execute(sql, params)

        return _Cur()

    def commit(self):
        self.commits += 1
        self.real.commit()

    def close(self):
        self.real.close()


def _mem_with_table():
    conn = sqlite3.connect(":memory:")
    conn.execute("CREATE TABLE t (k INTEGER, v TEXT)")
    return conn


def test_export_partition_batching_and_commits():
    """250 rows at 100/statement → 3 statements (100, 100, 50 — the tail
    gets its own shorter multi-row text), commits per the transaction knob."""
    real = _mem_with_table()
    spy = _SpyConn(real)
    rows = [(i, f"v{i}") for i in range(250)]
    n = export_partition(
        rows,
        conn_factory=lambda: spy,
        sql_for_batch=lambda b: insert_statement("t", ["k", "v"], b),
        params_per_row=2,
        records_per_statement=DEFAULT_RECORDS_PER_STATEMENT,
        statements_per_transaction=2,
    )
    assert n == 250
    assert [p for _, p in spy.executes] == [200, 200, 100]
    assert spy.executes[-1][0] == insert_statement("t", ["k", "v"], 50)
    # one commit after the 2nd statement + the final close-commit
    assert spy.commits == 2


def test_export_partition_unlimited_tx_single_commit():
    real = _mem_with_table()
    spy = _SpyConn(real)
    export_partition(
        [(i, "x") for i in range(30)],
        conn_factory=lambda: spy,
        sql_for_batch=lambda b: insert_statement("t", ["k", "v"], b),
        params_per_row=2,
        records_per_statement=10,
        statements_per_transaction=UNLIMITED_STATEMENTS_PER_TRANSACTION,
    )
    assert spy.commits == 1  # deferred to close (AsyncSqlOutputFormat -1)


# -- end-to-end through Spark (file sqlite, single partition) ---------------


def _file_factory(path):
    def factory():
        return sqlite3.connect(path)

    return factory


def test_jdbc_export_insert_spark(spark, scratch):
    db = os.path.join(scratch, "exp.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE t (k INTEGER, v TEXT)")
    conn.commit()
    conn.close()
    df = spark.createDataFrame([(i, f"v{i}") for i in range(500)], "k int, v string")
    jdbc_export(df.coalesce(1), _file_factory(db), "t", mode="insert")
    got = sqlite3.connect(db).execute("SELECT count(*), min(k), max(k) FROM t").fetchone()
    assert got == (500, 0, 499)


def test_jdbc_export_updateonly_ignores_unmatched(spark, scratch):
    """TestExportUpdate subset/no-op semantics: unmatched keys silently
    ignored, matched rows updated."""
    db = os.path.join(scratch, "upd.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, v TEXT)")
    conn.executemany("INSERT INTO t VALUES (?, ?)", [(1, "old1"), (3, "old3")])
    conn.commit()
    conn.close()
    df = spark.createDataFrame(
        [(1, "new1"), (2, "new2"), (3, "new3")], "k int, v string"
    )
    jdbc_export(
        df.coalesce(1), _file_factory(db), "t", mode="updateonly", update_key="k"
    )
    got = dict(sqlite3.connect(db).execute("SELECT k, v FROM t").fetchall())
    assert got == {1: "new1", 3: "new3"}  # key 2 silently ignored


def test_jdbc_export_allowinsert_upserts(spark, scratch):
    db = os.path.join(scratch, "ups.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, v TEXT)")
    conn.execute("INSERT INTO t VALUES (1, 'old1')")
    conn.commit()
    conn.close()
    df = spark.createDataFrame([(1, "new1"), (2, "new2")], "k int, v string")
    jdbc_export(
        df.coalesce(1),
        _file_factory(db),
        "t",
        mode="allowinsert",
        update_key="k",
        dialect="sqlite",
    )
    got = dict(sqlite3.connect(db).execute("SELECT k, v FROM t").fetchall())
    assert got == {1: "new1", 2: "new2"}
    # sqlite upsert text parity
    assert sqlite_upsert_statement("t", ["k", "v"], ["k"]) == (
        "INSERT INTO t (k, v) VALUES (?, ?) ON CONFLICT(k) DO UPDATE SET "
        "v=excluded.v"
    )


def test_jdbc_export_mode_validation(spark):
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    with pytest.raises(EngineError, match="update-key is required"):
        jdbc_export(df, lambda: None, "t", mode="updateonly")
    with pytest.raises(EngineError, match="vendor dialect"):
        jdbc_export(df, lambda: None, "t", mode="allowinsert", update_key="k")
    with pytest.raises(EngineError, match="unknown export mode"):
        jdbc_export(df, lambda: None, "t", mode="nope")


def test_jdbc_apply_changes_replicates_lake_to_sqlite(spark, scratch):
    """Outbound CDC into a JDBC replica: follow_changes delivers each
    commit's diff, jdbc_apply_changes upserts/deletes it through DB-API
    batches, and re-applying a diff after a simulated crash (watermark
    rewound before the save) is idempotent — effectively-once without any
    replica-side fence, because diffs are absolute one-row-per-key states."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from sqoop_spark.cdc.checkpoint import JobStore
    from sqoop_spark.lake import LakeTable
    from sqoop_spark.sources.jdbc import jdbc_apply_changes
    from sqoop_spark.streaming import follow_changes

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    src = LakeTable.create(
        spark, f"{scratch}/jsrc", schema, ["k"], num_buckets=2,
        properties={"order_column": "seq"},
    )
    db = os.path.join(scratch, "replica.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, seq INTEGER, v TEXT)")
    conn.commit()
    conn.close()
    factory = _file_factory(db)
    store = JobStore(f"{scratch}/j_jobs")
    store.create("jdbc-replica", {})

    def apply_fn(version, diff):
        jdbc_apply_changes(diff, factory, "t", ["k"], num_connections=1)

    src.append(spark.createDataFrame([(1, 1, "a"), (2, 2, "b")], schema))
    # bootstrap records position; replica syncs with a full export once
    assert follow_changes(src, store, "jdbc-replica", apply_fn) == 0
    jdbc_apply_changes(
        src.read().withColumn("_change", F.lit("insert")),
        factory, "t", ["k"], num_connections=1,
    )

    op_schema = T.StructType(schema.fields + [T.StructField("op", T.StringType())])
    src.append_delta(
        spark.createDataFrame(
            [(1, 10, "a2", "upsert"), (2, 11, "b", "delete")], op_schema
        )
    )
    src.append(spark.createDataFrame([(5, 12, "e")], schema))
    saved = store.read("jdbc-replica")["options"]["changelog.last.version"]
    assert follow_changes(src, store, "jdbc-replica", apply_fn) == 2

    def replica_state():
        return dict(
            (k, (s, v))
            for k, s, v in sqlite3.connect(db).execute(
                "SELECT k, seq, v FROM t"
            ).fetchall()
        )

    want = {r.k: (r.seq, r.v) for r in src.read().collect()}
    assert replica_state() == want == {1: (10, "a2"), 5: (12, "e")}

    # crash between apply and save: rewind, redeliver, state unchanged
    store.update("jdbc-replica", **{"changelog.last.version": saved})
    assert follow_changes(src, store, "jdbc-replica", apply_fn) == 2
    assert replica_state() == want


def test_cli_list_databases(tmp_path, capsys):
    """ListDatabasesTool analog over a lake root."""
    from sqoop_spark.cli import main

    (tmp_path / "db1").mkdir()
    (tmp_path / "db1" / "orders.parquet").write_bytes(b"")
    (tmp_path / "db2").mkdir()  # empty: not a database
    rc = main(["list-databases", "--path", str(tmp_path)])
    assert rc == 0
    assert capsys.readouterr().out.strip() == "db1"


def test_cli_sequencefile_missing_source_surfaces():
    """--as-sequencefile is a real layout now (sqoop_spark/sequencefile.py;
    CLI e2e in test_sequencefile.py) — a bad source path must surface as the
    reader's error, not be masked by a layout refusal."""
    from pyspark.errors import AnalysisException

    from sqoop_spark.cli import main

    with pytest.raises(AnalysisException):
        main(["import", "--table", "/nope", "--target", "/nope2", "--as-sequencefile"])


def test_split_predicates_partition_range_property():
    """Property (TestSplitBy parity): for any bounds and mapper count the
    predicates exactly partition [lo, hi] — every integer in range matches
    exactly ONE ranged predicate, and none outside does."""
    from hypothesis import given, settings, strategies as st

    from sqoop_spark.partitioning import integer_split_predicates

    @settings(max_examples=200, deadline=None)
    @given(
        lo=st.integers(-10_000, 10_000),
        span=st.integers(0, 5_000),
        m=st.integers(1, 16),
    )
    def check(lo, span, m):
        hi = lo + span
        preds = integer_split_predicates("c", lo, hi, m)

        def matches(v, p):
            # predicates are of the form "c >= A AND c < B" / "... <= B"
            left, right = p.split(" AND ")
            a = int(left.split(">= ")[1])
            closed = "<=" in right
            b = int(right.split("= " if closed else "< ")[1])
            return v >= a and (v <= b if closed else v < b)

        for v in {lo, hi, lo + span // 2, lo + 1, hi - 1} | (
            set(range(lo, hi + 1)) if span <= 64 else set()
        ):
            if v < lo or v > hi:
                continue
            n = sum(matches(v, p) for p in preds)
            assert n == 1, f"value {v} matched {n} predicates: {preds}"
        assert not any(matches(lo - 1, p) for p in preds)
        assert not any(matches(hi + 1, p) for p in preds)

    check()


# -- typed splitter dispatch (round-2 ADVICE: non-integer --split-by) -------


def test_plan_datetime_split_by():
    """DateSplitter dispatch: timestamp bounds yield quoted temporal
    predicates instead of an int() TypeError (DateSplitter.java:30-120)."""
    import datetime as dt

    lo = dt.datetime(2024, 1, 1, 0, 0, 0)
    hi = dt.datetime(2024, 1, 3, 0, 0, 0)
    plan = build_import_plan(
        URL, table="orders", split_by="ts", num_mappers=2, bounds=(lo, hi)
    )
    ranged = [p for p in plan.predicates if "IS NULL" not in p]
    assert len(ranged) == 2
    assert ranged[0] == "ts >= '2024-01-01 00:00:00' AND ts < '2024-01-02 00:00:00'"
    assert ranged[-1] == "ts >= '2024-01-02 00:00:00' AND ts <= '2024-01-03 00:00:00'"


def test_plan_decimal_and_text_split_by():
    from decimal import Decimal

    plan = build_import_plan(
        URL, table="t", split_by="amt", num_mappers=2,
        bounds=(Decimal("0"), Decimal("10")),
    )
    ranged = [p for p in plan.predicates if "IS NULL" not in p]
    assert ranged[0].startswith("amt >= 0 AND amt < 5")
    assert ranged[-1].endswith("<= 10")

    plan = build_import_plan(
        URL, table="t", split_by="name", num_mappers=2, bounds=("alpha", "omega")
    )
    ranged = [p for p in plan.predicates if "IS NULL" not in p]
    assert len(ranged) == 2
    assert ranged[0].startswith("name >= 'alpha'")
    assert ranged[-1].endswith("<= 'omega'")


def test_plan_unsupported_bound_type_clear_error():
    with pytest.raises(EngineError, match="no splitter for --split-by bounds"):
        build_import_plan(
            URL, table="t", split_by="blob", num_mappers=2, bounds=(object(), object())
        )


def test_plan_split_by_must_be_in_columns():
    """--columns excluding the split column fails DB-side (outer WHERE over
    the projected subquery) — validated up front with a clear message."""
    with pytest.raises(EngineError, match="must be included in --columns"):
        build_import_plan(
            URL, table="t", columns=["a", "b"], split_by="id",
            num_mappers=2, bounds=(0, 10),
        )


# -- eval write statements (EvalSqlTool.executeStatement parity) ------------


def test_eval_write_statements_sqlite(tmp_path, capsys):
    """`eval -e <write sql>` executes through the DB-API path and reports
    the reference's update count line (EvalSqlTool.java:68-83)."""
    from sqoop_spark.cli import main as cli_main

    db = str(tmp_path / "eval.db")
    url = f"jdbc:sqlite:{db}"
    with sqlite3.connect(db) as c:
        c.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
        c.executemany("INSERT INTO t VALUES (?, ?)", [(i, f"v{i}") for i in range(5)])
        c.commit()

    assert cli_main(["eval", "--connect", url, "-e",
                     "UPDATE t SET v = 'x' WHERE id < 3"]) == 0
    assert "3 row(s) updated." in capsys.readouterr().out
    assert cli_main(["eval", "--connect", url, "-e", "DELETE FROM t WHERE id = 4"]) == 0
    assert "1 row(s) updated." in capsys.readouterr().out
    with sqlite3.connect(db) as c:
        rows = c.execute("SELECT id, v FROM t ORDER BY id").fetchall()
    assert rows == [(0, "x"), (1, "x"), (2, "x"), (3, "v3")]


def test_eval_statement_classifier_and_factory():
    from sqoop_spark.sources.jdbc import (
        dbapi_factory_for_url,
        is_result_set_statement,
    )

    assert is_result_set_statement("  SELECT 1")
    assert is_result_set_statement("WITH x AS (SELECT 1) SELECT * FROM x")
    assert is_result_set_statement("explain select 1")
    assert not is_result_set_statement("INSERT INTO t VALUES (1)")
    assert not is_result_set_statement("CREATE TABLE t (a INT)")
    assert not is_result_set_statement("")
    with pytest.raises(EngineError, match="no in-process DB-API driver"):
        dbapi_factory_for_url("jdbc:postgresql://db/x")


# -- DB-API partitioned import (embedded database end-to-end) ---------------


@pytest.fixture()
def sqlite_db(tmp_path):
    db = str(tmp_path / "src.db")
    with sqlite3.connect(db) as c:
        c.execute(
            "CREATE TABLE repos (id INTEGER PRIMARY KEY, repo TEXT, path TEXT,"
            " commit_sha TEXT, lang TEXT, content TEXT, event_seq INTEGER)"
        )
        c.executemany(
            "INSERT INTO repos VALUES (?, ?, ?, ?, ?, ?, ?)",
            [
                (i, f"org{i % 3}/r", f"src/f{i % 7}.py", f"c{i}", "py",
                 f"content-{i}" if i % 10 else None, i)
                for i in range(200)
            ],
        )
        c.commit()
    return db


def test_dbapi_import_partitioned(spark, sqlite_db):
    """One connection per split predicate, fetched executor-side; union of
    splits == whole table; NULL split row included; schema inferred."""
    from sqoop_spark.sources.jdbc import (
        build_import_plan,
        dbapi_factory_for_url,
        jdbc_import,
        probe_bounds,
    )

    url = f"jdbc:sqlite:{sqlite_db}"
    lo, hi = probe_bounds(spark, url, "SELECT MIN(id), MAX(id) FROM repos")
    assert (lo, hi) == (0, 199)
    plan = build_import_plan(
        url, table="repos", split_by="id", num_mappers=4, bounds=(lo, hi)
    )
    df = jdbc_import(spark, plan)
    assert df.rdd.getNumPartitions() == 5  # 4 ranges + IS NULL split
    got = df.toPandas().sort_values("id").reset_index(drop=True)
    assert len(got) == 200
    assert got.id.tolist() == list(range(200))
    assert got.content.isna().sum() == 20  # NULLs survive
    assert str(df.schema["event_seq"].dataType) == "LongType()"


def test_dbapi_import_query_and_where(spark, sqlite_db):
    from sqoop_spark.sources.jdbc import build_import_plan, jdbc_import

    url = f"jdbc:sqlite:{sqlite_db}"
    plan = build_import_plan(
        url,
        query="SELECT id, repo FROM repos WHERE id < 50 AND $CONDITIONS",
        split_by="id",
        num_mappers=2,
        bounds=(0, 49),
    )
    df = jdbc_import(spark, plan)
    assert df.count() == 50 and df.columns == ["id", "repo"]
    plan1 = build_import_plan(url, table="repos", where="id >= 150", num_mappers=1)
    assert jdbc_import(spark, plan1).count() == 50


def test_cli_import_export_sqlite_end_to_end(spark, sqlite_db, tmp_path, capsys):
    """The reference's in-process-database suite shape (HSQLDB there,
    sqlite here): CLI import --connect pulls the table into a lake table
    over split predicates; CLI export --connect writes it back out through
    the batched DB-API executor."""
    from sqoop_spark.cli import main as cli_main
    from sqoop_spark.lake import LakeTable

    url = f"jdbc:sqlite:{sqlite_db}"
    target = str(tmp_path / "lake_repos")
    rc = cli_main([
        "import", "--connect", url, "--table", "repos",
        "--split-by", "id", "-m", "4",
        "--target", target, "--check-column", "event_seq",
        "--merge-key", "repo,path", "--schema-from-source",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["events_seen"] == 200
    table = LakeTable.load(spark, target).read().toPandas()
    # newest-wins on (repo, path): 3 repos x 7 paths = 21 live keys
    assert len(table) == 21
    assert table.event_seq.max() == 199

    # export the lake table back into a fresh sqlite table (insert mode)
    out_db = str(tmp_path / "out.db")
    with sqlite3.connect(out_db) as c:
        c.execute(
            "CREATE TABLE repos_out (id INTEGER, repo TEXT, path TEXT,"
            " commit_sha TEXT, lang TEXT, content TEXT, event_seq INTEGER)"
        )
        c.commit()
    rc = cli_main([
        "export", "--source", target, "--target-table", "repos_out",
        "--connect", f"jdbc:sqlite:{out_db}",
    ])
    assert rc == 0
    with sqlite3.connect(out_db) as c:
        n, mx = c.execute("SELECT COUNT(*), MAX(event_seq) FROM repos_out").fetchone()
    assert (n, mx) == (21, 199)


def test_password_file_resolution(tmp_path, capsys, monkeypatch):
    """Credential parity with the reference's --password-file path
    (tool/BaseSqoopTool.java:87): file contents win over the env fallback,
    one trailing newline strips, loose file modes warn, and a plaintext
    --password draws the reference's insecurity warning."""
    from sqoop_spark.cli import PASSWORD_ENV_VAR, build_parser, resolve_password

    pf = tmp_path / "pw.txt"
    pf.write_text("s3cret\n")
    os.chmod(pf, 0o600)
    args = build_parser().parse_args(
        ["eval", "-e", "SELECT 1", "--password-file", str(pf)]
    )
    assert resolve_password(args) == "s3cret"
    err = capsys.readouterr().err
    assert "insecure" not in err and "chmod" not in err

    os.chmod(pf, 0o644)  # group/other-readable: warn, still resolve
    assert resolve_password(args) == "s3cret"
    assert "chmod 600 recommended" in capsys.readouterr().err

    # --password alone draws the insecurity warning
    args_pw = build_parser().parse_args(["eval", "-e", "SELECT 1", "--password", "p"])
    assert resolve_password(args_pw) == "p"
    assert "insecure" in capsys.readouterr().err
    # both at once: the reference's "but not both" error
    # (BaseSqoopTool.applyCredentialsOptions), strengthened in round 5 to
    # cover --password-alias as well
    args2 = build_parser().parse_args(
        ["eval", "-e", "SELECT 1", "--password", "p", "--password-file", str(pf)]
    )
    with pytest.raises(SystemExit, match="Only one of"):
        resolve_password(args2)

    monkeypatch.setenv(PASSWORD_ENV_VAR, "envpw")
    args3 = build_parser().parse_args(["eval", "-e", "SELECT 1"])
    assert resolve_password(args3) == "envpw"
    # file beats env when both are present
    assert resolve_password(args) == "s3cret"


def test_cli_eval_with_password_file_end_to_end(sqlite_db, tmp_path, capsys):
    """--password-file flows through main() to a --connect tool."""
    from sqoop_spark.cli import main as cli_main

    pf = tmp_path / "pw.txt"
    pf.write_text("ignored-by-sqlite\n")
    os.chmod(pf, 0o600)
    rc = cli_main([
        "eval", "--connect", f"jdbc:sqlite:{sqlite_db}",
        "-e", "SELECT COUNT(*) AS n FROM repos",
        "--password-file", str(pf),
    ])
    assert rc == 0
    assert "200" in capsys.readouterr().out


def test_cli_import_all_tables_connect(spark, sqlite_db, tmp_path, capsys):
    """import-all-tables --connect (round-3 ADVICE: the CLI branch was
    unreachable — the subparser lacked --connect): every table from the
    DB-API catalog imports into the warehouse dir; --path is optional
    when --connect is given, and omitting both is a clear error."""
    from sqoop_spark.cli import main as cli_main

    wh = str(tmp_path / "wh_all")
    rc = cli_main([
        "import-all-tables", "--connect", f"jdbc:sqlite:{sqlite_db}",
        "--warehouse-dir", wh,
    ])
    assert rc == 0
    got = json.loads(capsys.readouterr().out.strip())
    assert got == {"repos": 200}
    assert spark.read.parquet(os.path.join(wh, "repos")).count() == 200

    with pytest.raises(SystemExit, match="one of --path or --connect"):
        cli_main(["import-all-tables", "--warehouse-dir", wh])


def test_cli_import_sqlite_table_mode_single_split_warning(spark, sqlite_db, tmp_path, capsys):
    """Table-mode --connect without --split-by: single-split fallback with
    a warning (round-2 ADVICE), not the query-mode error."""
    from sqoop_spark.cli import main as cli_main

    url = f"jdbc:sqlite:{sqlite_db}"
    target = str(tmp_path / "lake_single")
    rc = cli_main([
        "import", "--connect", url, "--table", "repos",
        "--target", target, "--check-column", "event_seq",
        "--merge-key", "repo,path", "--schema-from-source",
    ])
    assert rc == 0
    cap = capsys.readouterr()
    assert json.loads(cap.out)["events_seen"] == 200
    assert "falling back to a single split" in cap.err


def test_jdbc_replica_bootstrap_and_expiry_resync(spark, scratch):
    """follow_changes(bootstrap_fn=jdbc_full_resync): the FIRST pass
    delivers the base snapshot itself (previously the JDBC replica
    started empty and rows never touched again were permanently missing),
    and a watermark expired under expire_snapshots triggers a
    truncate-and-load resync that removes rows deleted across the
    untracked gap — parity with replicate_to_table's lake-side resync."""
    from pyspark.sql import types as T

    from sqoop_spark.cdc.checkpoint import JobStore
    from sqoop_spark.lake import LakeTable
    from sqoop_spark.sources.jdbc import jdbc_apply_changes, jdbc_full_resync
    from sqoop_spark.streaming import follow_changes

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    src = LakeTable.create(
        spark, f"{scratch}/bsrc", schema, ["k"], num_buckets=2,
        properties={"order_column": "seq"},
    )
    db = os.path.join(scratch, "breplica.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, seq INTEGER, v TEXT)")
    conn.commit()
    conn.close()
    factory = _file_factory(db)
    store = JobStore(f"{scratch}/b_jobs")
    store.create("boot", {})

    def apply_fn(version, diff):
        jdbc_apply_changes(diff, factory, "t", ["k"], num_connections=1)

    def bootstrap_fn(version, snapshot):
        jdbc_full_resync(snapshot, factory, "t", num_connections=1)

    def replica_state():
        return dict(
            (k, (s, v))
            for k, s, v in sqlite3.connect(db).execute(
                "SELECT k, seq, v FROM t"
            ).fetchall()
        )

    def run():
        return follow_changes(
            src, store, "boot", apply_fn, bootstrap_fn=bootstrap_fn
        )

    src.append(spark.createDataFrame([(1, 1, "a"), (2, 2, "b"), (3, 3, "c")], schema))
    # first pass: bootstrap counts as one applied batch and the replica
    # holds the full base snapshot — not an empty table plus a watermark
    assert run() == 1
    assert replica_state() == {1: (1, "a"), 2: (2, "b"), 3: (3, "c")}

    op_schema = T.StructType(schema.fields + [T.StructField("op", T.StringType())])
    src.append_delta(spark.createDataFrame(
        [(1, 10, "a2", "upsert"), (2, 11, "b", "delete")], op_schema
    ))
    assert run() == 1  # incremental diff, not a resync
    assert replica_state() == {1: (10, "a2"), 3: (3, "c")}

    # changes across an expiry gap: k=3 deleted, k=7 added, then every
    # version the consumer could diff from is expired
    src.append_delta(spark.createDataFrame(
        [(3, 12, "c", "delete"), (7, 13, "g", "upsert")], op_schema
    ))
    src.compact()
    src.expire_snapshots(keep_last=1)
    # simulate a prior resync crashed mid-load: an orphaned staging table
    # must be dropped and rebuilt, not break or double the reload
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE t__resync_staging (k INTEGER, seq INTEGER, v TEXT)")
    conn.execute("INSERT INTO t__resync_staging VALUES (999, 999, 'orphan')")
    conn.commit()
    conn.close()
    assert run() == 1  # re-bootstrap resync, one applied batch
    # the gap delete of k=3 must not survive in the replica
    assert replica_state() == {1: (10, "a2"), 7: (13, "g")}
    # the staged swap cleaned up after itself
    left = sqlite3.connect(db).execute(
        "SELECT name FROM sqlite_master WHERE name LIKE '%staging%'"
    ).fetchall()
    assert left == []
    # steady state afterwards: nothing to do
    assert run() == 0


def test_password_file_exactly_one_trailing_newline(tmp_path):
    """Exactly ONE trailing newline is stripped (the documented contract):
    a password genuinely ending in a newline stays expressible via a
    doubled final newline — rstrip would have collapsed it."""
    from sqoop_spark.cli import build_parser, resolve_password

    pf = tmp_path / "pw.txt"
    cases = {
        "secret": "secret",
        "secret\n": "secret",
        "secret\r\n": "secret",
        "secret\n\n": "secret\n",
        "secret\r\n\r\n": "secret\r\n",
    }
    for content, want in cases.items():
        pf.write_text(content)
        os.chmod(pf, 0o600)
        args = build_parser().parse_args(
            ["eval", "-e", "SELECT 1", "--password-file", str(pf)]
        )
        assert resolve_password(args) == want, repr(content)
