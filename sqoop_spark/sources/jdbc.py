"""Partitioned JDBC source + batched JDBC sink — Sqoop's core direction.

The reference is a JDBC↔lake tool at heart: a parallel table/query import
driven by per-split WHERE clauses (manager/SqlManager.java:655-691
importTable → mapreduce/db/DataDrivenDBInputFormat.java:140-254 getSplits),
and a batched INSERT/UPDATE/UPSERT export
(mapreduce/AsyncSqlOutputFormat.java:58-85 batching knobs;
mapreduce/ExportBatchOutputFormat.java:95-135 insert statement;
mapreduce/UpdateOutputFormat.java:183-206 update statement;
mapreduce/mysql/MySQLUpsertOutputFormat.java:95-140 upsert statement).

Spark-first mapping:

- **Import** = ``spark.read.jdbc(url, dbtable, predicates=[...])``. Spark
  opens one connection PER PREDICATE and scans them in parallel — exactly
  the reference's one-JDBC-connection-per-map-task model — so the
  predicate list IS the split plan, and we build it with the same
  interval math (``partitioning.integer_split_predicates``). Everything
  that can be unit-tested without a live database (predicate construction,
  bounding-query text, option assembly, error parity) is a pure function
  over a ``JdbcImportPlan``; the live read is a two-line wrapper.
- **Export** = either Spark's native writer (``df.write.jdbc`` with
  ``batchsize`` = records-per-statement — INSERT only), or, for the
  update/upsert modes Spark's writer cannot express, a
  ``foreachPartition`` DB-API executor that mirrors AsyncSqlRecordWriter:
  multi-row statements of ``records_per_statement`` rows, a commit every
  ``statements_per_transaction`` statements (−1 = one transaction per
  partition, AsyncSqlOutputFormat.UNLIMITED_STATEMENTS_PER_TRANSACTION).
  The executor takes any picklable zero-arg connection factory, so it is
  tested end-to-end against in-process sqlite3 and works unchanged against
  any DB-API driver on a real cluster.

At 100 TB the import side is bounded by the source database, not Spark:
``num_mappers`` is deliberately explicit (the reference defaults to 4,
SqoopOptions.java:313) because a thousand concurrent scans would be a
denial of service against the OLTP primary — partition count here is a
*courtesy contract* with the source, unlike lake scans where more is free.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Iterable, Iterator, Sequence

from sqoop_spark.errors import EngineError
from sqoop_spark.partitioning import split_predicates_for_bounds

CONDITIONS_TOKEN = "$CONDITIONS"

#: AsyncSqlOutputFormat.java:58-85 defaults.
DEFAULT_RECORDS_PER_STATEMENT = 100
DEFAULT_STATEMENTS_PER_TRANSACTION = 100
UNLIMITED_STATEMENTS_PER_TRANSACTION = -1


# ---------------------------------------------------------------------------
# import side
# ---------------------------------------------------------------------------


@dataclass
class JdbcImportPlan:
    """Everything ``spark.read.jdbc`` needs, precomputed and inspectable."""

    url: str
    dbtable: str
    predicates: list[str] | None  # None → single split (no bounding probe)
    properties: dict[str, str] = field(default_factory=dict)
    bounds_sql: str | None = None  # the MIN/MAX probe this plan was built from


def bounding_query(
    split_by: str,
    table: str | None = None,
    query: str | None = None,
    where: str | None = None,
    boundary_query: str | None = None,
) -> str:
    """The MIN/MAX bounding probe (DataDrivenDBInputFormat.java:234-254;
    free-form derivation manager/SqlManager.java:731-747). A user
    ``--boundary-query`` wins verbatim."""
    if boundary_query:
        return boundary_query
    if query is not None:
        inner = query.replace(CONDITIONS_TOKEN, "(1 = 1)")
        return f"SELECT MIN({split_by}), MAX({split_by}) FROM ({inner}) AS t1"
    sql = f"SELECT MIN({split_by}), MAX({split_by}) FROM {table}"
    if where:
        sql += f" WHERE {where}"
    return sql


def build_import_plan(
    url: str,
    table: str | None = None,
    query: str | None = None,
    columns: Sequence[str] | None = None,
    where: str | None = None,
    split_by: str | None = None,
    num_mappers: int = 4,
    bounds: tuple[int, int] | None = None,
    boundary_query: str | None = None,
    split_limit: int = -1,
    fetch_size: int = 1000,
    username: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    properties: dict[str, str] | None = None,
) -> JdbcImportPlan:
    """Build the partitioned-read plan — pure function, no connection.

    Mirrors ImportTool/DataDrivenImportJob validation:
    - exactly one of ``table`` / ``query``;
    - a free-form ``query`` must contain the ``$CONDITIONS`` token
      (DataDrivenImportJob.java:195-223 error parity);
    - ``num_mappers > 1`` requires ``split_by`` (same source);
    - ``num_mappers <= 1`` skips the bounding probe entirely and emits no
      predicates (the 1=1 single-split fast path,
      DataDrivenDBInputFormat.java:151-158).

    ``bounds`` are the (lo, hi) MIN/MAX values; probe them with
    ``probe_bounds`` (live) or pass them directly in tests.
    """
    if (table is None) == (query is None):
        raise EngineError("exactly one of table / query is required")
    if query is not None and CONDITIONS_TOKEN not in query:
        raise EngineError(
            f"Query [{query}] must contain '{CONDITIONS_TOKEN}' in WHERE clause."
        )

    props = dict(properties or {})
    if username is not None:
        props["user"] = username
    if password is not None:
        props["password"] = password
    if driver is not None:
        props["driver"] = driver
    props.setdefault("fetchsize", str(fetch_size))

    if query is not None:
        # predicates apply as WHERE on the subquery's output — equivalent to
        # per-split $CONDITIONS substitution when split_by is projected.
        dbtable = f"({query.replace(CONDITIONS_TOKEN, '(1 = 1)')}) AS SQOOP_SUBQUERY"
    elif columns or where:
        sel = ", ".join(columns) if columns else "*"
        dbtable = f"(SELECT {sel} FROM {table}"
        if where:
            dbtable += f" WHERE {where}"
        dbtable += ") AS SQOOP_SUBQUERY"
    else:
        dbtable = table  # plain table scan — lets the source prune natively

    if num_mappers <= 1:
        return JdbcImportPlan(url, dbtable, None, props, None)
    if split_by is None:
        raise EngineError(
            "When importing query results in parallel, you must specify --split-by."
        )
    bsql = bounding_query(split_by, table, query, where, boundary_query)
    if bounds is None:
        raise EngineError(
            "split bounds required: probe them with probe_bounds(spark, url, "
            "plan.bounds_sql) or pass bounds=(lo, hi)"
        )
    if columns and split_by not in columns:
        # Predicates apply as an outer WHERE on the subquery, so a split
        # column missing from the projection would fail database-side (the
        # reference injects $CONDITIONS before projection instead) —
        # validate up front with a clear message.
        raise EngineError(
            f"--split-by column {split_by!r} must be included in --columns "
            "(split predicates apply over the projected subquery)"
        )
    lo, hi = bounds
    if lo is None or hi is None:
        # all-NULL split column: one IS NULL split (getSplits NULL handling)
        return JdbcImportPlan(url, dbtable, [f"{split_by} IS NULL"], props, bsql)
    try:
        # typed splitter dispatch (integer/date/decimal/text/float/boolean)
        preds = split_predicates_for_bounds(split_by, lo, hi, num_mappers, split_limit)
    except ValueError as e:
        raise EngineError(str(e)) from None
    # NULL rows must not be dropped by the range predicates — the reference
    # appends an IS NULL split (DataDrivenDBInputFormat.java:204-210).
    preds.append(f"{split_by} IS NULL")
    return JdbcImportPlan(url, dbtable, preds, props, bsql)


def probe_bounds(spark, url: str, bounds_sql: str, properties: dict | None = None):
    """Run the bounding query (one row, two columns) — Spark's JVM JDBC
    reader for real vendor URLs, the in-process DB-API path for URLs that
    have no jar here (jdbc:sqlite:, the suite's HSQLDB analog)."""
    try:
        factory = dbapi_factory_for_url(url)
    except EngineError:
        factory = None
    if factory is not None:
        conn = factory()
        try:
            cur = conn.cursor()
            cur.execute(bounds_sql)
            row = cur.fetchone()
            return row[0], row[1]
        finally:
            conn.close()
    row = (
        spark.read.jdbc(url, f"({bounds_sql}) AS SQOOP_BOUNDS", properties=properties or {})
        .collect()[0]
    )
    return row[0], row[1]


def jdbc_import(spark, plan: JdbcImportPlan):
    """Execute the plan: one connection per predicate, scanned in parallel.

    Vendor URLs go through Spark's JVM JDBC relation (predicate list =
    split plan). URLs with an in-process DB-API driver but no JVM jar
    (jdbc:sqlite:) go through ``dbapi_import`` — same one-connection-per-
    split contract, fetched executor-side — so the CLI import runs
    end-to-end against the embedded database the way the reference's own
    suites run against in-process HSQLDB."""
    try:
        factory = dbapi_factory_for_url(plan.url)
    except EngineError:
        factory = None
    if factory is not None:
        return dbapi_import(spark, factory, plan)
    if plan.predicates is None:
        return spark.read.jdbc(plan.url, plan.dbtable, properties=plan.properties)
    return spark.read.jdbc(
        plan.url, plan.dbtable, predicates=list(plan.predicates), properties=plan.properties
    )


def _infer_schema_from_rows(names: Sequence[str], rows: Sequence[Sequence]) -> "T.StructType":
    """Spark schema from a driver-side sample: per column, the first
    non-NULL Python value decides the type (all-NULL → string). Mirrors
    the reference's 1=0 probe + ResultSetMetaData mapping
    (manager/SqlManager.java:106-114 + ConnManager.toJavaType) for
    DB-API drivers whose type_code metadata is vendor-noise."""
    import datetime as _dt
    import decimal as _dec

    from pyspark.sql import types as T

    def spark_type(v):
        if isinstance(v, bool):
            return T.BooleanType()
        if isinstance(v, int):
            return T.LongType()
        if isinstance(v, float):
            return T.DoubleType()
        if isinstance(v, (bytes, bytearray, memoryview)):
            return T.BinaryType()
        if isinstance(v, _dt.datetime):
            return T.TimestampType()
        if isinstance(v, _dt.date):
            return T.DateType()
        if isinstance(v, _dec.Decimal):
            return T.DecimalType(38, 18)
        return T.StringType()

    fields = []
    for i, name in enumerate(names):
        sample = next((r[i] for r in rows if r[i] is not None), None)
        fields.append(T.StructField(name, spark_type(sample), True))
    return T.StructType(fields)


def dbapi_import(
    spark,
    conn_factory: Callable[[], Any],
    plan: JdbcImportPlan,
    schema=None,
    fetch_size: int = 1000,
    infer_rows: int = 100,
):
    """Partitioned import over a DB-API connection factory.

    One executor task per split predicate, each opening its own
    connection and streaming ``fetchmany(fetch_size)`` batches — the
    reference's one-JDBC-connection-per-map-task model
    (mapreduce/db/DBRecordReader.java) without the JVM driver jar. The
    deliberate RDD use: per-partition imperative DB-API calls are the one
    shape the DataFrame reader cannot express without a jar; everything
    downstream is a DataFrame again. Schema comes from ``schema`` or a
    bounded driver-side probe (``LIMIT infer_rows``).
    """
    from pyspark.sql import functions as F  # noqa: F401  (docstring parity)

    preds = list(plan.predicates) if plan.predicates else ["1 = 1"]
    base_sql = f"SELECT * FROM {plan.dbtable}"

    if schema is None:
        conn = conn_factory()
        try:
            cur = conn.cursor()
            cur.execute(f"{base_sql} LIMIT {int(infer_rows)}")
            names = [d[0] for d in cur.description]
            sample = cur.fetchall()
        finally:
            conn.close()
        schema = _infer_schema_from_rows(names, sample)

    def fetch(idx_iter):
        for i in idx_iter:
            conn = conn_factory()
            try:
                cur = conn.cursor()
                cur.execute(f"{base_sql} WHERE {preds[i]}")
                while True:
                    batch = cur.fetchmany(fetch_size)
                    if not batch:
                        break
                    for row in batch:
                        yield tuple(row)
            finally:
                conn.close()

    rdd = spark.sparkContext.parallelize(range(len(preds)), len(preds)).mapPartitions(fetch)
    return spark.createDataFrame(rdd, schema=schema)


# ---------------------------------------------------------------------------
# export side — statement builders (text parity with the reference)
# ---------------------------------------------------------------------------


def insert_statement(table: str, cols: Sequence[str], num_rows: int = 1) -> str:
    """INSERT INTO t (a, b) VALUES (?, ?)[, (?, ?)...] —
    ExportBatchOutputFormat.getInsertStatement (:95-135) extended with the
    multi-row VALUES shape the MySQL path uses for records-per-statement."""
    cols_sql = ", ".join(cols)
    one = "(" + ", ".join("?" for _ in cols) + ")"
    values = ", ".join(one for _ in range(max(1, num_rows)))
    return f"INSERT INTO {table} ({cols_sql}) VALUES {values}"


def update_statement(table: str, cols: Sequence[str], update_keys: Sequence[str]) -> str:
    """UPDATE t SET a=?, b=? WHERE k1=? AND k2=? —
    UpdateOutputFormat.getUpdateStatement (:183-206). ``cols`` are the SET
    columns (non-key payload); rows with no key match are silently ignored
    by the database, which is exactly the reference's UpdateOnly contract."""
    set_sql = ", ".join(f"{c}=?" for c in cols)
    where_sql = " AND ".join(f"{k}=?" for k in update_keys)
    return f"UPDATE {table} SET {set_sql} WHERE {where_sql}"


def delete_statement(table: str, keys: Sequence[str]) -> str:
    """DELETE FROM t WHERE k1=? AND k2=? — the changelog-replication delete
    shape. The reference has no delete export (SqoopOptions.UpdateMode is
    insert/update/upsert only); outbound CDC needs one."""
    where_sql = " AND ".join(f"{k}=?" for k in keys)
    return f"DELETE FROM {table} WHERE {where_sql}"


def mysql_upsert_statement(table: str, cols: Sequence[str], num_rows: int = 1) -> str:
    """INSERT ... ON DUPLICATE KEY UPDATE c=VALUES(c) —
    MySQLUpsertOutputFormat.getUpdateStatement (:95-140), multi-row."""
    base = insert_statement(table, cols, num_rows)
    dup = ", ".join(f"{c}=VALUES({c})" for c in cols)
    return f"{base} ON DUPLICATE KEY UPDATE {dup}"


def oracle_merge_statement(
    table: str, cols: Sequence[str], update_keys: Sequence[str]
) -> str:
    """MERGE INTO t USING dual ON (k=?) WHEN MATCHED ... WHEN NOT MATCHED
    ... — OracleUpsertOutputFormat semantics (manager/OracleManager.java:
    473-486 dispatch)."""
    on_sql = " AND ".join(f"{table}.{k}=?" for k in update_keys)
    non_keys = [c for c in cols if c not in set(update_keys)]
    set_sql = ", ".join(f"{table}.{c}=?" for c in non_keys)
    ins_cols = ", ".join(cols)
    ins_vals = ", ".join("?" for _ in cols)
    return (
        f"MERGE INTO {table} USING dual ON ({on_sql}) "
        f"WHEN MATCHED THEN UPDATE SET {set_sql} "
        f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


def sqlite_upsert_statement(
    table: str, cols: Sequence[str], update_keys: Sequence[str]
) -> str:
    """SQLite dialect of the vendor upsert (INSERT ... ON CONFLICT DO
    UPDATE) — lets the executemany export path run end-to-end against the
    in-process sqlite3 used by the test suite."""
    base = insert_statement(table, cols, 1)
    keys_sql = ", ".join(update_keys)
    non_keys = [c for c in cols if c not in set(update_keys)]
    dup = ", ".join(f"{c}=excluded.{c}" for c in non_keys)
    return f"{base} ON CONFLICT({keys_sql}) DO UPDATE SET {dup}"


# ---------------------------------------------------------------------------
# export side — the batched DB-API executor (AsyncSqlRecordWriter analog)
# ---------------------------------------------------------------------------


def _chunks(it: Iterable, size: int) -> Iterator[list]:
    buf: list = []
    for x in it:
        buf.append(x)
        if len(buf) >= size:
            yield buf
            buf = []
    if buf:
        yield buf


def export_partition(
    rows: Iterable,
    conn_factory: Callable[[], Any],
    sql_for_batch: Callable[[int], str],
    params_per_row: int,
    records_per_statement: int = DEFAULT_RECORDS_PER_STATEMENT,
    statements_per_transaction: int = DEFAULT_STATEMENTS_PER_TRANSACTION,
    row_params: Callable[[Any], Sequence] | None = None,
) -> int:
    """Write one partition's rows through a DB-API connection.

    Mirrors AsyncSqlRecordWriter: ``records_per_statement`` rows fold into
    one multi-row statement (``sql_for_batch(n)`` renders the SQL for an
    n-row batch; the final short batch gets its own text, as the reference
    regenerates the statement for the tail); a commit lands every
    ``statements_per_transaction`` statements; −1 defers the single commit
    to close (UNLIMITED_STATEMENTS_PER_TRANSACTION). Returns rows written.

    Runs on executors via ``foreachPartition`` — ``conn_factory`` must be a
    picklable zero-arg callable (a driver-specific ``connect`` closure).
    """
    rp = row_params or (lambda r: list(r))
    conn = conn_factory()
    rows_out = 0
    stmts = 0
    try:
        cur = conn.cursor()
        for batch in _chunks(rows, max(1, records_per_statement)):
            flat: list = []
            for r in batch:
                p = list(rp(r))
                if len(p) != params_per_row:
                    raise EngineError(
                        f"row has {len(p)} params, statement expects {params_per_row}"
                    )
                flat.extend(p)
            cur.execute(sql_for_batch(len(batch)), flat)
            rows_out += len(batch)
            stmts += 1
            if (
                statements_per_transaction != UNLIMITED_STATEMENTS_PER_TRANSACTION
                and stmts % max(1, statements_per_transaction) == 0
            ):
                conn.commit()
        conn.commit()
        return rows_out
    finally:
        conn.close()


def jdbc_export(
    df,
    conn_factory: Callable[[], Any],
    table: str,
    mode: str = "insert",
    update_key: str | None = None,
    dialect: str = "generic",
    records_per_statement: int = DEFAULT_RECORDS_PER_STATEMENT,
    statements_per_transaction: int = DEFAULT_STATEMENTS_PER_TRANSACTION,
) -> None:
    """Distributed export of ``df`` through per-partition DB-API batches.

    ``mode``: "insert" (blind append, ExportTool default), "updateonly"
    (``--update-key``; unmatched rows silently ignored), "allowinsert"
    (vendor upsert; dialect "mysql" or "sqlite"). Column order follows
    ``df.columns``. The statement text is rendered once per batch size —
    all loops below run executor-side over Arrow-fed partitions.
    """
    cols = list(df.columns)
    keys = [k.strip() for k in (update_key or "").split(",") if k.strip()]
    if mode in ("updateonly", "allowinsert") and not keys:
        raise EngineError(f"--update-key is required for mode {mode}")

    if mode == "insert":
        sql_for_batch = lambda n: insert_statement(table, cols, n)  # noqa: E731
        params_per_row = len(cols)
        reorder = None
    elif mode == "updateonly":
        # UPDATE has no multi-row VALUES form — one statement per row (the
        # reference batches these via JDBC addBatch instead; per-transaction
        # batching below still amortizes commits).
        records_per_statement = 1
        non_keys = [c for c in cols if c not in set(keys)]
        stmt = update_statement(table, non_keys, keys)
        sql_for_batch = lambda n: stmt  # noqa: E731
        params_per_row = len(cols)
        idx = [cols.index(c) for c in non_keys] + [cols.index(k) for k in keys]
        reorder = lambda r: [r[i] for i in idx]  # noqa: E731
    elif mode == "allowinsert":
        if dialect == "mysql":
            sql_for_batch = lambda n: mysql_upsert_statement(table, cols, n)  # noqa: E731
        elif dialect == "sqlite":
            # ON CONFLICT upsert: single-row statements (see updateonly)
            records_per_statement = 1
            stmt = sqlite_upsert_statement(table, cols, keys)
            sql_for_batch = lambda n: stmt  # noqa: E731
        else:
            raise EngineError(
                f"allowinsert needs a vendor dialect (mysql/sqlite), got {dialect!r}"
            )
        params_per_row = len(cols)
        reorder = None
    else:
        raise EngineError(f"unknown export mode {mode!r}")

    def _run(rows):
        export_partition(
            rows,
            conn_factory,
            sql_for_batch,
            params_per_row,
            records_per_statement,
            statements_per_transaction,
            row_params=reorder,
        )

    df.foreachPartition(_run)


def jdbc_full_resync(
    snapshot,
    conn_factory: Callable[[], Any],
    table: str,
    dialect: str = "sqlite",
    statements_per_transaction: int = DEFAULT_STATEMENTS_PER_TRANSACTION,
    num_connections: int | None = None,
) -> None:
    """Staged full resync of a JDBC replica from a source snapshot — the
    bootstrap/expiry path of outbound replication (the JDBC analog of
    ``replicate_to_table``'s snapshot-plus-anti-join resync), shaped like
    the reference's ``--staging-table`` export
    (mapreduce/ExportJobBase.java: load into staging, move in one final
    transaction): the snapshot lands in ``<table>__resync_staging``
    through the distributed batched INSERT path while readers keep the
    old replica, then ONE transaction swaps the contents
    (``DELETE FROM t; INSERT INTO t SELECT * FROM staging``) — rows
    deleted at the source while the consumer was not tracking disappear,
    and concurrent readers never observe the hours-empty window a
    delete-then-reload would expose. Idempotent under crash-retry: the
    consumer's watermark is saved only AFTER a completed resync, the
    orphaned staging table is dropped on the next attempt, and a crash
    inside the swap transaction rolls back to the old replica state."""
    staging = f"{table}__resync_staging"
    conn = conn_factory()
    try:
        cur = conn.cursor()
        cur.execute(f"DROP TABLE IF EXISTS {staging}")
        cur.execute(f"CREATE TABLE {staging} AS SELECT * FROM {table} WHERE 1=0")
        conn.commit()
    finally:
        conn.close()
    if num_connections is not None:
        snapshot = snapshot.coalesce(num_connections)
    jdbc_export(
        snapshot,
        conn_factory,
        staging,
        mode="insert",
        dialect=dialect,
        statements_per_transaction=statements_per_transaction,
    )
    conn = conn_factory()
    try:
        cur = conn.cursor()
        cur.execute(f"DELETE FROM {table}")
        cur.execute(f"INSERT INTO {table} SELECT * FROM {staging}")
        conn.commit()
        cur.execute(f"DROP TABLE {staging}")
        conn.commit()
    finally:
        conn.close()


def jdbc_apply_changes(
    diff,
    conn_factory: Callable[[], Any],
    table: str,
    key_cols: Sequence[str],
    dialect: str = "sqlite",
    statements_per_transaction: int = DEFAULT_STATEMENTS_PER_TRANSACTION,
    num_connections: int | None = None,
) -> None:
    """Apply one changelog diff (``LakeTable.changes_between`` schema: table
    columns + ``_change``) to a JDBC replica: inserts/updates go through the
    vendor upsert dialect, deletes through keyed DELETE — the outbound-CDC
    sink the reference's insert/update/upsert export trio cannot express.

    A diff carries one row per key and every op is an absolute state, so
    re-applying it after a crash is idempotent: the at-least-once delivery
    of ``follow_changes`` (apply before watermark save) upgrades to
    effectively-once without any replica-side fence. Both legs run
    executor-side over partitions; nothing is collected to the driver.

    ``num_connections`` caps parallel connections against the replica —
    the same courtesy contract as the import side's ``num_mappers``
    (single-writer stores like sqlite need 1).
    """
    from pyspark.sql import functions as F

    if num_connections is not None:
        diff = diff.coalesce(num_connections)
    # The diff is a full-outer join over the changed buckets' resolved
    # states — materialize it ONCE for the two legs instead of recomputing
    # that join for each (upserts, then deletes).
    diff = diff.persist()
    try:
        upserts = diff.filter(F.col("_change") != "delete").drop("_change")
        jdbc_export(
            upserts,
            conn_factory,
            table,
            mode="allowinsert",
            update_key=",".join(key_cols),
            dialect=dialect,
            statements_per_transaction=statements_per_transaction,
        )
        stmt = delete_statement(table, key_cols)
        n_keys = len(key_cols)

        def _run(rows):
            export_partition(
                rows,
                conn_factory,
                lambda n: stmt,
                n_keys,
                records_per_statement=1,
                statements_per_transaction=statements_per_transaction,
            )

        diff.filter(F.col("_change") == "delete").select(
            *key_cols
        ).foreachPartition(_run)
    finally:
        diff.unpersist()


#: Statement heads that yield a result set (the eval read path); anything
#: else goes through execute-with-update-count (EvalSqlTool.java:68-83:
#: stmt.execute() dispatching on resultType).
_RESULT_SET_HEADS = ("select", "with", "show", "describe", "desc", "values", "explain")


def is_result_set_statement(sql: str) -> bool:
    head = sql.lstrip().split(None, 1)
    return bool(head) and head[0].lower().rstrip("(") in _RESULT_SET_HEADS


def dbapi_factory_for_url(url: str) -> Callable[[], Any]:
    """Map a jdbc: URL to a zero-arg DB-API connection factory for vendors
    with an in-process Python driver (sqlite — the suite's HSQLDB analog).
    Other vendors supply their own factory (the ``jdbc_export`` contract:
    any picklable zero-arg ``connect`` closure)."""
    if url.startswith("jdbc:sqlite:"):
        path = url[len("jdbc:sqlite:") :]

        def _connect():
            import sqlite3

            return sqlite3.connect(path)

        return _connect
    raise EngineError(
        f"no in-process DB-API driver for {url!r}; pass a connection "
        "factory to sqoop_spark.sources.jdbc.eval_statement instead"
    )


def eval_statement(conn_factory: Callable[[], Any], sql: str) -> int | None:
    """Execute one WRITE statement with an update-count report —
    EvalSqlTool.run (tool/EvalSqlTool.java:55-95): execute, read the
    update count, commit. Returns the count (None when the driver reports
    none, mirroring the reference's updateCount == -1 terminator)."""
    conn = conn_factory()
    try:
        cur = conn.cursor()
        cur.execute(sql)
        count = cur.rowcount
        conn.commit()
        return count if count is not None and count >= 0 else None
    finally:
        conn.close()


def jdbc_export_spark(
    df,
    url: str,
    table: str,
    records_per_statement: int = DEFAULT_RECORDS_PER_STATEMENT,
    properties: dict | None = None,
    mode: str = "append",
) -> None:
    """INSERT export through Spark's native JDBC writer.

    ``batchsize`` is the writer's records-per-statement knob (the
    AsyncSqlOutputFormat RECORDS_PER_STATEMENT analog); update/upsert modes
    need ``jdbc_export`` (Spark's writer cannot express them)."""
    props = dict(properties or {})
    props["batchsize"] = str(records_per_statement)
    df.write.jdbc(url, table, mode=mode, properties=props)
