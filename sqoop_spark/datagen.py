"""Change-event derivation & synthesis.

Two sources of CDC change events, both deterministic:

1. ``derive_change_events`` — maps the shared testdata ``events`` parquet
   (event_id, ts, user_id, event_type, value, props) into the engine's
   change-event shape ``(event_seq, event_ts, batch_id, op, repo, path,
   commit, lang, content, content_sha)`` using ONLY expressions that Spark
   and DuckDB compute identically (integer modulo, string concat, substr,
   chr, sha256). This makes every CDC semantic oracle-checkable: the driver
   runs the Spark plan and the DuckDB SQL side-by-side.

2. ``synthesize_change_events`` — generates N events directly on executors
   from ``spark.range`` + JVM expressions (xxhash64-seeded), never
   materializing the log. This is the 10^10-scale bench path: generation is
   embarrassingly parallel, deterministic from (seed, event_seq), and
   entirely whole-stage-codegen'd.

The key-space shape mirrors FIXTURES.md: a few hot repos hold a large share
of paths (exercises salting); content is pseudo-text with newlines, commas
and quotes (exercises normalization).
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["python", "java", "go", "rust", "js", "md"]

#: Event-schema columns every change-event DataFrame carries.
CHANGE_EVENT_COLUMNS = [
    "event_seq",
    "event_ts",
    "batch_id",
    "op",
    "repo",
    "path",
    "commit",
    "lang",
    "content",
    "content_sha",
]

# ---------------------------------------------------------------------------
# 1. Derivation from the shared `events` parquet (oracle-parity SQL)
# ---------------------------------------------------------------------------

# Stage 1 computes plain-string building blocks; stage 2 applies the hash via
# the __SHA__(column) marker so the same template serves Spark (sha2(c,256))
# and DuckDB (sha256(c)). Only ANSI constructs both engines share are used.
_DERIVE_TEMPLATE = """
SELECT
  event_seq,
  event_ts,
  batch_id,
  op,
  repo,
  path,
  substr(__SHA__(commit_src), 1, 40) AS commit,
  lang,
  content,
  __SHA__(content) AS content_sha
FROM (
  SELECT
    event_id AS event_seq,
    ts AS event_ts,
    CAST(floor(event_id / {batch_size}) AS BIGINT) AS batch_id,
    CASE WHEN event_id % 11 = 7 THEN 'delete' ELSE 'upsert' END AS op,
    CASE WHEN user_id % 3 = 0
         THEN 'org0/hotrepo'
         ELSE 'org' || CAST(user_id % 7 AS STRING)
              || '/repo' || CAST(user_id % 5 AS STRING)
    END AS repo,
    'src/pkg' || CAST(event_id % 13 AS STRING)
      || '/file' || CAST(event_id % {n_paths} AS STRING)
      || CASE CAST(event_id % 6 AS INT)
           WHEN 0 THEN '.py' WHEN 1 THEN '.java' WHEN 2 THEN '.go'
           WHEN 3 THEN '.rs' WHEN 4 THEN '.js' ELSE '.md' END AS path,
    'c' || CAST(event_id AS STRING) AS commit_src,
    CASE CAST(event_id % 6 AS INT)
      WHEN 0 THEN 'python' WHEN 1 THEN 'java' WHEN 2 THEN 'go'
      WHEN 3 THEN 'rust' WHEN 4 THEN 'js' ELSE 'md' END AS lang,
    'event ' || CAST(event_id AS STRING) || ' "' || event_type || '",'
      || chr(10) || substr(props, 1, 1 + CAST(event_id % 9 AS INT))
      || chr(10) || repeat('x', CAST(event_id % 37 AS INT)) AS content
  FROM {events_rel}
) t
"""


def derive_events_sql(
    events_rel: str,
    dialect: str,
    batch_size: int | str = 1000,
    n_paths: int = 97,
) -> str:
    """Render the derivation SQL for ``dialect`` in {'spark', 'duckdb'}.

    ``batch_size`` may be a SQL scalar-subquery string (the adaptive
    fixture sizing in __spark_entry__) — it lands inside the batch_id
    divisor."""
    sql = _DERIVE_TEMPLATE.format(
        events_rel=events_rel, batch_size=batch_size, n_paths=n_paths
    )
    if dialect == "spark":
        return re.sub(r"__SHA__\((\w+)\)", r"sha2(\1, 256)", sql)
    if dialect == "duckdb":
        return re.sub(r"__SHA__\((\w+)\)", r"sha256(\1)", sql)
    raise ValueError(f"unknown dialect: {dialect}")


def derive_change_events(
    spark: SparkSession,
    sf_dir: str,
    batch_size: int = 1000,
    n_paths: int = 97,
) -> DataFrame:
    """Read ``{sf_dir}/events.parquet`` and derive the CDC change-event tail."""
    view = "sqoop_spark_events_src"
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(view)
    return spark.sql(
        derive_events_sql(view, "spark", batch_size=batch_size, n_paths=n_paths)
    )


# ---------------------------------------------------------------------------
# 2. Executor-side synthesis at arbitrary scale (bench path)
# ---------------------------------------------------------------------------


def synthesize_change_events(
    spark: SparkSession,
    n_events: int,
    seed: int = 42,
    n_repos: int = 200,
    n_paths: int = 5000,
    hot_repos: int = 3,
    hot_fraction: float = 0.3,
    delete_pct: int = 8,
    batch_size: int = 1_000_000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic change-event stream, generated on executors.

    Every column is a pure function of (seed, event_seq) built from
    ``xxhash64`` — no Python in the loop, no driver materialization; at
    10^10 events this is a streaming source, which is exactly how the
    reference's perftest synthesizes its 10^8-row export input
    (src/perftest/ExportStressTest.java:43-44) but distributed.

    Skew: ``hot_fraction`` of events land in ``hot_repos`` repos (mirrors the
    hot-repo salting requirement; the reference's TextSplitter warns about
    exactly this imbalance, mapreduce/db/TextSplitter.java:69-72).
    """
    rng = spark.range(0, n_events, 1, num_partitions or spark.sparkContext.defaultParallelism)
    s = F.lit(str(seed))
    sid = F.col("id")

    def h(tag: str):
        return F.abs(F.xxhash64(s, sid, F.lit(tag)))

    hot_cut = int(hot_fraction * 1000)
    repo_idx = F.when(h("skew") % 1000 < hot_cut, h("hot") % hot_repos).otherwise(
        hot_repos + (h("repo") % (n_repos - hot_repos))
    )
    path_idx = h("path") % n_paths
    lang_idx = (path_idx % len(LANGS)).cast("int")
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]), lang_idx + 1)
    ext = F.element_at(
        F.array(*[F.lit(x) for x in [".py", ".java", ".go", ".rs", ".js", ".md"]]),
        lang_idx + 1,
    )
    chunk = F.sha2(F.concat(s, F.lit("t"), sid.cast("string")), 256)
    content_len = (h("len") % 1991 + 10).cast("int")
    content = F.substring(
        F.concat_ws(
            ",\n",
            chunk,
            F.reverse(chunk),
            F.repeat(F.concat(chunk, F.lit('"\n')), 30),
        ),
        1,
        content_len,
    )

    return rng.select(
        sid.alias("event_seq"),
        F.timestamp_micros(
            F.lit(1704067200000000) + sid * 1_000_000  # 2024-01-01T00:00:00Z
        ).alias("event_ts"),
        (sid / batch_size).cast("bigint").alias("batch_id"),
        F.when(h("op") % 100 < delete_pct, F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        F.concat(F.lit("org"), (repo_idx % 19).cast("string"), F.lit("/repo"), repo_idx.cast("string")).alias("repo"),
        F.concat(
            F.lit("src/pkg"), (path_idx % 23).cast("string"), F.lit("/file"), path_idx.cast("string"), ext
        ).alias("path"),
        F.substring(F.sha2(F.concat(s, F.lit("c"), sid.cast("string")), 256), 1, 40).alias(
            "commit"
        ),
        lang.alias("lang"),
        content.alias("content"),
        F.sha2(content, 256).alias("content_sha"),
    )


# ---------------------------------------------------------------------------
# 3. Pure-pandas replay oracle (test-scale reference state)
# ---------------------------------------------------------------------------


def replay_oracle(events_pdf: pd.DataFrame) -> pd.DataFrame:
    """Replay change events in pure pandas — the independent oracle.

    Sort by event_seq (the pinned total order — the deterministic tightening
    of the reference reducer's last-seen-wins, MergeReducerBase.java:31-51),
    apply insert/update/delete per (repo, path), return the final table.
    Mirrors the reference's read-everything-back assertion style
    (TestIncrementalImport.assertDirOfNumbers, :316-361).
    """
    state: dict[tuple[str, str], dict] = {}
    for row in events_pdf.sort_values("event_seq").to_dict("records"):
        key = (row["repo"], row["path"])
        if row["op"] == "delete":
            state.pop(key, None)
        else:
            state[key] = row
    cols = ["repo", "path", "commit", "lang", "content", "content_sha", "event_seq", "event_ts"]
    if not state:
        return pd.DataFrame(columns=cols)
    out = pd.DataFrame(list(state.values()))
    for c in out.columns:
        if c == "content_sha":
            out[c] = [
                hashlib.sha256(v.encode()).hexdigest() if s is None else s
                for v, s in zip(out["content"], out["content_sha"])
            ]
    return out[cols].sort_values(["repo", "path"]).reset_index(drop=True)
