"""Custom stateful streaming operator: per-key latest-state (CDC cache).

``latest_state_stream`` maintains the newest-wins state of every
``(repo, path)`` key *inside Spark's state store* via
``applyInPandasWithState`` — a streaming-native materialization of the same
newest-wins semantics the batch merge implements (cdc/merge.py), useful as
a low-latency CDC cache in front of the lake table.

Semantics per micro-batch and key:
- fold the batch's rows with the persisted state, keeping the row with the
  highest ``event_seq`` (ties keep the already-applied state — a
  re-delivered event is identical by construction; within a batch ties
  prefer 'upsert', matching LakeTable._resolve's ``_op`` desc order);
- emit the key's new state iff it changed (output mode ``update``);
- a winning delete keeps a tombstone in state (so late lower-seq upserts
  cannot resurrect the key — the anomaly CoW has, solved here exactly the
  way MoR delta markers solve it) and emits op='delete'.

State is Arrow-encoded pandas, grouped processing — no per-row Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "repo string, path string, event_seq long, op string, "
    "commit string, content_sha string"
)
STATE_SCHEMA = "event_seq long, op string, commit string, content_sha string"


def _fold(key, pdf_iter, state: GroupState):
    best = tuple(state.get) if state.exists else None  # (seq, op, commit, sha)
    changed = False
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values(["event_seq", "op"], ascending=[False, False])
        top = pdf.iloc[0]

        def _s(v):
            return None if pd.isna(v) else str(v)

        cand = (
            int(top["event_seq"]),
            str(top["op"]),
            _s(top["commit"]),
            _s(top["content_sha"]),
        )
        if (best is None or cand[0] > best[0]) and cand != best:
            best, changed = cand, True
    if changed:
        state.update(best)
        yield pd.DataFrame(
            [
                {
                    "repo": key[0],
                    "path": key[1],
                    "event_seq": best[0],
                    "op": best[1],
                    "commit": best[2],
                    "content_sha": best[3],
                }
            ]
        )


def latest_state_stream(stream):
    """Attach the stateful latest-state operator to a change-event stream.

    ``stream`` must carry (repo, path, event_seq, op, commit, content_sha).
    Returns a streaming DataFrame in ``update`` semantics: one row per key
    whose state changed in the micro-batch.
    """
    cols = ["repo", "path", "event_seq", "op", "commit", "content_sha"]
    return (
        stream.select(*cols)
        .groupBy("repo", "path")
        .applyInPandasWithState(
            _fold,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
