"""Per-file bloom-filter index for high-cardinality equality pruning.

Zone maps prune RANGE predicates; an equality probe on a high-cardinality
column whose values are uniformly spread (``content_sha = '9f2c...'``)
intersects every file's ``[min, max]`` and prunes nothing. Iceberg solves
this with puffin-sidecar blooms, parquet with optional footer blooms;
this engine writes one small SIDECAR file next to each data file
(``<part>.parquet.bloom`` — manifest entries carry only its relative
path, so the manifest stays O(files), not O(rows)) for the columns named
by the ``bloom_columns`` table property. :meth:`LakeTable.scan` and
:meth:`LakeTable.lookup` test equality/IN terms against the sidecars and
skip files that provably hold none of the probed values.

Soundness:
- No false negatives *within one environment*: the vectorized row hash
  (``pandas.util.hash_pandas_object`` — Arrow-columnar in, uint64 out, no
  per-row Python) is deterministic for a fixed pandas build. Across
  upgrades the sidecar's recorded CANARY hash no longer reproduces and
  the whole sidecar is ignored (fail-open) — drift degrades pruning,
  never results.
- Values are normalized to the column's logical kind (int64 / float64 /
  str) on BOTH the build and probe sides; a probe literal that cannot be
  losslessly coerced (e.g. ``1.5`` against an int column) contributes no
  pruning.
- NULLs are dropped from the build; an equality term never matches NULL,
  so their absence cannot hide a matching row.
"""

from __future__ import annotations

import base64
import json
import math

import numpy as np
import pandas as pd

K_HASHES = 7
BITS_PER_ROW = 10
MIN_BITS = 1 << 10
MAX_BITS = 1 << 23  # 1 MiB of bits — caps sidecar size per column
CANARY = "__sqoop_spark_bloom_canary_v1__"
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _hash64(values: pd.Series) -> np.ndarray:
    return pd.util.hash_pandas_object(values, index=False).to_numpy(
        dtype=np.uint64
    )


def canary_hash() -> int:
    return int(_hash64(pd.Series([CANARY], dtype=object))[0])


def column_kind(dtype) -> str | None:
    """The normalization kind for a Spark type, or None if the column
    cannot carry a bloom (then it is silently skipped)."""
    from pyspark.sql import types as T

    if isinstance(
        dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        return "int"
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dtype, T.StringType):
        return "str"
    return None


def _normalize(s: pd.Series, kind: str) -> pd.Series:
    s = s.dropna()
    if kind == "int":
        return s.astype("int64")
    if kind == "float":
        return s.astype("float64")
    return s.astype(str).astype(object)


def coerce_probe(value, kind: str):
    """The probe literal as the build side hashed it, or None when the
    coercion would be lossy (→ no pruning from this value)."""
    try:
        if kind == "int":
            if isinstance(value, bool) or not isinstance(value, (int, float)):
                return None
            if isinstance(value, float) and not value.is_integer():
                return None
            return pd.Series([int(value)], dtype="int64")
        if kind == "float":
            if isinstance(value, bool) or not isinstance(value, (int, float)):
                return None
            return pd.Series([float(value)], dtype="float64")
        if kind == "str":
            if not isinstance(value, str):
                return None
            return pd.Series([value], dtype=object)
    except (ValueError, OverflowError):
        return None
    return None


def _size_bits(rows: int) -> int:
    want = max(MIN_BITS, rows * BITS_PER_ROW)
    return min(MAX_BITS, 1 << math.ceil(math.log2(want)))


def _indices(h: np.ndarray, m: int):
    # Kirsch-Mitzenmacher double hashing with the STEP taken from the
    # high half of the 64-bit hash: m is a power of two, so (h + i*h2)
    # mod m sees only the low lg(m) bits of each operand — a step derived
    # from the low bits (e.g. h*const) would make every probe position a
    # function of h mod m alone, collapsing k probes to one and raising
    # the false-positive rate from fill^k to ~n/m (measured 5.7% vs the
    # 0.03% this construction gives at 1000 rows / 16 Ki bits).
    with np.errstate(over="ignore"):
        h2 = ((h >> np.uint64(32)) * _MIX) | np.uint64(1)
    mask = np.uint64(m - 1)
    return h, h2, mask


def build_column(values: pd.Series, kind: str) -> dict | None:
    """Bloom descriptor for one column of one file, or None when the
    column is all-NULL (nothing to probe — the entry simply has no bloom
    for it and fails open)."""
    norm = _normalize(values, kind)
    if len(norm) == 0:
        return None
    h = _hash64(norm)
    m = _size_bits(len(norm))
    words = np.zeros(m >> 6, dtype=np.uint64)
    h1, h2, mask = _indices(h, m)
    with np.errstate(over="ignore"):  # uint64 wraparound is the contract
        for i in range(K_HASHES):
            idx = (h1 + np.uint64(i) * h2) & mask
            np.bitwise_or.at(
                words, (idx >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (idx & np.uint64(63)),
            )
    return {
        "m": m,
        "k": K_HASHES,
        "kind": kind,
        "bits": base64.b64encode(words.tobytes()).decode("ascii"),
    }


def might_contain(desc: dict, value) -> bool:
    """True unless the bloom PROVES the value absent. Fail-open on any
    coercion failure."""
    probe = coerce_probe(value, desc["kind"])
    if probe is None:
        return True
    words = np.frombuffer(
        base64.b64decode(desc["bits"]), dtype=np.uint64
    )
    m = int(desc["m"])
    h1, h2, mask = _indices(_hash64(probe), m)
    with np.errstate(over="ignore"):  # uint64 wraparound is the contract
        for i in range(int(desc["k"])):
            idx = int((h1[0] + np.uint64(i) * h2[0]) & mask)
            if not (int(words[idx >> 6]) >> (idx & 63)) & 1:
                return False
    return True


def write_sidecar(path: str, columns: dict[str, dict]) -> None:
    with open(path, "w") as f:
        json.dump({"canary": canary_hash(), "columns": columns}, f)


def read_sidecar(path: str) -> dict | None:
    """The sidecar's column descriptors, or None when it is unreadable or
    its canary does not reproduce under THIS environment's hash (pandas
    upgrade between write and read) — fail open either way."""
    try:
        with open(path) as f:
            doc = json.load(f)
        if doc.get("canary") != canary_hash():
            return None
        return doc["columns"]
    except (OSError, ValueError, KeyError):
        return None
