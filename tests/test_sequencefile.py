"""SequenceFile<LongWritable, Text> layout — pure-Python container parity.

Mirrors the reference's sequencefile-layout coverage
(TestSequenceFileImport-shaped: write via the import layout, read back,
compare records) with the extra proof the pure-Python writer needs: the
JVM's own ``sc.sequenceFile`` reader must accept the emitted bytes, so
the files are Hadoop-compatible, not merely self-consistent.
"""

import glob
import io
import os
import struct
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from sqoop_spark.sequencefile import (
    _read_vlong,
    _write_vlong,
    read_seqfile,
    read_sequencefile,
    write_sequencefile,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _frame(spark, n=500):
    return spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("path/with,comma "), F.col("id")).alias("s"),
        F.when(F.col("id") % 7 == 0, None).otherwise(F.col("id") * 1.5).alias("v"),
    )


def test_vlong_roundtrip_edges():
    # WritableUtils.writeVLong edge values: one-byte range bounds, sign
    # flips, multi-byte lengths up to the full 64-bit range.
    for n in (0, 1, -1, 127, 128, -112, -113, 255, 256, 65535, -65536,
              2**31 - 1, -2**31, 2**33, 2**63 - 1, -2**63):
        out = io.BytesIO()
        _write_vlong(out, n)
        back = _read_vlong(io.BufferedReader(io.BytesIO(out.getvalue())))
        assert back == n, n
    # Hadoop's encoding is single-byte exactly in [-112, 127]
    for n, size in ((127, 1), (128, 2), (-112, 1), (-113, 2)):
        out = io.BytesIO()
        _write_vlong(out, n)
        assert len(out.getvalue()) == size, n


def test_jvm_readback_and_roundtrip(spark, scratch):
    """The compatibility pin: Spark's JVM sequenceFile reader parses our
    container, keys follow the (pid << 33) + i convention, and parsing
    the Text lines back yields the exact input frame."""
    df = _frame(spark)
    path = os.path.join(scratch, "seq")
    write_sequencefile(df, path, enclosed_by='"', escaped_by="\\")

    pairs = spark.sparkContext.sequenceFile(path).collect()
    assert len(pairs) == 500
    # keys: unique, partition-prefixed longs (LongWritable end-to-end)
    keys = [k for k, _ in pairs]
    assert len(set(keys)) == 500
    assert any(k >= (1 << 33) for k in keys)  # >1 partition wrote

    back = read_sequencefile(
        spark, path, df.schema, enclosed_by='"', escaped_by="\\"
    )
    assert sorted(back.collect()) == sorted(df.collect())


def test_python_reader_matches_jvm(spark, scratch):
    df = _frame(spark, 200)
    path = os.path.join(scratch, "seq")
    write_sequencefile(df, path)
    jvm = sorted(spark.sparkContext.sequenceFile(path).collect())
    ours = sorted(
        pair
        for part in glob.glob(os.path.join(path, "part-*.seq"))
        for pair in read_seqfile(part)
    )
    assert ours == jvm


def test_deflate_record_compression(spark, scratch):
    """compression='deflate' writes DefaultCodec record-compressed values
    the JVM still reads; files are smaller than uncompressed."""
    # per-RECORD compression only pays on compressible values — pad each
    # row with a repetitive field (tiny incompressible records grow by
    # the zlib framing, which is also true of the JVM writer)
    df = (
        _frame(spark, 400)
        .withColumn("pad", F.repeat(F.lit("abcdef "), 40))
        .coalesce(1)
    )
    plain, packed = os.path.join(scratch, "p"), os.path.join(scratch, "z")
    write_sequencefile(df, plain)
    write_sequencefile(df, packed, compression="deflate")
    assert spark.sparkContext.sequenceFile(packed).count() == 400
    back = read_sequencefile(spark, packed, df.schema)
    assert sorted(back.collect()) == sorted(df.collect())
    size = lambda p: sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(p, "part-*.seq"))
    )
    assert size(packed) < size(plain)


def test_sync_markers_present(spark, scratch):
    """Files long enough to cross SYNC_INTERVAL carry sync escapes — the
    splittability contract — and the reader resynchronizes over them."""
    df = _frame(spark, 2000).coalesce(1)
    path = os.path.join(scratch, "seq")
    write_sequencefile(df, path)
    part = glob.glob(os.path.join(path, "part-*.seq"))[0]
    raw = open(part, "rb").read()
    assert struct.pack(">i", -1) in raw[100:]  # at least one sync escape
    assert len(read_seqfile(part)) == 2000


def test_overwrite_clears_stale_parts(spark, scratch):
    """Re-export with fewer partitions must not leave stale part files
    that a directory read would merge in (the write_avro_container
    contract)."""
    path = os.path.join(scratch, "seq")
    write_sequencefile(_frame(spark, 300).repartition(4), path)
    assert len(glob.glob(os.path.join(path, "part-*.seq"))) == 4
    write_sequencefile(_frame(spark, 50).coalesce(1), path)
    assert len(glob.glob(os.path.join(path, "part-*.seq"))) == 1
    assert spark.sparkContext.sequenceFile(path).count() == 50


def test_null_and_delims(spark, scratch):
    """--null-string and custom field delimiter flow through the Text
    lines exactly as the text sink's DelimiterSet options."""
    df = _frame(spark, 50)
    path = os.path.join(scratch, "seq")
    write_sequencefile(df, path, field_delim="|", null_string="NULLZ")
    lines = [v for _, v in spark.sparkContext.sequenceFile(path).collect()]
    assert any("NULLZ" in ln for ln in lines)
    assert all(ln.count("|") >= 2 for ln in lines)
    back = read_sequencefile(
        spark, path, df.schema, field_delim="|", null_string="NULLZ"
    )
    assert sorted(back.collect()) == sorted(df.collect())


def test_unsupported_codec_raises(spark, scratch):
    from sqoop_spark.errors import EngineError

    with pytest.raises(EngineError, match="unsupported codec"):
        write_sequencefile(_frame(spark, 5), os.path.join(scratch, "s"),
                           compression="gzip")


def test_cli_import_and_export_sequencefile(spark, scratch, tmp_path):
    """--as-sequencefile import lands part-NNNNN.seq at the target; export
    --format sequencefile does the same from a parquet source."""
    src = os.path.join(scratch, "src.parquet")
    _frame(spark, 80).write.parquet(src)
    out = os.path.join(scratch, "landed")
    r = subprocess.run(
        [sys.executable, "-m", "sqoop_spark", "import",
         "--table", src, "--target", out, "--as-sequencefile"],
        capture_output=True, text=True, cwd=REPO, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    parts = glob.glob(os.path.join(out, "part-*.seq"))
    assert parts
    assert sum(len(read_seqfile(p)) for p in parts) == 80
