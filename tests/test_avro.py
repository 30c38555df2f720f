"""Avro Object Container DataSource (sources/avro_format.py).

The environment ships neither the spark-avro jar nor any Python avro
package, so the format is implemented from the public spec — which
makes INDEPENDENT verification non-negotiable: the golden test below
hand-encodes a container byte-by-byte straight from the Avro 1.11
spec (magic, metadata map, zigzag varints, deflate block, sync
markers) so the reader is pinned to the FORMAT, not merely to our own
writer's dialect.
"""

from __future__ import annotations

import datetime
import io
import json
import os
import struct
import zlib

import pytest
from pyspark.sql import functions as F

from tests.conftest import *  # noqa: F401,F403 - spark/sf_dir fixtures
from yet_another_map_reduce_spark.sources import avro_format


def _zz(n: int) -> bytes:
    """Spec zigzag varint, written independently of the module under
    test (different construction: iterative masks over the zigzag)."""
    z = (n << 1) ^ (n >> 63)
    z &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        out.append(b | 0x80 if z else b)
        if not z:
            return bytes(out)


def _golden_container(codec: str = "null") -> tuple[bytes, list[tuple]]:
    """A 3-record container for schema (a long, s nullable string),
    encoded by hand from the spec."""
    schema = {
        "type": "record",
        "name": "golden",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
        ],
    }
    rows = [(42, "hi"), (-3, None), (0, "yet another")]
    body = io.BytesIO()
    for a, s in rows:
        body.write(_zz(a))
        if s is None:
            body.write(_zz(0))  # union branch 0 = null
        else:
            body.write(_zz(1))  # union branch 1 = string
            b = s.encode()
            body.write(_zz(len(b)) + b)
    data = body.getvalue()
    if codec == "deflate":
        c = zlib.compressobj(wbits=-15)
        data = c.compress(data) + c.flush()

    sync = bytes(range(16))
    out = io.BytesIO()
    out.write(b"Obj\x01")
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    out.write(_zz(len(meta)))
    for k, v in meta.items():
        out.write(_zz(len(k)) + k.encode())
        out.write(_zz(len(v)) + v)
    out.write(_zz(0))
    out.write(sync)
    out.write(_zz(len(rows)))  # block record count
    out.write(_zz(len(data)))  # block byte size
    out.write(data)
    out.write(sync)
    return out.getvalue(), rows


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_reader_decodes_hand_encoded_golden_container(spark, tmp_path, codec):
    raw, rows = _golden_container(codec)
    p = os.path.join(str(tmp_path), "golden.avro")
    with open(p, "wb") as fh:
        fh.write(raw)

    # module-level reader
    assert list(avro_format.read_container(p)) == rows

    # full DataSource path: registration, schema inference, scan
    avro_format.register(spark)
    df = spark.read.format("pyavro").load(p)
    assert [f.simpleString() for f in df.schema.fields] == [
        "a:bigint",
        "s:string",
    ]
    assert sorted(df.collect()) == sorted(rows)


def test_reader_rejects_bad_magic_and_bad_codec(tmp_path):
    p = os.path.join(str(tmp_path), "bad.avro")
    with open(p, "wb") as fh:
        fh.write(b"PAR1not an avro file")
    with pytest.raises(ValueError, match="bad magic"):
        avro_format.read_header(p)

    raw, _ = _golden_container(codec="zstd")  # metadata names a codec we lack
    p2 = os.path.join(str(tmp_path), "codec.avro")
    with open(p2, "wb") as fh:
        fh.write(raw)
    with pytest.raises(ValueError, match="unsupported avro codec"):
        avro_format.read_header(p2)


def test_sync_marker_mismatch_is_loud(tmp_path):
    raw, _ = _golden_container()
    # flip one byte of the trailing sync marker
    broken = raw[:-1] + bytes([raw[-1] ^ 0xFF])
    p = os.path.join(str(tmp_path), "desync.avro")
    with open(p, "wb") as fh:
        fh.write(broken)
    with pytest.raises(ValueError, match="sync marker"):
        list(avro_format.read_container(p))


def test_roundtrip_all_supported_types(spark, tmp_path):
    """write -> read across every supported type incl. NULLs, negative
    zigzag territory, empty arrays/strings, date + timestamp logicals."""
    avro_format.register(spark)
    df = spark.createDataFrame(
        [
            (
                1,
                -(2**40),
                1.5,
                float("inf"),
                "héllo",
                bytearray(b"\x00\xff"),
                True,
                [1.0, -2.5],
                datetime.date(2026, 8, 15),
                datetime.datetime(2026, 8, 15, 12, 34, 56, 789000),
            ),
            (2, None, None, None, "", None, None, [], None, None),
            (3, 0, -0.0, 3.25, None, bytearray(b""), False, None, datetime.date(1969, 12, 31), None),
        ],
        "id int, l bigint, d double, f float, s string, b binary, "
        "bo boolean, arr array<double>, dt date, ts timestamp",
    ).withColumn("tsn", F.col("ts").cast("timestamp_ntz"))
    out = os.path.join(str(tmp_path), "rt")
    df.write.format("pyavro").mode("append").save(out)
    assert [f for f in os.listdir(out) if f.endswith(".avro")]
    back = spark.read.format("pyavro").load(out)
    assert dict(back.dtypes) == dict(df.dtypes)
    a = sorted(df.collect(), key=lambda r: r["id"])
    b = sorted(back.collect(), key=lambda r: r["id"])
    assert a == b


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip_documents_table(spark, sf_dir, tmp_path, codec):
    """Corpus-scale-ish round trip on real testdata, both codecs, and
    the deflate output is genuinely smaller than the null-codec one."""
    from yet_another_map_reduce_spark.sources.readers import read_table

    avro_format.register(spark)
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    out = os.path.join(str(tmp_path), f"docs_{codec}")
    docs.write.format("pyavro").option("codec", codec).mode("append").save(out)
    back = spark.read.format("pyavro").load(out)
    assert back.count() == docs.count()
    assert (
        back.agg(F.sum(F.crc32(F.concat_ws("|", "doc_id", "text", "lang")))).first()[0]
        == docs.agg(F.sum(F.crc32(F.concat_ws("|", "doc_id", "text", "lang")))).first()[0]
    )


def test_deflate_smaller_than_null(spark, sf_dir, tmp_path):
    from yet_another_map_reduce_spark.sources.readers import read_table

    avro_format.register(spark)
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")

    def total(codec):
        out = os.path.join(str(tmp_path), codec)
        docs.coalesce(2).write.format("pyavro").option("codec", codec).mode("append").save(out)
        return sum(
            os.path.getsize(os.path.join(out, f))
            for f in os.listdir(out)
            if f.endswith(".avro")
        )

    assert total("deflate") < total("null")


def test_writer_rejects_unsupported_types_loudly(spark, tmp_path):
    avro_format.register(spark)
    df = spark.createDataFrame([(1, 1.5)], "id int, d double").select(
        "id", F.col("d").cast("decimal(10,2)").alias("d")
    )
    with pytest.raises(Exception, match="outside this avro"):
        df.write.format("pyavro").mode("append").save(os.path.join(str(tmp_path), "d"))
    # avro maps have string keys only — non-string keys must be loud
    mk = spark.createDataFrame([(1,)], "id int").select(
        "id", F.create_map(F.lit(1), F.lit("x")).alias("m")
    )
    with pytest.raises(Exception, match="string keys"):
        mk.write.format("pyavro").mode("append").save(os.path.join(str(tmp_path), "m"))


def test_split_reads_tile_blocks_exactly_once(spark, tmp_path):
    """A single container fans out across byte-range splits on sync
    boundaries (the Hadoop-Avro convention): with split_bytes far below
    the file size the scan gets many partitions, every row appears
    exactly once, and results equal the unsplit read — for an awkward
    split size that lands mid-block as well as a tiny one."""
    avro_format.register(spark)
    out = os.path.join(str(tmp_path), "big")
    n = 20_000
    df = spark.range(n).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("h")
    )
    # one file, many small blocks (64 rows/block -> ~312 sync points)
    (
        df.coalesce(1)
        .write.format("pyavro")
        .option("block_rows", 64)
        .option("codec", "null")
        .mode("append")
        .save(out)
    )
    files = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert len(files) == 1
    size = os.path.getsize(os.path.join(out, files[0]))

    # default split (64 MiB) leaves this ~1 MB file as one partition
    whole = spark.read.format("pyavro").load(out)
    assert whole.rdd.getNumPartitions() == 1
    for split in (4096, 13_331):  # tiny, and a prime that lands mid-block
        got = (
            spark.read.format("pyavro")
            .option("split_bytes", split)
            .load(out)
        )
        assert got.rdd.getNumPartitions() == -(-size // split)
        assert got.count() == n, f"split={split}: lost or duplicated rows"
        assert got.select("id").distinct().count() == n
        assert (
            got.agg(F.sum(F.crc32("h"))).first()[0]
            == df.agg(F.sum(F.crc32("h"))).first()[0]
        )


def test_schema_evolution_reads_by_name_across_drifted_files(spark, tmp_path):
    """The Avro read rule: each file decodes with its own writer schema
    and projects onto the read schema BY NAME.  A directory holding an
    old-layout file (fewer fields, different order) and a new-layout
    file must read consistently — old files surface NULL for the field
    they predate, and field ORDER drift must not misassign values (the
    positional-read failure mode this pins against)."""
    avro_format.register(spark)
    out = os.path.join(str(tmp_path), "evo")
    os.makedirs(out)

    old_schema = {
        "type": "record",
        "name": "evo",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
        ],
    }
    new_schema = {
        "type": "record",
        "name": "evo",
        "fields": [  # reordered + one added field
            {"name": "name", "type": ["null", "string"]},
            {"name": "score", "type": ["null", "double"]},
            {"name": "id", "type": "long"},
        ],
    }
    avro_format.write_container(
        os.path.join(out, "part-old.avro"), [(1, "a"), (2, "b")], old_schema
    )
    avro_format.write_container(
        os.path.join(out, "part-new.avro"), [("c", 0.5, 3)], new_schema
    )

    # explicit read schema: the union layout, in an order matching
    # NEITHER file — every value must land under its own name
    df = (
        spark.read.format("pyavro")
        .schema("id bigint, score double, name string")
        .load(out)
    )
    got = {r["id"]: (r["score"], r["name"]) for r in df.collect()}
    assert got == {1: (None, "a"), 2: (None, "b"), 3: (0.5, "c")}

    # inferred schema comes from one file; the other still projects by
    # name (whichever file wins inference, values stay under their name)
    inf = spark.read.format("pyavro").load(out)
    by_id = {r["id"]: r["name"] for r in inf.collect()}
    assert by_id == {1: "a", 2: "b", 3: "c"}


def test_stream_reader_tails_new_containers_exactly_once(spark, tmp_path):
    """The pyavro streaming source: an availableNow pass absorbs the
    backlog; a restart from the same checkpoint after a new container
    lands reads ONLY the new file (the consumed-filename offset), so
    the downstream total is exactly-once across restarts."""
    avro_format.register(spark)
    src = os.path.join(str(tmp_path), "feed")
    os.makedirs(src)
    sink = os.path.join(str(tmp_path), "sink")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    schema = {
        "type": "record",
        "name": "feed",
        "fields": [{"name": "id", "type": "long"}],
    }
    avro_format.write_container(os.path.join(src, "a.avro"), [(1,), (2,)], schema)
    avro_format.write_container(os.path.join(src, "b.avro"), [(3,)], schema)

    def drain():
        q = (
            spark.readStream.format("pyavro")
            .load(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    drain()
    assert sorted(r["id"] for r in spark.read.parquet(sink).collect()) == [1, 2, 3]

    avro_format.write_container(os.path.join(src, "c.avro"), [(4,)], schema)
    drain()
    assert sorted(r["id"] for r in spark.read.parquet(sink).collect()) == [1, 2, 3, 4]


def test_overwrite_and_abort_semantics(spark, tmp_path):
    avro_format.register(spark)
    out = os.path.join(str(tmp_path), "ow")
    one = spark.range(5).select(F.col("id").cast("long"))
    one.write.format("pyavro").mode("append").save(out)
    two = spark.range(3).select(F.col("id").cast("long"))
    two.write.format("pyavro").mode("overwrite").save(out)
    assert spark.read.format("pyavro").load(out).count() == 3


def test_roundtrip_nested_struct_map_and_array_of_struct(spark, tmp_path):
    """Nested records (Spark struct), maps (string keys), and arrays of
    records roundtrip through the full DataSource path — including NULL
    structs, NULL map values, and logical types INSIDE a nested record
    (timestamp-micros must encode/decode recursively, not only at the
    top level)."""
    avro_format.register(spark)
    out = os.path.join(str(tmp_path), "nested")
    ts = datetime.datetime(2026, 8, 16, 12, 30, 0, 123456)
    rows = [
        (
            1,
            {"w": 640, "h": 480, "tags": ["a", "b"]},
            {"fps": 24, "missing": None},
            [{"ts": ts, "score": 0.5}, {"ts": None, "score": -1.0}],
        ),
        (2, None, {}, []),
    ]
    ddl = (
        "id bigint, meta struct<w:int,h:int,tags:array<string>>, "
        "props map<string,bigint>, "
        "frames array<struct<ts:timestamp,score:double>>"
    )
    df = spark.createDataFrame(rows, ddl)
    df.write.format("pyavro").mode("append").save(out)

    back = spark.read.format("pyavro").load(out)
    assert back.schema.simpleString() == df.schema.simpleString()
    got = {r["id"]: r for r in back.collect()}
    assert got[1]["meta"].asDict() == {"w": 640, "h": 480, "tags": ["a", "b"]}
    assert got[1]["props"] == {"fps": 24, "missing": None}
    assert [f.asDict() for f in got[1]["frames"]] == [
        {"ts": ts, "score": 0.5},
        {"ts": None, "score": -1.0},
    ]
    assert got[2]["meta"] is None
    assert got[2]["props"] == {}
    assert got[2]["frames"] == []


def test_nested_golden_hand_encoded_record_and_map(spark, tmp_path):
    """Reader pinned to the SPEC for nested values: a record field is
    the plain concatenation of its fields' encodings; a map is
    count-prefixed key/value blocks ending with a 0 count — encoded
    here by hand, independently of the module's writer."""
    schema = {
        "type": "record",
        "name": "g",
        "fields": [
            {"name": "id", "type": "long"},
            {
                "name": "geo",
                "type": [
                    "null",
                    {
                        "type": "record",
                        "name": "g_geo",
                        "fields": [
                            {"name": "lat", "type": "double"},
                            {"name": "city", "type": ["null", "string"]},
                        ],
                    },
                ],
            },
            {"name": "kv", "type": {"type": "map", "values": "long"}},
        ],
    }
    body = io.BytesIO()
    # row 1: id=7, geo={lat:1.5, city:"x"}, kv={"a":1,"b":2}
    body.write(_zz(7))
    body.write(_zz(1))  # geo union branch 1 = record
    body.write(struct.pack("<d", 1.5))
    body.write(_zz(1) + _zz(1) + b"x")  # city: branch 1, len 1, 'x'
    body.write(_zz(2))  # map block of 2 entries
    body.write(_zz(1) + b"a" + _zz(1))
    body.write(_zz(1) + b"b" + _zz(2))
    body.write(_zz(0))  # end of map blocks
    # row 2: id=-1, geo=null, kv={}
    body.write(_zz(-1))
    body.write(_zz(0))  # geo null branch
    body.write(_zz(0))  # empty map
    data = body.getvalue()

    sync = bytes(range(16))
    out = io.BytesIO()
    out.write(b"Obj\x01")
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": b"null"}
    out.write(_zz(len(meta)))
    for k, v in meta.items():
        out.write(_zz(len(k)) + k.encode())
        out.write(_zz(len(v)) + v)
    out.write(_zz(0))
    out.write(sync)
    out.write(_zz(2))  # block record count
    out.write(_zz(len(data)))
    out.write(data)
    out.write(sync)

    p = os.path.join(str(tmp_path), "nested-golden.avro")
    with open(p, "wb") as fh:
        fh.write(out.getvalue())

    assert list(avro_format.read_container(p)) == [
        (7, (1.5, "x"), {"a": 1, "b": 2}),
        (-1, None, {}),
    ]

    avro_format.register(spark)
    df = spark.read.format("pyavro").load(p)
    assert (
        df.schema.simpleString()
        == "struct<id:bigint,geo:struct<lat:double,city:string>,kv:map<string,bigint>>"
    )
    got = sorted(df.collect(), key=lambda r: r["id"])
    assert got[0]["geo"] is None and got[0]["kv"] == {}
    assert got[1]["geo"].asDict() == {"lat": 1.5, "city": "x"}
    assert got[1]["kv"] == {"a": 1, "b": 2}


def test_nested_schema_evolution_resolves_by_name(spark, tmp_path):
    """By-name resolution must recurse INTO nested records — including
    records inside arrays: a file whose nested field order drifted (or
    that predates a nested field) must still land every value under its
    name, never positionally misassigned."""
    avro_format.register(spark)
    out = os.path.join(str(tmp_path), "nevo")
    os.makedirs(out)

    def rec(name, fields):
        return {"type": "record", "name": name, "fields": fields}

    old = rec(
        "e",
        [
            {"name": "id", "type": "long"},
            {
                "name": "m",
                "type": rec(
                    "e_m",
                    [
                        {"name": "w", "type": "long"},
                        {"name": "h", "type": "long"},
                    ],
                ),
            },
        ],
    )
    new = rec(
        "e",
        [
            {"name": "id", "type": "long"},
            {
                "name": "m",
                "type": rec(
                    "e_m",
                    [  # reordered + added nested field
                        {"name": "h", "type": "long"},
                        {"name": "label", "type": ["null", "string"]},
                        {"name": "w", "type": "long"},
                    ],
                ),
            },
        ],
    )
    avro_format.write_container(
        os.path.join(out, "part-old.avro"), [(1, (640, 480))], old
    )
    avro_format.write_container(
        os.path.join(out, "part-new.avro"), [(2, (1080, "hd", 1920))], new
    )

    df = (
        spark.read.format("pyavro")
        .schema("id bigint, m struct<w:bigint,h:bigint,label:string>")
        .load(out)
    )
    got = {r["id"]: r["m"].asDict() for r in df.collect()}
    assert got == {
        1: {"w": 640, "h": 480, "label": None},
        2: {"w": 1920, "h": 1080, "label": "hd"},
    }

    # records inside arrays resolve too
    arr_old = rec(
        "a",
        [
            {
                "name": "xs",
                "type": {
                    "type": "array",
                    "items": rec("a_xs", [{"name": "p", "type": "long"}]),
                },
            }
        ],
    )
    out2 = os.path.join(str(tmp_path), "nevo-arr")
    os.makedirs(out2)
    avro_format.write_container(
        os.path.join(out2, "part.avro"), [([(5,), (6,)],)], arr_old
    )
    df2 = (
        spark.read.format("pyavro")
        .schema("xs array<struct<q:bigint,p:bigint>>")
        .load(out2)
    )
    assert [x.asDict() for x in df2.first()["xs"]] == [
        {"q": None, "p": 5},
        {"q": None, "p": 6},
    ]


def test_arrow_fast_path_roundtrip_ntz_date_arrays(spark, tmp_path):
    """A schema of primitives + date + TIMESTAMP_NTZ + arrays is arrow
    fast-path ELIGIBLE (asserted directly) and roundtrips exactly
    through the DataSource — including NULLs and empty arrays.  The
    tz'd-timestamp all-types test rides the row path, so this is the
    coverage for the RecordBatch hand-off."""
    from pyspark.sql.types import StructType

    from yet_another_map_reduce_spark.sources.avro_format import (
        _arrow_fast_schema,
    )

    avro_format.register(spark)
    ddl = (
        "id bigint, name string, score double, ok boolean, "
        "dt date, tsn timestamp_ntz, xs array<bigint>"
    )
    assert _arrow_fast_schema(StructType.fromDDL(ddl)) is not None
    # and a tz'd timestamp or nested struct disqualifies
    assert _arrow_fast_schema(StructType.fromDDL("ts timestamp")) is None
    assert (
        _arrow_fast_schema(StructType.fromDDL("s struct<a:int>")) is None
    )

    ntz = datetime.datetime(2026, 8, 16, 7, 8, 9, 250000)
    rows = [
        (1, "a", 0.5, True, datetime.date(2026, 1, 2), ntz, [1, 2]),
        (2, None, None, None, None, None, []),
        (3, "", -0.0, False, datetime.date(1969, 12, 31), None, None),
    ]
    df = spark.createDataFrame(rows, ddl)
    out = os.path.join(str(tmp_path), "fast")
    df.write.format("pyavro").mode("append").save(out)
    back = spark.read.format("pyavro").load(out)
    assert dict(back.dtypes) == dict(df.dtypes)
    assert sorted(back.collect(), key=lambda r: r["id"]) == sorted(
        df.collect(), key=lambda r: r["id"]
    )


def test_avro_to_parquet_conversion(spark, sf_dir, tmp_path):
    """The land-then-convert operator (BASELINE.md r12 posture made
    first-class): avro containers in, parquet out, one call.  Pins
    (a) row/hash parity between the source table and the converted
    parquet, (b) that the read actually fanned the containers across
    sync-marker splits (split-count assertion), (c) output file sizing
    from on-disk bytes."""
    from yet_another_map_reduce_spark.functions import md5_hash64
    from yet_another_map_reduce_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    land = str(tmp_path / "landed")
    out = str(tmp_path / "served")
    avro_format.write_avro(docs.coalesce(2), land, codec="null", mode="overwrite")

    # tiny split size forces multi-split reads of each container
    res = avro_format.avro_to_parquet(
        spark, land, out, split_bytes=16 * 1024
    )
    assert res["rows"] == docs.count()
    n_files = len([f for f in os.listdir(land) if f.endswith(".avro")])
    assert res["splits"] > n_files, "containers must fan out across splits"
    assert res["out_files"] >= 1

    def corpus_hash(df):
        return df.withColumn(
            "h",
            md5_hash64(
                F.concat_ws(
                    "|",
                    F.col("doc_id"),
                    F.coalesce(F.col("text"), F.lit("<NULL>")),
                    F.col("lang"),
                    F.col("n_chars").cast("string"),
                )
            ),
        ).agg(F.expr("bit_xor(h)").alias("h")).collect()[0]["h"]

    assert corpus_hash(spark.read.parquet(out)) == corpus_hash(docs)


def test_avro_to_parquet_partitioned(spark, sf_dir, tmp_path):
    """partition_by routes rows into hive directories with whole files
    per directory (the shuffle-on-partition-cols path)."""
    from yet_another_map_reduce_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    land = str(tmp_path / "landed")
    out = str(tmp_path / "bylang")
    avro_format.write_avro(docs, land, mode="overwrite")
    res = avro_format.avro_to_parquet(spark, land, out, partition_by=["lang"])
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    got_dirs = {
        d.split("=", 1)[1]
        for d in os.listdir(out)
        if d.startswith("lang=")
    }
    assert got_dirs == langs
    assert res["rows"] == docs.count()


def test_type_drift_on_shared_leaf_raises_loudly(spark, tmp_path):
    """A leaf whose type CHANGED between the file's writer schema and
    the read schema must raise at open time, naming the field — never
    coerce silently (Arrow int->float64 loses precision above 2^53;
    that near-miss is why this check exists).  Promotions are out of
    scope by module contract."""
    avro_format.register(spark)
    out = os.path.join(str(tmp_path), "drift")
    os.makedirs(out)
    schema = {
        "type": "record",
        "name": "d",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "v", "type": "long"},
        ],
    }
    big = (1 << 53) + 1  # not representable in float64
    avro_format.write_container(
        os.path.join(out, "part-0.avro"), [(1, big)], schema
    )

    # leaf drift: long written, double requested
    with pytest.raises(Exception, match="type drift.*\\bv\\b|\\bv\\b.*type drift"):
        (
            spark.read.format("pyavro")
            .schema("id bigint, v double")
            .load(out)
            .collect()
        )

    # container-kind drift: leaf written, struct requested
    with pytest.raises(Exception, match="struct"):
        (
            spark.read.format("pyavro")
            .schema("id bigint, v struct<x:bigint>")
            .load(out)
            .collect()
        )

    # matching read schema still reads the full value exactly
    got = (
        spark.read.format("pyavro")
        .schema("id bigint, v bigint")
        .load(out)
        .collect()
    )
    assert got[0]["v"] == big

    # absent/extra fields stay legal (by-name evolution unchanged)
    got = (
        spark.read.format("pyavro")
        .schema("id bigint, missing string")
        .load(out)
        .collect()
    )
    assert got[0]["missing"] is None


def test_nested_type_drift_names_the_path(spark, tmp_path):
    """Drift inside a nested record/array is caught with the full field
    path in the error."""
    avro_format.register(spark)
    out = os.path.join(str(tmp_path), "nested_drift")
    os.makedirs(out)
    schema = {
        "type": "record",
        "name": "n",
        "fields": [
            {"name": "id", "type": "long"},
            {
                "name": "meta",
                "type": {
                    "type": "record",
                    "name": "meta_t",
                    "fields": [{"name": "w", "type": "int"}],
                },
            },
        ],
    }
    avro_format.write_container(
        os.path.join(out, "part-0.avro"), [(1, (7,))], schema
    )
    with pytest.raises(Exception, match="meta\\.w"):
        (
            spark.read.format("pyavro")
            .schema("id bigint, meta struct<w:string>")
            .load(out)
            .collect()
        )


def test_avro_to_parquet_append_stats_are_deltas(spark, sf_dir, tmp_path):
    """Under mode='append' the stats dict reports THIS conversion's
    rows/files, not the accumulated dataset (reconciliation contract)."""
    from yet_another_map_reduce_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    land1 = str(tmp_path / "b1")
    land2 = str(tmp_path / "b2")
    out = str(tmp_path / "served")
    avro_format.write_avro(docs.where("doc_id < 100"), land1, mode="overwrite")
    avro_format.write_avro(docs.where("doc_id >= 100"), land2, mode="overwrite")
    n1 = docs.where("doc_id < 100").count()
    n2 = docs.where("doc_id >= 100").count()
    r1 = avro_format.avro_to_parquet(spark, land1, out, mode="overwrite")
    r2 = avro_format.avro_to_parquet(spark, land2, out, mode="append")
    assert r1["rows"] == n1
    assert r2["rows"] == n2  # delta, not n1 + n2
    assert r2["out_files"] >= 1
    assert spark.read.parquet(out).count() == n1 + n2


def test_reversed_union_order_decodes_correctly(spark, tmp_path):
    """[T, \"null\"] unions (the standard layout when a field's default
    is non-null) must decode by the union's ACTUAL null-branch
    position — hard-coding branch 0 = null read every real value as
    None and desynced the remaining fields (r15 review finding).
    Exercised through BOTH decode paths (compiled fast path and the
    interpreted _read_value path via a nested field)."""
    out = os.path.join(str(tmp_path), "rev")
    os.makedirs(out)
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": ["long", "null"], "default": 7},
            {"name": "t", "type": ["string", "null"], "default": "x"},
            {
                "name": "meta",
                "type": [
                    {
                        "type": "record",
                        "name": "m",
                        "fields": [{"name": "w", "type": ["long", "null"]}],
                    },
                    "null",
                ],
            },
        ],
    }
    rows = [(42, "a", (5,)), (None, None, None), (1, "b", (None,))]
    p = os.path.join(out, "part-0.avro")
    avro_format.write_container(p, rows, schema)
    back = list(avro_format.read_container(p))
    assert back == [(42, "a", (5,)), (None, None, None), (1, "b", (None,))]
    # and through the DataSource (compiled/arrow paths as applicable)
    avro_format.register(spark)
    got = sorted(
        (
            (r["id"], r["t"])
            for r in spark.read.format("pyavro")
            .load(out)
            .select("id", "t")
            .collect()
        ),
        key=lambda x: (x[0] is None, x[0]),
    )
    assert got == [(1, "b"), (42, "a"), (None, None)]


def test_multibranch_union_still_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="union"):
        avro_format._plan_type(["long", "string"], "f")
    with pytest.raises(ValueError, match="union"):
        avro_format._plan_type(["null", "long", "string"], "f")


def test_writer_orphan_tmp_files_are_invisible(spark, tmp_path):
    """Two-phase commit: task files land as *.avro.tmp and only commit
    renames winners to *.avro — a failed/speculative attempt's orphan
    never surfaces as live data (previously commit was a no-op and
    readers globbed every *.avro, silently duplicating rows)."""
    avro_format.register(spark)
    out = str(tmp_path / "tp")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, t string")
    df.coalesce(1).write.format("pyavro").mode("overwrite").save(out)
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]
    # plant an orphan attempt: complete container bytes, tmp suffix
    avro_format.write_container(
        os.path.join(out, "part-00000-dead-a0.avro.tmp"),
        [(9, "orphan")],
        {"type": "record", "name": "r", "fields": [
            {"name": "id", "type": "long"}, {"name": "t", "type": "string"}]},
    )
    back = spark.read.format("pyavro").load(out).collect()
    assert sorted(r["id"] for r in back) == [1, 2]  # orphan invisible


def test_overwrite_preserves_old_data_until_commit(spark, tmp_path):
    """A failed overwrite job must leave the old dataset intact:
    deletion of the previous generation happens in commit(), after the
    winners are renamed in — never at planning time (previously
    __init__ cleared the destination before any task ran)."""
    avro_format.register(spark)
    out = str(tmp_path / "ow")
    spark.createDataFrame([(1,)], "id long").write.format("pyavro").mode(
        "overwrite"
    ).save(out)
    old = set(avro_format._list_avro_files(out))
    assert old
    # constructing the overwrite writer (= job planning) must not delete
    w = avro_format.AvroWriter(
        {"path": out}, spark.createDataFrame([(2,)], "id long").schema, True
    )
    assert set(avro_format._list_avro_files(out)) == old
    w.abort([])  # failed job: abort, old data still live
    assert set(avro_format._list_avro_files(out)) == old
    assert spark.read.format("pyavro").load(out).collect()[0]["id"] == 1
    # a successful overwrite does retire the old generation
    spark.createDataFrame([(3,)], "id long").write.format("pyavro").mode(
        "overwrite"
    ).save(out)
    back = spark.read.format("pyavro").load(out).collect()
    assert [r["id"] for r in back] == [3]


def test_encode_logical_tz_aware_uses_utc_epoch():
    """A +02:00 datetime stores micros since the UTC epoch (instant
    semantics), not micros since 1969-12-31T22:00Z."""
    tz2 = datetime.timezone(datetime.timedelta(hours=2))
    v = datetime.datetime(2020, 1, 1, 2, 0, tzinfo=tz2)  # == 2020-01-01T00:00Z
    micros = avro_format._encode_logical(v, "timestamp-micros")
    utc = datetime.datetime(2020, 1, 1, tzinfo=datetime.timezone.utc)
    epoch = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
    assert micros == (utc - epoch) // datetime.timedelta(microseconds=1)
    # naive values keep the naive epoch (timestamp_ntz semantics)
    nv = datetime.datetime(2020, 1, 1)
    assert avro_format._encode_logical(nv, "timestamp-micros") == (
        nv - datetime.datetime(1970, 1, 1)
    ) // datetime.timedelta(microseconds=1)
