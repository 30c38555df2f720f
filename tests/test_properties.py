"""Property-based tests (hypothesis): the MapReduce compat contract and
dedup invariants hold for arbitrary generated inputs.

Strategy note: one shared SparkSession, small cases, deadline disabled
(JVM round-trips dwarf hypothesis's default budget)."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from yet_another_map_reduce_spark.operators.mapreduce import run_inprocess

KEYS = ["alpha", "beta", "gamma", "delta", "x"]

lines_strategy = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(min_value=0, max_value=1000)),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=lines_strategy)
def test_inprocess_mr_equals_python_fold(spark, tmp_path_factory, pairs):
    """sum-per-key via the generic MR surface == a plain Python fold,
    for any input multiset and any reducer count."""
    tmp = tmp_path_factory.mktemp("mrprop")
    src = tmp / "in.txt"
    src.write_text("".join(f"{k}\t{v}\n" for k, v in pairs))

    def mapper(line: str):
        k, v = line.split("\t")
        yield f"{k},{v}"

    def reducer(key: str, values):
        yield f"{key},{sum(int(v) for v in values)}"

    out = run_inprocess(spark, str(src), mapper, reducer, num_reducers=3)
    got = dict(r["value"].split(",") for r in out.collect())

    want = Counter()
    for k, v in pairs:
        want[k] += v
    assert got == {k: str(v) for k, v in want.items()}


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="ab cd", min_size=0, max_size=40), min_size=1, max_size=12
    )
)
def test_exact_dedup_partitions_ids(spark, texts):
    """exact_dedup: dup_counts sum to row count; each surviving id is the
    min of its normalization class."""
    from yet_another_map_reduce_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = exact_dedup(df, "text", "doc_id").collect()
    assert sum(r["dup_count"] for r in rows) == len(texts)
    # surviving ids are distinct and each is a legitimate min
    norm = lambda s: " ".join(s.lower().split())  # noqa: E731
    classes: dict[str, int] = {}
    for i, t in enumerate(texts):
        classes.setdefault(norm(t), i)
    assert sorted(r["doc_id"] for r in rows) == sorted(classes.values())


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=14),
        st.integers(min_value=0, max_value=14),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=20,
)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edges_strategy)
def test_connected_components_equals_union_find(spark, edges):
    """The distributed min-label propagation agrees with a driver-side
    union-find on any random small graph."""
    from yet_another_map_reduce_spark.operators.dedup import connected_components

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {x: find(x) for x in parent}

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == want


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    ids=st.lists(st.text(alphabet="abcdef0123456789", min_size=1, max_size=8),
                 min_size=1, max_size=40, unique=True),
    seed=st.integers(min_value=0, max_value=5),
)
def test_deterministic_shuffle_is_permutation(spark, ids, seed):
    from yet_another_map_reduce_spark.operators.sampling import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    out = deterministic_shuffle(df, "doc_id", seed=seed).collect()
    # exactly a permutation: multiset of ids preserved, no dup/loss
    assert Counter(r["doc_id"] for r in out) == Counter(ids)
    # output order is the hash order (stable re-derivation)
    keys = [r["shuffle_key"] for r in out]
    assert keys == sorted(keys)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    n=st.integers(min_value=1, max_value=60),
    weight=st.floats(min_value=0.0, max_value=3.0, allow_nan=False),
    seed=st.integers(min_value=0, max_value=5),
)
def test_mixture_sample_copy_counts_bracket_weight(spark, n, weight, seed):
    import math

    from yet_another_map_reduce_spark.operators.sampling import mixture_sample

    df = spark.range(n).select(F.col("id").alias("doc_id"), F.lit("g").alias("grp"))
    out = mixture_sample(df, "grp", "doc_id", {"g": weight}, seed=seed)
    per_doc = Counter(r["doc_id"] for r in out.collect())
    lo, hi = math.floor(weight), math.ceil(weight)
    # every surviving row is replicated floor(w) or ceil(w) times...
    assert all(c in (lo, hi) and c > 0 for c in per_doc.values())
    # ...and dropped rows only exist when floor(w) == 0
    if lo >= 1:
        assert len(per_doc) == n


@settings(
    deadline=None,
    max_examples=15,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
        ),
        min_size=1,
        max_size=25,
        unique=True,
    ),
    seed=st.one_of(st.none(), st.integers(min_value=0, max_value=99)),
)
def test_md5_hash64_matches_sql_twin(spark, values, seed):
    """The portable hash underpinning every sampling/shuffle/LSH oracle:
    Spark's functions.md5_hash64 and the DuckDB _sql_hash64 expression
    must agree bit-for-bit on arbitrary unicode, for any seed."""
    import duckdb

    from yet_another_map_reduce_spark.functions import md5_hash64
    from yet_another_map_reduce_spark.queries import _sql_hash64

    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = {
        r["v"]: r["h"]
        for r in df.select("v", md5_hash64(F.col("v"), seed).alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    want = dict(
        con.execute(f"SELECT v, {_sql_hash64('v', seed=seed)} FROM t").fetchall()
    )
    assert got == want


docs_strategy = st.lists(
    st.lists(st.sampled_from(KEYS), min_size=1, max_size=12).map(" ".join),
    min_size=1,
    max_size=10,
)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=docs_strategy)
def test_chunk_dedup_conserves_distinct_chunks(spark, texts):
    """For any corpus: every doc's chunk count is ceil(len/k); kept
    counts never exceed totals; and the kept-chunk multiset equals the
    corpus's DISTINCT chunk set exactly (each distinct chunk survives
    exactly once, in its first-occurrence document)."""
    from yet_another_map_reduce_spark.operators.dedup import chunk_dedup

    k = 3
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = chunk_dedup(df, "text", "doc_id", chunk_tokens=k).collect()
    by_id = {r["doc_id"]: r for r in rows}

    def chunks_of(t: str) -> list[str]:
        toks = t.split(" ")
        return [" ".join(toks[i : i + k]) for i in range(0, len(toks), k)]

    all_chunks = [c for t in texts for c in chunks_of(t)]
    assert sum(r["n_kept"] for r in rows) == len(set(all_chunks))
    for i, t in enumerate(texts):
        r = by_id[i]
        assert r["n_chunks"] == len(chunks_of(t))
        assert 0 <= r["n_kept"] <= r["n_chunks"]
        # kept text is the in-order concatenation of this doc's first-
        # occurrence chunks
        seen_before = set()
        for j, tt in enumerate(texts[:i]):
            seen_before.update(chunks_of(tt))
        expect, seen_here = [], set()
        for c in chunks_of(t):
            if c not in seen_before and c not in seen_here:
                expect.append(c)
            seen_here.add(c)
        assert r["dedup_text"] == " ".join(expect)


_yamr_op = st.one_of(
    st.tuples(st.just("overwrite"), st.integers(1, 3)),
    st.tuples(st.just("append"), st.integers(1, 3)),
    st.tuples(st.just("delete"), st.just(0)),
)


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_yamr_op, min_size=1, max_size=3))
def test_yamr_version_history_matches_model(spark, tmp_path_factory, ops):
    """Any sequence of overwrite/append/delete: the live dataset equals
    a plain Python model of the operations, and EVERY snapshot version
    equals the model's state right after the corresponding commit."""
    from yet_another_map_reduce_spark.sources import yamr_format

    yamr_format.register(spark)
    out = str(tmp_path_factory.mktemp("yamrprop") / "ds")
    state: list[str] = []
    history: list[list[str]] = []
    counter = 0
    for kind, n in [("overwrite", 2), *ops]:  # always start with a write
        if kind == "delete":
            if not state:
                continue
            yamr_format.delete_where(spark, out, "tx", "value LIKE 'del-%'")
            state = [v for v in state if not v.startswith("del-")]
        else:
            rows = []
            for _ in range(n):
                prefix = "del-" if counter % 3 == 1 else "keep-"
                rows.append(f"{prefix}{counter}")
                counter += 1
            df = spark.createDataFrame([(v,) for v in rows], "value string")
            (
                df.repartition(1)
                .write.format("yamr")
                .option("path", out)
                .option("name", "tx")
                .mode(kind)
                .save()
            )
            state = rows if kind == "overwrite" else state + rows
        history.append(sorted(state))

    r = lambda: spark.read.format("yamr").option("path", out).option("name", "tx")  # noqa: E731
    assert sorted(x["value"] for x in r().load().collect()) == history[-1]
    versions = yamr_format.list_versions(out, "tx")
    assert versions == list(range(1, len(history) + 1))
    for v, want in zip(versions, history):
        got = sorted(x["value"] for x in r().option("version", v).load().collect())
        assert got == want, f"version {v}"


# ---------------------------------------------------------------------------
# BPE trainer + encoder: the incremental implementations must be
# indistinguishable from the naive reference semantics at any input
# ---------------------------------------------------------------------------

word_table_strategy = st.lists(
    st.tuples(
        st.text(alphabet="abcd", min_size=1, max_size=8),
        st.integers(min_value=1, max_value=50),
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


@settings(max_examples=60, deadline=None)
@given(table=word_table_strategy, n=st.integers(min_value=0, max_value=40))
def test_bpe_incremental_trainer_equals_naive(table, n):
    """The heap/delta trainer replays the naive full-recount argmax
    exactly — same merges, same order, same early stop — on arbitrary
    word tables (tiny alphabet maximizes pair-count ties, the risky
    path for the (count DESC, pair ASC) heap ordering)."""
    from yet_another_map_reduce_spark.operators import text

    assert text.bpe_train_merges(table, n) == text._bpe_train_merges_naive(table, n)


@settings(max_examples=30, deadline=None)
@given(
    words=st.lists(st.text(alphabet="abcdersting", min_size=1, max_size=14),
                   min_size=1, max_size=20),
    data=st.data(),
)
def test_bpe_min_rank_encoder_equals_rank_order_apply(words, data):
    """The Arrow tier's min-rank merge loop == applying every trained
    merge once in rank order (the chained-replace/oracle semantics),
    for words SEEN and UNSEEN in training — the property that licenses
    swapping tiers by merge-table size."""
    from yet_another_map_reduce_spark.operators import text

    table = text.synthetic_word_counts(300, seed=7)
    n = data.draw(st.integers(min_value=1, max_value=200))
    merges = text.bpe_train_merges(table, n)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in words + [table[0][0], table[-1][0]]:
        ref = list(w)
        for m in merges:
            ref = text._bpe_apply_merge(ref, m)
        got = text._bpe_encode_word(w, ranks, {})
        assert got == ref, (w, n)


def test_bpe_8k_encoder_equals_rank_order_apply():
    """The tier-equivalence property AT the realistic table size the
    registered text_bpe_tokenize_8k query ships (8,192 merges, 20k-word
    vocabulary): min-rank encode == applying all 8,192 merges once in
    rank order, on systematically sampled vocabulary words AND
    out-of-vocabulary words (hypothesis covers the property at ≤200
    merges; this pins it where the production table actually lives —
    r8 verdict item 1)."""
    from yet_another_map_reduce_spark.operators import text
    from yet_another_map_reduce_spark.queries import _bpe_realistic_merges

    table = text.synthetic_word_counts(20000)
    merges = _bpe_realistic_merges()  # 8,192 merges over that table
    assert len(merges) == 8192
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    sample = [table[i][0] for i in range(0, len(table), 797)]  # ~26 vocab words
    oov = ["zzzzq", "theringtionment", "xylophone", "aaaa", "q",
           "stationable", "comproized"]
    memo: dict = {}
    for w in sample + oov:
        ref = list(w)
        for m in merges:
            ref = text._bpe_apply_merge(ref, m)
        assert text._bpe_encode_word(w, ranks, memo) == ref, w
    # memoized second pass returns identical results (per-task memo path)
    for w in sample[:5]:
        ref = list(w)
        for m in merges:
            ref = text._bpe_apply_merge(ref, m)
        assert text._bpe_encode_word(w, ranks, memo) == ref, w


def test_bpe_8k_frozen_table_matches_training():
    """Provenance pin for data/bpe_merges_8k.json: retraining from the
    deterministic synthetic vocabulary reproduces the committed table
    byte-for-byte (merge pairs AND rank order).  This is what licenses
    shipping the frozen table to BOTH the Spark query and its DuckDB
    oracle as literal VALUES — if the file were edited or the trainer
    drifted, query and oracle would agree with each other but this test
    would fail (~7 s driver-side train, no Spark session)."""
    import json
    import os

    from yet_another_map_reduce_spark.operators import text
    from yet_another_map_reduce_spark.queries import _BPE_8K_FROZEN

    with open(_BPE_8K_FROZEN) as fh:
        frozen = json.load(fh)
    assert (frozen["n_words"], frozen["seed"], frozen["max_count"]) == (
        20000, 0, 10000,
    )
    retrained = text.bpe_train_merges(
        text.synthetic_word_counts(
            frozen["n_words"], seed=frozen["seed"], max_count=frozen["max_count"]
        ),
        frozen["num_merges"],
    )
    assert [list(p) for p in retrained] == frozen["merges"]
    assert os.path.getsize(_BPE_8K_FROZEN) < 1 << 20  # stays model-parameter scale


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=-(10**6), max_value=10**6), min_size=1, max_size=40
    ),
    lo=st.integers(min_value=-1000, max_value=1000),
    width=st.integers(min_value=1, max_value=2000),
)
def test_zorder_sql_matches_python_morton(spark, vals, lo, width):
    """The generated z-value SQL (evaluated by Spark; the same string
    the DuckDB oracle replays) equals a pure-Python Morton reference —
    bucketing from arbitrary bounds, two-sided clamping, and bit
    interleave over 2 columns — for arbitrary values INCLUDING ones
    outside the bounds."""
    from yet_another_map_reduce_spark.sources.zorder import zorder_sql

    hi = lo + width
    rows = [(v, (v * 7 + 3) % (2 * 10**6) - 10**6) for v in vals]

    def bucket(v: float) -> int:
        frac = (float(v) - lo) / (float(hi) - lo)
        import math

        return max(0, min(255, int(math.floor(frac * 256))))

    def morton(a: int, b: int) -> int:
        z = 0
        for i in range(8):
            z |= ((bucket(a) >> i) & 1) << (2 * i)
            z |= ((bucket(b) >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(rows, "a long, b long")
    z = F.expr(
        zorder_sql(["a", "b"], {"a": (str(lo), str(hi)), "b": (str(lo), str(hi))})
    )
    got = {(r["a"], r["b"]): r["z"] for r in df.select("a", "b", z.alias("z")).collect()}
    for a, b in rows:
        assert got[(a, b)] == morton(a, b), (a, b, lo, hi)


# ---------------------------------------------------------------- avro codec

@settings(max_examples=200, deadline=None)
@given(n=st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_avro_varint_roundtrip_full_int64_range(n):
    """zigzag-varint encode/decode are inverses over the whole int64
    domain (the spec's long type), including the sign extremes the
    arithmetic-shift zigzag must get right."""
    import io

    from yet_another_map_reduce_spark.sources import avro_format

    buf = io.BytesIO()
    avro_format.write_long(buf, n)
    raw = buf.getvalue()
    assert 1 <= len(raw) <= 10
    got, pos = avro_format.read_long(memoryview(raw), 0)
    assert got == n and pos == len(raw)


_avro_row = st.tuples(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),          # long
    st.one_of(st.none(), st.text(max_size=40)),                    # ?string
    st.one_of(st.none(), st.binary(max_size=24)),                  # ?bytes
    st.booleans(),                                                 # boolean
    st.one_of(                                                     # ?double
        st.none(),
        st.floats(allow_nan=False, width=64),
    ),
    st.lists(                                                      # array<long>
        st.integers(min_value=-(2**40), max_value=2**40), max_size=6
    ),
)

_AVRO_PROP_SCHEMA = {
    "type": "record",
    "name": "prop",
    "fields": [
        {"name": "l", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "b", "type": ["null", "bytes"]},
        {"name": "bo", "type": "boolean"},
        {"name": "d", "type": ["null", "double"]},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
    ],
}


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(_avro_row, max_size=20),
    codec=st.sampled_from(["null", "deflate"]),
    block_rows=st.integers(min_value=1, max_value=7),
)
def test_avro_container_roundtrip_arbitrary_rows(tmp_path_factory, rows, codec, block_rows):
    """write_container/read_container are inverses for arbitrary rows of
    every nullable/primitive/array shape, at every codec, and for block
    sizes down to 1 row (maximum sync-marker density) — the pure-Python
    half of the pyavro DataSource, pinned without a JVM in the loop."""
    import os
    import uuid

    from yet_another_map_reduce_spark.sources import avro_format

    p = os.path.join(
        str(tmp_path_factory.mktemp("avroprop")), f"{uuid.uuid4().hex}.avro"
    )
    n = avro_format.write_container(
        p, iter(rows), _AVRO_PROP_SCHEMA, codec=codec, block_rows=block_rows
    )
    assert n == len(rows)
    got = list(avro_format.read_container(p))
    # bytes come back as bytes (inputs may be bytes already); floats exact
    want = [
        (l, s, bytes(b) if b is not None else None, bo, d, list(arr))
        for (l, s, b, bo, d, arr) in rows
    ]
    assert got == want


_AVRO_NESTED_SCHEMA = {
    "type": "record",
    "name": "nprop",
    "fields": [
        {"name": "id", "type": "long"},
        {
            "name": "rec",
            "type": [
                "null",
                {
                    "type": "record",
                    "name": "nprop_rec",
                    "fields": [
                        {"name": "x", "type": "long"},
                        {
                            "name": "tags",
                            "type": {"type": "array", "items": "string"},
                        },
                    ],
                },
            ],
        },
        {"name": "kv", "type": {"type": "map", "values": ["null", "long"]}},
    ],
}

_avro_nested_row = st.tuples(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.one_of(
        st.none(),
        st.tuples(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.lists(st.text(max_size=10), max_size=4),
        ),
    ),
    st.dictionaries(
        st.text(max_size=8),
        st.one_of(
            st.none(), st.integers(min_value=-(2**40), max_value=2**40)
        ),
        max_size=4,
    ),
)


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(_avro_nested_row, max_size=12),
    codec=st.sampled_from(["null", "deflate"]),
    block_rows=st.integers(min_value=1, max_value=5),
)
def test_avro_nested_container_roundtrip(tmp_path_factory, rows, codec, block_rows):
    """Arbitrary NESTED values — nullable records holding arrays, maps
    with nullable values — survive write_container -> read_container
    exactly, across both codecs and pathological block sizes."""
    import os
    import uuid

    from yet_another_map_reduce_spark.sources import avro_format

    p = os.path.join(
        str(tmp_path_factory.mktemp("avronest")), f"{uuid.uuid4().hex}.avro"
    )
    n = avro_format.write_container(
        p, iter(rows), _AVRO_NESTED_SCHEMA, codec=codec, block_rows=block_rows
    )
    assert n == len(rows)
    got = list(avro_format.read_container(p))
    want = [
        (i, (r[0], list(r[1])) if r is not None else None, dict(kv))
        for (i, r, kv) in rows
    ]
    assert got == want


@settings(max_examples=150, deadline=1000)
@given(blob=st.binary(max_size=300))
def test_avro_header_fuzz_fails_loudly_never_hangs(tmp_path_factory, blob):
    """Feeding arbitrary bytes after the magic to the header parser must
    terminate promptly with a clean Python exception (ValueError /
    KeyError / UnicodeDecodeError family) — never hang, never crash the
    interpreter, never return a bogus schema (a valid return requires a
    parseable avro.schema JSON entry, which random bytes cannot form
    without also being a legitimate header)."""
    import os
    import uuid

    from yet_another_map_reduce_spark.sources import avro_format

    p = os.path.join(
        str(tmp_path_factory.mktemp("avrofuzz")), f"{uuid.uuid4().hex}.avro"
    )
    with open(p, "wb") as fh:
        fh.write(b"Obj\x01" + blob)
    try:
        schema, codec, sync, pos = avro_format.read_header(p)
    except (ValueError, KeyError, UnicodeDecodeError, AttributeError, TypeError):
        return
    # astronomically unlikely success path: must still be structurally sane
    assert isinstance(schema, dict) and codec in ("null", "deflate")
    assert len(sync) == 16 and pos <= 4 + len(blob)


_AVRO_WIDE_SCHEMA = {
    "type": "record",
    "name": "wprop",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "d", "type": "double"},
        {"name": "f", "type": ["null", "float"]},
        {"name": "s", "type": "string"},
        {"name": "bo", "type": "boolean"},
        {"name": "dt", "type": {"type": "int", "logicalType": "date"}},
        {
            "name": "ts",
            "type": {"type": "long", "logicalType": "timestamp-micros"},
        },
    ],
}


@settings(max_examples=150, deadline=2000)
@given(
    mode=st.sampled_from(["truncate", "flip"]),
    where=st.floats(min_value=0.0, max_value=1.0),
    flip=st.integers(min_value=1, max_value=255),
    codec=st.sampled_from(["null", "deflate"]),
    shape=st.sampled_from(["nested", "wide"]),
)
def test_avro_block_corruption_fails_loudly_never_hangs(
    tmp_path_factory, mode, where, flip, codec, shape
):
    """Corrupting or truncating the DATA region of a valid container
    (flip one byte / cut the file at an arbitrary point) must terminate
    promptly: either a clean exception (ValueError / IndexError /
    zlib.error / UnicodeDecodeError family) or a list of
    schema-arity rows (avro blocks carry no checksum, so a flipped byte
    can legally decode to different values; truncation at an exact
    block boundary is indistinguishable from a shorter file).  Never a
    hang, never unbounded memory — the anti-hang guards on counts and
    lengths are what this pins."""
    import os
    import uuid
    import zlib

    from yet_another_map_reduce_spark.sources import avro_format

    p = os.path.join(
        str(tmp_path_factory.mktemp("avrocorrupt")), f"{uuid.uuid4().hex}.avro"
    )
    import datetime

    if shape == "nested":
        schema = _AVRO_NESTED_SCHEMA
        rows = [
            (i, (i * 7, ["t", "u"]), {"k": i, "z": None}) for i in range(50)
        ]
        arity = 3
    else:  # wide: reaches the double/float/date/timestamp decode guards
        schema = _AVRO_WIDE_SCHEMA
        ep = datetime.datetime(1970, 1, 1)
        rows = [
            (
                i,
                i * 0.5,
                float(i) if i % 3 else None,
                f"s{i}",
                bool(i % 2),
                datetime.date(2026, 1, 1),
                ep + datetime.timedelta(seconds=i),
            )
            for i in range(50)
        ]
        arity = 7
    avro_format.write_container(
        p, iter(rows), schema, codec=codec, block_rows=8
    )
    raw = open(p, "rb").read()
    _, _, _, data_pos = avro_format.read_header(p)
    span = len(raw) - data_pos
    off = data_pos + min(span - 1, int(where * span))
    if mode == "truncate":
        bad = raw[: off + 1]
    else:
        bad = raw[:off] + bytes([raw[off] ^ flip]) + raw[off + 1 :]
    with open(p, "wb") as fh:
        fh.write(bad)
    try:
        got = list(avro_format.read_container(p))
    except (ValueError, IndexError, UnicodeDecodeError, zlib.error, OverflowError):
        return
    assert all(isinstance(r, tuple) and len(r) == arity for r in got)
    assert len(got) <= len(rows)


@settings(max_examples=30, deadline=None)
@given(
    rows=st.lists(_avro_row, max_size=16),
    block_rows=st.integers(min_value=1, max_value=5),
)
def test_avro_codegen_paths_equal_interpreted_paths(
    tmp_path_factory, rows, block_rows
):
    """The generated codec is pinned BYTE-EQUAL (write side) and
    VALUE-EQUAL (read side) to the interpreted `_write_value` /
    `_read_value` paths on arbitrary rows — so a codegen bug can't hide
    behind the roundtrip tests' our-writer-our-reader symmetry."""
    import io
    import os
    import uuid
    from unittest import mock

    from yet_another_map_reduce_spark.sources import avro_format

    d = str(tmp_path_factory.mktemp("avrodiff"))
    plans = [
        avro_format._plan_field(f)[1]
        for f in _AVRO_PROP_SCHEMA["fields"]
    ]

    # write side: generated encoder output == interpreted encoder output
    # (on the flat prefix — the trailing array field is outside the
    # compiled subset by design, so the full schema must NOT compile)
    assert avro_format._compile_row_encoder(plans) is None
    flat_plans = plans[:-1]
    enc = avro_format._compile_row_encoder(flat_plans)
    assert enc is not None, "flat primitive schema must compile"
    for row in rows:
        flat = row[:-1]
        gen = bytearray()
        enc(gen, flat)
        ref = io.BytesIO()
        for v, (typ, nullable) in zip(flat, flat_plans):
            avro_format._write_value(ref, v, typ, nullable)
        assert bytes(gen) == ref.getvalue(), f"encoder divergence on {flat!r}"

    # read side: force the interpreted decoder and compare full reads
    p = os.path.join(d, f"{uuid.uuid4().hex}.avro")
    avro_format.write_container(
        p, iter(rows), _AVRO_PROP_SCHEMA, codec="null", block_rows=block_rows
    )
    with_codegen = list(avro_format.read_container(p))

    def interpreted(plans_):
        def _decode(view, count):
            out, pos = [], 0
            for _ in range(count):
                r = []
                for typ, nullable in plans_:
                    v, pos = avro_format._read_value(view, pos, typ, nullable)
                    r.append(v)
                out.append(tuple(r))
            return out

        return _decode

    with mock.patch.object(
        avro_format, "_compile_block_decoder", interpreted
    ):
        with_interpreter = list(avro_format.read_container(p))
    assert with_codegen == with_interpreter


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            # a tiny line alphabet so cross-doc repeats actually occur;
            # both boilerplate-eligible (>=10 chars) and short lines
            st.sampled_from(
                [
                    "shared boilerplate banner line",
                    "another repeated long line here",
                    "unique-ish filler text segment",
                    "short",
                    "",
                    "  padded boilerplate line  ",
                ]
            ),
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    ),
    freq=st.integers(min_value=1, max_value=3),
)
def test_remove_common_lines_equals_python_reference(spark, docs, freq):
    """remove_common_lines == the obvious in-Python reference: count
    distinct docs per trimmed line (>= 10 chars), delete lines over the
    threshold, keep order, never drop a doc."""
    from yet_another_map_reduce_spark.operators.text import remove_common_lines

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
        for r in remove_common_lines(df, max_doc_freq=freq).collect()
    }

    # reference: split EXACTLY like the operator (split of "" is [""])
    split = {i: t.split("\n") for i, t in rows}
    docfreq: dict[str, set[int]] = {}
    for i, lines in split.items():
        for ln in lines:
            if len(ln.strip()) >= 10:
                docfreq.setdefault(ln.strip(), set()).add(i)
    boiler = {k for k, s in docfreq.items() if len(s) > freq}
    for i, lines in split.items():
        kept = [
            ln
            for ln in lines
            if not (len(ln.strip()) >= 10 and ln.strip() in boiler)
        ]
        assert got[i] == (
            "\n".join(kept),
            len(lines),
            len(lines) - len(kept),
        ), f"doc {i}"
    assert set(got) == set(split)  # the spine never drops a doc
