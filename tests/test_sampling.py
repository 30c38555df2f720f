"""Semantics tests for operators/sampling.py, windows.validity_intervals,
and aggregates.profile_columns (oracle parity covered by the
`sample_hash_split`/`sample_reservoir_group`/`scd2_intervals`/
`profile_columns` registry entries)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from yet_another_map_reduce_spark.operators import aggregates, sampling, windows


def test_hash_split_is_deterministic_and_partition_invariant(spark):
    df = spark.range(2000).withColumnRenamed("id", "k")
    a = sampling.hash_split(df, "k", 0, 100).collect()
    b = sampling.hash_split(df.repartition(7), "k", 0, 100).collect()
    assert sorted(r["k"] for r in a) == sorted(r["k"] for r in b)
    # ~10% within loose tolerance
    assert 120 <= len(a) <= 280


def test_hash_split_ranges_partition_the_input(spark):
    df = spark.range(500).withColumnRenamed("id", "k")
    train = sampling.hash_split(df, "k", 0, 800)
    test = sampling.hash_split(df, "k", 800, 1000)
    assert train.count() + test.count() == 500
    assert train.join(test, "k").count() == 0


def test_reservoir_per_group_size_and_stability(spark):
    rows = [(i, "g%d" % (i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, g string")
    a = sampling.reservoir_per_group(df, ["g"], "id", 4)
    assert a.groupBy("g").count().where("count != 4").count() == 0
    b = sampling.reservoir_per_group(df.repartition(5), ["g"], "id", 4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # different seed → (almost surely) different sample
    c = sampling.reservoir_per_group(df, ["g"], "id", 4, seed=1)
    assert sorted(map(tuple, a.collect())) != sorted(map(tuple, c.collect()))


def test_validity_intervals_chain_and_open_end(spark):
    t = lambda d: dt.datetime(2024, 1, d)
    df = spark.createDataFrame(
        [(1, t(1)), (1, t(5)), (2, t(3))], "k long, ts timestamp"
    )
    out = windows.validity_intervals(df, ["k"], ["ts"], "ts").collect()
    got = {(r["k"], r["ts"].day): r["valid_to"] for r in out}
    assert got[(1, 1)] == t(5)
    assert got[(1, 5)].year == 2199 and got[(2, 3)].year == 2199


def test_profile_columns_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "b")], "id long, s string"
    )
    got = {r["col_name"]: r for r in aggregates.profile_columns(df, ["id", "s"]).collect()}
    assert got["id"]["n_rows"] == 4 and got["id"]["n_nulls"] == 0 and got["id"]["n_distinct"] == 4
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2


def test_deterministic_shuffle_is_layout_invariant(spark):
    df = spark.range(200).withColumnRenamed("id", "doc_id")
    a = [r["doc_id"] for r in sampling.deterministic_shuffle(df, "doc_id", seed=1).collect()]
    b = [
        r["doc_id"]
        for r in sampling.deterministic_shuffle(df.repartition(13), "doc_id", seed=1).collect()
    ]
    assert a == b  # permutation independent of partition layout
    assert a != list(range(200))  # actually shuffled
    c = [r["doc_id"] for r in sampling.deterministic_shuffle(df, "doc_id", seed=2).collect()]
    assert a != c  # a different seed gives a different epoch order


def test_mixture_sample_replicates_and_drops_by_weight(spark):
    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "double")
        .when(F.col("id") % 3 == 1, "keep")
        .otherwise("drop")
        .alias("grp"),
    )
    out = sampling.mixture_sample(
        df, "grp", "doc_id", {"double": 2.0, "keep": 1.0, "drop": 0.0}, seed=0
    )
    rows = out.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.max("copy_id").alias("maxc")
    )
    got = {r["grp"]: (r["n"], r["maxc"]) for r in rows.collect()}
    assert got["double"] == (200, 2)  # every row exactly twice
    assert got["keep"] == (100, 1)
    assert "drop" not in got  # weight 0 removes the group entirely


def test_mixture_sample_fractional_weight_is_hash_exact(spark):
    from yet_another_map_reduce_spark.functions import md5_hash64

    df = spark.range(1000).select(F.col("id").alias("doc_id"), F.lit("g").alias("grp"))
    out = sampling.mixture_sample(df, "grp", "doc_id", {"g": 0.25}, seed=5)
    kept = {r["doc_id"] for r in out.collect()}
    expected = {
        r["doc_id"]
        for r in df.where(F.pmod(md5_hash64("doc_id", 5), F.lit(1000)) < 250).collect()
    }
    assert kept == expected  # the exact hash-bucket rule, not approximately-25%


def test_mixture_sample_by_weights_matches_literal_variant(spark):
    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("grp"),
    )
    lit = sampling.mixture_sample(df, "grp", "doc_id", {"a": 1.5, "b": 0.25}, seed=9)
    wdf = spark.createDataFrame([("a", 1.5), ("b", 0.25)], "grp string, weight double")
    tab = sampling.mixture_sample_by_weights(df, "grp", "doc_id", wdf, seed=9)
    assert sorted(map(tuple, lit.select("doc_id", "copy_id").collect())) == sorted(
        map(tuple, tab.select("doc_id", "copy_id").collect())
    )
    # a group absent from the weights table falls back to default 1.0
    wdf_partial = spark.createDataFrame([("a", 2.0)], "grp string, weight double")
    part = sampling.mixture_sample_by_weights(df, "grp", "doc_id", wdf_partial, seed=9)
    got = {r["grp"]: r["n"] for r in part.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {"a": 400, "b": 200}


def test_stratified_hash_sample_layout_invariant_and_rate(spark):
    df = spark.range(3000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, "A").when(F.col("id") % 3 == 1, "B")
        .otherwise("C").alias("s"),
    )
    frac = {"A": 0.1, "B": 0.3}  # C absent -> dropped
    a = sampling.stratified_hash_sample(df, "k", "s", frac, seed=1).collect()
    b = sampling.stratified_hash_sample(df.repartition(11), "k", "s", frac, seed=1).collect()
    assert sorted(r["k"] for r in a) == sorted(r["k"] for r in b)
    by_s = {}
    for r in a:
        by_s[r["s"]] = by_s.get(r["s"], 0) + 1
    assert "C" not in by_s
    assert 0.05 < by_s["A"] / 1000 < 0.15
    assert 0.2 < by_s["B"] / 1000 < 0.4


def test_heavy_hitters_exact_matches_full_group_by(spark):
    # skewed corpus: items 0..4 hot, a 2000-item tail
    df = spark.range(10000).select(
        F.when(F.col("id") % 2 == 0, (F.col("id") % 5).cast("string"))
        .otherwise(F.concat(F.lit("tail"), (F.col("id") % 2000).cast("string")))
        .alias("v")
    )
    k = 20
    got = aggregates.heavy_hitters_exact(df, "v", k=k).collect()
    n = df.count()
    exact = {
        r["v"]: r["c"]
        for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("c")).collect()
        if r["c"] * (k + 1) > n
    }
    assert {r["item"]: r["count"] for r in got} == exact
    # and the guarantee is partitioning-independent
    got2 = aggregates.heavy_hitters_exact(df.repartition(13), "v", k=k).collect()
    assert {r["item"]: r["count"] for r in got2} == exact


def test_balanced_sample_caps_and_covers_every_cluster(spark, sf_dir):
    """The diversity-sampling contract: every k-means cluster
    contributes min(20, its size) vectors — so tail clusters keep full
    representation while head clusters are capped — and the selection
    is the deterministic hash-ranked reservoir (stable across
    partitionings)."""
    from yet_another_map_reduce_spark.operators import similarity
    from yet_another_map_reduce_spark.queries import QUERIES
    from yet_another_map_reduce_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    sizes = {
        r["cluster_id"]: r["n"]
        for r in similarity.kmeans_assign(
            emb, "vec_id", "embedding", nlist=8, iterations=2
        ).groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got: dict[int, int] = {}
    for r in QUERIES["embedding_balanced_sample"](spark, sf_dir).collect():
        got[r["cluster_id"]] = got.get(r["cluster_id"], 0) + 1
    assert set(got) == set(sizes), "every non-empty cluster must contribute"
    for cid, n in sizes.items():
        assert got[cid] == min(20, n), (cid, n, got[cid])


def test_reservoir_tiers_agree_on_null_group_keys(spark):
    """The big tier's summary join-back is null-safe: a NULL group key
    is a group (the window tier's semantics), not a dropped row —
    previously the same call returned different samples depending only
    on input size (r15 review finding)."""
    from yet_another_map_reduce_spark.operators import sampling

    rows = [(i, None if i % 2 else "g") for i in range(40)]
    df = spark.createDataFrame(rows, "id long, grp string")
    small = sampling.reservoir_per_group(df, ["grp"], "id", k=3, n=40)
    big = sampling.reservoir_per_group(
        df, ["grp"], "id", k=3, n=40, single_task_threshold=1
    )
    key = lambda t: (t[0] is None, t[0] or "", t[1])  # noqa: E731
    s = sorted(((r["grp"], r["id"]) for r in small.collect()), key=key)
    b = sorted(((r["grp"], r["id"]) for r in big.collect()), key=key)
    assert s == b
    assert sum(1 for g, _ in s if g is None) == 3  # NULL group sampled


def test_hash_split_keeps_null_ids_exhaustive(spark):
    """NULL ids land in SOME bucket (hashed as ''), so disjoint ranges
    stay jointly exhaustive — previously NULL-id rows vanished from
    train, val, AND test."""
    from yet_another_map_reduce_spark.operators import sampling

    df = spark.createDataFrame(
        [(str(i),) for i in range(20)] + [(None,)], "id string"
    )
    a = sampling.hash_split(df, "id", 0, 500).count()
    b = sampling.hash_split(df, "id", 500, 1000).count()
    assert a + b == 21  # the NULL-id row is in exactly one split


def test_mixture_sample_replicates_null_id_rows(spark):
    """A NULL-id row with weight >= 1 yields floor(weight) copies, not
    silent omission (NULL hash propagated into __copies before)."""
    from yet_another_map_reduce_spark.operators import sampling

    df = spark.createDataFrame([("en", None), ("en", "a")], "lang string, id string")
    out = sampling.mixture_sample(df, "lang", "id", {"en": 2.0}).collect()
    ids = sorted(
        ((r["id"], r["copy_id"]) for r in out),
        key=lambda t: (t[0] is not None, t[0] or "", t[1]),
    )
    assert ids == [(None, 1), (None, 2), ("a", 1), ("a", 2)]


def test_mixture_by_weights_tolerates_caller_weight_column(spark):
    """weights_df's weight column is namespaced internally: a df that
    already carries 'weight' no longer hits an ambiguous reference,
    and the caller's column survives in the output."""
    from yet_another_map_reduce_spark.operators import sampling

    df = spark.createDataFrame(
        [("en", "a", 7.0), ("de", "b", 9.0)], "lang string, id string, weight double"
    )
    wdf = spark.createDataFrame([("en", 2.0)], "lang string, weight double")
    out = sampling.mixture_sample_by_weights(df, "lang", "id", wdf).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r["weight"])
    assert by_id["a"] == [7.0, 7.0]  # en weight 2 -> two copies, caller col intact
    assert by_id["b"] == [9.0]       # default weight 1


def test_sampling_guards_reject_column_collisions(spark):
    import pytest

    from yet_another_map_reduce_spark.operators import sampling

    df = spark.createDataFrame([(1, 2)], "id long, shuffle_key long")
    with pytest.raises(ValueError, match="shuffle_key"):
        sampling.deterministic_shuffle(df, "id")
    df2 = spark.createDataFrame([("en", 1, 3)], "lang string, id long, copy_id long")
    with pytest.raises(ValueError, match="copy_id"):
        sampling.mixture_sample(df2, "lang", "id", {"en": 1.0})
