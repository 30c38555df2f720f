"""End-to-end throughput of the streaming ingest pipeline at sf0.1:
bootstrap an IVF-PQ index on the first half of the documents table,
then stream the second half (plus a 20% planted-duplicate tail) through
dedup -> quality gate -> embed -> index append in N micro-batches, and
report docs/sec plus the per-stage batch cadence.

Usage: python scripts/ingest_throughput.py [n_batches]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from yet_another_map_reduce_spark.operators import classify, dedup, similarity, text  # noqa: E402
from yet_another_map_reduce_spark.queries import (  # noqa: E402
    _CLASSIFIER_FEATURE_COLS,
    _classifier_features,
    with_classifier_features,
)
from yet_another_map_reduce_spark.session import build_session  # noqa: E402
from yet_another_map_reduce_spark.sources.readers import read_table  # noqa: E402
from yet_another_map_reduce_spark.streaming import file_stream, streaming_ingest_pipeline  # noqa: E402


featurize = with_classifier_features


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    load = os.getloadavg()[0]
    if load > 4.0:
        print(f"WARNING: loadavg {load:.1f} — readings may be contaminated")

    spark = build_session(app_name="ingest-throughput")
    docs = read_table(spark, "/root/testdata/sf0.1", "documents")
    n_docs = docs.count()
    cut = n_docs // 2
    boot = docs.where(F.col("doc_id") < cut)
    inc = docs.where(F.col("doc_id") >= cut)
    dups = (
        boot.where(F.col("doc_id") < cut // 5)
        .withColumn("doc_id", F.col("doc_id") + 10 * n_docs)
    )
    payload = inc.unionByName(dups)
    n_payload = payload.count()

    model = classify.perceptron_train_averaged(
        _classifier_features(docs), "y", _CLASSIFIER_FEATURE_COLS, iterations=3
    ).collect()
    last = max(model, key=lambda r: r["iteration"])
    weights = [last[f"s{k}"] for k in range(len(_CLASSIFIER_FEATURE_COLS) + 1)]
    # data-driven cut (the corpus is majority non-en, so margin>0 keeps
    # nothing): gate at the median margin so ~half of each batch passes
    threshold = int(
        classify.perceptron_score(
            _classifier_features(docs), weights, _CLASSIFIER_FEATURE_COLS, "doc_id"
        ).agg(F.expr("percentile(margin, 0.5)")).collect()[0][0]
    )

    work = "/tmp/ingest_throughput"
    shutil.rmtree(work, ignore_errors=True)
    index_dir, seen_dir = os.path.join(work, "idx"), os.path.join(work, "seen")
    boot_vecs = text.hash_embed_dense(boot.select("doc_id", "text"), "text", "doc_id")
    t0 = time.perf_counter()
    similarity.build_ivfpq_index_auto(
        boot_vecs, "doc_id", "embedding", index_dir,
        books=similarity.train_pq_codebooks(boot_vecs, "doc_id", "embedding"),
    )
    dedup.batch_fingerprints(boot, "text").write.parquet(
        os.path.join(seen_dir, "batch=-1")
    )
    t_boot = time.perf_counter() - t0

    replay = os.path.join(work, "replay")
    payload.repartition(n_batches).write.parquet(replay)
    stream = file_stream(spark, replay, payload.schema, fmt="parquet",
                         max_files_per_trigger=1)
    t0 = time.perf_counter()
    q = streaming_ingest_pipeline(
        stream,
        index_dir=index_dir,
        seen_dir=seen_dir,
        checkpoint_dir=os.path.join(work, "ckpt"),
        weights=weights,
        feature_cols=_CLASSIFIER_FEATURE_COLS,
        featurize=featurize,
        threshold=threshold,
    )
    q.awaitTermination()
    t_stream = time.perf_counter() - t0

    live = similarity._resolve_index_dir(index_dir)
    segs = similarity._segment_names(live, index_dir)
    print(
        f"bootstrap: {cut} docs indexed in {t_boot:.1f}s; "
        f"stream: {n_payload} docs ({n_batches} micro-batches, "
        f"{len(segs) - 1} appended segments) in {t_stream:.1f}s "
        f"= {n_payload / t_stream:.0f} docs/s end-to-end "
        f"({t_stream / n_batches:.2f}s per micro-batch)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
