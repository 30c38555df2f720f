"""Measure recall@10 vs probe_fraction on PLANTED anisotropic,
overlapping clusters — the geometry where a fixed nprobe loses recall
(r10 verdict item 3 / handoff: the benchmark corpus's well-separated
clusters measure FLAT 0.900 recall from 2.5% to 25% probed, so they
cannot demonstrate the probe_fraction knob).

Clusters are drawn close together (center sigma comparable to the
within-cluster spread) with per-axis anisotropic scales, so a vector's
true cosine neighborhood straddles several IVF cells; recall then
slopes with the probed fraction instead of plateauing at the floor.

Results go into BASELINE.md ("Round-11: sloped recall-vs-probe_fraction
on planted anisotropic geometry").

Usage: python scripts/probe_fraction_recall.py [n_clusters per_cluster dim]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from yet_another_map_reduce_spark.fixtures import planted_anisotropic  # noqa: E402

from yet_another_map_reduce_spark.operators import similarity  # noqa: E402
from yet_another_map_reduce_spark.session import build_session  # noqa: E402


def recall_at(out_df, exact: dict[int, set[int]]) -> float:
    got: dict[int, set[int]] = {}
    for r in out_df.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    per_q = [len(exact[qid] & got.get(qid, set())) / len(exact[qid]) for qid in exact]
    return round(sum(per_q) / len(per_q), 4)


def main() -> None:
    n_clusters = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    load = os.getloadavg()[0]
    if load > 4.0:
        print(f"WARNING: loadavg {load:.1f} — readings may be contaminated")

    spark = build_session(app_name="probe-fraction-recall")
    df = planted_anisotropic(spark, n_clusters, per, dim).cache()
    n = df.count()
    q = df.where(F.col("vec_id") % (n // 8) == 0)
    print(f"corpus n={n}, dim={dim}, clusters={n_clusters}, queries={q.count()}")

    exact: dict[int, set[int]] = {}
    for r in similarity.cosine_topk(df, q, "vec_id", "embedding", k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    # High-resolution codebooks (m=8 subspaces x 32 codes): keep PQ
    # quantization error well below the cell-miss signal, so recall-vs-
    # probe_fraction isolates what the knob controls.  The default
    # m=4/k=8 books collapse this overlapping geometry into so few
    # distinct codes that even EXHAUSTIVE probing reads recall ~0.09 —
    # measured before settling on these sizes.
    index_dir = f"/tmp/probe_fraction_idx_{n_clusters}_{per}_{dim}"
    if not os.path.exists(os.path.join(index_dir, "CURRENT")):
        cent = similarity.ivf_centroids(df, "vec_id", "embedding", nlist=n_clusters)
        books = similarity.train_pq_codebooks(
            df, "vec_id", "embedding", m=8, k=32, iterations=3
        )
        similarity.build_ivfpq_index(
            df, "vec_id", "embedding", index_dir, centroids=cent, books=books
        )

    # two recall columns: vs exact cosine (end-to-end quality, includes
    # the constant PQ quantization loss) and vs the EXHAUSTIVE-ADC
    # result (pf=1.0) — the latter isolates exactly the loss the knob
    # controls: true ADC neighbors living in unprobed cells.
    adc_full: dict[int, set[int]] = {}
    for r in similarity.search_ivfpq_index(
        spark, index_dir, q, "vec_id", "embedding", k=10, probe_fraction=1.0
    ).collect():
        adc_full.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    print(
        f"{'probe_fraction':>14} {'nprobe':>6} {'recall_vs_exact':>15} "
        f"{'recall_vs_full_adc':>18} {'sec':>6}"
    )
    import math

    for pf in (0.05, 0.1, 0.2, 0.3, 0.5, 1.0):
        t0 = time.perf_counter()
        out = similarity.search_ivfpq_index(
            spark, index_dir, q, "vec_id", "embedding", k=10, probe_fraction=pf
        ).cache()
        rec = recall_at(out, exact)
        rec_adc = recall_at(out, adc_full)
        sec = time.perf_counter() - t0
        out.unpersist()
        nprobe = min(n_clusters, max(4, math.ceil(pf * n_clusters)))
        print(f"{pf:>14} {nprobe:>6} {rec:>15} {rec_adc:>18} {sec:>6.2f}")

    spark.stop()


if __name__ == "__main__":
    main()
