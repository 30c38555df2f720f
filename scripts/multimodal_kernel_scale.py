"""Scaling measurement for the multimodal HASH KERNELS (the per-row
work the r14 near-dup operators add): image_phash aHash + DCT tiers,
audio_fingerprint, and the video frame-sample→hash chain, each timed at
a base media count and at 10×.

Scope note (why kernels, not end-to-end near-dup): the banded-Hamming
JOIN substrate these operators feed was scale-measured on the text
family in earlier rounds (BASELINE.md simhash/minhash 10×/100× rows) —
the media variants reuse it unchanged, shuffling only 8-byte hashes.
The synthetic media fixtures can only produce 256 distinct pixel
patterns, so an end-to-end near-dup "scale" run on them measures the
quadratic growth of its own duplicate-clique OUTPUT, not engine
behavior; the kernels are the genuinely new work and should scale
linearly (map-only, Arrow-batched, no shuffle).

Media ids are expanded ``doc_id * K + copy`` so the 10× corpus has 10×
distinct media, not 10 replicas of the same ids.

Usage: python scripts/multimodal_kernel_scale.py [base_n]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from yet_another_map_reduce_spark.operators import multimodal  # noqa: E402
from yet_another_map_reduce_spark.session import build_session  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(fn, runs: int = 3) -> float:
    fn()  # warm-up
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    load = os.getloadavg()[0]
    if load > 4.0:
        print(f"WARNING: loadavg {load:.1f} — readings may be contaminated")
    spark = build_session(app_name="multimodal-kernel-scale")

    def media_ids(n: int):
        per = max(1, n // 5000)
        return (
            spark.range(5000)
            .select(F.explode(F.sequence(F.lit(0), F.lit(per - 1))).alias("c"), "id")
            .select((F.col("id") * per + F.col("c")).alias("doc_id"))
            .limit(n)
        )

    results = {}
    for n in (base_n, base_n * 10):
        ids = media_ids(n)
        img = multimodal.synthetic_ppm_media(ids, "doc_id", width=16, height=16)
        wav = multimodal.synthetic_wav_media(ids, "doc_id", n_samples=800)
        vid = multimodal.synthetic_video_media(
            ids, "doc_id", n_frames=6, frame_ms=40, width=8, height=8
        )
        legs = {
            "image_phash_ahash": lambda: force(
                multimodal.image_phash(img, kind="ahash")
            ),
            "image_phash_dct": lambda: force(multimodal.image_phash(img, kind="dct")),
            "audio_fingerprint": lambda: force(multimodal.audio_fingerprint(wav)),
            "audio_fp_spectral": lambda: force(
                multimodal.audio_fingerprint(wav, kind="spectral")
            ),
            "video_frame_hashes": lambda: force(
                multimodal._video_frame_fingerprints(vid, 40, 8, "ahash")
            ),
        }
        for name, fn in legs.items():
            sec = timed(fn)
            results.setdefault(name, []).append(sec)
            print(f"n={n:>7} {name:20} {sec:8.3f}s", flush=True)

    print("\nratios (10x data):")
    for name, (a, b) in results.items():
        print(f"  {name:20} {b / a:5.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
