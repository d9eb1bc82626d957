#!/usr/bin/env python
"""Hot-bucket cap A/B: measure what `bucket_cap` buys on a skew-augmented
corpus.

Takes the sf0.1 documents table and plants ONE hot cluster of C identical
documents (the pathological shape at corpus scale: boilerplate, legal
disclaimers, scraped templates). Uncapped, banded LSH must expand
C*(C-1)/2 pairs *per band* from a single bucket row — cost and memory
quadratic in C, concentrated in one task. Capped, the bucket is dropped
before expansion (cost O(cap^2)) and `lsh_bucket_overflow` accounts for
every skipped bucket.

The sweep runs C in (500, 1000, 2000) uncapped to show the quadratic wall
growth, and capped (cap=64) to show flat cost — plus the overflow
side-channel totals proving nothing is silently lost. C=10000 uncapped is
deliberately NOT run: a single bucket row would materialize a 50M-element
pair array (~GBs in one task) — the exact failure mode the cap exists to
prevent; the quadratic fit from the measured points extrapolates its cost.

Usage: python scripts/lsh_cap_bench.py [OUT.json]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from polars_ad_etl_spark.operators.dedup import (  # noqa: E402
    dedup_minhash_lsh_pairs,
    lsh_bucket_overflow,
)
from polars_ad_etl_spark.session import get_spark  # noqa: E402

HOT_TEXT = (
    "this exact boilerplate disclaimer paragraph is repeated verbatim on "
    "every scraped page of the template site and is the classic hot "
    "bucket at corpus scale"
)
CAP = 64


def planted_dir(spark, base_sf: str, c: int) -> str:
    work = tempfile.mkdtemp(prefix=f"lsh_cap_{c}_")
    d = spark.read.parquet(f"{base_sf}/documents.parquet")
    max_id = d.agg(F.max("doc_id")).collect()[0][0]
    hot = spark.range(c).select(
        (F.col("id") + max_id + 1).alias("doc_id"),
        F.lit(HOT_TEXT).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("template-site").alias("source"),
        F.lit(len(HOT_TEXT)).cast("long").alias("n_chars"),
    )
    d.unionByName(hot).write.mode("overwrite").parquet(f"{work}/documents.parquet")
    return work


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "ROUND5_lsh_cap.json"
    spark = get_spark("lsh-cap-bench")
    base = "/root/testdata/sf0.1"
    # warmup: compile both plan shapes on the tiny SF
    dedup_minhash_lsh_pairs(spark, "/root/testdata/sf0.001").count()
    dedup_minhash_lsh_pairs(spark, "/root/testdata/sf0.001", bucket_cap=CAP).count()

    result = {"cap": CAP, "planted_sizes": [], "baseline_sf": 0.1}
    for c in (500, 1000, 2000):
        work = planted_dir(spark, base, c)
        rec = {"cluster_size": c}
        t0 = time.perf_counter()
        rec["uncapped_pairs"] = dedup_minhash_lsh_pairs(spark, work).count()
        rec["uncapped_wall"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        rec["capped_pairs"] = dedup_minhash_lsh_pairs(
            spark, work, bucket_cap=CAP
        ).count()
        rec["capped_wall"] = round(time.perf_counter() - t0, 2)
        over = (
            lsh_bucket_overflow(spark, work, CAP)
            .agg(
                F.count("*").alias("buckets"),
                F.sum("dropped_pairs").alias("dropped_upper"),
            )
            .collect()[0]
        )
        rec["dropped_buckets"] = over.buckets
        rec["dropped_pairs_upper_bound"] = over.dropped_upper
        # accounting: every pair present uncapped is either still emitted
        # capped or attributable to a dropped bucket
        rec["accounted"] = (
            rec["capped_pairs"] + over.dropped_upper >= rec["uncapped_pairs"]
        )
        result["planted_sizes"].append(rec)
        print(rec, flush=True)
        shutil.rmtree(work, ignore_errors=True)

    # same A/B for the embedding-cosine candidate generator: plant a
    # cluster of C near-identical vectors (one hot sign-LSH bucket) into
    # the sf0.1 embeddings table
    from polars_ad_etl_spark.operators.dedup import (
        dedup_embedding_cosine_pairs,
        embedding_bucket_overflow,
    )

    result["embedding_planted_sizes"] = []
    base_e = spark.read.parquet(f"{base}/embeddings.parquet")
    dim = len(base_e.select("embedding").first()[0])
    max_vid = base_e.agg(F.max("vec_id")).collect()[0][0]
    for c in (500, 1000, 2000):
        work = tempfile.mkdtemp(prefix=f"cos_cap_{c}_")
        hot = spark.range(c).select(
            (F.col("id") + max_vid + 1).alias("vec_id"),
            F.expr(
                f"transform(sequence(1, {dim}),"
                " j -> CAST(1.0 + 1e-4 * id * sin(j) AS FLOAT))"
            ).alias("embedding"),
            F.lit(999).alias("label"),
        )
        base_e.unionByName(hot).write.mode("overwrite").parquet(
            f"{work}/embeddings.parquet"
        )
        rec = {"cluster_size": c}
        t0 = time.perf_counter()
        rec["uncapped_pairs"] = dedup_embedding_cosine_pairs(spark, work).count()
        rec["uncapped_wall"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        rec["capped_pairs"] = dedup_embedding_cosine_pairs(
            spark, work, bucket_cap=CAP
        ).count()
        rec["capped_wall"] = round(time.perf_counter() - t0, 2)
        over = (
            embedding_bucket_overflow(spark, work, CAP)
            .agg(
                F.count("*").alias("buckets"),
                F.sum("dropped_candidates").alias("dropped"),
            )
            .collect()[0]
        )
        rec["dropped_buckets"] = over.buckets
        rec["dropped_candidates"] = over.dropped
        result["embedding_planted_sizes"].append(rec)
        print(rec, flush=True)
        shutil.rmtree(work, ignore_errors=True)
    Path(out_path).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
