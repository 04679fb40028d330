"""End-to-end training-data curation pipeline over the documents
corpus: the charter-C operators composed the way a pretraining data
run actually chains them.

    quality filter (Gopher rules, c23 logic)
      -> exact dedup          (keep min-id per content hash)
      -> near-dup removal     (MinHash-LSH pairs -> connected
                               components -> keep canonical)
      -> decontamination      (drop train docs sharing 3-gram
                               shingles with the held-out split)
      -> mixture resampling   (per-language epoch weights)
      -> packing accounting   (256-token training batches)

Each stage is lazy; one action at the end prints the funnel.  Run:
    python scripts/run_curation_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tp_airflow_gtfs_snowflake_spark.operators import dedup as D  # noqa: E402
from tp_airflow_gtfs_snowflake_spark.operators.components import (  # noqa: E402
    dedup_keep_canonical)
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import _t  # noqa: E402
from tp_airflow_gtfs_snowflake_spark.session import get_spark  # noqa: E402

_STOPS = ("the", "a", "of", "and", "in")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("curation-demo")
    docs = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism)
    funnel: list[tuple[str, int]] = [("raw corpus", docs.count())]

    # 1. quality filter (Gopher-style integer rules, c23)
    toks = F.split(F.trim(F.lower("text")), " +")
    q = (docs.withColumn("n_words", F.size(toks))
         .withColumn("n_stop", F.size(F.filter(toks,
                                               lambda w: w.isin(*_STOPS))))
         .filter((F.col("n_words") >= 5) & (F.col("n_stop") >= 1))
         .drop("n_words", "n_stop"))
    funnel.append(("quality-filtered", q.count()))

    # 2. exact dedup (md5 groupBy, min-id keeper)
    q = D.dedup_exact(q, "doc_id", "text")
    funnel.append(("exact-deduped", q.count()))

    # 3. near-dup removal: MinHash-LSH pairs -> components -> canonical
    pairs = D.minhash_near_duplicates(q, "doc_id", "text",
                                      num_hashes=32, bands=8,
                                      threshold=0.5).select("d1", "d2")
    q = dedup_keep_canonical(q, pairs)
    funnel.append(("near-dup removed", q.count()))

    # 4. decontamination vs the held-out split (odd doc_ids).  The
    # synthetic corpus draws from a ~16-word vocabulary so ANY shared
    # 3-gram (the c30 criterion, right for real text) would flag every
    # doc; the demo flags docs whose shingle set is >=80% covered by
    # the test split — the "near-verbatim leak" semantic.
    sh = q.select("doc_id",
                  F.explode(D.token_shingles(F.col("text"), 3)).alias("sh"))
    n_sh = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    test_sh = (sh.filter(F.col("doc_id") % 2 == 1)
               .select("sh").distinct())
    dirty = (sh.filter(F.col("doc_id") % 2 == 0)
             .join(test_sh, "sh", "left_semi")
             .groupBy("doc_id").agg(F.count("*").alias("n_shared"))
             .join(n_sh, "doc_id")
             .filter(F.col("n_shared") * 5 >= F.col("n_sh") * 4)
             .select("doc_id"))
    train = (q.filter(F.col("doc_id") % 2 == 0)
             .join(dirty, "doc_id", "left_anti"))
    funnel.append(("decontaminated train split", train.count()))

    # 5. mixture resampling (epoch weights per language)
    w_ppm = (F.when(F.col("lang") == "en", 500000)
             .when(F.col("lang") == "de", 2250000)
             .otherwise(1000000))
    frac = F.pmod(D.portable_hash64(
        F.concat(F.col("doc_id").cast("string"), F.lit(":mix"))),
        F.lit(1000000))
    n_copies = ((w_ppm.cast("long") / 1000000).cast("long")
                + F.when(frac < w_ppm % 1000000, 1).otherwise(0))
    sampled = (train.withColumn("n_copies", n_copies)
               .filter(F.col("n_copies") > 0)
               .select("doc_id", "lang", F.size(
                   F.split(F.trim(F.lower("text")), " +")).alias("n_tok"),
                   F.explode(F.sequence(
                       F.lit(0).cast("long"),
                       F.col("n_copies") - 1)).alias("copy_idx")))
    funnel.append(("after mixture resampling", sampled.count()))

    # 6. packing accounting: 256-token batches per language
    batches = (sampled
               .groupBy("lang")
               .agg(F.sum("n_tok").alias("n_tokens"))
               .withColumn("n_batches",
                           F.ceil(F.col("n_tokens") / 256).cast("long")))

    print("\n=== curation funnel ===")
    for stage, n in funnel:
        print(f"{stage:32s} {n:8d}")
    print("\n=== packed training batches per language ===")
    batches.orderBy("lang").show()


if __name__ == "__main__":
    main()
