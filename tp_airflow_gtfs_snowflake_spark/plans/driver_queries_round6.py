"""Round-6 additions: distributed BPE tokenizer training.

The missing tier of the LLM training-data pipeline: rounds 1-5 built
dedup / decontamination / quality / packing; this round adds learning
the tokenizer itself from the curated corpus (Sennrich et al., ACL
2016 — public algorithm; see operators/bpe.py for the 100 TB shape:
one corpus-scale word-count shuffle, then vocabulary-sized merge
iterations).

- c82: the oracled slice — initial symbol-pair counts over the
  word-frequency table (exactly iteration 0 of the trainer's loop,
  SQL-expressible so DuckDB value-checks the distributed pair-count
  aggregation bit-for-bit).
- c82b: the full merge loop (rows-only: iterative argmax+fold is not
  SQL; tests/test_bpe.py pins the merge SEQUENCE exactly against a
  sequential pure-Python reference implementation).
- c83: end-to-end learned-vocabulary token frequencies (rows-only;
  encode applies merges to the DISTINCT word table, never the raw
  corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.operators import bpe as _bpe
from tp_airflow_gtfs_snowflake_spark.operators import spatial as _spatial
from tp_airflow_gtfs_snowflake_spark.plans.driver_queries import (
    REGISTRY, _register, _t)


@_register(
    "c82_bpe_pair_counts",
    """
    WITH w AS (
      SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
      FROM documents
    ), wf AS (
      SELECT word || chr(183) AS w, count(*) AS freq
      FROM w WHERE word <> '' GROUP BY word
    ), pr AS (
      SELECT substr(w, CAST(i AS INT), 1) AS left_sym,
             substr(w, CAST(i AS INT) + 1, 1) AS right_sym,
             freq
      FROM (SELECT w, freq, unnest(range(1, length(w))) AS i FROM wf)
    )
    SELECT left_sym, right_sym, CAST(sum(freq) AS BIGINT) AS cnt
    FROM pr GROUP BY left_sym, right_sym
    ORDER BY cnt DESC, left_sym, right_sym
    LIMIT 30
    """,
    "BPE trainer iteration 0: frequency-weighted adjacent character "
    "pair counts over the distinct-word table (end-of-word marker "
    "included), top 30.  This is the exact aggregation the merge "
    "loop argmaxes each round — oracled here so the distributed "
    "pair counting (explode of shifted-slice zip_with, map-side "
    "combined) is value-checked; the iterative loop itself is c82b. "
    "The word-count shuffle is the ONLY corpus-scale stage of BPE "
    "training; pairs aggregate over the vocabulary-sized table",
)
def c82_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    sym = _bpe.init_symbols(_bpe.word_frequencies(docs))
    return (_bpe.pair_counts(sym)
            .orderBy(F.desc("cnt"), "left_sym", "right_sym")
            .limit(30)
            .select("left_sym", "right_sym",
                    F.col("cnt").cast("long").alias("cnt")))


@_register(
    "c82b_bpe_learn_merges",
    None,  # iterative argmax + fold; merge sequence pinned by pytest
    "full BPE merge-loop training (30 merges over documents): each "
    "iteration is one map-side-combined pair-count agg + a 1-row "
    "TakeOrdered argmax + a zero-exchange fold applying the merge to "
    "the cached word table, localCheckpoint every 8 rounds "
    "(components.py lineage pattern).  Deterministic tie-break "
    "(count desc, then lexicographic) makes the sequence engine- "
    "and partitioning-independent; tests/test_bpe.py proves exact "
    "equality with a sequential Sennrich-style reference",
)
def c82b_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # ~6k distinct words at sf0.01 -> the loop is task-launch bound;
    # pack into 4 partitions (at corpus scale leave loop_partitions
    # unset -- see learn_bpe docstring).
    return _bpe.learn_bpe(spark, docs, num_merges=30, loop_partitions=4)


@_register(
    "c83_bpe_token_frequencies",
    None,  # depends on the learned merge list -> not SQL-expressible
    "end-to-end learned-vocabulary token histogram: learn 30 merges, "
    "tokenize, count corpus-wide token frequencies, top 30.  The "
    "encode step applies merges to the DISTINCT word table only "
    "(vocabulary-sized work) and the corpus re-weights by word "
    "frequency — raw text is never re-scanned per merge.  At 100 TB "
    "a token stream would broadcast-join this word->tokens map",
)
def c83_bpe_token_frequencies(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tf = _bpe.bpe_token_frequencies(spark, docs, num_merges=30,
                                    loop_partitions=4)
    return (tf.orderBy(F.desc("total"), "token").limit(30)
            .select("token", F.col("total").cast("long").alias("total")))


@_register(
    "b101_spatial_radius_join",
    """
    WITH p AS (
      SELECT c_custkey AS id,
             CAST(CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)),
                                      1, 8) AS BIGINT)
                  % 1000000 AS BIGINT) AS x,
             CAST(CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)),
                                      9, 8) AS BIGINT)
                  % 1000000 AS BIGINT) AS y
      FROM customer
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST((a.x - b.x) * (a.x - b.x)
                + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist_sq
    FROM p a JOIN p b ON a.id < b.id
    WHERE (a.x - b.x) * (a.x - b.x)
          + (a.y - b.y) * (a.y - b.y) < 5000 * 5000
    """,
    "grid-blocked spatial radius self-join (operators/spatial.py): "
    "integer point coordinates derived portably from md5(custkey) "
    "in a 1e6-square, all pairs closer than r=5000.  Spark blocks "
    "by r-sized grid cells (3x3 neighbor replication on ONE side, "
    "cell equi-join, exact integer dist_sq verify -- provably "
    "lossless, O(co-bucketed pairs)); the oracle is the naive "
    "O(n^2) theta join.  The GTFS stops-within-radius query in "
    "scaled-meter projection; hot cells are plain join skew (AQE "
    "skew split applies)",
)
def b101_spatial_radius_join(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    coord = lambda lo: (F.conv(F.substring(  # noqa: E731
        F.md5(F.col("c_custkey").cast("string")), lo, 8), 16, 10)
        .cast("long") % 1000000)
    pts = cust.select(F.col("c_custkey").alias("id"),
                      coord(1).alias("x"), coord(9).alias("y"))
    return (_spatial.radius_pairs(pts, radius=5000)
            .select("id_a", "id_b",
                    F.col("dist_sq").cast("long").alias("dist_sq")))
