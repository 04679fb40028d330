"""Blocked fuzzy string matching (entity resolution / record linkage).

The classic dedup-adjacent curation op the reference's warehouse would
express as a self-join on an edit-distance predicate: find record
pairs whose names differ by a few character edits (typos, OCR noise,
vendor-feed drift).  A naive form is an O(n²) theta-join with an
O(len²) predicate — unusable at scale.  The standard remedy (Christen,
"Data Matching", 2012 — public textbook material) is BLOCKING: a cheap
deterministic key that any low-distance pair must share, so the
quadratic comparison runs only within blocks.

Spark-first shape: derive the block key as a native expression, shuffle
once on it (plain equi-join — Catalyst gets broadcast/AQE for free),
apply `levenshtein` (JVM built-in, no Python) only to in-block pairs.
Block-key choice is part of the operator's SPEC, not an approximation
bolted on: recall is exactly "pairs sharing a block", the same contract
LSH ops in operators/dedup.py document.  A hot block is a hot
partition; the sub_blocks grid of similarity.cell_blocked_neardup is
the remedy when one key dominates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def block_key(name: Column, *, prefix_len: int = 0) -> Column:
    """(first token, token count[, prefix]) — any pair within a small
    edit distance of a short multi-word name almost surely agrees on
    these; exact agreement is what makes the join an equi-join."""
    toks = F.split(name, " ")
    parts = [F.element_at(toks, 1), F.size(toks).cast("string")]
    if prefix_len:
        parts.append(F.substring(name, 1, prefix_len))
    return F.concat_ws("|", *parts)


def blocked_fuzzy_pairs(df: DataFrame, *, id_col: str, name_col: str,
                        max_dist: int = 3,
                        min_dist: int = 1) -> DataFrame:
    """(id_a, id_b, dist) for in-block pairs with
    min_dist <= levenshtein <= max_dist, id_a < id_b.

    min_dist=1 excludes exact duplicates by default — those are
    operators/dedup.exact_duplicates territory (hash groupBy, no
    pairwise work); this operator exists for the near-miss band.
    One shuffle on the block key; the distance runs JVM-side inside
    whole-stage codegen, never in Python.
    """
    a = df.select(block_key(F.col(name_col)).alias("bk"),
                  F.col(id_col).alias("id_a"),
                  F.col(name_col).alias("name_a"))
    b = df.select(block_key(F.col(name_col)).alias("bk"),
                  F.col(id_col).alias("id_b"),
                  F.col(name_col).alias("name_b"))
    d = F.levenshtein("name_a", "name_b")
    return (a.join(b, "bk")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("dist", d)
            .filter((F.col("dist") >= min_dist)
                    & (F.col("dist") <= max_dist))
            .select("id_a", "id_b", "dist"))


def fuzzy_match_profile(df: DataFrame, *, id_col: str, name_col: str,
                        max_dist: int = 3) -> DataFrame:
    """Per-record linkage profile: how many fuzzy matches each record
    has and how close the nearest one is — the triage table an
    entity-resolution pass hands to a reviewer (or a threshold rule).
    Pairs are symmetrized (each pair counts for both endpoints) with a
    union of the two orientations, then ONE hash aggregation; records
    with no match in range are kept with n_matches=0 via a left join
    back to the id universe (broadcastable result side at any scale,
    since the profile is <= one row per record).
    """
    pairs = blocked_fuzzy_pairs(df, id_col=id_col, name_col=name_col,
                                max_dist=max_dist)
    sym = (pairs.select(F.col("id_a").alias("rid"), "dist")
           .unionByName(pairs.select(F.col("id_b").alias("rid"), "dist")))
    prof = (sym.groupBy("rid")
            .agg(F.count("*").cast("long").alias("n_matches"),
                 F.min("dist").cast("long").alias("nearest_dist")))
    ids = df.select(F.col(id_col).alias("rid"))
    return (ids.join(prof, "rid", "left")
            .select("rid",
                    F.coalesce("n_matches", F.lit(0)).cast("long")
                    .alias("n_matches"),
                    F.col("nearest_dist")))
