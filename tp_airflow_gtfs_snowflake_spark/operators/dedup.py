"""Deduplication operators (charter C1): exact, normalized, n-gram
Jaccard, MinHash+LSH, SimHash — all native DataFrame expressions (no
Python in the hot path).

Scale design (100 TB corpus):
- exact/normalized dedup groups by a 128-bit content hash, never by
  the full text (shuffling md5 keys instead of document bodies).
- MinHash/LSH: signatures are computed per document in a single
  narrow pass (explode shingles -> xxhash64 -> groupBy doc);
  candidate generation shuffles only (band_id, band_hash, doc_id)
  tuples; exact Jaccard verification runs only on bucket-collided
  pairs.  This is the standard shingle->minhash->band->bucket-join
  pipeline; cost is O(docs x shingles) + O(candidate pairs), never
  O(docs^2).
- SimHash: 64-bit signature via bit-vote aggregation, near-dup =
  signature XOR popcount <= radius within LSH-style prefix buckets.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HashFn = Callable[[Column], Column]


def portable_hash64(c: Column) -> Column:
    """60-bit hash both Spark and DuckDB compute identically:
    first 15 hex chars of md5 parsed as an integer.

    Spark:  conv(substring(md5(x), 1, 15), 16, 10)::long
    DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT

    xxhash64 (the default hash below) is ~3x faster JVM-side but has no
    DuckDB equivalent; use this one when an external oracle must
    reproduce signatures bit-for-bit.
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _tokens(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), " +")


def token_shingles(text: Column, n: int = 3) -> Column:
    """Distinct token n-gram shingles of a text column (native)."""
    toks = _tokens(text)
    # sequence(0, -1) would yield a DESCENDING [0, -1] and element_at
    # would hit index 0; texts shorter than n tokens get no shingles.
    idx = F.when(F.size(toks) >= n,
                 F.sequence(F.lit(0), F.size(toks) - n)) \
        .otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.concat_ws(
        " ", *[F.element_at(toks, i + j + 1) for j in range(n)]))
    return F.array_distinct(grams)


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup via content-hash groupBy: one row per distinct
    content with the deterministic keeper (min id) and copy count."""
    return (df.select(F.col(id_col).alias("doc_id"),
                      F.md5(F.col(text_col)).alias("fingerprint"))
            .groupBy("fingerprint")
            .agg(F.min("doc_id").alias("keep_doc_id"),
                 F.count("*").alias("n_copies")))


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Return df with only the keeper row per distinct content."""
    keep = exact_duplicates(df, id_col, text_col).select(
        F.col("keep_doc_id").alias(id_col))
    return df.join(keep, id_col, "left_semi")


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Exact pairwise n-gram Jaccard over shingle-sharing pairs.

    Only pairs that share >= 1 shingle are materialized (inverted-index
    join), so cost is driven by shingle collision counts, not docs^2.
    Hot shingles (stopword runs) explode pair counts at scale — the
    MinHash path below is the remedy; this operator is the exact
    verifier / small-corpus tool.
    """
    sh = df.select(F.col(id_col).alias("doc_id"),
                   F.explode(token_shingles(F.col(text_col), n)).alias("sh"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (a.join(b, (F.col("a.sh") == F.col("b.sh"))
                     & (F.col("a.doc_id") < F.col("b.doc_id")))
              .groupBy(F.col("a.doc_id").alias("d1"),
                       F.col("b.doc_id").alias("d2"))
              .agg(F.count("*").alias("n_common")))
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("n_sh").alias("n2"))
    return (common.join(s1, "d1").join(s2, "d2")
            .withColumn("jaccard",
                        F.col("n_common")
                        / (F.col("n1") + F.col("n2") - F.col("n_common")))
            .filter(F.col("jaccard") >= threshold)
            .select("d1", "d2", "n_common", "jaccard"))


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       num_hashes: int = 32, shingle_n: int = 3,
                       hash_fn: HashFn = F.xxhash64) -> DataFrame:
    """Per-doc MinHash signature: sig[i] = min over shingles of
    hash(i || shingle).  One narrow pass + one groupBy(doc).

    Default hash is xxhash64, Spark's built-in 64-bit hash (JVM,
    codegen) — the i-th permutation is simulated by seeding the hash
    input with i.  Pass hash_fn=portable_hash64 when an external SQL
    oracle must reproduce the signatures.
    """
    sh = df.select(F.col(id_col).alias("doc_id"),
                   F.explode(token_shingles(F.col(text_col), shingle_n))
                   .alias("sh"))
    hashes = sh.select(
        "doc_id", "sh",
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("i"),
    ).withColumn("h", hash_fn(F.concat_ws(":", "i", "sh")))
    sig = (hashes.groupBy("doc_id", "i").agg(F.min("h").alias("mh"))
           .groupBy("doc_id")
           .agg(F.array_sort(F.collect_list(F.struct("i", "mh"))).alias("s"))
           .select("doc_id", F.transform("s", lambda x: x["mh"]).alias("signature")))
    return sig


def minhash_lsh_candidates(signatures: DataFrame, *, bands: int,
                           rows_per_band: int) -> DataFrame:
    """Band the signatures; docs sharing any band bucket are candidate
    pairs.  Shuffles only (band_id, band_hash, doc_id)."""
    banded = signatures.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        "signature",
    ).select(
        "doc_id", "band",
        F.md5(F.concat_ws(",", F.slice(
            "signature",
            F.col("band") * rows_per_band + 1, rows_per_band))).alias("bucket"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("d1"),
                    F.col("b.doc_id").alias("d2"))
            .distinct())


def minhash_near_duplicates(df: DataFrame, id_col: str, text_col: str, *,
                            num_hashes: int = 32, bands: int = 8,
                            shingle_n: int = 3, threshold: float = 0.5,
                            hash_fn: HashFn = F.xxhash64) -> DataFrame:
    """Full MinHash-LSH pipeline: signatures -> banded candidates ->
    exact Jaccard verification of candidates only."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n,
                             hash_fn)
    cand = minhash_lsh_candidates(sig, bands=bands, rows_per_band=rows_per_band)

    sh = df.select(F.col(id_col).alias("doc_id"),
                   F.explode(token_shingles(F.col(text_col), shingle_n))
                   .alias("sh"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    # count shared shingles per candidate pair
    common = (cand.join(sh.select(F.col("doc_id").alias("d1"), "sh"), "d1")
              .join(sh.select(F.col("doc_id").alias("d2"),
                              F.col("sh").alias("sh_b")), "d2")
              .filter(F.col("sh") == F.col("sh_b"))
              .groupBy("d1", "d2").agg(F.count("*").alias("n_common")))
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("n_sh").alias("n2"))
    return (common.join(s1, "d1").join(s2, "d2")
            .withColumn("jaccard",
                        F.col("n_common")
                        / (F.col("n1") + F.col("n2") - F.col("n_common")))
            .filter(F.col("jaccard") >= threshold)
            .select("d1", "d2", "jaccard"))


def simhash64(text: Column, shingle_n: int = 2, n_bits: int = 64,
              hash_fn: HashFn = F.xxhash64) -> Column:
    """n_bits-wide SimHash of a text column, fully native.

    Each shingle votes +1/-1 on each bit position according to its
    64-bit hash; the signature sets bit k when the vote sum is
    positive.  Built with transform/aggregate over the shingle array —
    no UDF, no shuffle (per-row expression).
    """
    # F.shiftright/F.shiftleft only take Python-int shift amounts; the
    # shift amount here is the lambda-bound bit index (a Column), so go
    # through the SQL functions, which accept column arguments.
    def _shr(c: Column, k: Column) -> Column:
        return F.call_function("shiftright", c, k)

    def _shl(c: Column, k: Column) -> Column:
        return F.call_function("shiftleft", c, k)

    # Hash each shingle exactly once, THEN fan out to per-bit votes —
    # hashing inside the per-bit lambda would recompute the hash
    # n_bits times per shingle (md5 64x per shingle is minutes at
    # corpus scale; this form is pure bit arithmetic per vote).
    hashed = F.transform(token_shingles(text, shingle_n), hash_fn)
    votes = F.aggregate(
        hashed,
        F.expr(f"array_repeat(0L, {n_bits})"),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bits - 1)),
                lambda k: _shr(h, k).bitwiseAND(F.lit(1)) * 2 - 1),
            lambda a, v: a + v),
    )
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(n_bits - 1)),
        lambda k: F.when(F.element_at(votes, k + 1) > 0,
                         _shl(F.lit(1).cast("long"), k)).otherwise(F.lit(0).cast("long")))
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseOR(x))


def simhash_signatures(df: DataFrame, id_col: str, text_col: str, *,
                       shingle_n: int = 2, n_bits: int = 64,
                       hash_fn: HashFn = F.xxhash64) -> DataFrame:
    """(doc_id, sig) SimHash signatures via explode + groupBy.

    Same math as simhash64() but a different physical shape: one row
    per (doc, shingle), one hash per shingle, then n_bits SUM columns
    in a single hash aggregate — all whole-stage codegen.  The
    higher-order-function form (simhash64) evaluates interpreted array
    lambdas per shingle and is ~100x slower on a real corpus; this is
    the shape to use at scale.  Docs with zero shingles (< shingle_n
    tokens) produce no row here (vs an all-zero signature there).
    """
    sh = df.select(F.col(id_col).alias("doc_id"),
                   F.explode(token_shingles(F.col(text_col), shingle_n))
                   .alias("sh"))
    h = sh.select("doc_id", hash_fn(F.col("sh")).alias("h"))
    votes = h.groupBy("doc_id").agg(*[
        F.sum(F.shiftright("h", k).bitwiseAND(F.lit(1)) * 2 - 1)
        .alias(f"v{k}") for k in range(n_bits)])
    sig = None
    for k in range(n_bits):
        bit = F.when(F.col(f"v{k}") > 0,
                     F.shiftleft(F.lit(1).cast("long"), k)) \
            .otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig.bitwiseOR(bit)
    return votes.select("doc_id", sig.alias("sig"))


def simhash_near_duplicates(df: DataFrame, id_col: str, text_col: str, *,
                            radius: int = 3, prefix_bits: int = 16,
                            shingle_n: int = 2,
                            hash_fn: HashFn = F.xxhash64) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= radius.

    Candidate generation buckets on the top `prefix_bits` of the
    signature (documents differing only in low bits still collide on
    the prefix with high probability for small radii; a production
    variant uses several rotated prefix tables — one table is enough
    for the test corpus and keeps the example readable).
    """
    sig = simhash_signatures(df, id_col, text_col, shingle_n=shingle_n,
                             hash_fn=hash_fn)
    sig = sig.withColumn("bucket", F.shiftrightunsigned("sig", 64 - prefix_bits))
    a, b = sig.alias("a"), sig.alias("b")
    pairs = (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("d1"),
                     F.col("b.doc_id").alias("d2"),
                     F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
                     .alias("hamming")))
    return pairs.filter(F.col("hamming") <= radius)
