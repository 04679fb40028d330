"""Distributed BPE (byte-pair encoding) vocabulary training.

Public algorithm: Sennrich, Haddow & Birch, "Neural Machine
Translation of Rare Words with Subword Units" (ACL 2016).  The
reference repo has no tokenizer-training surface; this is a charter
extension (LLM training-data pipeline operator family, alongside
functions/text.py's BPE-ish token *counting*).

Scale design (100 TB corpus):

- The ONLY corpus-scale operation is the word-frequency extraction:
  one explode + one groupBy(word) shuffle.  Heaps' law keeps the
  distinct-word relation ~10^7-10^8 rows for a 10^11-token corpus --
  a few GB, comfortably distributed and cacheable.
- Every merge iteration then runs against that compact word table
  only: a pair-count aggregation (map-side combinable, one exchange
  whose key space is symbol *pairs*, far smaller than the table), a
  1-row TakeOrdered collect for the argmax pair, and a narrow fold
  applying the merge (zero exchanges -- plan-gated).
  ``localCheckpoint`` every few rounds truncates the growing fold
  lineage, same pattern as operators/components.py.
- Practical trainers (sentencepiece et al.) apply a frequency cutoff
  and run the merge loop on one node once the word table is ~MB;
  ``min_freq`` supports that cutoff here.  The distributed loop is
  for when the table is not small, and its per-iteration cost is
  dominated by job-launch overhead at toy scale and by the pair agg
  at corpus scale.
- Encoding a corpus with a learned merge list NEVER applies merges
  to raw text row-by-row: merges are applied once to the DISTINCT
  word table (vocabulary-sized work), then the corpus joins back to
  the word->tokens map -- fuzzy.py uses the same collapse-first
  trick for edit-distance joins.

Determinism: ties on pair count break by lexicographically smallest
(left_sym, right_sym), so the merge sequence is engine- and
partitioning-independent (the Sennrich reference breaks ties by dict
iteration order, which is not reproducible).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# U+00B7 middle dot: end-of-word marker.  Words are restricted to
# [a-z]+ by word_frequencies, so the marker can never collide with a
# word character, and it is a single code point so character-level
# splits and DuckDB substr() agree on it.
END_OF_WORD = "·"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, freq)`` from a document corpus -- the one corpus-scale
    shuffle of BPE training.  Lowercased, [a-z]+ runs only."""
    w = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("word"))
    return (w.filter(F.col("word") != "")
            .groupBy("word").agg(F.count("*").alias("freq")))


def init_symbols(word_freqs: DataFrame,
                 marker: str = END_OF_WORD) -> DataFrame:
    """Add ``syms``: the word split to characters + end-of-word marker."""
    return word_freqs.withColumn(
        "syms", F.split(F.concat(F.col("word"), F.lit(marker)), ""))


def pair_counts(sym_df: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-symbol pair counts.

    Shifted-slice zip_with (the c68 skip-gram idiom) builds the pair
    array without positional element_at probes; counts overlapping
    occurrences exactly like the reference algorithm.
    """
    pairs = F.expr(
        "zip_with(slice(syms, 1, size(syms) - 1),"
        "         slice(syms, 2, size(syms) - 1),"
        "         (l, r) -> struct(l AS left_sym, r AS right_sym))")
    return (sym_df.filter(F.size("syms") >= 2)
            .select(F.col("freq"), F.explode(pairs).alias("p"))
            .groupBy("p.left_sym", "p.right_sym")
            .agg(F.sum("freq").alias("cnt")))


def top_pair(pair_df: DataFrame):
    """Most frequent pair; ties -> lexicographically smallest pair.
    TakeOrderedAndProject + a 1-row collect (the per-iteration argmax
    is the only driver round-trip in the loop)."""
    rows = (pair_df
            .orderBy(F.desc("cnt"), "left_sym", "right_sym")
            .limit(1).collect())
    return rows[0] if rows else None


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """Left fold replacing adjacent (left, right) with the merged
    symbol -- equivalent to the reference's greedy left-to-right scan
    because the merged symbol is strictly longer than ``left`` and so
    can never itself chain-match as the pair's left element."""
    lc, rc, mc = F.lit(left), F.lit(right), F.lit(left + right)

    def step(acc: Column, s: Column) -> Column:
        hit = ((F.size(acc) > 0)
               & (F.element_at(acc, -1) == lc) & (s == rc))
        return (F.when(hit,
                       F.concat(F.slice(acc, 1, F.size(acc) - 1),
                                F.array(mc)))
                .otherwise(F.concat(acc, F.array(s))))

    return F.aggregate(syms,
                       F.expr("cast(array() as array<string>)"), step)


def apply_merge(sym_df: DataFrame, left: str, right: str) -> DataFrame:
    """Apply one learned merge to every word -- a narrow projection,
    zero exchanges (plan-gated by test_bpe_apply_merge_is_narrow)."""
    return sym_df.withColumn("syms", _merge_fold(F.col("syms"), left, right))


def learn_bpe(spark: SparkSession, docs: DataFrame, *,
              text_col: str = "text", num_merges: int = 30,
              min_freq: int = 2, checkpoint_every: int = 8,
              word_freqs: DataFrame | None = None,
              loop_partitions: int | None = None) -> DataFrame:
    """Learn ``num_merges`` BPE merges; returns the merge table
    ``(rank, left_sym, right_sym, merged, cnt)`` (tiny -- created
    driver-side from the per-iteration argmax rows).

    Stops early when the best remaining pair's count drops below
    ``min_freq`` (a pair seen once cannot generalize).  Pass a
    precomputed ``word_freqs`` to share the corpus scan with an
    encode step.

    ``loop_partitions``: optional coalesce of the word table before
    the loop.  The per-iteration stages run one task per partition;
    when the vocabulary is small (thousands of words) the loop is
    task-launch bound, so pack it into a few partitions.  Leave None
    at corpus scale (10^7+ words) to keep the inherited parallelism.
    """
    if word_freqs is None:
        word_freqs = word_frequencies(docs, text_col)
    sym = init_symbols(word_freqs)
    if loop_partitions is not None:
        sym = sym.coalesce(loop_partitions)
    sym = sym.localCheckpoint(eager=True)  # cut the scan+shuffle lineage
    merges = []
    for i in range(num_merges):
        best = top_pair(pair_counts(sym))
        if best is None or best["cnt"] < min_freq:
            break
        merges.append((i + 1, best["left_sym"], best["right_sym"],
                       best["left_sym"] + best["right_sym"],
                       int(best["cnt"])))
        sym = apply_merge(sym, best["left_sym"], best["right_sym"])
        if (i + 1) % checkpoint_every == 0:
            sym = sym.localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "rank bigint, left_sym string, right_sym string, "
                "merged string, cnt bigint")


def encode_words(word_freqs: DataFrame,
                 merges: list[tuple[str, str]], *,
                 checkpoint_every: int = 8) -> DataFrame:
    """Apply a learned merge list to the distinct-word table ->
    ``(word, freq, syms)`` with ``syms`` the final tokenization.

    Vocabulary-sized work: the corpus is never touched -- callers
    join their token stream to this map (broadcast when the vocab
    fits, shuffle join otherwise)."""
    sym = init_symbols(word_freqs)
    for i, (left, right) in enumerate(merges):
        sym = apply_merge(sym, left, right)
        if (i + 1) % checkpoint_every == 0:
            sym = sym.localCheckpoint(eager=True)
    return sym


def bpe_token_frequencies(spark: SparkSession, docs: DataFrame, *,
                          text_col: str = "text", num_merges: int = 30,
                          loop_partitions: int | None = None) -> DataFrame:
    """End-to-end: learn merges, tokenize the vocabulary, return
    corpus-wide ``(token, total)`` frequencies."""
    wf = word_frequencies(docs, text_col)
    if loop_partitions is not None:
        wf = wf.coalesce(loop_partitions)
    wf = wf.localCheckpoint(eager=True)  # reused by learn + encode
    learned = learn_bpe(spark, docs, text_col=text_col,
                        num_merges=num_merges, word_freqs=wf)
    pairs = [(r["left_sym"], r["right_sym"]) for r in learned.collect()]
    enc = encode_words(wf, pairs)
    return (enc.select(F.col("freq"),
                       F.explode(F.col("syms")).alias("token"))
            .groupBy("token").agg(F.sum("freq").alias("total")))
