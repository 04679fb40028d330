"""BPE vocabulary training vs a pure-Python Sennrich-style reference.

The reference algorithm (ACL 2016, public) is re-implemented here
sequentially, with the SAME deterministic tie-break as the operator
(max count, then lexicographically smallest pair), and the learned
merge SEQUENCES are compared exactly.
"""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from tp_airflow_gtfs_snowflake_spark.operators import bpe

from tests.conftest import SF_SMALL


# ------------------------- python reference -------------------------

def _ref_word_freqs(texts):
    import re
    c = collections.Counter()
    for t in texts:
        for w in re.split(r"[^a-z]+", (t or "").lower()):
            if w:
                c[w] += 1
    return c


def _ref_merge_word(syms, pair):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_learn(word_freqs, num_merges, min_freq=2):
    vocab = {tuple(w) + (bpe.END_OF_WORD,): f
             for w, f in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best, cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_freq:
            break
        merges.append((best[0], best[1], cnt))
        vocab = {_ref_merge_word(s, best): f for s, f in vocab.items()}
    return merges, vocab


def _texts(spark):
    rows = (spark.read.parquet(f"{SF_SMALL}/documents.parquet")
            .select("doc_id", "text").orderBy("doc_id").limit(60)
            .collect())
    return [r["text"] for r in rows]


@pytest.fixture(scope="module")
def corpus(spark):
    texts = _texts(spark)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return texts, df


def test_bpe_merge_sequence_matches_reference(spark, corpus):
    texts, df = corpus
    ref_merges, _ = _ref_learn(_ref_word_freqs(texts), 25)
    got = bpe.learn_bpe(spark, df, num_merges=25).orderBy("rank").collect()
    assert len(got) == len(ref_merges)
    for row, (l, r, cnt) in zip(got, ref_merges):
        assert (row["left_sym"], row["right_sym"], row["cnt"]) == (l, r, cnt)
        assert row["merged"] == l + r


def test_bpe_encode_matches_reference_vocab(spark, corpus):
    texts, df = corpus
    wf = _ref_word_freqs(texts)
    ref_merges, ref_vocab = _ref_learn(wf, 25)
    learned = [(l, r) for l, r, _ in ref_merges]
    enc = bpe.encode_words(
        bpe.word_frequencies(df), learned).collect()
    got = {r["word"]: tuple(r["syms"]) for r in enc}
    want = {"".join(s).rstrip(bpe.END_OF_WORD): s
            for s in ref_vocab}
    assert set(got) == set(want)
    for w, syms in want.items():
        assert got[w] == syms, w


def test_bpe_encode_reconstructs_words(spark, corpus):
    _, df = corpus
    learned = bpe.learn_bpe(spark, df, num_merges=15)
    pairs = [(r["left_sym"], r["right_sym"]) for r in learned.collect()]
    enc = bpe.encode_words(bpe.word_frequencies(df), pairs)
    bad = (enc.withColumn("rejoined",
                          F.array_join(F.col("syms"), ""))
           .filter(F.col("rejoined")
                   != F.concat(F.col("word"), F.lit(bpe.END_OF_WORD))))
    assert bad.count() == 0


def test_bpe_apply_merge_is_narrow(spark, corpus):
    """The merge-apply step must be a pure projection: zero exchanges,
    zero joins -- at corpus scale it runs once per iteration over the
    cached word table and anything wider would dominate the loop."""
    _, df = corpus
    sym = bpe.init_symbols(bpe.word_frequencies(df))
    sym = sym.localCheckpoint(eager=True)
    plan = (bpe.apply_merge(sym, "t", "h")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_bpe_pair_counts_has_partial_agg(spark, corpus):
    """Pair counting must map-side combine: the exploded pair stream
    collapses to per-partition partials before the one exchange."""
    _, df = corpus
    sym = bpe.init_symbols(bpe.word_frequencies(df))
    sym = sym.localCheckpoint(eager=True)
    plan = (bpe.pair_counts(sym)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_sum" in plan


def test_bpe_early_stop_on_min_freq(spark):
    # every pair unique -> best count 1 < min_freq=2 -> zero merges
    df = spark.createDataFrame([("abc",), ("xyz",)], "text string")
    assert bpe.learn_bpe(spark, df, num_merges=10).count() == 0
