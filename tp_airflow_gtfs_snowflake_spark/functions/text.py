"""Text-analysis functions (charter C3): language ID, quality scoring,
token counting, rolling-hash fingerprinting.

All are native column expressions (JVM codegen, no Python in the hot
path) so they run as narrow per-row maps at 100 TB — no shuffle, no
UDF serialization.  Each has a deterministic ANSI-SQL equivalent so
the driver's DuckDB oracle can verify it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic.  Real deployments plug in fastText-style models via a
# Pandas UDF; the heuristic is the native-expression scale path.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "in", "to", "is"),
    "fr": ("le", "la", "de", "et", "les", "des", "un"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht"),
    "es": ("el", "la", "de", "que", "y", "los", "en"),
}

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space
# symbol — the GPT-2 pretokenizer shape, minus unicode categories so
# Spark (Java regex) and DuckDB (RE2) agree byte-for-byte on ASCII.
BPE_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tokens(text: Column) -> Column:
    """Whitespace tokens of lowercased trimmed text."""
    return F.split(F.trim(F.lower(text)), " +")


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit count over whitespace tokens."""
    toks = tokens(text)
    out = {}
    for lang, words in STOPWORDS.items():
        wl = F.array([F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(wl, t)))
    return out


def lang_id(text: Column) -> Column:
    """argmax language by stopword hits; ties break by language code
    order (deterministic); no hits at all -> 'und' (undetermined)."""
    scores = lang_scores(text)
    pairs = F.array(*[F.struct(scores[lang].alias("score"),
                               F.lit(lang).alias("lang"))
                      for lang in sorted(STOPWORDS)])
    best = F.array_max(F.filter(pairs, lambda p: p["score"] > 0))
    # array_max on struct compares score first, then lang DESC would
    # win on ties — invert by taking max score then first lang with it.
    max_score = F.array_max(F.transform(pairs, lambda p: p["score"]))
    first_best = F.filter(pairs, lambda p: p["score"] == max_score)[0]["lang"]
    return F.when(max_score > 0, first_best).otherwise(F.lit("und"))


def bpe_token_count(text: Column) -> Column:
    """Token count under the BPE-ish pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_TOKEN_RE), 0))


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-scoring features: length, punctuation ratio, stopword
    ratio, mean token length (the C4-style heuristic filters used to
    score web-scraped training text)."""
    raw = F.trim(text)
    toks = tokens(text)
    n_chars = F.length(raw)
    n_punct = F.length(raw) - F.length(F.regexp_replace(raw, r"[^a-z0-9 ]", ""))
    en = F.array([F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
    n_tok = F.size(toks)
    # nullif guards: ANSI mode (Spark 4 default) turns x/0 into a task
    # failure, not a null — empty/whitespace-only text must yield null
    # ratios, not crash the stage.
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "punct_ratio": n_punct / F.nullif(n_chars, F.lit(0)),
        "stopword_ratio": n_stop / F.nullif(n_tok, F.lit(0)),
        "mean_token_len": (F.length(F.regexp_replace(F.trim(F.lower(text)),
                                                     " +", ""))
                           / F.nullif(n_tok, F.lit(0))),
    }


def quality_score(text: Column) -> Column:
    """Composite 0..1-ish quality score: rewards stopword presence and
    moderate token length, penalizes punctuation soup — a linear blend
    of the standard heuristics (deterministic, oracle-friendly)."""
    f = quality_features(text)
    return F.round(
        F.least(f["stopword_ratio"] * 4, F.lit(1.0)) * 0.5
        + F.when((f["mean_token_len"] >= 3) & (f["mean_token_len"] <= 10),
                 F.lit(1.0)).otherwise(F.lit(0.0)) * 0.3
        + (1 - F.least(f["punct_ratio"] * 10, F.lit(1.0))) * 0.2,
        6)


# Polynomial rolling hash (Rabin-Karp shape) over token values.  Token
# value is pure arithmetic (length + first/last char codes) so DuckDB
# reproduces it exactly; 31/1e9+7 are the classic base/modulus.
_B = 31
_P = 1_000_000_007


def _token_val(t: Column) -> Column:
    return (F.length(t) * 131
            + F.ascii(F.substring(t, 1, 1)) * 31
            + F.ascii(F.substring(t, -1, 1))) % _P


def rolling_fingerprints(text: Column, k: int = 4) -> Column:
    """All k-token rolling hashes of a document (array<long>).

    h(i) = sum_{j<k} val(tok[i+j]) * B^(k-1-j) mod P, computed with
    zip_with over k shifted copies — narrow per-row expression.
    """
    toks = tokens(text)
    vals = F.transform(toks, _token_val)
    n = F.size(vals)
    # sequence(0, -1) would yield a DESCENDING [0, -1]; docs with fewer
    # than k tokens must produce an empty index list instead.
    idx = F.when(n >= k, F.sequence(F.lit(0), n - k)) \
        .otherwise(F.array().cast("array<int>"))
    powers = [pow(_B, k - 1 - j, _P) for j in range(k)]
    return F.transform(
        idx,
        lambda i: sum(
            (F.element_at(vals, i + j + 1) * F.lit(powers[j])) % _P
            for j in range(k)) % _P)


def winnow_fingerprint(text: Column, k: int = 4) -> Column:
    """Winnowing-style document fingerprint: min rolling hash (the
    standard plagiarism / near-dup signature primitive)."""
    return F.array_min(rolling_fingerprints(text, k))
