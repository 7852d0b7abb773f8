"""Text-analysis operators for the LLM-data-pipeline surface.

All hot-path logic is built-in `pyspark.sql.functions` (JVM, codegen'd,
no Python per row): tokenization via split/filter, ratios via regexp
counts, fingerprints via a modular polynomial fold with `F.aggregate`.
At 100 TB these are embarrassingly parallel map-side expressions — no
shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from azure_iot_realtime_data_pipeline_spark.functions.rounding import round_half_up

#: tiny deterministic stopword sets per language for the n-gram/stopword
#: heuristic language id. Closed lists keep the operator SQL-expressible.
STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is")
FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 131


def tokens(text: Column) -> Column:
    """Whitespace tokenization, empty tokens dropped."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def stopword_count(toks: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    def is_stop(t: Column) -> Column:
        cond = F.lit(False)
        for s in stopwords:
            cond = cond | (t == s)
        return cond

    return F.size(F.filter(toks, is_stop)).cast("long")


def alpha_ratio(text: Column) -> Column:
    """Share of [a-z ] characters — junk/markup detector component."""
    clean = F.length(F.regexp_replace(text, "[^a-z ]", ""))
    total = F.length(text)
    return F.when(total == 0, F.lit(0.0)).otherwise(clean.cast("double") / total.cast("double"))


def quality_score(text: Column) -> Column:
    """Deterministic doc-quality heuristic in [0,1]: blend of alpha ratio
    and (1 - stopword ratio), the length/punct/stopword family of
    filters used by LLM corpus cleaning pipelines."""
    toks = tokens(text)
    n = F.size(toks).cast("double")
    stop_ratio = F.when(n == 0, F.lit(0.0)).otherwise(stopword_count(toks).cast("double") / n)
    return round_half_up(0.5 * alpha_ratio(text) + 0.5 * (1.0 - stop_ratio))


def lang_id(text: Column) -> Column:
    """Stopword-hit heuristic language id; 'und' when no evidence.

    A real deployment swaps the closed lists for per-language n-gram
    profiles; the operator shape (pure map-side scalar expr) is the
    point at scale.
    """
    toks = tokens(text)
    en_hits = stopword_count(toks, STOPWORDS_EN)
    return F.when(en_hits > 0, F.lit("en")).otherwise(F.lit("und"))


#: BPE-ish pre-tokenizer: word / number / single-punctuation pieces —
#: the ASCII-deterministic core of GPT-style pre-tokenization splits.
#: Kept free of lookarounds/classes that differ between Java regex
#: (Spark) and the oracle engine's dialect.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def bpe_tokens(text: Column) -> Column:
    """Regex pre-tokenization (the 'BPE-ish' counting basis): runs of
    letters, runs of digits, and single punctuation marks. Whitespace
    never produces a token. Pure JVM regexp_extract_all — map-side."""
    return F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text)).cast("long")


def fingerprint(text: Column) -> Column:
    """Order-sensitive modular polynomial fingerprint over tokens.

    hash = fold(tokens, h -> (h*131 + 7*len(tok) + ascii(tok[0])) % p).
    Stays inside int64 by reducing mod p each step (p < 2^30, h*131 <
    2^38) — safe under ANSI overflow checking and portable to the DuckDB
    oracle via list_reduce.
    """
    contribs = F.transform(
        tokens(text),
        lambda t: (F.length(t).cast("long") * 7 + F.ascii(F.substring(t, 1, 1)).cast("long")),
    )
    return F.aggregate(
        contribs,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * FINGERPRINT_BASE + x) % FINGERPRINT_MOD,
    )
