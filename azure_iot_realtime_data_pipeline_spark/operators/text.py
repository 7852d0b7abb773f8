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


#: fixed alphabet for the character-entropy signal: the 26 lowercase
#: letters, 10 digits and space; every other character pools into one
#: OTHER bucket. A closed alphabet keeps the operator a pure map-side
#: expression (one literal replace per symbol, no explode, no shuffle)
#: and SQL-expressible for the oracle.
ENTROPY_ALPHABET = tuple("abcdefghijklmnopqrstuvwxyz0123456789 ")


def char_entropy_bits(text: Column | str) -> Column:
    """J67 character-level Shannon entropy in bits over the lowercased
    text — the gibberish/encoded-blob detector (RefinedWeb-class
    signal): near-uniform char use (base64 blobs, minified code) scores
    high, repetitive boilerplate scores low, natural English sits
    ~2.9-4.2.

    Map-side only: per alphabet symbol, count = len - len(replace(s,
    sym)) (codegen string ops, no explode — an exploded char stream
    would shuffle |corpus| rows at 100 TB); the remainder pools into
    OTHER. Cross-engine exactness (the J43 pinned-ln idiom): with
    integer counts c_i and total n,

        H = ( n * mlog2(n) - sum_i c_i * mlog2(c_i) ) / n / 1e6

    where mlog2(x) = floor(log2(x)*1e6 + 0.5) as int64 — every term
    integer until the final division, so accumulation order cannot
    move the value; the only float boundary is the half-up pin of
    log2 itself. NULL/empty text -> NULL.

    Pass the column as a NAME (str) where possible: the str path
    assembles the whole ~450-node expression as ONE SQL string for a
    single F.expr call (r13: building it op-by-op through the Column
    DSL cost 2-4 s of py4j round trips PER QUERY BUILD — driver-side,
    serial, paid on every bench rep; the JVM parses the same tree in
    milliseconds). The Column path below stays for composed-expression
    callers and is expression-identical."""
    if isinstance(text, str):
        # the str path is a NAME contract, not an expression contract
        # (ADVICE r13): backtick-quote the identifier (embedded backticks
        # doubled per the SQL quoting rule) so any legal column name —
        # spaces, dots, keywords — parses as a NAME, and an expression
        # string fails analysis as a nonexistent column instead of being
        # silently evaluated as SQL
        quoted = text.replace("`", "``")
        s = f"lower(`{quoted}`)"
        n = f"length({s})"

        def mlog2(x: str) -> str:
            return f"CAST(FLOOR(log2(CAST({x} AS DOUBLE)) * 1000000.0D + 0.5D) AS BIGINT)"

        counts = [
            f"CAST({n} - length(replace({s}, '{ch}', '')) AS BIGINT)"
            for ch in ENTROPY_ALPHABET
        ]
        total_known = " + ".join(counts)
        other = f"(CAST({n} AS BIGINT) - ({total_known}))"
        terms = [
            f"(CASE WHEN {c} > 0 THEN {c} * {mlog2(c)} ELSE CAST(0 AS BIGINT) END)"
            for c in [*counts, other]
        ]
        acc = " + ".join(terms)
        n_long = f"CAST({n} AS BIGINT)"
        return F.expr(
            f"CASE WHEN {n} > 0 THEN "
            f"CAST({n_long} * {mlog2(n_long)} - ({acc}) AS DOUBLE) "
            f"/ CAST({n} AS DOUBLE) / 1000000.0D END"
        )
    s = F.lower(text)
    n = F.length(s)

    def mlog2(x: Column) -> Column:
        return F.floor(F.log2(x.cast("double")) * 1_000_000.0 + F.lit(0.5)).cast(
            "long"
        )

    counts = [
        (n - F.length(F.replace(s, F.lit(ch), F.lit("")))).cast("long")
        for ch in ENTROPY_ALPHABET
    ]
    total_known = counts[0]
    for c in counts[1:]:
        total_known = total_known + c
    other = n.cast("long") - total_known
    acc = F.lit(0).cast("long")
    for c in counts + [other]:
        acc = acc + F.when(c > 0, c * mlog2(c)).otherwise(F.lit(0))
    return F.when(
        n > 0,
        (n.cast("long") * mlog2(n.cast("long")) - acc).cast("double")
        / n.cast("double")
        / F.lit(1_000_000.0),
    )
