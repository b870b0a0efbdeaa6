"""Text-analysis operators for LLM data pipelines (SURVEY.md §7 M5):
tokenization, language ID, quality scoring, fingerprinting, shingling.

Everything here is built-in Spark SQL expressions — no Python UDFs — so the
whole text pipeline stays inside whole-stage codegen and scales linearly
with executors. Heuristics are deliberately simple + deterministic so each
one has an exact DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram-free language-ID heuristic.
# Scores are raw occurrence counts of ' word ' in the padded, lowercased
# text; ties break by this dict's order (first wins).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "es", "una"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokens; empty/blank text -> empty array (split of '' gives
    [''], filtered out here)."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def occurrences(col: Column, needle: str) -> Column:
    """Occurrence count of ``needle`` via the length-difference trick —
    exactly reproducible in ANSI SQL (no regex engine differences)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def lang_score(col: Column, lang: str) -> Column:
    """Total marker-word occurrences for one language over padded text."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    score = F.lit(0)
    for w in LANG_MARKERS[lang]:
        score = score + occurrences(padded, f" {w} ")
    return score


def lang_id(col: Column) -> Column:
    """Deterministic argmax over language scores; 'und' when all zero.
    Tie-break: LANG_MARKERS insertion order."""
    scores = {lang: lang_score(col, lang) for lang in LANG_MARKERS}
    best = None
    for lang in LANG_MARKERS:
        cond = scores[lang] > 0
        for other in LANG_MARKERS:
            if other != lang:
                cond = cond & (scores[lang] >= scores[other])
        # ties resolve to the FIRST matching clause in this when-chain,
        # i.e. LANG_MARKERS declaration order
        best = F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
    return best.otherwise(F.lit("und"))


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are not alphanumeric/whitespace."""
    stripped = F.regexp_replace(col, r"[A-Za-z0-9\s]", "")
    return F.when(F.length(col) > 0, F.length(stripped) / F.length(col)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column) -> Column:
    """English stopword tokens / total tokens (0 for empty docs)."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    stop = F.lit(0)
    for w in LANG_MARKERS["en"]:
        stop = stop + occurrences(padded, f" {w} ")
    n = token_count(col)
    return F.when(n > 0, stop / n).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    stopword presence. Deterministic arithmetic, SQL-twin-able."""
    n = token_count(col)
    len_ok = F.when((n >= 10) & (n <= 100_000), F.lit(0.4)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(col) < 0.1, F.lit(0.3)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(col) > 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
    return len_ok + punct_ok + stop_ok


def normalized_text(col: Column) -> Column:
    """Casefold + collapse whitespace + trim — the canonical form used for
    fingerprinting and exact dedup."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint_md5(col: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (md5 renders
    identically in every engine, unlike hash())."""
    return F.md5(normalized_text(col))


# BPE-ish subword splitting: letter runs, digit runs, or single non-space
# symbols — the pre-tokenization regex shape GPT-style BPE vocabularies use.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-style pre-tokens (JVM regex engine; the pattern uses
    only portable constructs so the DuckDB oracle matches exactly)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), F.lit(0)))


def fingerprint_rolling(col: Column, base: int = 31, mod: int = 2**31 - 1) -> Column:
    """Karp–Rabin polynomial rolling hash of the normalized text:
    h = sum(h*base + ascii(char)) mod m, folded left-to-right over the
    characters. Stays in JVM expressions (aggregate over split chars);
    the same fold is expressible in SQL for the oracle."""
    chars = F.split(normalized_text(col), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % F.lit(mod).cast("bigint"),
    )


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles from an ALREADY-MATERIALIZED token-array column.

    ``toks`` must be a plain attribute (produced by a previous projection),
    not an expression tree: the transform() lambda body re-evaluates its
    free subexpressions once per output element, so an inline
    regexp+split+filter token expression would run O(tokens) times per
    document (measured 50x slowdown on the minhash path)."""
    k = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(k - n, F.lit(0)))
    return F.when(k <= n, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    )


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles of the normalized text, as an array<string>.
    Documents shorter than n tokens yield their full token string.
    For hot paths, project ``tokens(normalized_text(col))`` into a column
    first and call :func:`shingles_from_tokens` on it (see docstring there)."""
    return shingles_from_tokens(tokens(normalized_text(col)), n)


# PII detection/redaction (training-data curation: scrub contact data
# before text reaches a training corpus). Patterns are deliberately kept in
# the common subset of Java regex (Spark) and RE2 (DuckDB) — ASCII classes,
# bounded repetition, \b word boundaries — so every count and replacement
# has an exact cross-engine oracle. Dict order IS the redaction order
# (email first: addresses contain digit runs the other patterns could
# partially shadow).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
}


def pii_count(col: Column, kind: str) -> Column:
    """Occurrences of one PII class in the raw text (regexp_count is
    codegen'd JVM-side — the whole detector is a shuffle-free scan)."""
    return F.regexp_count(col, F.lit(PII_PATTERNS[kind][0]))


def repetition_gram_stats(
    docs, id_col: str, text_col: str, n: int
) -> "DataFrame":  # noqa: F821 — DataFrame imported lazily to keep Column-only module light
    """Per-document n-gram repetition profile -> [id, n{n} (total n-gram
    occurrences), top{n}_bp (share of the single most frequent n-gram),
    dup{n}_bp (share of occurrences whose n-gram occurs more than once)]
    — the Gopher/MassiveText repetition filters (Rae et al. 2021, §A1.1)
    in integer basis points so both engines floor identically. Documents
    with fewer than ``n`` tokens are omitted (no n-grams exist).

    Scale shape: one explode pass over the corpus, one partial-agg
    groupBy keyed (doc, gram) — the shuffle carries distinct per-doc
    grams, not raw occurrences (map-side combine) — then a second
    groupBy keyed doc. No driver state, no skew hazard beyond a single
    pathological document, which partitions by doc id anyway."""
    words = F.filter(
        F.split(normalized_text(F.col(text_col)), r"\s+"),
        lambda t: t != F.lit(""),
    )
    grams = (
        docs.select(F.col(id_col), words.alias("w"))
        .filter(F.size("w") >= n)
        .select(
            id_col,
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(w) - {n}), "
                    f"i -> concat_ws(' ', slice(w, i + 1, {n})))"
                )
            ).alias("g"),
        )
    )
    per_gram = grams.groupBy(id_col, "g").count()
    return per_gram.groupBy(id_col).agg(
        F.sum("count").cast("long").alias(f"n{n}"),
        F.expr("CAST(10000 * max(count) DIV sum(count) AS LONG)").alias(
            f"top{n}_bp"
        ),
        F.expr(
            "CAST(10000 * sum(CASE WHEN count > 1 THEN count ELSE 0 END) "
            "DIV sum(count) AS LONG)"
        ).alias(f"dup{n}_bp"),
    )


def disc_percentiles_from_counts(
    counts,
    part_col: str,
    val_col: str,
    cnt_col: str,
    qs: dict[str, tuple[int, int]] = {"p10": (1, 10), "p50": (1, 2), "p90": (9, 10)},
):
    """PERCENTILE_DISC from a PRE-AGGREGATED (partition, value, count)
    table -> [partition, n_rows, <q>_<val> ...] — the 100 TB path for
    length_percentiles_by_source: a corpus has billions of rows but only
    ~thousands of distinct token lengths per source, so aggregate first
    (map-side combine, one small shuffle) and rank-select over the tiny
    histogram instead of sorting raw rows inside the window. Exactly the
    q-th discrete percentile: smallest value whose cumulative count
    reaches ceil(q*n), identical to the row-level window form (pinned by
    an equivalence test).

    ``qs`` maps output-column prefix -> (numerator, denominator)."""
    from pyspark.sql import Window

    w_cum = (
        Window.partitionBy(part_col)
        .orderBy(val_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = counts.select(
        part_col,
        val_col,
        F.sum(cnt_col).over(w_cum).alias("cum"),
        F.sum(cnt_col).over(Window.partitionBy(part_col)).alias("n"),
    )

    def pick(num: int, den: int) -> Column:
        idx = F.expr(f"({num} * n + {den} - 1) DIV {den}")
        return F.min(F.when(F.col("cum") >= idx, F.col(val_col))).cast("long")

    aggs = [F.max("n").cast("long").alias("n_rows")]
    aggs += [
        pick(num, den).alias(f"{name}_{val_col}") for name, (num, den) in qs.items()
    ]
    return c.groupBy(part_col).agg(*aggs)


def redact_pii(col: Column) -> Column:
    """Replace every PII match with its class token, applying the classes
    in PII_PATTERNS order. Pure nested regexp_replace — no Python, no
    shuffle, linear scan at any scale."""
    out = col
    for pattern, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pattern, token.replace("$", r"\$"))
    return out


# --- C4 line-level cleaning rules (Raffel et al. 2020, §2.2) -----------------

#: substrings whose presence disqualifies a LINE (C4 keeps only lines that
#: look like prose; policy/code markers are the canonical exclusions).
C4_BANNED_LINE = ("lorem ipsum", "javascript", "cookie policy", "{")


def c4_line_profile(docs, id_col: str, text_col: str) -> "DataFrame":  # noqa: F821
    """Per-document C4 cleaning profile -> [id, n_lines, n_kept_lines,
    kept_chars, n_sentences, has_brace] applying the line-level rules of
    Raffel et al. 2020 §2.2: a line survives iff it ends in terminal
    punctuation (. ! ? "), has >= 3 words, and contains none of the
    banned markers (lowercased match). ``n_sentences`` counts terminal
    punctuation marks across the KEPT text (C4 drops pages with < 3
    sentences); ``has_brace`` is the page-level code marker C4 drops
    outright.

    All rules are higher-order array functions over split('\\n') — JVM
    codegen, shuffle-free, a pure scan at 100 TB. On a corpus without
    newlines or punctuation every document degenerates to one dropped
    line; the rule semantics are pinned on constructed text in
    tests/test_text.py."""
    lines = F.split(F.col(text_col), "\n")
    lower = lambda line: F.lower(F.trim(line))  # noqa: E731
    def _kept(line):  # one line survives all three rules
        t = F.trim(line)
        terminal = lower(line).rlike('[.!?"]$')
        words = F.size(
            F.filter(F.split(t, r"\s+"), lambda w: w != F.lit(""))
        ) >= 3
        banned = F.lit(False)
        for marker in C4_BANNED_LINE:
            banned = banned | lower(line).contains(marker)
        return terminal & words & ~banned

    kept = F.filter(lines, _kept)
    kept_text = F.array_join(F.transform(kept, F.trim), " ")
    return docs.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        F.length(kept_text).cast("long").alias("kept_chars"),
        F.size(
            F.regexp_extract_all(kept_text, F.lit("[.!?]"), F.lit(0))
        ).cast("long").alias("n_sentences"),
        F.col(text_col).contains("{").alias("has_brace"),
    )
