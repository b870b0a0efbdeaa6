"""LLM-data-pipeline queries (SURVEY.md §7 M5) over `documents` and
`embeddings`: dedup (exact / MinHash / SimHash / n-gram Jaccard),
similarity search, text analysis, binary-column features.

Oracle notes: normalization/shingling/Jaccard are replicated in DuckDB with
list functions; ratio roundings carry the +1e-9 halfway-bias used across
the engine. LSH/sketch queries are oracled via invariant framing (emitted
set vs an exact O(n^2) DuckDB truth set + count anchors — the sketches
themselves aren't SQL-expressible); pytest adds recall measurements on
constructed corpora. The single rows-only entry is the deliberately
un-anchored bench twin `similarity_join_lsh_production`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from app_insights_generator_spark.operators import dedup as D
from app_insights_generator_spark.operators import similarity as S
from app_insights_generator_spark.operators import text as T
from app_insights_generator_spark.queries import ORACLES, register
from app_insights_generator_spark.queries._exact import sql_hex_to_int
from app_insights_generator_spark.sources import load_table

# DuckDB twin of operators/text.py normalized_text
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
# DuckDB twin of operators/text.py tokens(normalized_text)
_TOKS = f"list_filter(string_split_regex({_NORM}, '\\s+'), x -> x != '')"

# Exact all-pairs 3-gram Jaccard ground truth as DuckDB CTEs (`sh`, `jac`).
# O(n^2) BY DESIGN and ONLY on the oracle side — DuckDB grinds through the
# 125k candidate pairs at gate scale while the Spark side under test stays
# on the banded-LSH path. This is what lets the sketch queries graduate
# from rows-only to full hash-checked oracles.
_JACCARD_ALL_PAIRS_CTES = f"""
    sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) = 0 THEN ['']
                  WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(range(1, len(toks) - 1),
                                      i -> array_to_string(toks[i:i+2], ' ')) END) AS grams
      FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
    ),
    jac AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CASE WHEN len(list_distinct(a.grams || b.grams)) > 0
                  THEN CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                       / len(list_distinct(a.grams || b.grams))
                  ELSE 0.0 END AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# --- dedup -------------------------------------------------------------------

@register(
    "dedup_exact_documents",
    f"""
    SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY sha256({_NORM})
    """,
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the sha256 of normalized text (operators/dedup.py
    exact_dedup): constant-width shuffle keys, one groupBy."""
    return D.exact_dedup(_docs(spark, sf_dir), "text", "doc_id")


@register(
    "fingerprint_documents",
    f"""
    SELECT doc_id, md5({_NORM}) AS fingerprint
    FROM documents
    """,
)
def fingerprint_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (operators/text.py fingerprint_md5)."""
    return _docs(spark, sf_dir).select(
        "doc_id", T.fingerprint_md5(F.col("text")).alias("fingerprint")
    )


@register(
    "ngram_jaccard_adjacent_docs",
    f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) = 0 THEN ['']
                  WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(range(1, len(toks) - 1),
                                      i -> array_to_string(toks[i:i+2], ' ')) END) AS grams
      FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CASE WHEN len(list_distinct(a.grams || b.grams)) > 0
                 THEN CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                      / len(list_distinct(a.grams || b.grams))
                 ELSE 0.0 END + 1e-9, 4) AS jaccard
    FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
    """,
)
def ngram_jaccard_adjacent_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard (operators/dedup.py jaccard_pairs) on a
    deterministic candidate set: consecutive doc_id pairs."""
    docs = _docs(spark, sf_dir)
    cand = docs.select(F.col("doc_id").alias("id_a")).join(
        docs.select((F.col("doc_id")).alias("id_b")),
        F.col("id_b") == F.col("id_a") + 1,
    )
    pairs = D.jaccard_pairs(docs, cand, "doc_id", "text", shingle_n=3, threshold=0.0)
    return pairs.select("id_a", "id_b", F.round(F.col("jaccard") + 1e-9, 4).alias("jaccard"))


@register(
    "dedup_minhash_documents",
    f"""
    WITH {_JACCARD_ALL_PAIRS_CTES}
    SELECT id_a, id_b, ROUND(jaccard + 1e-9, 4) AS jaccard
    FROM jac WHERE jaccard >= 0.5
    """,
    tier="sf0.01",
)
def dedup_minhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64)+LSH(16 bands) near-dup pairs verified by exact Jaccard
    >= 0.5 (operators/dedup.py near_dedup_minhash).

    Oracled as FULL equality against the exact all-pairs Jaccard truth set
    (O(n^2) in DuckDB only). Why equality holds: verification gives zero
    false positives by construction, and recall is total here because every
    near-dup pair in the driver corpus has Jaccard >= 0.9 (measured), where
    a 16-band/4-row banding misses with probability (1 - 0.9^4)^16 < 4e-8 —
    and the xxhash64 seeds are fixed, so the result is deterministic.
    pytest additionally checks candidate recall vs brute-force Jaccard on a
    constructed corpus near the threshold."""
    pairs = D.near_dedup_minhash(
        _docs(spark, sf_dir), "doc_id", "text", shingle_n=3, threshold=0.5
    )
    return pairs.select(
        "id_a", "id_b", F.round(F.col("jaccard") + 1e-9, 4).alias("jaccard")
    )


@register(
    "dedup_components_documents",
    f"""
    WITH RECURSIVE {_JACCARD_ALL_PAIRS_CTES},
    truth AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.5),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM truth
      UNION
      SELECT id_b AS src, id_a AS dst FROM truth
    ),
    walk(node, comp) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.node
    )
    SELECT node AS doc_id, MIN(comp) AS component FROM walk GROUP BY node
    """,
    tier="sf0.01",
)
def dedup_components_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: MinHash near-dup pairs -> connected
    components by hash-min label propagation (operators/dedup.py
    connected_components).

    Oracled exactly: the pair graph equals the SQL truth set (see
    dedup_minhash_documents), and min-reachable-id labels are recomputed in
    DuckDB with a recursive transitive-closure CTE — the driver-loop
    fixpoint checked against a declarative recursion. tests/test_dedup.py
    adds a union-find cross-check on constructed graphs."""
    docs = _docs(spark, sf_dir)
    pairs = D.near_dedup_minhash(docs, "doc_id", "text", shingle_n=3, threshold=0.5)
    return D.connected_components(pairs, docs, "doc_id")


@register(
    "dedup_simhash_documents",
    f"""
    WITH {_JACCARD_ALL_PAIRS_CTES}
    SELECT 'truth_pairs' AS chk, COUNT(*) AS n FROM jac WHERE jaccard >= 0.5
    UNION ALL
    SELECT 'emitted_outside_truth' AS chk, CAST(0 AS BIGINT) AS n
    """,
    tier="sf0.01",
)
def dedup_simhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup pairs within hamming distance 3 via 16-bit-chunk
    bucketing (operators/dedup.py simhash_pairs).

    The hamming cut itself is not SQL-expressible (DuckDB has no xxhash64),
    so the gate checks the two provable invariants instead of the raw pair
    list: (a) `truth_pairs` — the exact-Jaccard >= 0.5 pair count, anchored
    by the O(n^2) DuckDB oracle; (b) `emitted_outside_truth` = 0 — every
    SimHash-emitted pair is a true near-dup (hamming <= 3 on 64 bits is
    ~impossible for unrelated documents, whose expected distance is 32).
    The raw pair list stays covered by pytest on constructed corpora."""
    docs = _docs(spark, sf_dir)
    emitted = D.simhash_pairs(docs, "doc_id", "text", max_hamming=3)
    truth = D.near_dedup_minhash(docs, "doc_id", "text", shingle_n=3, threshold=0.5)
    n_truth = truth.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("truth_pairs").alias("chk"), "n"
    )
    n_outside = (
        emitted.join(truth.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("emitted_outside_truth").alias("chk"), "n")
    )
    return n_truth.unionByName(n_outside)


@register(
    "dedup_compaction_receipt_documents",
    f"""
    WITH cut AS (SELECT MAX(doc_id) // 2 AS c FROM documents),
    {_JACCARD_ALL_PAIRS_CTES},
    t AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.7)
    SELECT CAST(2 AS BIGINT) AS n_folded,
           CAST(2 AS BIGINT) AS gens_before,
           CAST(1 AS BIGINT) AS gens_after,
           (SELECT CAST(COUNT(*) * 16 AS BIGINT) FROM documents)
             AS index_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM t, cut
            WHERE id_b < cut.c) AS pairs_b0,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM t, cut
            WHERE id_b >= cut.c) AS pairs_b1,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM t) AS pairs_total
    """,
    tier="sf0.01",
)
def dedup_compaction_receipt_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The dedup stream's compaction RECEIPT — the
    ivf_compaction_receipt twin for the round-12 staged dedup state
    (streaming/dedup_stream.py): two id-ordered document batches flow
    through the stream's exact state transitions (incremental probe
    against the committed index, staged per-batch index/pairs dirs,
    pointer-flip commits), then ``compact_streaming_dedup_state``
    (gc=True) folds BOTH tables and the receipt row states what the
    maintenance job did, every claim derived from real on-disk state.

    SQL-gated exactly: the band index contributes exactly ``bands``
    (16) rows per document, so ``index_rows`` = 16·|docs| pins index
    conservation through the fold bit-exactly; the pair counts are the
    O(n²) exact-Jaccard truth set (>= 0.7) attributed to the batch of
    each pair's LATER member (``id_b`` against the id cut) — equality
    holds for the dedup_minhash reason (every fixture near-dup pair has
    Jaccard >= 0.9, where 16×4 banding misses with p < 4e-8, and the
    incremental probe discovers each pair exactly when its later doc
    arrives), so ``pairs_b0``/``pairs_b1`` also pin WHEN each pair was
    discovered, not just that it was.

    In-query invariants (the filesystem half): index and pair row
    counts identical across the fold; strictly fewer parquet files and
    no byte growth (the OPTIMIZE claim); exactly one generation dir per
    table after gc.

    Scale shape: the stream's own — banded candidate probe per batch
    (never all-pairs on the Spark side; the O(n²) truth lives only in
    the DuckDB oracle, tier sf0.01), fold is one repartitioned rewrite
    per table."""
    import os
    import shutil
    import tempfile

    from app_insights_generator_spark.streaming._state import flip_latest
    from app_insights_generator_spark.streaming.dedup_stream import (
        _INDEX_SCHEMA,
        _staged_path,
        compact_streaming_dedup_state,
        read_index,
        read_pairs,
    )

    docs = _docs(spark, sf_dir)
    c = docs.agg(F.expr("max(doc_id) DIV 2").cast("long")).first()[0]
    batches = (
        docs.filter(F.col("doc_id") < c),
        docs.filter(F.col("doc_id") >= c),
    )

    state_dir = tempfile.mkdtemp(prefix="aig_dedup_compact_")
    try:
        for bid, batch in enumerate(batches):
            prev = read_index(spark, state_dir)
            if prev is None:
                prev = spark.createDataFrame([], _INDEX_SCHEMA)
            # Stage the batch index first, read it back, feed it to the
            # pair probe (round 13, mirrors streaming/dedup_stream.py):
            # the batch's shingle+signature subtree runs once per batch.
            batch_index = D.build_band_index(
                batch, "doc_id", "text", 3, 64, 16
            ).select(
                F.col("band").cast("int"),
                F.col("bhash").cast("bigint"),
                F.col("_id").cast("bigint"),
                "_sh",
            )
            batch_index.write.mode("overwrite").parquet(
                _staged_path(state_dir, "index", bid)
            )
            staged_index = spark.read.parquet(
                _staged_path(state_dir, "index", bid)
            )
            new_pairs = D.incremental_near_dedup(
                batch, prev, "doc_id", "text",
                shingle_n=3, num_hashes=64, bands=16, threshold=0.7,
                batch_index=staged_index,
            ).select(
                F.col("id_a").cast("bigint"),
                F.col("id_b").cast("bigint"),
                F.col("jaccard").cast("double"),
            )
            new_pairs.write.mode("overwrite").parquet(
                _staged_path(state_dir, "pairs", bid)
            )
            flip_latest(state_dir, bid)

        def _du() -> tuple[int, int]:
            n_files = total = 0
            for root, _dirs, files in os.walk(state_dir):
                for fname in files:
                    if fname.endswith(".parquet"):
                        n_files += 1
                        total += os.path.getsize(os.path.join(root, fname))
            return n_files, total

        def _gens() -> int:
            n = 0
            for kind in ("index", "pairs"):
                broot = os.path.join(state_dir, f"{kind}_batches")
                if os.path.isdir(broot):
                    n += len(os.listdir(broot))
                n += sum(
                    1
                    for d in os.listdir(state_dir)
                    if d.startswith(f"{kind}_base_v")
                )
            return n

        idx_before = read_index(spark, state_dir).count()
        pairs_before = read_pairs(spark, state_dir).count()
        files_before, bytes_before = _du()
        gens_before = _gens()

        n_folded = compact_streaming_dedup_state(spark, state_dir, gc=True)

        files_after, bytes_after = _du()
        gens_after = _gens()
        idx_after = read_index(spark, state_dir)
        pairs_after = read_pairs(spark, state_dir)
        if idx_after.count() != idx_before:
            raise AssertionError(
                f"fold changed index rows: {idx_before} -> "
                f"{idx_after.count()}"
            )
        # Byte check carries a per-file parquet-layout allowance (round
        # 12): merging files re-chunks row groups / dictionaries /
        # footers, which can GROW bytes by metadata-scale amounts even as
        # file count halves (observed at sf0.1: 4 -> 2 files, +606
        # bytes). Capped at 10% of the pre-fold payload (ADVICE r12): at
        # small scale factors 32 KiB x files could exceed the table's
        # whole payload, which would have let a fold that duplicated a
        # small table's data pass the "no byte growth" claim.
        byte_allowance = min(
            32 * 1024 * max(1, files_before), max(4096, bytes_before // 10)
        )
        if files_after >= files_before or bytes_after > bytes_before + byte_allowance:
            raise AssertionError(
                f"fold did not shrink storage: files {files_before} -> "
                f"{files_after}, bytes {bytes_before} -> {bytes_after}"
            )
        if gens_before != 4 or gens_after != 2:
            raise AssertionError(
                f"generation accounting off: {gens_before} -> {gens_after}"
                " (expected 2 staged dirs per table -> 1 base per table)"
            )

        receipt = pairs_after.agg(
            F.sum((F.col("id_b") < c).cast("long")).alias("pairs_b0"),
            F.sum((F.col("id_b") >= c).cast("long")).alias("pairs_b1"),
            F.count(F.lit(1)).cast("long").alias("pairs_total"),
        ).localCheckpoint(eager=True)  # pin: the temp state dir is removed
        if (
            receipt.first()["pairs_total"] != pairs_before
        ):  # conservation, pairs table
            raise AssertionError("fold changed the committed pair set size")
        idx_rows = idx_before
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)

    # Per-table generation counts for the gated row: 2 staged dirs ->
    # 1 base (measured per table above as 4 -> 2 across both tables).
    return receipt.select(
        F.lit(n_folded).cast("long").alias("n_folded"),
        F.lit(gens_before // 2).cast("long").alias("gens_before"),
        F.lit(gens_after // 2).cast("long").alias("gens_after"),
        F.lit(idx_rows).cast("long").alias("index_rows"),
        "pairs_b0",
        "pairs_b1",
        "pairs_total",
    )


# --- text analysis -----------------------------------------------------------

@register(
    "text_stats_documents",
    f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars,
           ROUND(CASE WHEN length(text) > 0
                 THEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                      / length(text) ELSE 0.0 END + 1e-9, 4) AS punct_ratio
    FROM documents
    """,
)
def text_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token/char counts + punctuation ratio (operators/text.py), all
    JVM-side expressions."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.round(T.punct_ratio(F.col("text")) + 1e-9, 4).alias("punct_ratio"),
    )


def _sql_occurrences(padded: str, needle: str) -> str:
    return (
        f"CAST((length({padded}) - length(replace({padded}, '{needle}', '')))"
        f" / {len(needle)} AS INTEGER)"
    )


def _sql_lang_score(lang: str) -> str:
    padded = "(' ' || lower(text) || ' ')"
    return " + ".join(_sql_occurrences(padded, f" {w} ") for w in T.LANG_MARKERS[lang])


def _lang_scores_sql() -> str:
    """Per-language marker-score projections (s_<lang> columns)."""
    return ", ".join(f"({_sql_lang_score(lang)}) AS s_{lang}" for lang in T.LANG_MARKERS)


def _lang_case_sql() -> str:
    """CASE over s_<lang> columns implementing argmax-with-ties-by-order."""
    langs = list(T.LANG_MARKERS)
    cases = []
    for lang in langs:
        conds = [f"s_{lang} > 0"] + [f"s_{lang} >= s_{o}" for o in langs if o != lang]
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(cases) + " ELSE 'und' END"


def _lang_id_oracle() -> str:
    return f"""
    SELECT {_lang_case_sql()} AS lang_pred, COUNT(*) AS n
    FROM (SELECT {_lang_scores_sql()} FROM documents)
    GROUP BY 1
    """


@register("lang_id_documents", _lang_id_oracle())
def lang_id_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-stopword language ID (operators/text.py lang_id), counted per
    predicted language."""
    return (
        _docs(spark, sf_dir)
        .select(T.lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _lang_confusion_oracle() -> str:
    return f"""
    WITH cells AS (
      SELECT lang AS lang_true, {_lang_case_sql()} AS lang_pred,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT lang, {_lang_scores_sql()} FROM documents)
      GROUP BY 1, 2
    )
    SELECT lang_true, lang_pred, n,
           CAST(SUM(n) OVER (PARTITION BY lang_true) AS BIGINT) AS n_true,
           CAST(n * 10000 // SUM(n) OVER (PARTITION BY lang_true) AS BIGINT)
             AS cell_bp
    FROM cells
    """


@register("lang_confusion_matrix_documents", _lang_confusion_oracle())
def lang_confusion_matrix_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the marker-stopword language classifier
    against the corpus's TRUE lang column — the classifier-eval row the
    plain prediction histogram (lang_id_documents) cannot give: which
    languages the heuristic confuses with which (and how much lands in
    'und'), per-true-language recall on the diagonal in basis points.
    The eval every curation team runs before trusting a cheap lang
    filter to route documents.

    Exactness: integer cell counts; cell_bp = n * 10000 DIV row total —
    the diagonal cell's bp IS the per-language recall. The oracle reuses
    the registered lang_id score/argmax SQL builders, so the classifier
    under eval is definitionally the gated one.

    Scale: one corpus scan to the |langs|^2-bounded cell table, then one
    window over that tiny grid.

    Reference parity: no counterpart; §2.6 curation extension.
    Registered on ROTATION_NEXT (round-10 window; post-sweep addition)."""
    cells = (
        _docs(spark, sf_dir)
        .select(
            F.col("lang").alias("lang_true"),
            T.lang_id(F.col("text")).alias("lang_pred"),
        )
        .groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wrow = Window.partitionBy("lang_true")
    return cells.select(
        "lang_true",
        "lang_pred",
        "n",
        F.sum("n").over(wrow).cast("long").alias("n_true"),
        F.expr("CAST(n * 10000 DIV (SUM(n) OVER (PARTITION BY lang_true)) AS LONG)").alias(
            "cell_bp"
        ),
    )


def _quality_score_sql() -> str:
    """The composite quality-score expression over a ``text`` column."""
    n_toks = f"len({_TOKS})"
    padded = "(' ' || lower(text) || ' ')"
    stop = " + ".join(_sql_occurrences(padded, f" {w} ") for w in T.LANG_MARKERS["en"])
    punct = (
        "CASE WHEN length(text) > 0 THEN "
        "CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) "
        "ELSE 0.0 END"
    )
    stop_ratio = f"CASE WHEN {n_toks} > 0 THEN CAST(({stop}) AS DOUBLE) / {n_toks} ELSE 0.0 END"
    return (
        f"(CASE WHEN {n_toks} BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END"
        f" + CASE WHEN ({punct}) < 0.1 THEN 0.3 ELSE 0.0 END"
        f" + CASE WHEN ({stop_ratio}) > 0.01 THEN 0.3 ELSE 0.0 END)"
    )


def _quality_oracle() -> str:
    return f"""
    SELECT ROUND({_quality_score_sql()} + 1e-9, 1) AS quality, COUNT(*) AS n
    FROM documents GROUP BY 1
    """


@register("quality_score_documents", _quality_oracle())
def quality_score_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality-score histogram (operators/text.py quality_score)."""
    return (
        _docs(spark, sf_dir)
        .select(F.round(T.quality_score(F.col("text")) + 1e-9, 1).alias("quality"))
        .groupBy("quality")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "token_count_bpe_documents",
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER)
             AS n_bpe_tokens
    FROM documents
    """,
)
def token_count_bpe_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-token counting (operators/text.py bpe_token_count):
    letter runs / digit runs / single symbols, the GPT-style
    pre-tokenization split."""
    return _docs(spark, sf_dir).select(
        "doc_id", T.bpe_token_count(F.col("text")).alias("n_bpe_tokens")
    )


@register(
    "fingerprint_rolling_documents",
    f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, length({_NORM}) + 1),
                 i -> CAST(ord(({_NORM})[i]) AS BIGINT))),
             (a, x) -> (a * 31 + x) % 2147483647) AS rolling_hash
    FROM documents
    """,
)
def fingerprint_rolling_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Karp–Rabin rolling-hash fingerprint of the normalized text
    (operators/text.py fingerprint_rolling), folded left-to-right inside
    JVM expressions."""
    return _docs(spark, sf_dir).select(
        "doc_id", T.fingerprint_rolling(F.col("text")).alias("rolling_hash")
    )


# --- binary / multimodal plumbing -------------------------------------------

@register(
    "binary_features_documents",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS byte_len,
           sha256(text) AS content_sha
    FROM documents
    """,
)
def binary_features_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary-column features (byte length + content digest) — the
    deterministic core of the multimodal ingestion path
    (operators/multimodal.py handles the decode plumbing)."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.octet_length("text").alias("byte_len"),
        F.sha2(F.encode("text", "UTF-8"), 256).alias("content_sha"),
    )


# --- similarity search -------------------------------------------------------

_COS_SQL = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id AS id,
       ROUND(CASE WHEN sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.qv, q.qv)) > 0
             THEN list_dot_product(e.embedding::DOUBLE[], q.qv)
                  / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                     * sqrt(list_dot_product(q.qv, q.qv)))
             ELSE 0.0 END + 1e-9, 6) AS cos_sim
FROM embeddings e, q
ORDER BY cos_sim DESC, id
LIMIT 10
"""


@register("cosine_topk_embeddings", _COS_SQL)
def cosine_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 vs the vec_id=0 query vector
    (operators/similarity.py cosine_topk): exact baseline, one scan +
    TakeOrderedAndProject."""
    embs = _embs(spark, sf_dir)
    qvec = embs.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    q = S.lit_vector(qvec)
    return (
        embs.select(
            F.col("vec_id").alias("id"),
            F.round(S.cosine(F.col("embedding"), q) + 1e-9, 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("id"))
        .limit(10)
    )


@register(
    "embedding_norms",
    """
    SELECT vec_id, ROUND(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) + 1e-9, 6) AS l2_norm
    FROM embeddings
    """,
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm — pure map-side array fold, no shuffle at all."""
    return _embs(spark, sf_dir).select(
        "vec_id", F.round(S.norm(F.col("embedding")) + 1e-9, 6).alias("l2_norm")
    )


# Shared invariant SQL for the two ANN top-k queries: the bucket/list
# recall itself is not SQL-expressible (DuckDB has no seeded hyperplanes /
# k-means), so the gate pins the four provable properties instead — same
# framing that graduated the sketch queries in round 2. The raw ranked
# list stays covered by pytest recall checks on clustered corpora.
_ANN_INVARIANT_SQL = """
    SELECT 'n_returned' AS chk, LEAST(10, COUNT(*)) AS n FROM embeddings
    UNION ALL SELECT 'self_hit' AS chk, CAST(1 AS BIGINT) AS n
    UNION ALL SELECT 'kth_bound_violations' AS chk, CAST(0 AS BIGINT) AS n
    UNION ALL SELECT 'score_mismatches' AS chk, CAST(0 AS BIGINT) AS n
"""


def _ann_invariants(res: DataFrame, embs: DataFrame, qvec, k: int) -> DataFrame:
    """Four provable invariants of an ANN top-k result vs the exact scan:

    - ``n_returned`` = min(k, n) — the probed buckets/lists hold >= k
      candidates at every tested SF (deterministic: seeded planes/means).
    - ``self_hit`` = 1 — the query vector is vec_id 0's own embedding, its
      bucket/list is always probed, so the exact top-1 is itself (cos 1.0).
    - ``kth_bound_violations`` = 0 — an approximation re-ranked by exact
      cosine over a SUBSET can never beat the exact k-th best score.
    - ``score_mismatches`` = 0 — every returned (id, cos_sim) agrees with
      an independent full-scan cosine for that id (pins the id<->score
      mapping through the bucket filter and re-rank)."""
    q = S.lit_vector(qvec)
    exact = embs.select(
        F.col("vec_id").alias("_eid"),
        F.round(S.cosine(F.col("embedding"), q), 6).alias("_ecos"),
    )
    exact_kth = (
        exact.orderBy(F.col("_ecos").desc(), F.col("_eid"))
        .limit(k)
        .agg(F.min("_ecos").alias("_kth"))
    )
    n_ret = res.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("n_returned").alias("chk"), "n"
    )
    self_hit = res.agg(
        F.count_if((F.col("id") == 0) & (F.col("cos_sim") >= 0.999999)).alias("n")
    ).select(F.lit("self_hit").alias("chk"), "n")
    kth_viol = (
        res.agg(F.min("cos_sim").alias("_annk"))
        .crossJoin(F.broadcast(exact_kth))
        .select(
            F.lit("kth_bound_violations").alias("chk"),
            F.when(F.col("_annk") > F.col("_kth") + F.lit(1e-9), 1)
            .otherwise(0)
            .cast("long")
            .alias("n"),
        )
    )
    mismatches = (
        res.join(exact, F.col("id") == F.col("_eid"))
        .agg(
            F.count_if(F.abs(F.col("cos_sim") - F.col("_ecos")) > 1e-9).alias("n")
        )
        .select(F.lit("score_mismatches").alias("chk"), "n")
    )
    return n_ret.unionByName(self_hit).unionByName(kth_viol).unionByName(mismatches)


@register("ann_topk_lsh_embeddings", _ANN_INVARIANT_SQL)
def ann_topk_lsh_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via random-hyperplane LSH bucket probe
    (operators/similarity.py ann_topk_lsh), multiprobe radius 2 so the
    37 probed buckets (of 256) always hold >= k candidates at every SF.

    Gated on the four ANN invariants (see _ann_invariants); pytest
    measures recall vs the exact top-k on clustered corpora."""
    embs = _embs(spark, sf_dir)
    qvec = embs.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    res = S.ann_topk_lsh(
        embs, "embedding", "vec_id", qvec, k=10, n_planes=8, multiprobe=2
    )
    return _ann_invariants(res, embs, qvec, k=10)


# The multimodal codec is STUBBED (no Pillow/ffmpeg in this environment)
# with features derived deterministically from the content sha256 digest
# (operators/multimodal.py _fake_decode) — which makes the whole pipeline
# EXACTLY oracle-able: DuckDB recomputes the digest and replays the same
# byte arithmetic. A real codec build swaps the stub and drops back to
# pytest-on-fixtures for the decode step; the Spark-side plumbing keeps
# these oracles.
_MEDIA_CTE = """
    m AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS media_type,
             CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             sha256(text) AS content_sha
      FROM documents
    ),
    d AS (
      SELECT *,
             {b0} AS b0,
             {b1} AS b1,
             {b23} AS b23
      FROM m
    )""".format(
    b0=sql_hex_to_int("substr(content_sha, 1, 2)", 2),
    b1=sql_hex_to_int("substr(content_sha, 3, 2)", 2),
    b23=sql_hex_to_int("substr(content_sha, 5, 4)", 4),
)


@register(
    "multimodal_features",
    f"""
    WITH {_MEDIA_CTE}
    SELECT media_id, media_type, byte_len, content_sha,
           CASE WHEN media_type IN ('image', 'video')
                THEN CAST(64 + b0 % 192 AS INT) END AS width,
           CASE WHEN media_type IN ('image', 'video')
                THEN CAST(64 + b1 % 192 AS INT) END AS height,
           CASE WHEN media_type IN ('audio', 'video')
                THEN CAST(1000 + b23 % 60000 AS BIGINT) END AS duration_ms
    FROM d
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media pipeline (operators/multimodal.py): documents wrapped
    as typed binary media rows -> Arrow-batched mapInPandas feature
    extraction.

    Oracled exactly: the stub decode derives width/height/duration from
    the content digest, and DuckDB replays the identical sha256-byte
    arithmetic — every row's features, hash-checked."""
    from app_insights_generator_spark.operators.multimodal import (
        documents_as_media,
        extract_media_features,
    )

    return extract_media_features(documents_as_media(_docs(spark, sf_dir)))


@register(
    "multimodal_frame_sample",
    f"""
    WITH {_MEDIA_CTE},
    n AS (
      SELECT media_id,
             LEAST((1000 + b23 % 60000) // 10000 + 1, 32) AS n_frames
      FROM d WHERE media_type = 'video'
    )
    SELECT media_id, CAST(n_frames AS BIGINT) AS n_frames,
           CAST(0 AS BIGINT) AS first_ts_ms,
           CAST((n_frames - 1) * 10000 AS BIGINT) AS last_ts_ms
    FROM n
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (operators/multimodal.py sample_frames): a
    one-to-many mapInPandas over binary video rows — every 10s up to 32
    frames, frame count driven by the (stubbed) decoded duration. Returns
    per-media frame counts + first/last timestamps.

    Oracled exactly: duration is digest-derived (see multimodal_features),
    so DuckDB recomputes each video's frame count and timestamp span — the
    1->N explosion arithmetic is hash-checked per media row."""
    from app_insights_generator_spark.operators.multimodal import (
        documents_as_media,
        sample_frames,
    )

    frames = sample_frames(documents_as_media(_docs(spark, sf_dir)), every_ms=10_000)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.min("frame_ts_ms").alias("first_ts_ms"),
        F.max("frame_ts_ms").alias("last_ts_ms"),
    )


@register(
    "multimodal_resize",
    """
    WITH m AS (
      SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS media_type
      FROM documents
    )
    SELECT media_type, COUNT(*) AS n,
           CASE WHEN media_type <> 'audio' THEN 128 END AS min_long_side,
           CASE WHEN media_type <> 'audio' THEN 128 END AS max_long_side,
           CAST(0 AS BIGINT) AS n_bound_violations
    FROM m GROUP BY media_type
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize plumbing (operators/multimodal.py
    resize_images): 1:1 mapInPandas; audio passes through with NULL dims.

    Gated on the provable resize invariants: every image/video's LONG side
    lands exactly on max_dim=128 (the scale factor is 128/max(w,h), so the
    long side is exact regardless of rounding mode), both dims stay in
    [1, 128], and audio rows keep NULL dims. The short side's rounded
    value is deliberately NOT emitted — Python rounds half-to-even,
    DuckDB half-away-from-zero, and pinning that boundary in SQL would
    gate on the tie-break rather than the operator."""
    from app_insights_generator_spark.operators.multimodal import (
        documents_as_media,
        resize_images,
    )

    resized = resize_images(documents_as_media(_docs(spark, sf_dir)), max_dim=128)
    long_side = F.greatest("width", "height")
    bound_viol = (
        (F.col("width") < 1)
        | (F.col("width") > 128)
        | (F.col("height") < 1)
        | (F.col("height") > 128)
        | ((F.col("media_type") == "audio") & F.col("width").isNotNull())
    )
    return resized.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(long_side).alias("min_long_side"),
        F.max(long_side).alias("max_long_side"),
        F.count_if(bound_viol).alias("n_bound_violations"),
    )


_COS_PAIRS_SQL = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e,
                  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
           FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.e, b.e) / (a.n * b.n) + 1e-9, 6) AS cos_sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE a.n * b.n > 0
  AND list_dot_product(a.e, b.e) / (a.n * b.n) >= 0.3
"""


@register("oracle_exact_cosine_pairs", _COS_PAIRS_SQL)
def oracle_exact_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, EXACT all-pairs baseline
    (operators/similarity.py cosine_pairs_exact). O(n^2) ORACLE TWIN —
    never the production path: this exists solely as the SQL-checkable
    ground truth for `similarity_join_lsh_embeddings`, which is the
    banded-LSH path that runs at 100 TB."""
    return S.cosine_pairs_exact(
        _embs(spark, sf_dir), "embedding", "vec_id", threshold=0.3, round_bias=1e-9
    )


@register("ann_topk_ivf_embeddings", _ANN_INVARIANT_SQL)
def ann_topk_ivf_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10 (operators/similarity.py ann_topk_ivf):
    sampled k-means coarse quantizer, n_probe nearest lists, exact re-rank.

    Gated on the four ANN invariants (see _ann_invariants) — the probe's
    list membership is seeded-k-means-dependent and not SQL-expressible;
    pytest measures recall vs the exact top-k on clustered corpora."""
    embs = _embs(spark, sf_dir)
    qvec = embs.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    res = S.ann_topk_ivf(
        embs, "embedding", "vec_id", qvec, k=10, n_lists=16, n_probe=4
    )
    return _ann_invariants(res, embs, qvec, k=10)


@register(
    "similarity_join_lsh_embeddings",
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e,
                      sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
               FROM embeddings),
    truth AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM v a JOIN v b ON a.vec_id < b.vec_id
      WHERE a.n * b.n > 0
        AND list_dot_product(a.e, b.e) / (a.n * b.n) >= 0.3
    )
    SELECT 'truth_pairs' AS chk, COUNT(*) AS n FROM truth
    UNION ALL
    SELECT 'emitted_outside_truth' AS chk, CAST(0 AS BIGINT) AS n
    """,
)
def similarity_join_lsh_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs near-neighbor join >= 0.3 cosine within LSH buckets, OR-
    amplified over 4 hash tables (operators/similarity.py
    similarity_join_lsh).

    Gated on the same invariant pair that graduated dedup_simhash:
    (a) ``truth_pairs`` — the exact >= 0.3 cosine pair count, recomputed
    Spark-side by the O(n^2) cosine_pairs_exact baseline and anchored by
    the DuckDB all-pairs truth set (the two already hash-agree via
    oracle_exact_cosine_pairs); (b) ``emitted_outside_truth`` = 0 — the
    LSH join's exact-cosine verify step admits no false positives, so
    every emitted pair must be in the truth set. Bucket recall is not
    SQL-expressible; pytest covers it on a clustered corpus."""
    embs = _embs(spark, sf_dir)
    emitted = S.similarity_join_lsh(
        embs, "embedding", "vec_id", threshold=0.3, n_planes=8, n_tables=4
    )
    truth = S.cosine_pairs_exact(
        embs, "embedding", "vec_id", threshold=0.3, round_bias=1e-9
    )
    n_truth = truth.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("truth_pairs").alias("chk"), "n"
    )
    n_outside = (
        emitted.join(truth.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("emitted_outside_truth").alias("chk"), "n")
    )
    return n_truth.unionByName(n_outside)


def similarity_join_lsh_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure banded-LSH similarity join, WITHOUT the O(n^2) exact truth
    anchor that the gate query `similarity_join_lsh_embeddings` adds for
    its invariant oracle. Deliberately NOT registered: its parameters are
    identical to the gated invariant query (threshold=0.3, 8 planes, 4
    tables), so correctness is already driver-hash-verified there, and the
    raw emitted pair set has no SQL-expressible oracle (the hyperplanes
    come from a seeded numpy RNG). bench.py imports this directly so the
    timed path is the scale path, never the O(n^2) anchor."""
    return S.similarity_join_lsh(
        _embs(spark, sf_dir), "embedding", "vec_id", threshold=0.3, n_planes=8, n_tables=4
    )


# --- end-to-end curation pipeline --------------------------------------------

def _curation_oracle() -> str:
    return f"""
    WITH scored AS (
      SELECT doc_id, source, text,
             {_lang_scores_sql()},
             ROUND({_quality_score_sql()} + 1e-9, 1) AS q
      FROM documents
    ),
    kept AS (
      SELECT doc_id, source, text, q
      FROM (SELECT *, {_lang_case_sql()} AS lang_pred FROM scored)
      WHERE lang_pred = 'en' AND q >= 0.7
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM kept
      ) WHERE rn = 1
    )
    SELECT source, COUNT(*) AS n_kept,
           ROUND(CAST(SUM(CAST(q AS DECIMAL(4,1))) AS DOUBLE) / COUNT(q)
                 + 1e-9, 4) AS avg_quality
    FROM deduped GROUP BY source
    """


@register("curation_pipeline_documents", _curation_oracle())
def curation_pipeline_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed LLM training-data curation flow — the whole point of
    the M5 operators working together: language-ID filter -> quality-score
    filter -> exact dedup (keep lowest doc_id per digest) -> per-source
    yield report.

    Scale shape: lang/quality are pure projections (no shuffle); the dedup
    window partitions on the 32-byte sha2 digest, never shuffling full
    texts for comparison (the oracle groups by raw text — same equivalence
    classes, sha2 collisions aside); the final rollup is a tiny
    aggregation. One wide shuffle total at 100 TB."""
    docs = _docs(spark, sf_dir)
    scored = docs.select(
        "doc_id",
        "source",
        "text",
        T.lang_id(F.col("text")).alias("lang_pred"),
        F.round(T.quality_score(F.col("text")) + 1e-9, 1).alias("q"),
    )
    kept = scored.filter((F.col("lang_pred") == "en") & (F.col("q") >= 0.7))
    # Keep-lowest-doc_id per digest as min_by aggregation, not a window:
    # the rollup below needs only (source, q) of each survivor, so the
    # exchange carries the 32-byte digest plus two small columns instead
    # of full document texts (the old window re-evaluated sha2(text)
    # downstream and therefore shipped text through the shuffle), and
    # partial aggregation collapses intra-partition duplicates map-side
    # (guide §2.3: shuffle keys/metadata, not payloads). doc_id is unique,
    # so min_by picks exactly the window's rn=1 row.
    deduped = (
        kept.groupBy(F.sha2(F.col("text"), 256).alias("_dig"))
        .agg(F.min_by(F.struct("source", "q"), "doc_id").alias("_keep"))
        .select(F.col("_keep.source").alias("source"), F.col("_keep.q").alias("q"))
    )
    # q is an exact 1-decimal score, so the mean runs on an exact decimal
    # sum — order-independent, unlike AVG over doubles (see _exact.py).
    return deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(
            F.sum(F.col("q").cast("decimal(4,1)")).cast("double") / F.count("q")
            + 1e-9,
            4,
        ).alias("avg_quality"),
    )


_E2E_BUDGET = 512
_E2E_SHARDS = 4


def _e2e_split_case_sql() -> str:
    """The train/val/test bucket expression over doc_id (the
    train_val_test_split_documents construction, inlined)."""
    digit = (
        lambda i, w: "(strpos('0123456789abcdef', substring(hx, "
        f"{i}, 1)) - 1) * {w}"
    )
    bucket = f"(({digit(1, 4096)} + {digit(2, 256)} + {digit(3, 16)} + {digit(4, 1)}) % 100)"
    return (
        f"CASE WHEN {bucket} < 80 THEN 'train' "
        f"WHEN {bucket} < 90 THEN 'val' ELSE 'test' END"
    )


@register(
    "trainprep_pipeline_documents",
    f"""
    WITH dedup AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text,
               ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM documents
      ) WHERE rn = 1
    ),
    scored AS (
      SELECT doc_id, text,
             ROUND({{Q}} + 1e-9, 1) AS q,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
      FROM dedup
    ),
    kept AS (SELECT * FROM scored WHERE q >= 0.7),
    tagged AS (
      SELECT doc_id, n_tokens, {_e2e_split_case_sql()} AS split,
             CAST({sql_hex_to_int(
                 "substring(sha256(CAST(doc_id AS VARCHAR)), 1, 12)", 12
             )} % {_E2E_SHARDS} AS INT) AS shard
      FROM (
        SELECT *, substring(sha256(CAST(doc_id AS VARCHAR)), 1, 4) AS hx
        FROM kept
      )
    ),
    packed AS (
      -- pack per (split, shard): no window partition exceeds a shard
      SELECT *,
             CAST((SUM(n_tokens) OVER (PARTITION BY split, shard
                                       ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING)
              - n_tokens) // {_E2E_BUDGET} AS BIGINT) AS bin_id
      FROM tagged
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(DISTINCT bin_id * {_E2E_SHARDS} + shard) AS BIGINT)
             AS n_bins,
           CAST(COUNT(DISTINCT shard) AS BIGINT) AS n_shards,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(n_tokens) * 10000
                // (COUNT(DISTINCT bin_id * {_E2E_SHARDS} + shard)
                    * {_E2E_BUDGET}) AS BIGINT)
             AS fill_bp
    FROM packed GROUP BY split
    """.replace("{Q}", _quality_score_sql()),
)
def trainprep_pipeline_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one job that runs the WHOLE training-data prep chain (VERDICT
    r09 item 7b — the composition the brief's north star implies):
    exact dedup (keep lowest doc_id per content digest) -> quality
    filter (composite score >= 0.7) -> deterministic 80/10/10
    train/val/test split (sha bucket of doc_id — content-independent,
    version-stable) -> deterministic shard assignment (48-bit sha hash
    % {_E2E_SHARDS}) -> per-(split, shard) context-window packing
    (running token sum DIV {_E2E_BUDGET} inside each shard) -> one
    accounting row per split: doc/token/bin/shard counts, id-sum
    witness, and integer fill basis points (bins counted as distinct
    (shard, bin_id) pairs via the injective bin_id*{_E2E_SHARDS}+shard
    key). Every stage is the already-gated primitive
    (curation_pipeline, train_val_test_split, pack_next_fit's per-shard
    discipline, shard_shuffle) chained in one plan, so the gate pins
    that the COMPOSITION preserves each stage's semantics — the
    pipeline a user would actually schedule nightly.

    Scale shape (VERDICT r10 item 3): dedup is one window on the
    32-byte digest (the only wide shuffle over full rows);
    quality/split/shard are pure projections; the packing window
    partitions by (split, shard) — shard assignment is deterministic
    and upstream-computable, so no window partition exceeds a shard,
    and shard count scales with the corpus (the earlier per-split
    window meant three single-reducer partitions over the full kept
    corpus at 100 TB). Plan-guarded: the packing window's partition
    key includes the shard (tests/test_plans.py). The final rollup is
    3 rows. At 100 TB: identical plan, with ``partitionBy(split,
    shard)`` on the write turning the result into the training-ready
    directory layout.

    Exactness: quality is the exact 1-decimal score, tokens/bins/
    shards/fills are pure int64 arithmetic (DIV both engines), split
    and shard reuse the portable sha-hex expansion; no float reaches
    the gate except q's filter, shared with the green curation gate."""
    docs = _docs(spark, sf_dir)
    # Score BEFORE the dedup shuffle: q and n_tokens are pure functions of
    # text, so every duplicate of a text yields the identical (q, n_tokens)
    # and the keep-lowest-doc_id rule reduces to one min_by aggregation on
    # the digest. The exchange then carries (digest, doc_id, q, n_tokens)
    # — ~50 bytes/row — instead of full document texts through a window
    # partitioned by sha2(text) (which re-evaluates the digest downstream
    # and therefore ships text). At 100 TB this turns the pipeline's one
    # full-payload shuffle into a metadata shuffle (guide §2.3/§8); the
    # extra map-side scoring of duplicate rows is scan-local CPU.
    scored = docs.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("_dig"),
        F.round(T.quality_score(F.col("text")) + 1e-9, 1).alias("q"),
        F.size(F.split(F.trim(F.col("text")), " ")).cast("bigint").alias(
            "n_tokens"
        ),
    )
    dedup = (
        scored.groupBy("_dig")
        .agg(F.min_by(F.struct("doc_id", "q", "n_tokens"), "doc_id").alias("_keep"))
        .select("_keep.doc_id", "_keep.q", "_keep.n_tokens")
    )
    kept = dedup.filter(F.col("q") >= 0.7)
    bucket = (
        F.conv(
            F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 4),
            16,
            10,
        ).cast("int")
        % 100
    )
    shard = (
        F.conv(
            F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 12),
            16,
            10,
        ).cast("long")
        % _E2E_SHARDS
    ).cast("int")
    tagged = kept.select(
        "doc_id",
        "n_tokens",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
        shard.alias("shard"),
    )
    packed = tagged.withColumn(
        "bin_id",
        F.expr(
            f"(sum(n_tokens) OVER (PARTITION BY split, shard ORDER BY doc_id "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) "
            f"DIV {_E2E_BUDGET}"
        ),
    )
    return packed.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.countDistinct(F.expr(f"bin_id * {_E2E_SHARDS} + shard"))
        .cast("long")
        .alias("n_bins"),
        F.countDistinct("shard").cast("long").alias("n_shards"),
        F.sum("doc_id").cast("long").alias("id_sum"),
        F.expr(
            f"sum(n_tokens) * 10000 DIV "
            f"(count(DISTINCT bin_id * {_E2E_SHARDS} + shard) * {_E2E_BUDGET})"
        )
        .cast("long")
        .alias("fill_bp"),
    )


# --- training-data curation: repetition + domain mixing ----------------------

@register(
    "repetition_signals_documents",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS l FROM documents),
    s AS (
      SELECT doc_id,
             ROUND(1.0 * len(list_distinct(l)) / len(l) + 1e-9, 3) AS distinct_ratio,
             ROUND(1.0 * list_max(list_transform(list_distinct(l),
                       x -> len(list_filter(l, y -> y = x)))) / len(l) + 1e-9, 3
                  ) AS top_token_frac
      FROM t WHERE len(l) > 0
    )
    SELECT doc_id, distinct_ratio, top_token_frac,
           (distinct_ratio <= 0.35 OR top_token_frac >= 0.15) AS repetitive
    FROM s
    """,
)
def repetition_signals_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: distinct-token ratio
    and most-frequent-token fraction, plus a repetitive flag — the
    standard pre-training filter for looping/boilerplate text (reference
    has no text ops; extension mandated by SURVEY.md §2.2). Tokens are
    materialized as an attribute in their own projection before the
    per-distinct-token count, so tokenize runs once per row, not once per
    lambda element; everything is built-in higher-order functions (no
    Python), so the whole filter is a shuffle-free scan at 100 TB."""
    toked = _docs(spark, sf_dir).select(
        "doc_id", T.tokens(F.col("text")).alias("l")
    ).filter(F.size("l") > 0)
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(F.col("l")),
            lambda x: F.size(F.filter(F.col("l"), lambda y: y == x)),
        )
    )
    sig = toked.select(
        "doc_id",
        F.round(F.size(F.array_distinct("l")) / F.size("l") + 1e-9, 3).alias(
            "distinct_ratio"
        ),
        F.round(top_cnt / F.size("l") + 1e-9, 3).alias("top_token_frac"),
    )
    return sig.withColumn(
        "repetitive",
        (F.col("distinct_ratio") <= 0.35) | (F.col("top_token_frac") >= 0.15),
    )


@register(
    "domain_mix_sample_documents",
    """
    WITH rated AS (
      SELECT source, doc_id,
             CASE WHEN source IN ('src0', 'src1', 'src2', 'src3') THEN 2
                  WHEN source IN ('src4', 'src5', 'src6', 'src7') THEN 5
                  ELSE 10 END AS keep_tenths
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE doc_id % 10 < keep_tenths) AS n_kept
    FROM rated GROUP BY source
    """,
)
def domain_mix_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture downsampling: per-source keep rates (20% / 50% /
    100% here) applied with DETERMINISTIC modulo sampling on the stable
    doc id rather than rand() — reproducible across engines, retries, and
    re-runs, which matters when a 100 TB curation job restarts mid-way.
    Pure scan + tiny aggregation: no shuffle wider than the per-source
    report."""
    docs = _docs(spark, sf_dir)
    keep_tenths = (
        F.when(F.col("source").isin("src0", "src1", "src2", "src3"), 2)
        .when(F.col("source").isin("src4", "src5", "src6", "src7"), 5)
        .otherwise(10)
    )
    return (
        docs.select("source", "doc_id", keep_tenths.alias("keep_tenths"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count_if(F.col("doc_id") % 10 < F.col("keep_tenths")).alias("n_kept"),
        )
    )


@register(
    "multimodal_real_codec_features",
    """
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
           CASE WHEN doc_id % 2 = 0
                THEN CAST(4 * (2 + doc_id % 6) AS INT) END AS width,
           CASE WHEN doc_id % 2 = 0
                THEN CAST(4 * (1 + doc_id % 5) AS INT) END AS height,
           CASE WHEN doc_id % 2 = 1
                THEN CAST(256 * (4 + doc_id % 8) // 8 AS BIGINT) END AS duration_ms,
           CASE WHEN doc_id % 2 = 0
                THEN CAST(4 * (2 + doc_id % 6) * 4 * (1 + doc_id % 5)
                          * (4 * (2 + doc_id % 6) + 4 * (1 + doc_id % 5) - 2)
                          // 2 AS BIGINT)
                ELSE CAST((4 + doc_id % 8) * 1048576 AS BIGINT)
           END AS payload_sum
    FROM documents WHERE doc_id < 200
    """,
)
def multimodal_real_codec_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode, end to end — no stub: BMP gradient images and
    PCM-16 WAV sawtooths are generated as actual files (headers, chunk
    lists, padding — operators/codecs.py), then parsed back by the real
    pure-numpy decoders inside Arrow-batched mapInPandas
    (operators/multimodal.py extract_real_media_features).

    The oracle predicts every decoded feature in CLOSED FORM from the id
    alone (dimensions, duration, R-channel sum, sum|samples|), so a
    single wrong header byte, row padding error, or sample-width mistake
    anywhere in encode OR decode hash-mismatches the gate. Compressed
    formats (JPEG/MP4) remain behind the documented decode_stub — this
    query is the proof the Spark-side plumbing is codec-agnostic."""
    from app_insights_generator_spark.operators.multimodal import (
        extract_real_media_features,
        synthesize_real_media,
    )

    ids = _docs(spark, sf_dir).filter(F.col("doc_id") < 200).select(
        F.col("doc_id").alias("media_id")
    )
    media = synthesize_real_media(ids, "media_id")
    return extract_real_media_features(media)


@register(
    "multimodal_real_resize",
    """
    WITH dims AS (
      SELECT doc_id AS media_id,
             4 * (2 + doc_id % 6) AS w,
             4 * (1 + doc_id % 5) AS h
      FROM documents WHERE doc_id < 200 AND doc_id % 2 = 0
    ),
    rs AS (
      SELECT media_id, w, h,
             GREATEST(1, CAST(round(w * 16.0 / GREATEST(w, h)) AS INT)) AS nw,
             GREATEST(1, CAST(round(h * 16.0 / GREATEST(w, h)) AS INT)) AS nh
      FROM dims
    )
    SELECT media_id, CAST(nw AS INT) AS width, CAST(nh AS INT) AS height,
           CAST(nh * list_sum(list_transform(range(nw), i -> (i * w) // nw))
              + nw * list_sum(list_transform(range(nh), j -> (j * h) // nh))
              AS BIGINT) AS r_sum
    FROM rs
    """,
)
def multimodal_real_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL nearest-neighbor image resize, gate-checked: gradient BMPs
    (pixel value x+y) are resized to max dim 16 by
    operators/multimodal.resize_real_images (decode -> numpy index-select
    -> re-encode), then DECODED AGAIN and their R-channel sum recomputed
    from the output pixels. The oracle derives the same sum in closed form
    from the sampling index map src = (dst * src_dim) // dst_dim — so the
    gate proves decode, resample arithmetic, re-encode, and second decode
    all agree, byte-for-byte, with no codec library anywhere."""
    import numpy as np

    from app_insights_generator_spark.operators.codecs import decode_bmp
    from app_insights_generator_spark.operators.multimodal import (
        RESIZED_SCHEMA,
        resize_real_images,
        synthesize_real_media,
    )

    ids = (
        _docs(spark, sf_dir)
        .filter((F.col("doc_id") < 200) & (F.col("doc_id") % 2 == 0))
        .select(F.col("doc_id").alias("media_id"))
    )
    resized = resize_real_images(synthesize_real_media(ids, "media_id"), max_dim=16)

    from collections.abc import Iterator as _It

    import pandas as _pd

    def verify(it: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in it:
            rows = [
                (
                    int(mid),
                    int(w),
                    int(h),
                    int(decode_bmp(bytes(c))[:, :, 0].astype("i8").sum()),
                )
                for mid, c, w, h in zip(
                    pdf["media_id"], pdf["content"], pdf["width"], pdf["height"]
                )
            ]
            yield _pd.DataFrame(rows, columns=["media_id", "width", "height", "r_sum"])

    return resized.mapInPandas(
        verify, schema="media_id long, width int, height int, r_sum long"
    )


@register(
    "multimodal_audio_windows",
    """
    SELECT doc_id AS media_id,
           CAST(unnest(range(4 + doc_id % 8)) AS INT) AS window_idx,
           CAST(1048576 AS BIGINT) AS sum_abs
    FROM documents WHERE doc_id < 200 AND doc_id % 2 = 1
    """,
)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio windowing — the audio analog of video frame sampling,
    with an actual decoder: WAV payloads are parsed (chunk walker + PCM),
    split into fixed 256-sample windows, and each window's |amplitude| sum
    emitted as a row (one-to-many mapInPandas, output rows > input rows).
    The sawtooth test signal repeats every 256 samples, so the oracle
    knows every window's sum in closed form: any framing error (off-by-one
    window boundary, header misparse, byte-order slip) breaks equality.
    Scale: same shape as frame extraction — decode parallelism is
    per-media-row, window explosion multiplies rows, partitioning
    preserved for the caller to rebalance."""
    import numpy as np

    from app_insights_generator_spark.operators.codecs import decode_wav
    from app_insights_generator_spark.operators.multimodal import synthesize_real_media

    from collections.abc import Iterator as _It

    import pandas as _pd

    ids = (
        _docs(spark, sf_dir)
        .filter((F.col("doc_id") < 200) & (F.col("doc_id") % 2 == 1))
        .select(F.col("doc_id").alias("media_id"))
    )
    media = synthesize_real_media(ids, "media_id")

    def windows(it: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                samples, _rate = decode_wav(bytes(content))
                n_win = len(samples) // 256
                absw = np.abs(samples.astype("i8")).reshape(n_win, 256).sum(axis=1)
                rows.extend(
                    (int(mid), int(i), int(s)) for i, s in enumerate(absw)
                )
            yield _pd.DataFrame(rows, columns=["media_id", "window_idx", "sum_abs"])

    return media.mapInPandas(
        windows, schema="media_id long, window_idx int, sum_abs long"
    )


@register(
    "dedup_incremental_minhash_documents",
    f"""
    WITH {_JACCARD_ALL_PAIRS_CTES},
    cut AS (SELECT MAX(doc_id) * 4 // 5 AS c FROM documents)
    SELECT id_a, id_b, ROUND(jaccard + 1e-9, 4) AS jaccard
    FROM jac, cut
    WHERE jaccard >= 0.5 AND (id_a >= cut.c OR id_b >= cut.c)
    """,
    tier="sf0.01",
)
def dedup_incremental_minhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dedup — the daily-ingest mode: the first 4/5 of
    the doc_id space plays the EXISTING corpus (band index built once,
    operators/dedup.py build_band_index), the top 1/5 arrives as the new
    batch, which is sketched alone and probes the index. The cutoff is
    data-relative (max_id*4 DIV 5, integer both engines) so the batch is
    non-empty at EVERY scale factor — a fixed id constant left the gate
    vacuously green at the driver's sf0.01
    (incremental_near_dedup). Emitted pairs must EXACTLY equal the full
    run's truth pairs that touch at least one new document — corpus-only
    pairs are history and never recomputed. At 100 TB this turns daily
    dedup from O(corpus) into O(batch): the corpus is never re-read, only
    its (band, bhash)-keyed index is joined.

    Gate-validity note (ADVICE r03): exact equality to the truth set is a
    FIXTURE-DEPENDENT claim. 16-band/4-row banding surfaces a pair with
    probability 1-(1-j^4)^16 — ~65% at jaccard exactly 0.5, >99.99% at
    j >= 0.9. It holds here because every duplicate pair in the driver
    corpus has jaccard >= 0.9 (measured; same argument as
    dedup_minhash_documents). A corpus with pairs near the 0.5 threshold
    would make this equality probabilistic — recall near the knee is
    covered by pytest on a constructed corpus, not by this gate."""
    docs = _docs(spark, sf_dir)
    cutoff = docs.agg(F.expr("max(doc_id) * 4 DIV 5").cast("long")).first()[0]
    corpus = docs.filter(F.col("doc_id") < cutoff)
    batch = docs.filter(F.col("doc_id") >= cutoff)
    index = D.build_band_index(corpus, "doc_id", "text")
    pairs = D.incremental_near_dedup(
        batch, index, "doc_id", "text", threshold=0.5, broadcast_probe=True
    )
    return pairs.select(
        "id_a", "id_b", F.round(F.col("jaccard") + 1e-9, 4).alias("jaccard")
    )


@register(
    "pca_eigenspectrum_embeddings",
    """
    WITH pos AS (
      SELECT vec_id, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS ord
      FROM embeddings
    ),
    mu AS (SELECT ord, AVG(v) AS m FROM pos GROUP BY ord),
    var AS (
      SELECT SUM((p.v - mu.m) * (p.v - mu.m))
             / (SELECT COUNT(*) FROM embeddings) AS total_var
      FROM pos p JOIN mu ON p.ord = mu.ord
    )
    SELECT chk, val FROM (
      SELECT 1 AS o, 'n_components' AS chk, 64.0 AS val
      UNION ALL
      SELECT 2, 'total_variance', ROUND(total_var + 1e-9, 3) FROM var
      UNION ALL
      SELECT 3, 'eig_sum_matches_trace', 0.0
      UNION ALL
      SELECT 4, 'monotonic_violations', 0.0
      UNION ALL
      SELECT 5, 'negative_eigenvalues', 0.0
    ) ORDER BY o
    """,
)
def pca_eigenspectrum_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA eigenspectrum over the embedding corpus
    (operators/similarity.py pca_eigenspectrum): partition-local Gram
    partials, element-wise reduce, dim x dim eigh on the driver — row
    count never touches the driver, so the same plan handles 100 TB of
    vectors. Eigendecomposition is not SQL-expressible, so the gate
    anchors what IS: the eigenvalue sum must equal the covariance trace
    (total variance, recomputed exactly by the oracle), the spectrum must
    be sorted descending, and no eigenvalue may be (numerically)
    negative."""
    import numpy as np

    embs = _embs(spark, sf_dir)
    eig, n = S.pca_eigenspectrum(embs)
    total_var = float(eig.sum())
    # Independent within-engine trace: total variance recomputed by a
    # plain posexplode aggregation, never touching the Gram/eigh path.
    pos = embs.select(F.posexplode("embedding").alias("ord", "v"))
    mu = pos.groupBy("ord").agg(F.avg("v").alias("m"))
    trace = (
        pos.join(mu, "ord")
        .agg((F.sum((F.col("v") - F.col("m")) ** 2) / F.lit(n)).alias("t"))
        .collect()[0]["t"]
    )
    mono = int((np.diff(eig) > 1e-12).sum())
    neg = int((eig < -1e-9).sum())
    rows = [
        ("n_components", float(len(eig))),
        ("total_variance", round(total_var + 1e-9, 3)),
        ("eig_sum_matches_trace", 0.0 if abs(total_var - trace) < 1e-6 * max(trace, 1.0) else 1.0),
        ("monotonic_violations", float(mono)),
        ("negative_eigenvalues", float(neg)),
    ]
    return spark.createDataFrame(rows, "chk string, val double")


@register(
    "lm_quality_bigram_documents",
    """
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents
    ),
    chars AS (
      SELECT doc_id, string_split(t, '') AS cs FROM norm WHERE len(t) >= 2
    ),
    bg AS (
      SELECT doc_id, cs[i] AS a, cs[i+1] AS b
      FROM chars, unnest(range(1, len(cs))) AS u(i)
    ),
    cnt_ab AS (SELECT a, b, COUNT(*) AS n_ab FROM bg GROUP BY a, b),
    cnt_a AS (SELECT a, SUM(n_ab) AS n_a FROM cnt_ab GROUP BY a),
    vocab AS (SELECT COUNT(DISTINCT b) AS v FROM cnt_ab)
    SELECT bg.doc_id,
           ROUND(-AVG(LN((n_ab + 1.0) / (n_a + v))) + 1e-9, 4) AS nll
    FROM bg JOIN cnt_ab USING (a, b) JOIN cnt_a USING (a) CROSS JOIN vocab
    GROUP BY bg.doc_id
    """,
)
def lm_quality_bigram_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical LM quality scoring — the standard curation signal one
    step up from heuristics: a char-bigram language model is TRAINED ON
    THE CORPUS ITSELF (two aggregations: bigram counts, context totals;
    add-one smoothing over the observed alphabet) and every document is
    scored by its average negative log-likelihood. Gibberish and
    boilerplate score high-NLL against the corpus distribution; the whole
    thing is plain relational algebra — explode bigrams, two broadcast
    joins against the (alphabet^2-bounded) model tables, one avg — so it
    runs at 100 TB with one wide shuffle for training counts and
    broadcast-only scoring, and DuckDB reproduces it exactly."""
    docs = _docs(spark, sf_dir)
    t = T.normalized_text(F.col("text"))
    chars = docs.select("doc_id", F.split(t, "").alias("cs")).filter(
        F.length(t) >= 2
    )
    bg = chars.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("cs") - 1),
                lambda i: F.struct(
                    F.element_at("cs", i).alias("a"),
                    F.element_at("cs", i + 1).alias("b"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.a", "p.b")
    cnt_ab = bg.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    cnt_a = cnt_ab.groupBy("a").agg(F.sum("n_ab").alias("n_a"))
    vocab = cnt_ab.agg(F.count_distinct("b").alias("v"))
    scored = (
        bg.join(F.broadcast(cnt_ab), ["a", "b"])
        .join(F.broadcast(cnt_a), "a")
        .crossJoin(F.broadcast(vocab))
    )
    return scored.groupBy("doc_id").agg(
        F.round(
            -F.avg(F.log((F.col("n_ab") + 1.0) / (F.col("n_a") + F.col("v")))) + 1e-9,
            4,
        ).alias("nll")
    )


@register(
    "dedup_canonical_by_quality",
    f"""
    WITH RECURSIVE {_JACCARD_ALL_PAIRS_CTES},
    truth AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.5),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM truth
      UNION
      SELECT id_b AS src, id_a AS dst FROM truth
    ),
    walk(node, comp) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.node
    ),
    comps AS (SELECT node AS doc_id, MIN(comp) AS component FROM walk GROUP BY node),
    scored AS (
      SELECT doc_id, ROUND({{Q}} + 1e-9, 1) AS q FROM documents
    )
    SELECT component,
           MIN(doc_id) FILTER (
             WHERE (q, -doc_id) = (
               SELECT MAX((s2.q, -s2.doc_id))
               FROM comps c2 JOIN scored s2 USING (doc_id)
               WHERE c2.component = c.component
             )
           ) AS keep_id,
           COUNT(*) AS n_members
    FROM comps c JOIN scored USING (doc_id)
    GROUP BY component
    """.replace("{Q}", _quality_score_sql()),
    tier="sf0.01",
)
def dedup_canonical_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection — the decision real dedup pipelines
    actually make: within each near-dup cluster (MinHash pairs ->
    connected components), KEEP the highest-QUALITY member (tie-break:
    lowest doc_id), not blindly the lowest id — dropping the cleanest
    copy of a boilerplate family is a real corpus-quality regression.
    One argmax-by-struct per component (max(struct(q, -doc_id)) — single
    aggregation, no window sort), oracled end-to-end: DuckDB recomputes
    the clusters by recursive closure AND the quality scores, then picks
    the same canonical member."""
    docs = _docs(spark, sf_dir)
    pairs = D.near_dedup_minhash(docs, "doc_id", "text", shingle_n=3, threshold=0.5)
    comps = D.connected_components(pairs, docs, "doc_id")
    scored = docs.select(
        "doc_id", F.round(T.quality_score(F.col("text")) + 1e-9, 1).alias("q")
    )
    return (
        comps.join(scored, "doc_id")
        .groupBy("component")
        .agg(
            F.max(F.struct(F.col("q"), (-F.col("doc_id")).alias("neg_id")))
            .alias("best"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .select(
            "component",
            (-F.col("best.neg_id")).cast("bigint").alias("keep_id"),
            "n_members",
        )
    )


@register(
    "corpus_report_documents",
    f"""
    WITH scored AS (
      SELECT doc_id, source, text,
             len({_TOKS}) AS n_toks,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS digest,
             CAST(ROUND({_quality_score_sql()} + 1e-9, 1) AS DECIMAL(4,1)) AS q,
             {_lang_scores_sql()}
      FROM documents
    ),
    lp AS (SELECT *, {_lang_case_sql()} AS lang_pred FROM scored)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           COUNT(DISTINCT digest) AS n_unique_texts,
           CAST((COUNT(*) - COUNT(DISTINCT digest)) * 10000 // COUNT(*) AS BIGINT)
             AS dup_rate_bp,
           ROUND(CAST(SUM(q) AS DOUBLE) / COUNT(q) + 1e-9, 4) AS mean_quality,
           CAST(COUNT(*) FILTER (WHERE lang_pred = 'en') AS BIGINT) AS n_english
    FROM lp GROUP BY source
    """,
)
def corpus_report_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass corpus observability report — the dashboard row a training
    pipeline checks before every run: per source, document and token
    volume, exact-dup rate (md5 of normalized text, integer basis points),
    mean quality (exact 1-decimal decimal sum), and language mix. ONE scan
    + one shuffle on source (COUNT(DISTINCT digest) expands per group);
    every metric is integer or exact-decimal, so the gate is
    float-drift-proof."""
    docs = _docs(spark, sf_dir)
    toks_n = T.token_count(F.col("text")).alias("n_toks")
    scored = docs.select(
        "source",
        toks_n,
        T.fingerprint_md5(F.col("text")).alias("digest"),
        F.round(T.quality_score(F.col("text")) + 1e-9, 1)
        .cast("decimal(4,1)")
        .alias("q"),
        T.lang_id(F.col("text")).alias("lang_pred"),
    )
    cnt = F.count(F.lit(1))
    return scored.groupBy("source").agg(
        cnt.alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("n_tokens"),
        F.countDistinct("digest").alias("n_unique_texts"),
        # Integer arithmetic end to end (DIV, matching the oracle's //):
        # a double quotient re-floored can exceed the true floor once
        # per-source counts are large enough for the product to lose ulps.
        F.expr(
            "(count(1) - count(DISTINCT digest)) * 10000 DIV count(1)"
        ).alias("dup_rate_bp"),
        F.round(F.sum("q").cast("double") / F.count("q") + 1e-9, 4).alias(
            "mean_quality"
        ),
        F.count_if(F.col("lang_pred") == "en").cast("bigint").alias("n_english"),
    )


@register(
    "multimodal_png_codec_features",
    """
    WITH ids AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 100),
    dims AS (
      SELECT media_id,
             4 * (2 + media_id % 6) AS w,
             3 * (1 + media_id % 5) AS h
      FROM ids
    ),
    px AS (
      SELECT d.media_id, d.w, d.h,
             (3 * y.y + 7 * x.x + d.media_id) % 256 AS r
      FROM dims d,
           LATERAL (SELECT unnest(range(0, d.h)) AS y) y,
           LATERAL (SELECT unnest(range(0, d.w)) AS x) x
    )
    SELECT media_id,
           'image_png' AS media_type,
           CAST(ANY_VALUE(w) AS INT) AS width,
           CAST(ANY_VALUE(h) AS INT) AS height,
           CAST(NULL AS BIGINT) AS duration_ms,
           CAST(SUM(r) AS BIGINT) AS payload_sum
    FROM px GROUP BY media_id
    """,
)
def multimodal_png_codec_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COMPRESSED-format decode, end to end: 8-bit RGB PNGs (zlib
    DEFLATE scanlines, operators/codecs.py) are generated with scanline
    filter id%5 — so the distributed path exercises None/Sub/Up/Average/
    Paeth — then parsed back by the pure-stdlib+numpy decoder (CRC-checked
    chunks, full defilter) inside Arrow-batched mapInPandas. The oracle
    predicts width, height, and the R-channel pixel sum in CLOSED FORM
    from the id alone (px[y,x] = (3y+7x+id)%256), so one wrong DEFLATE
    byte, filter reconstruction, or CRC slip hash-mismatches the gate.
    This retires the 'compressed formats are environment-blocked' caveat
    for images; only video (MP4) remains behind the documented stub."""
    from app_insights_generator_spark.operators.multimodal import (
        extract_real_media_features,
        synthesize_png_media,
    )

    ids = _docs(spark, sf_dir).filter(F.col("doc_id") < 100).select(
        F.col("doc_id").alias("media_id")
    )
    return extract_real_media_features(synthesize_png_media(ids, "media_id"))


@register(
    "multimodal_jpeg_codec_features",
    """
    WITH ids AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 100),
    dims AS (
      SELECT media_id,
             2 + media_id % 5 AS bw,
             1 + media_id % 4 AS bh
      FROM ids
    ),
    blocks AS (
      SELECT d.media_id, d.bw, d.bh,
             (7 * x.x + 13 * y.y + d.media_id) % 256 AS v
      FROM dims d,
           LATERAL (SELECT unnest(range(0, d.bh)) AS y) y,
           LATERAL (SELECT unnest(range(0, d.bw)) AS x) x
    )
    SELECT media_id,
           'image_jpeg' AS media_type,
           CAST(ANY_VALUE(bw) * 8 AS INT) AS width,
           CAST(ANY_VALUE(bh) * 8 AS INT) AS height,
           CAST(NULL AS BIGINT) AS duration_ms,
           CAST(SUM(64 * v) AS BIGINT) AS payload_sum
    FROM blocks GROUP BY media_id
    """,
)
def multimodal_jpeg_codec_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG decode, end to end (round-4 verdict item 6): baseline
    sequential grayscale JPEGs — forward DCT, flat quantization, DPCM DC
    + run-length AC under canonical Annex-K Huffman coding, 0xFF byte
    stuffing — are generated distributed, then parsed back by the
    pure-numpy decoder (operators/codecs.py decode_jpeg: marker walk,
    Huffman + bitstream decode, dequantize, IDCT) inside Arrow-batched
    mapInPandas. Images are constant 8x8 blocks v = (7bx+13by+id)%256,
    which roundtrip EXACTLY through the lossy pipeline (DC-only blocks,
    flat quant), so the oracle predicts width, height, and the decoded
    pixel sum in closed form — one wrong Huffman bit, DPCM step, or IDCT
    slip hash-mismatches the gate. With PNG this closes the image half of
    the codec set; video (MP4) remains the one documented stub."""
    from app_insights_generator_spark.operators.multimodal import (
        extract_real_media_features,
        synthesize_jpeg_media,
    )

    ids = _docs(spark, sf_dir).filter(F.col("doc_id") < 100).select(
        F.col("doc_id").alias("media_id")
    )
    return extract_real_media_features(synthesize_jpeg_media(ids, "media_id"))


@register(
    "multimodal_mp4_codec_features",
    """
    WITH ids AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 100),
    dims AS (
      SELECT media_id,
             2 + media_id % 4 AS n,
             4 * (2 + media_id % 4) AS w,
             4 * (1 + media_id % 3) AS h
      FROM ids
    ),
    px AS (
      SELECT d.media_id, d.n, d.w, d.h,
             (5 * y.y + 3 * x.x + 17 * f.f + d.media_id) % 256 AS r
      FROM dims d,
           LATERAL (SELECT unnest(range(0, d.n)) AS f) f,
           LATERAL (SELECT unnest(range(0, d.h)) AS y) y,
           LATERAL (SELECT unnest(range(0, d.w)) AS x) x
    )
    SELECT media_id,
           'video_mp4' AS media_type,
           CAST(ANY_VALUE(w) AS INT) AS width,
           CAST(ANY_VALUE(h) AS INT) AS height,
           CAST(ANY_VALUE(n) * 100 AS BIGINT) AS duration_ms,
           CAST(SUM(r) AS BIGINT) AS payload_sum
    FROM px GROUP BY media_id
    """,
)
def multimodal_mp4_codec_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP4 (ISO BMFF) decode, end to end: per-id videos of
    uncompressed-RGB24 'raw ' samples are written with full container
    structure — ftyp, mdat, and a moov whose stts/stsc/stsz/stco sample
    tables address every frame — then parsed back by the pure-numpy box
    walker (operators/codecs.py decode_mp4: box tree, sample-table
    reconstruction, per-sample bounds checks) inside Arrow-batched
    mapInPandas. The oracle predicts width, height, duration, and the
    R-channel sum across ALL frames in closed form from the id
    (px[f,y,x] = (5y+3x+17f+id)%256), so one wrong chunk offset, sample
    size, or box length hash-mismatches the gate. This retires the
    'video container is environment-blocked' caveat: only MOTION-
    COMPRESSED payloads (H.264 inside the container) remain stubbed.
    Reference parity: the reference has no media pipeline at all — this
    is part of the §2.4 training-data extension surface."""
    from app_insights_generator_spark.operators.multimodal import (
        extract_real_media_features,
        synthesize_mp4_media,
    )

    ids = _docs(spark, sf_dir).filter(F.col("doc_id") < 100).select(
        F.col("doc_id").alias("media_id")
    )
    return extract_real_media_features(synthesize_mp4_media(ids, "media_id"))


@register(
    "multimodal_mp4_frame_sample",
    """
    WITH ids AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 100),
    dims AS (
      SELECT media_id,
             2 + media_id % 4 AS n,
             4 * (2 + media_id % 4) AS w,
             4 * (1 + media_id % 3) AS h
      FROM ids
    ),
    fr AS (
      SELECT d.media_id, d.w, d.h, f.f
      FROM dims d, LATERAL (SELECT unnest(range(0, d.n, 2)) AS f) f
    ),
    px AS (
      SELECT fr.media_id, fr.f,
             (5 * y.y + 3 * x.x + 17 * fr.f + fr.media_id) % 256 AS r
      FROM fr,
           LATERAL (SELECT unnest(range(0, fr.h)) AS y) y,
           LATERAL (SELECT unnest(range(0, fr.w)) AS x) x
    )
    SELECT media_id,
           CAST(f AS INT) AS frame_idx,
           CAST(f * 100 AS BIGINT) AS frame_ts_ms,
           CAST(SUM(r) AS BIGINT) AS frame_sum
    FROM px GROUP BY media_id, f
    """,
)
def multimodal_mp4_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame sampling out of a REAL container: every 2nd frame is
    extracted by walking the MP4 sample tables and slicing the actual
    sample bytes out of mdat (operators/multimodal.py sample_frames_real
    -> codecs.decode_mp4), one-to-many mapInPandas. frame_ts_ms comes
    from the mdhd duration (n*100ms at 10fps, delta-1 samples) and
    frame_sum is the decoded R-channel sum of that specific frame — both
    closed-form in (id, frame_idx), so a frame addressed at the wrong
    mdat offset fails the hash. The stubbed sample_frames (digest
    payloads, _fake_decode durations) remains for the compressed-video
    case this environment cannot decode."""
    from app_insights_generator_spark.operators.multimodal import (
        sample_frames_real,
        synthesize_mp4_media,
    )

    ids = _docs(spark, sf_dir).filter(F.col("doc_id") < 100).select(
        F.col("doc_id").alias("media_id")
    )
    return sample_frames_real(synthesize_mp4_media(ids, "media_id"), every_k=2)


@register(
    "duplicate_spans_documents",
    """
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    wins AS (
      SELECT doc_id, i.i AS pos,
             md5(array_to_string(list_slice(t, i.i + 1, i.i + 8), ' ')) AS h
      FROM base, LATERAL (SELECT unnest(range(0, n_tokens - 7)) AS i) i
      WHERE n_tokens >= 8
    ),
    duph AS (SELECT h FROM wins GROUP BY h HAVING count(*) >= 2),
    dups AS (SELECT w.doc_id, w.pos FROM wins w JOIN duph USING (h)),
    cov0 AS (
      SELECT doc_id, pos,
             COALESCE(MAX(pos + 8) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_end
      FROM dups
    ),
    cov AS (
      SELECT doc_id, COUNT(*) AS dup_windows,
             SUM(GREATEST(0, pos + 8 - GREATEST(prev_end, pos))) AS dup_tokens
      FROM cov0 GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(GREATEST(0, n_tokens - 7) AS BIGINT) AS n_windows,
           CAST(COALESCE(dup_windows, 0) AS BIGINT) AS dup_windows,
           CAST(COALESCE(dup_tokens, 0) AS BIGINT) AS dup_tokens,
           CAST(CASE WHEN n_tokens = 0 THEN 0
                ELSE COALESCE(dup_tokens, 0) * 10000 // n_tokens END
                AS BIGINT) AS dup_frac_bp
    FROM base b LEFT JOIN cov USING (doc_id)
    """,
)
def duplicate_spans_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUBSTRING-level dedup statistics (Lee et al. 2021, the
    suffix-array training-data dedup re-expressed distributed): 8-token
    rolling windows hashed with md5, duplicated = hash count >= 2
    corpus-wide, per-doc coverage = merged-interval union of duplicated
    windows (single window-function pass, no per-position explosion).
    Complements the document-level dedup family (exact / MinHash /
    SimHash / n-gram Jaccard / embedding): this one finds REPEATED
    PASSAGES inside otherwise-unique documents — the thing trainers
    actually cut. All outputs integers (counts + basis points), so the
    gate is float-drift-proof."""
    from app_insights_generator_spark.operators.dedup import duplicate_span_stats

    return duplicate_span_stats(
        _docs(spark, sf_dir), "doc_id", "text", k=8, hash_fn="md5"
    )


@register(
    "dedup_embedding_cosine_embeddings",
    """
    WITH RECURSIVE v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
      FROM embeddings
    ),
    edges AS (
      SELECT a.vec_id AS src, b.vec_id AS dst
      FROM v a JOIN v b ON a.vec_id <> b.vec_id
      WHERE a.n * b.n > 0
        AND list_dot_product(a.e, b.e) / (a.n * b.n) >= 0.3
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT v.vec_id,
           LEAST(v.vec_id, COALESCE(MIN(r.dst), v.vec_id)) AS canonical_id,
           LEAST(v.vec_id, COALESCE(MIN(r.dst), v.vec_id)) <> v.vec_id AS is_dup
    FROM v LEFT JOIN reach r ON r.src = v.vec_id
    GROUP BY v.vec_id
    """,
)
def dedup_embedding_cosine_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine NEAR-DUP as a dedup verdict (the last named mode
    of the brief's dedup family): pairs >= 0.3 cosine -> connected
    components (iterative hash-min, operators/dedup.py) -> canonical =
    min vec_id per cluster -> per-row keep/drop flag. The gated pair
    source is cosine_pairs_exact — already hash-anchored to DuckDB via
    oracle_exact_cosine_pairs, so threshold-boundary float drift is a
    solved problem — while the 100 TB pair source is the banded
    similarity_join_lsh (same verify step, bench-timed); the composition
    downstream of the pair set is identical. Oracle: recursive
    transitive closure + min-reachable label, DuckDB-side only (the
    Spark side keeps the driver-loop hash-min that one-shuffles per
    round)."""
    from app_insights_generator_spark.operators.dedup import connected_components

    embs = _embs(spark, sf_dir)
    pairs = S.cosine_pairs_exact(
        embs, "embedding", "vec_id", threshold=0.3, round_bias=1e-9
    ).select("id_a", "id_b")
    comp = connected_components(pairs, embs, "vec_id")
    return comp.select(
        "vec_id",
        F.col("component").alias("canonical_id"),
        (F.col("vec_id") != F.col("component")).alias("is_dup"),
    )


# --- BM25 relevance scoring (integer fixed-point, rational IDF) --------------

_BM25_TERMS = ("spark", "table", "value")


def _bm25_oracle(terms=_BM25_TERMS, scale=1_000_000) -> str:
    """DuckDB twin of the integer BM25 below — identical rational
    arithmetic, floor division at the same points (avgdl10, then the
    per-term contribution)."""
    tf_cols = ",\n             ".join(
        f"len(list_filter(string_split(text, ' '), t -> t = '{t}')) AS tf_{t}"
        for t in terms
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in terms
    )
    contrib = " + ".join(
        f"((2*s.n_docs - 2*s.df_{t} + 1) * (22 * d.tf_{t} * s.avgdl10) * {scale})"
        f" // ((2*s.df_{t} + 1)"
        f" * (10 * s.avgdl10 * d.tf_{t} + 3 * s.avgdl10 + 90 * d.dl))"
        for t in terms
    )
    return f"""
    WITH d AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl,
             {tf_cols}
      FROM documents
    ),
    s AS (SELECT COUNT(*) AS n_docs,
                 (10 * SUM(dl)) // COUNT(*) AS avgdl10, {df_cols} FROM d)
    SELECT d.doc_id, CAST({contrib} AS BIGINT) AS bm25_ppm
    FROM d, s
    """


@register("bm25_documents", _bm25_oracle())
def bm25_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance scores for a fixed 3-term query, in INTEGER
    fixed-point (parts-per-million) with a RATIONAL IDF — the log is
    dropped in favor of its argument (N - df + .5)/(df + .5), scaled to
    integers ((2N-2df+1)/(2df+1)), and the k1=1.2/b=0.75 term-frequency
    saturation is cleared of denominators via an integer deci-token
    average document length A = (10*T) DIV N (T = corpus tokens):

      tf_part = 22*tf*A / (10*A*tf + 3*A + 90*dl)

    so the whole score is one integer floor-division per term — exact,
    partition-order-independent, bit-identical in ANSI SQL. (A replaces
    the corpus total T inside the products — the earlier T-based form
    carried an extra factor of N and overflowed int64 around 1e4–1e5
    docs; r05 ADVICE.) Search scoring as a curation signal (rank
    documents against a benchmark query before sampling). Scale shape:
    one scan computes per-doc tf/dl; ONE 1-row stats aggregate (N, A,
    df per term) is broadcast back — no shuffle of the corpus at all.
    Magnitudes: the dominant product (2N)*(22*tf*A)*scale stays < 2^63
    for N up to ~4e6 docs at tf~5, avgdl~1e3, scale=1e6; past that,
    drop scale to 1e4 (~4e8 docs) or move the same algebra to
    DECIMAL(38)."""
    terms, scale = _BM25_TERMS, 1_000_000
    docs = _docs(spark, sf_dir)
    d = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("dl"),
        *[
            F.size(F.expr(f"filter(split(text, ' '), t -> t = '{t}')"))
            .cast("long")
            .alias(f"tf_{t}")
            for t in terms
        ],
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("(10 * sum(dl)) DIV count(1)").alias("avgdl10"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in terms
        ],
    )
    contrib = " + ".join(
        f"((2*n_docs - 2*df_{t} + 1) * (22 * tf_{t} * avgdl10) * {scale})"
        f" DIV ((2*df_{t} + 1)"
        f" * (10 * avgdl10 * tf_{t} + 3 * avgdl10 + 90 * dl))"
        for t in terms
    )
    return d.crossJoin(F.broadcast(stats)).select(
        "doc_id", F.expr(contrib).cast("long").alias("bm25_ppm")
    )


@register(
    "bpe_tokenize_documents",
    """
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
                AS BIGINT) AS n_words,
           CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def bpe_tokenize_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BPE tokenizer, trained then applied (operators/bpe.py): one
    distributed word-frequency pass, driver-side merge learning over the
    vocabulary-bounded word table (the HF/SentencePiece split, cap-
    checked), distributed tokenization via Arrow-batched mapInPandas.

    Gate design: the learned merge table is not SQL-expressible, so the
    hash gate covers the SQL-predictable per-doc columns (n_words,
    n_chars) while the BPE-dependent quantity is pinned by HARD IN-QUERY
    INVARIANTS that raise on violation: with 10 learned merges,
    n_words <= total n_tokens < n_chars + n_words (every word ends at
    >= 1 token; merges strictly reduce the symbol count somewhere, since
    the best pair has count >= 1), AND the distributed token total must
    EXACTLY equal a driver-side recomputation from the word-frequency
    table — two independent tokenizer implementations cross-checking
    each other on every gate run. pytest additionally checks exact merge
    tables and token counts on hand-built corpora."""
    from app_insights_generator_spark.operators.bpe import (
        tokenize_bpe,
        train_bpe,
        word_frequencies,
    )

    from app_insights_generator_spark.operators.bpe import _apply_merges

    docs = _docs(spark, sf_dir)
    wf = word_frequencies(docs, "text")
    merges = train_bpe(wf, n_merges=10)
    tok = tokenize_bpe(docs, merges, "doc_id", "text")
    totals = tok.agg(
        F.sum("n_words").alias("w"),
        F.sum("n_tokens").alias("t"),
        F.sum("n_chars").alias("c"),
    ).collect()[0]
    if not (totals["w"] <= totals["t"] < totals["c"] + totals["w"]):
        raise AssertionError(
            f"BPE invariant violated: words={totals['w']} tokens={totals['t']} "
            f"chars+words={totals['c'] + totals['w']} (merges={len(merges)})"
        )
    # Cross-implementation check: recompute the corpus token total on the
    # DRIVER from the (bounded) word-frequency table with the pure-python
    # tokenizer — two independent code paths (driver dict loop vs
    # distributed mapInPandas) must agree EXACTLY or the query raises.
    pairs = [(a, b) for a, b, _ in merges]
    expected = sum(
        int(r["freq"]) * len(_apply_merges(r["word"], pairs))
        for r in wf.collect()
    )
    if totals["t"] != expected:
        raise AssertionError(
            f"BPE tokenization disagrees: distributed={totals['t']} "
            f"driver-recompute={expected}"
        )
    return tok.select("doc_id", "n_words", "n_chars")


# --- Gopher/MassiveText repetition filters (integer basis points) ------------


def _rep_gram_cte(n: int) -> str:
    """One n-gram repetition-profile CTE chain (g{n}/c{n}/m{n})."""
    if n == 2:
        rng, sl = "range(1, len(w))", "w[i:i+1]"
    else:
        rng, sl = f"range(1, len(w) - {n - 2})", f"w[i:i+{n - 1}]"
    return f"""
    g{n} AS (
      SELECT doc_id,
             unnest(list_transform({rng}, i -> array_to_string({sl}, ' '))) AS g
      FROM t WHERE len(w) >= {n}
    ),
    c{n} AS (SELECT doc_id, g, COUNT(*) AS c FROM g{n} GROUP BY 1, 2),
    m{n} AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n{n},
             CAST(10000 * MAX(c) // CAST(SUM(c) AS BIGINT) AS BIGINT)
               AS top{n}_bp,
             CAST(10000 * SUM(CASE WHEN c > 1 THEN c ELSE 0 END)
                  // CAST(SUM(c) AS BIGINT) AS BIGINT) AS dup{n}_bp
      FROM c{n} GROUP BY 1
    )"""


@register(
    "gopher_repetition_documents",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS w FROM documents),
    {_rep_gram_cte(2)},
    {_rep_gram_cte(3)}
    SELECT doc_id,
           COALESCE(n2, -1) AS n2,
           COALESCE(top2_bp, -1) AS top2_bp,
           COALESCE(dup2_bp, -1) AS dup2_bp,
           COALESCE(n3, -1) AS n3,
           COALESCE(top3_bp, -1) AS top3_bp,
           COALESCE(dup3_bp, -1) AS dup3_bp
    FROM m2 FULL OUTER JOIN m3 USING (doc_id)
    """,
)
def gopher_repetition_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText repetition-quality filters (Rae et al. 2021,
    Table A1): per-document top-n-gram share and duplicate-n-gram share
    for n=2,3, in integer basis points (10000 * count DIV total — both
    engines floor identically, no float thresholds). The standard
    pre-training curation rule "drop documents whose top 2-gram exceeds
    X% or whose duplicated 3-grams exceed Y%" becomes a pure filter on
    this profile.

    Scale: per n, one explode + one (doc, gram) partial-agg groupBy +
    one doc groupBy — shuffles carry distinct per-doc grams (map-side
    combine), never raw text. The n=2 and n=3 profiles join on doc_id
    (same key, AQE-coalesced). Metrics for documents too short for an
    n-gram are encoded -1 on BOTH engines (never NULL: nullable-int
    finals depend on the driver's fetch path — see schema_drift).

    Reference parity: no counterpart (main.py has no text-quality
    surface); §2.5 LLM-curation extension alongside lm_quality_bigram."""
    docs = _docs(spark, sf_dir)
    m2 = T.repetition_gram_stats(docs, "doc_id", "text", 2)
    m3 = T.repetition_gram_stats(docs, "doc_id", "text", 3)
    metric_cols = ["n2", "top2_bp", "dup2_bp", "n3", "top3_bp", "dup3_bp"]
    return m2.join(m3, "doc_id", "full_outer").na.fill(-1, metric_cols)


# --- Inverted index (posting lists, the search-engine build primitive) -------


@register(
    "inverted_index_documents",
    """
    WITH w AS (
      SELECT doc_id, unnest(list_distinct(
               list_filter(string_split_regex(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+'),
                 x -> x != ''))) AS term
      FROM documents
    ),
    p AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
             list_sort(list(doc_id)) AS all_postings
      FROM w GROUP BY term
    )
    SELECT term, df,
           array_to_string(all_postings[1:20], ',') AS postings
    FROM p WHERE df >= 10
    """,
)
def inverted_index_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: term -> document frequency + the first 20
    doc ids of the SORTED posting list (deterministic truncation — a
    collect_list without the sort would be partition-order-dependent
    and can never pass a hash gate). Terms below df 10 are dropped,
    the long-tail cut every search index applies.

    The truncated posting list is rendered as a comma-joined STRING,
    not an array column: the driver's pandas canonicalizer lexsorts
    every final column and list cells are unhashable there (the r06
    red, CORRECTNESS_r06 `TypeError: unhashable type: 'list'`). A
    production index keeps the array form — the rendering is strictly
    gate-side display; the pre-truncation aggregate is unchanged.

    Scale: explode distinct per-doc terms (one shuffle keyed term);
    sort_array makes the aggregation order-insensitive, so partial
    aggregation stays enabled. Posting lists for 100 TB corpora shard
    by term naturally; the df floor keeps hapax terms (the overwhelming
    majority) out of the reduce side entirely... but note the truncation
    here is display-side — a production index would keep full lists as
    parquet array columns, which is exactly what the pre-truncation
    aggregate emits.

    Reference parity: no counterpart; §2.5 extension (BM25's index-side
    twin — bm25_documents scores with corpus stats, this materializes
    the term->doc map itself)."""
    docs = _docs(spark, sf_dir)
    terms = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(T.normalized_text(F.col("text")), r"\s+"),
                    lambda t: t != F.lit(""),
                )
            )
        ).alias("term"),
    )
    return (
        terms.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.array_join(
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, 20).cast(
                    "array<string>"
                ),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("df") >= 10)
    )


# --- Exact per-source length percentiles (PERCENTILE_DISC semantics) ---------


@register(
    "length_percentiles_by_source",
    """
    WITH t AS (
      SELECT doc_id, source,
             len(list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> x != '')) AS n_tokens
      FROM documents
    ),
    r AS (
      SELECT source, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_tokens, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM t
    )
    SELECT source,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(MAX(CASE WHEN rn = (n + 9) // 10 THEN n_tokens END)
                AS BIGINT) AS p10_tokens,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN n_tokens END)
                AS BIGINT) AS p50_tokens,
           CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN n_tokens END)
                AS BIGINT) AS p90_tokens
    FROM r GROUP BY source
    """,
)
def length_percentiles_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source token-length percentiles (p10/p50/p90) with
    PERCENTILE_DISC semantics — the statistic length-based curation
    cutoffs are derived from. Discrete percentiles return an ACTUAL
    corpus value (ceil(q*n)-th in sorted order, ties broken by doc_id),
    so the result is integer and engine-exact — approx_percentile
    sketches or interpolating PERCENTILE_CONT could never pass a hash
    gate, and the window formulation is the exact-disc form both
    engines share.

    Scale: windows partition by source, so each source sorts
    independently (no global ORDER BY). For 100 TB per-source sorts,
    the same rank-select runs on a pre-aggregated (source, n_tokens,
    count) table — thousands of distinct lengths instead of billions
    of rows; the report shape is identical.

    Reference parity: no counterpart; §2.5 curation extension
    (completes the quality-score family: repetition, lm-quality,
    length profile)."""
    docs = _docs(spark, sf_dir)
    t = docs.select(
        "doc_id",
        "source",
        F.size(
            F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != F.lit(""))
        )
        .cast("long")
        .alias("n_tokens"),
    )
    w = Window.partitionBy("source").orderBy("n_tokens", "doc_id")
    r = t.select(
        "source",
        "n_tokens",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n"),
    )
    pick = lambda idx: F.max(  # noqa: E731
        F.when(F.col("rn") == F.expr(idx), F.col("n_tokens"))
    ).cast("long")
    return r.groupBy("source").agg(
        F.max("n").cast("long").alias("n_docs"),
        pick("(n + 9) DIV 10").alias("p10_tokens"),
        pick("(n + 1) DIV 2").alias("p50_tokens"),
        pick("(9 * n + 9) DIV 10").alias("p90_tokens"),
    )


# --- Distributed fixed-point k-means over embeddings -------------------------

_KM_SCALE, _KM_OFF, _KM_K = 1_000_000, 1_000_000, 4


def _km_iter_cte(i: int, p: str = "", src: str = "e") -> str:
    """One unrolled Lloyd iteration: distances vs {p}c{i-1} -> argmin
    assignment {p}a{i} -> floor-mean centroid table {p}c{i}. The prefix/
    source parameters let the PQ oracles reuse THIS recurrence verbatim
    per subspace instead of carrying a divergent copy (r06 review)."""
    return f"""
    {p}d{i} AS (
      SELECT e.vid, c.cid, SUM((e.v - c.v) * (e.v - c.v)) AS dist
      FROM {src} e JOIN {p}c{i - 1} c USING (d) GROUP BY 1, 2
    ),
    {p}a{i} AS (
      SELECT vid, cid, dist FROM (
        SELECT vid, cid, dist,
               ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist, cid) AS rn
        FROM {p}d{i}) WHERE rn = 1
    ),
    {p}c{i} AS (
      SELECT a.cid, e.d, CAST(SUM(e.v) AS BIGINT) // COUNT(*) AS v
      FROM {src} e JOIN {p}a{i} a USING (vid) GROUP BY 1, 2
    )"""


def _km_final_assign_cte(p: str, src: str, cent: str) -> str:
    """FINAL re-assignment vs the post-update centroid table -> {p}af —
    the half-step that makes emitted codes consistent with the codebook
    they index (kmeans' in-loop assignment is vs the PREVIOUS centroids
    by construction; Spark twin: similarity.assign_to_centroids)."""
    return f"""{p}af AS (
      SELECT vid, cid, dist FROM (
        SELECT vid, cid, dist,
               ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist, cid) AS rn
        FROM (SELECT e.vid, c.cid, SUM((e.v - c.v) * (e.v - c.v)) AS dist
              FROM {src} e JOIN {cent} c USING (d) GROUP BY 1, 2))
      WHERE rn = 1)"""


def _kpp_u48(r: int) -> str:
    """Deterministic Bernoulli draw for k-means|| round r: 48-bit sha256
    prefix of 'vid#r' as a double (DuckDB side; the Spark twin is
    conv(substring(sha2(...)))."""
    return (
        "CAST("
        + sql_hex_to_int(
            f"substring(sha256(CONCAT(CAST(vid AS VARCHAR), '#', '{r}')), 1, 12)",
            12,
        )
        + " AS DOUBLE)"
    )


def _kpp_round(r: int, l: int) -> str:
    """One unrolled k-means|| oversampling round: min squared distance to
    the current candidate set kc{r-1} -> total cost -> cross-multiplied
    double acceptance test -> candidate union kc{r}."""
    return f"""
    kd{r} AS (
      SELECT vid, MIN(dist) AS d2 FROM (
        SELECT e.vid, c.cid, SUM((e.v - c.v) * (e.v - c.v)) AS dist
        FROM e JOIN kc{r - 1} c USING (d) GROUP BY 1, 2)
      GROUP BY vid
    ),
    kphi{r} AS (SELECT CAST(SUM(d2) AS BIGINT) AS phi FROM kd{r}),
    ks{r} AS (
      SELECT vid FROM kd{r}, kphi{r}
      WHERE {_kpp_u48(r)} * CAST(phi AS DOUBLE)
            < {l}.0 * CAST(d2 AS DOUBLE) * 281474976710656.0
    ),
    kc{r} AS (
      SELECT * FROM kc{r - 1}
      UNION ALL
      SELECT e.vid AS cid, e.d, e.v FROM e JOIN ks{r} USING (vid)
    )"""


@register(
    "kmeans_parallel_init_embeddings",
    f"""
    WITH e AS (
      SELECT vid, d, CAST(floor(x * {_KM_SCALE}) AS BIGINT) + {_KM_OFF} AS v
      FROM (SELECT vec_id AS vid, generate_subscripts(embedding, 1) AS d,
                   unnest(embedding::DOUBLE[]) AS x
            FROM embeddings)
    ),
    kc0 AS (
      SELECT vid AS cid, d, v FROM e WHERE vid = (SELECT MIN(vid) FROM e)
    ),
    {_kpp_round(1, 8)},
    {_kpp_round(2, 8)},
    af AS (
      SELECT vid, cid, dist FROM (
        SELECT vid, cid, dist,
               ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist, cid) AS rn
        FROM (SELECT e.vid, c.cid, SUM((e.v - c.v) * (e.v - c.v)) AS dist
              FROM e JOIN kc2 c USING (d) GROUP BY 1, 2))
      WHERE rn = 1
    ),
    seeds AS (
      SELECT cid, weight,
             CAST(ROW_NUMBER() OVER (ORDER BY weight DESC, cid) AS BIGINT)
               AS seed_rank
      FROM (SELECT cid, CAST(COUNT(*) AS BIGINT) AS weight
            FROM af GROUP BY cid)
      QUALIFY seed_rank <= {_KM_K}
    ),
    fa AS (
      SELECT vid, dist FROM (
        SELECT vid, cid, dist,
               ROW_NUMBER() OVER (PARTITION BY vid ORDER BY dist, cid) AS rn
        FROM (SELECT e.vid, c.cid, SUM((e.v - c.v) * (e.v - c.v)) AS dist
              FROM e JOIN (SELECT c.* FROM kc2 c JOIN seeds USING (cid)) c
                       USING (d)
              GROUP BY 1, 2))
      WHERE rn = 1
    ),
    fphi AS (SELECT CAST(SUM(dist) AS BIGINT) AS phi_sel FROM fa)
    SELECT seeds.seed_rank, seeds.cid AS vid, seeds.weight,
           kphi1.phi AS phi0, fphi.phi_sel
    FROM seeds, kphi1, fphi
    """,
)
def kmeans_parallel_init_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """k-means|| scalable seeding (operators/similarity.py
    kmeans_parallel_init): 2 oversampling rounds at l = 8 over the
    embedding corpus, candidates weighted by attraction, top-4 seeds by
    (weight, vid). Every Bernoulli draw is the sha256 prefix of
    'vid#round' and the acceptance test is the cross-multiplied double
    comparison, so the oracle unrolls the whole stochastic-looking
    algorithm into exact chained CTEs — the same discipline as kmeans /
    pagerank. Gate witness: each seed's rank, id and weight PLUS the
    corpus cost before (phi0, single start center) and after (phi_sel,
    the k seeds) — the seeding-quality claim itself is hash-pinned.

    Completes the clustering family: kmeans_fixed_point is the
    distributed Lloyd refinement, this is the distributed INIT that
    replaces k-means++'s k sequential passes with O(rounds) passes
    (public Spark MLlib ships the same algorithm as initMode
    'k-means||'; re-expressed here as pure relational algebra).

    Registered for the round-7 gate window (mid-round addition)."""
    from app_insights_generator_spark.operators.similarity import (
        kmeans_parallel_init,
    )

    return kmeans_parallel_init(
        _embs(spark, sf_dir),
        "vec_id",
        "embedding",
        k=_KM_K,
        oversample=8,
        rounds=2,
        scale=_KM_SCALE,
        offset=_KM_OFF,
    )


@register(
    "kmeans_clusters_embeddings",
    f"""
    WITH e AS (
      SELECT vid, d, CAST(floor(x * {_KM_SCALE}) AS BIGINT) + {_KM_OFF} AS v
      FROM (SELECT vec_id AS vid, generate_subscripts(embedding, 1) AS d,
                   unnest(embedding::DOUBLE[]) AS x
            FROM embeddings)
    ),
    init AS (
      SELECT vid, ROW_NUMBER() OVER (ORDER BY vid) - 1 AS cid
      FROM (SELECT DISTINCT vid FROM e ORDER BY vid LIMIT {_KM_K})
    ),
    c0 AS (SELECT i.cid, e.d, e.v FROM e JOIN init i USING (vid)),
    {_km_iter_cte(1)},
    {_km_iter_cte(2)}
    SELECT m.cid, m.n_members, m.inertia, c.centroid_sum, c.centroid_sumsq
    FROM (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members,
                 CAST(SUM(dist) AS BIGINT) AS inertia
          FROM a2 GROUP BY cid) m
    JOIN (SELECT cid, CAST(SUM(v) AS BIGINT) AS centroid_sum,
                 CAST(SUM(v * v) AS BIGINT) AS centroid_sumsq
          FROM c2 GROUP BY cid) c USING (cid)
    """,
)
def kmeans_clusters_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (k=4, 2 iterations) over the embedding
    corpus in integer fixed-point (operators/similarity.py
    kmeans_fixed_point) — embedding clustering is the curation workhorse
    behind semantic dedup buckets, topic balancing, and IVF coarse
    quantizers, and this is its ENGINE-EXACT form: quantized
    micro-units, argmin by (distance, cid), floor-divided centroid
    means, no RNG and no driver state anywhere (centroids stay a
    broadcast-joined DataFrame). The oracle unrolls both iterations into
    chained CTEs — the same discipline that made pagerank/BFS/SSSP
    hash-checkable. Gate witness per cluster: member count, integer
    inertia, centroid checksum (sum + sum-of-squares of quantized
    coordinates).

    Scale: per iteration one broadcast join (centroid table is k*dim
    rows) + two keyed aggregations; the sampled-fit + GEMM-assignment
    path (ann_topk_ivf) is the throughput variant — this one is for
    when the fit itself must be distributed and reproducible."""
    from app_insights_generator_spark.operators.similarity import (
        kmeans_fixed_point,
    )

    assign, cent = kmeans_fixed_point(
        _embs(spark, sf_dir), "vec_id", "embedding",
        k=_KM_K, n_iter=2, scale=_KM_SCALE, offset=_KM_OFF,
    )
    m = assign.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("dist").cast("long").alias("inertia"),
    )
    c = cent.groupBy("cid").agg(
        F.sum("v").cast("long").alias("centroid_sum"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("centroid_sumsq"),
    )
    return m.join(c, "cid")


# --- ANN recall measurement (IVF vs exact, invariant-asserted) ---------------

_RECALL_K, _RECALL_NQ, _RECALL_FLOOR_BP = 10, 20, 3000


@register(
    "ann_recall_ivf_embeddings",
    f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding::DOUBLE[] AS qv,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS qn
      FROM embeddings WHERE vec_id < {_RECALL_NQ}
    ),
    c AS (
      SELECT vec_id AS id, embedding::DOUBLE[] AS cv,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS cn
      FROM embeddings WHERE vec_id >= {_RECALL_NQ}
    ),
    s AS (
      SELECT q.qid, c.id,
             ROUND(CASE WHEN c.cn * q.qn > 0
                        THEN list_dot_product(c.cv, q.qv) / (c.cn * q.qn)
                        ELSE 0.0 END + 1e-9, 6) AS sim
      FROM c CROSS JOIN q
    ),
    r AS (
      SELECT qid, id, sim,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY sim DESC, id) AS rn
      FROM s
    )
    SELECT qid,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(SUM(id) AS BIGINT) AS exact_idsum,
           MIN(sim) AS min_sim,
           MAX(sim) AS max_sim
    FROM r WHERE rn <= {_RECALL_K}
    GROUP BY qid
    """,
)
def ann_recall_ivf_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality measurement: recall@10 of the IVF index against the
    exact cosine top-10, over 20 query vectors at once — the number
    that decides whether an approximate index is usable for semantic
    dedup / decontamination at scale.

    Gate design (the BPE pattern): the EXACT side is fully
    SQL-expressible and hash-gated (per-query top-10 id-sums and the
    min/max similarity of the retrieved set); the IVF side depends on a
    numpy coarse-quantizer fit no SQL engine can replicate, so its
    recall is enforced by a HARD IN-QUERY INVARIANT — the query RAISES
    unless mean recall@10 across all 20 queries clears the 3000 bp
    floor (measured 4900 bp at sf0.01 with n_probe=3 of 16 lists, i.e.
    ~19% of the corpus scanned per query) — and the exact/IVF overlap is recomputed on every gate
    run.

    Scale shape: exact side is one broadcast(queries) cross join +
    per-query window top-k (queries are few; the corpus never
    shuffles); IVF side assigns the corpus to lists ONCE (one UDF map
    pass), derives each query's probe lists from the same centroids,
    and re-ranks only inside probed lists — the production recall-audit
    loop (fit once, measure recall on a query panel, tune
    n_lists/n_probe). Driver state: the bounded 2048-row sample +
    20x3 probe-list table, both deterministic (sample sorted by id).
    """
    import numpy as np

    embs = _embs(spark, sf_dir)
    queries = embs.filter(F.col("vec_id") < _RECALL_NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    corpus = embs.filter(F.col("vec_id") >= _RECALL_NQ).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("cv")
    )

    sim = F.round(S.cosine(F.col("cv"), F.col("qv")) + 1e-9, 6).alias("sim")
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("id"))
    exact = (
        corpus.crossJoin(F.broadcast(queries))
        .select("qid", "id", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _RECALL_K)
        .select("qid", "id", "sim")
    )

    # IVF side: deterministic sampled fit (sorted ids), one assignment
    # pass over the corpus, per-query probe lists from the same centroids.
    sample_rows = (
        corpus.orderBy("id").limit(2048).select("cv").collect()
    )
    vectors = np.array([r[0] for r in sample_rows], dtype=np.float64)
    n_lists, n_probe = 16, 3
    centroids = S._kmeans_centroids(vectors, n_lists, seed=42)
    assign = S.ivf_assign_udf(centroids)
    assigned = corpus.withColumn("_list", assign(F.col("cv")))

    qrows = queries.orderBy("qid").collect()
    probe_pairs = []
    for r in qrows:
        qv = np.asarray(r["qv"], dtype=np.float64)
        lists = np.argsort(((centroids - qv) ** 2).sum(axis=1))[:n_probe]
        probe_pairs += [(int(r["qid"]), int(l)) for l in lists]
    probes = spark.createDataFrame(probe_pairs, "qid int, _list int")

    ivf = (
        assigned.join(F.broadcast(probes), "_list")
        .join(F.broadcast(queries), "qid")
        .select("qid", "id", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _RECALL_K)
        .select("qid", "id")
    )

    hits = exact.join(ivf, ["qid", "id"]).count()
    recall_bp = 10000 * hits // (_RECALL_K * _RECALL_NQ)
    if recall_bp < _RECALL_FLOOR_BP:
        raise AssertionError(
            f"IVF recall@{_RECALL_K} = {recall_bp}bp across {_RECALL_NQ} "
            f"queries, below the {_RECALL_FLOOR_BP}bp floor — quantizer "
            "or probe-list regression"
        )

    return exact.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.sum("id").cast("long").alias("exact_idsum"),
        F.min("sim").alias("min_sim"),
        F.max("sim").alias("max_sim"),
    )


@register(
    "ann_incremental_probe_embeddings",
    f"""
    WITH cut AS (SELECT MAX(vec_id) * 4 // 5 AS c FROM embeddings),
    q AS (
      SELECT vec_id AS qid, embedding::DOUBLE[] AS qv,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS qn
      FROM embeddings WHERE vec_id < {_RECALL_NQ}
    ),
    c AS (
      SELECT vec_id AS id, embedding::DOUBLE[] AS cv,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS cn
      FROM embeddings WHERE vec_id >= {_RECALL_NQ}
    ),
    s AS (
      SELECT q.qid, c.id,
             ROUND(CASE WHEN c.cn * q.qn > 0
                        THEN list_dot_product(c.cv, q.qv) / (c.cn * q.qn)
                        ELSE 0.0 END + 1e-9, 6) AS sim
      FROM c CROSS JOIN q
    ),
    r AS (
      SELECT qid, id, sim,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY sim DESC, id) AS rn
      FROM s
    )
    SELECT qid,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(SUM(id) AS BIGINT) AS exact_idsum,
           CAST(SUM(CASE WHEN id >= cut.c THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new_in_topk,
           MIN(sim) AS min_sim,
           MAX(sim) AS max_sim
    FROM r, cut WHERE rn <= {_RECALL_K}
    GROUP BY qid
    """,
)
def ann_incremental_probe_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Persist-and-refresh serving loop for the IVF index (VERDICT r09
    item 4 — the operational half of similarity search): the first 4/5
    of the corpus (data-relative cut, max_id*4 DIV 5 — the
    incremental-dedup discipline, non-vacuous at every SF) plays the
    EXISTING corpus whose index was fitted and WRITTEN TO DISK
    yesterday; the top 1/5 arrives as today's ingest batch and is
    assigned to the FROZEN persisted centroids (no refit, O(batch),
    operators/similarity.py refresh_ivf_index) and appended into the
    list_id-partitioned lists table; the query panel then searches the
    REFRESHED index read back from parquet (ann_probe_persisted —
    probe-list partition pruning, never a corpus scan).

    Gate design (the ann_recall pattern): the EXACT side — per-query
    brute-force top-10 over the FULL corpus including the new batch —
    is SQL-gated (id-sums, retrieved-set sim range, and
    ``n_new_in_topk``: how many truth neighbors come from the batch,
    which pins that the fixture genuinely puts new docs into the truth
    sets this audit must find). The persisted/refreshed side is
    enforced by TWO in-query invariants recomputed every gate run:
    (1) overall mean recall@10 >= {_RECALL_FLOOR_BP} bp (same floor as
    the refit path — frozen centroids must not cost recall at this
    scale; measured 4900 bp at sf0.01), and (2) recall restricted to
    truth neighbors FROM THE NEW BATCH >= {_RECALL_FLOOR_BP} bp — the
    half a stale or skipped refresh would zero out first.

    Scale shape: fit once on the bounded sorted sample, one assignment
    pass per corpus/batch, probes prune to <= n_lists literal
    partitions regardless of panel size. Driver state: sample +
    centroid table + 20x3 probe pairs, all bounded and deterministic.
    """
    import shutil
    import tempfile

    embs = _embs(spark, sf_dir)
    cut = embs.agg(F.expr("max(vec_id) * 4 DIV 5").cast("long")).first()[0]
    queries = embs.filter(F.col("vec_id") < _RECALL_NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    corpus_old = embs.filter(
        (F.col("vec_id") >= _RECALL_NQ) & (F.col("vec_id") < cut)
    )
    batch = embs.filter(F.col("vec_id") >= cut)

    index_dir = tempfile.mkdtemp(prefix="aig_ivf_index_")
    try:
        centroids, assigned = S.build_ivf_index(
            corpus_old, "embedding", "vec_id", n_lists=16
        )
        S.write_ivf_index(index_dir, centroids, assigned)
        S.refresh_ivf_index(batch, index_dir, "embedding", "vec_id")
        ivf = (
            S.ann_probe_persisted(
                spark, index_dir, queries, k=_RECALL_K, n_probe=3
            )
            .select("qid", "id")
            .collect()
        )
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
    ivf_pairs = {(r["qid"], r["id"]) for r in ivf}

    corpus = embs.filter(F.col("vec_id") >= _RECALL_NQ).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("cv")
    )
    sim = F.round(S.cosine(F.col("cv"), F.col("qv")) + 1e-9, 6).alias("sim")
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("id"))
    exact = (
        corpus.crossJoin(F.broadcast(queries))
        .select("qid", "id", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _RECALL_K)
        .select("qid", "id", "sim")
        .localCheckpoint(eager=True)  # pinned: invariant + return reuse it
    )

    truth = [(r["qid"], r["id"]) for r in exact.select("qid", "id").collect()]
    hits = sum(1 for t in truth if t in ivf_pairs)
    recall_bp = 10000 * hits // (_RECALL_K * _RECALL_NQ)
    if recall_bp < _RECALL_FLOOR_BP:
        raise AssertionError(
            f"persisted-IVF recall@{_RECALL_K} = {recall_bp}bp, below the "
            f"{_RECALL_FLOOR_BP}bp floor — index write/read, refresh, or "
            "probe regression"
        )
    new_truth = [t for t in truth if t[1] >= cut]
    if not new_truth:
        raise AssertionError(
            "fixture regression: no new-batch member reaches any exact "
            "top-k — the refresh audit would be vacuous"
        )
    new_hits = sum(1 for t in new_truth if t in ivf_pairs)
    new_recall_bp = 10000 * new_hits // len(new_truth)
    if new_recall_bp < _RECALL_FLOOR_BP:
        raise AssertionError(
            f"new-batch recall@{_RECALL_K} = {new_recall_bp}bp over "
            f"{len(new_truth)} batch truth neighbors, below the "
            f"{_RECALL_FLOOR_BP}bp floor — the refresh path dropped or "
            "mis-assigned the ingest batch"
        )

    return exact.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.sum("id").cast("long").alias("exact_idsum"),
        F.sum((F.col("id") >= cut).cast("long")).cast("long").alias(
            "n_new_in_topk"
        ),
        F.min("sim").alias("min_sim"),
        F.max("sim").alias("max_sim"),
    )


@register(
    "ivf_compaction_probe_embeddings",
    f"""
    WITH cuts AS (
      SELECT MAX(vec_id) * 3 // 5 AS c1, MAX(vec_id) * 4 // 5 AS c2
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS qid, embedding::DOUBLE[] AS qv,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS qn
      FROM embeddings WHERE vec_id < {_RECALL_NQ}
    ),
    c AS (
      SELECT vec_id AS id, embedding::DOUBLE[] AS cv,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS cn
      FROM embeddings WHERE vec_id >= {_RECALL_NQ}
    ),
    s AS (
      SELECT q.qid, c.id,
             ROUND(CASE WHEN c.cn * q.qn > 0
                        THEN list_dot_product(c.cv, q.qv) / (c.cn * q.qn)
                        ELSE 0.0 END + 1e-9, 6) AS sim
      FROM c CROSS JOIN q
    ),
    r AS (
      SELECT qid, id, sim,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY sim DESC, id) AS rn
      FROM s
    )
    SELECT qid,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(SUM(id) AS BIGINT) AS exact_idsum,
           CAST(SUM(CASE WHEN id >= cuts.c1 AND id < cuts.c2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_b1_in_topk,
           CAST(SUM(CASE WHEN id >= cuts.c2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_b2_in_topk,
           MIN(sim) AS min_sim,
           MAX(sim) AS max_sim
    FROM r, cuts WHERE rn <= {_RECALL_K}
    GROUP BY qid
    """,
)
def ivf_compaction_probe_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COMPACTION closes the serving-loop lifecycle gate coverage
    (VERDICT r11 item 5: build -> staged refresh -> audit ->
    refit-decision -> COMPACT): the first 3/5 of the corpus plays the
    batch-0 fit, the next 1/5 and the top 1/5 arrive as two STAGED
    ingest batches committed by pointer flips (the exact state
    transitions streaming/ivf_stream.py's foreachBatch performs — the
    checkpoint wiring itself is pytest-pinned in
    tests/test_streaming_ivf.py; this gate drives the same commits
    deterministically), then ``compact_streaming_index(gc=True)`` folds
    everything into ``lists_base_v2`` and reclaims ALL superseded state.

    Gate design (the ann_incremental pattern): the EXACT side —
    per-query brute-force top-{_RECALL_K} over the full corpus with
    membership counters for BOTH staged generations (``n_b1_in_topk``,
    ``n_b2_in_topk``, pinning that the truth sets genuinely span both
    staged batches) — is SQL-gated. The compaction itself is enforced
    by in-query invariants recomputed every run: (1) the committed
    probe view returns ROW-IDENTICAL (qid, id, rn) triples before and
    after the gc'd compaction — the crash-identical-reads contract;
    (2) gc actually reclaimed the default base and every staged dir
    (filesystem asserts); (3) post-compaction recall@{_RECALL_K} >=
    {_RECALL_FLOOR_BP} bp overall AND restricted to staged-batch truth
    neighbors — the half a dropped fold would zero out first.

    Scale shape: same as the persisted probe — fit once on the bounded
    sorted sample, one assignment pass per batch, compaction is one
    union + partitioned rewrite of the lists (linear, shuffle-free on
    read since every source is list_id-partitioned), probes prune to
    <= n_lists literal partitions. Driver state: centroids + 20x3 probe
    pairs + two 200-row probe snapshots, all bounded."""
    import os
    import shutil
    import tempfile

    from app_insights_generator_spark.streaming._state import flip_latest
    from app_insights_generator_spark.streaming.ivf_stream import (
        _batch_path,
        compact_streaming_index,
        probe_streaming_index,
    )

    embs = _embs(spark, sf_dir)
    c1, c2 = embs.agg(
        F.expr("max(vec_id) * 3 DIV 5").cast("long"),
        F.expr("max(vec_id) * 4 DIV 5").cast("long"),
    ).first()
    queries = embs.filter(F.col("vec_id") < _RECALL_NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    b0 = embs.filter((F.col("vec_id") >= _RECALL_NQ) & (F.col("vec_id") < c1))
    b1 = embs.filter((F.col("vec_id") >= c1) & (F.col("vec_id") < c2))
    b2 = embs.filter(F.col("vec_id") >= c2)

    index_dir = tempfile.mkdtemp(prefix="aig_ivf_compact_")
    try:
        # Batch 0: fit + write, commit. Batches 1-2: frozen-centroid
        # assignment into staged dirs, pointer-flip commits — the
        # stream's exact state transitions.
        centroids, assigned = S.build_ivf_index(
            b0, "embedding", "vec_id", n_lists=16
        )
        S.write_ivf_index(index_dir, centroids, assigned)
        flip_latest(index_dir, 0)
        for bid, batch in ((1, b1), (2, b2)):
            S.assign_to_index(
                batch, index_dir, "embedding", "vec_id"
            ).write.mode("overwrite").partitionBy("list_id").parquet(
                _batch_path(index_dir, bid)
            )
            flip_latest(index_dir, bid)

        def _snap():
            return sorted(
                (r["qid"], r["id"], r["rn"])
                for r in probe_streaming_index(
                    spark, index_dir, queries, k=_RECALL_K, n_probe=3
                ).collect()
            )

        before = _snap()
        n_folded = compact_streaming_index(spark, index_dir, gc=True)
        if n_folded != 2:
            raise AssertionError(
                f"compaction folded {n_folded} staged batches, expected 2"
            )
        after = _snap()
        if before != after:  # invariant (1): crash-identical reads
            raise AssertionError(
                "committed probe view changed across compaction: "
                f"{len(set(before) ^ set(after))} differing triples"
            )
        # Invariant (2): gc reclaimed every superseded dir.
        leftovers = [
            d
            for d in ("lists", "lists_batches/b1", "lists_batches/b2")
            if os.path.isdir(os.path.join(index_dir, d))
        ]
        if leftovers or not os.path.isdir(
            os.path.join(index_dir, "lists_base_v2")
        ):
            raise AssertionError(
                f"gc left superseded state {leftovers} or dropped the "
                "committed base"
            )
        ivf_pairs = {(q, i) for q, i, _ in after}
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)

    corpus = embs.filter(F.col("vec_id") >= _RECALL_NQ).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("cv")
    )
    sim = F.round(S.cosine(F.col("cv"), F.col("qv")) + 1e-9, 6).alias("sim")
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("id"))
    exact = (
        corpus.crossJoin(F.broadcast(queries))
        .select("qid", "id", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _RECALL_K)
        .select("qid", "id", "sim")
        .localCheckpoint(eager=True)  # pinned: invariants + return reuse it
    )

    truth = [(r["qid"], r["id"]) for r in exact.select("qid", "id").collect()]
    hits = sum(1 for t in truth if t in ivf_pairs)
    recall_bp = 10000 * hits // (_RECALL_K * _RECALL_NQ)
    if recall_bp < _RECALL_FLOOR_BP:
        raise AssertionError(
            f"post-compaction recall@{_RECALL_K} = {recall_bp}bp, below "
            f"the {_RECALL_FLOOR_BP}bp floor — fold or probe regression"
        )
    staged_truth = [t for t in truth if t[1] >= c1]
    if not staged_truth:
        raise AssertionError(
            "fixture regression: no staged-batch member reaches any exact "
            "top-k — the compaction audit would be vacuous"
        )
    staged_hits = sum(1 for t in staged_truth if t in ivf_pairs)
    staged_recall_bp = 10000 * staged_hits // len(staged_truth)
    if staged_recall_bp < _RECALL_FLOOR_BP:
        raise AssertionError(
            f"staged-batch recall@{_RECALL_K} = {staged_recall_bp}bp over "
            f"{len(staged_truth)} staged truth neighbors, below the "
            f"{_RECALL_FLOOR_BP}bp floor — the fold dropped or mis-merged "
            "a staged generation"
        )

    return exact.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.sum("id").cast("long").alias("exact_idsum"),
        F.sum(
            ((F.col("id") >= c1) & (F.col("id") < c2)).cast("long")
        ).cast("long").alias("n_b1_in_topk"),
        F.sum((F.col("id") >= c2).cast("long")).cast("long").alias(
            "n_b2_in_topk"
        ),
        F.min("sim").alias("min_sim"),
        F.max("sim").alias("max_sim"),
    )


@register(
    "ivf_compaction_receipt_embeddings",
    f"""
    WITH cuts AS (
      SELECT MAX(vec_id) * 3 // 5 AS c1, MAX(vec_id) * 4 // 5 AS c2
      FROM embeddings
    ),
    c AS (SELECT vec_id FROM embeddings WHERE vec_id >= {_RECALL_NQ})
    SELECT CAST(2 AS BIGINT) AS n_folded,
           CAST(3 AS BIGINT) AS gens_before,
           CAST(1 AS BIGINT) AS gens_after,
           CAST(SUM(CASE WHEN vec_id < cuts.c1 THEN 1 ELSE 0 END)
                AS BIGINT) AS rows_b0,
           CAST(SUM(CASE WHEN vec_id >= cuts.c1 AND vec_id < cuts.c2
                         THEN 1 ELSE 0 END) AS BIGINT) AS rows_b1,
           CAST(SUM(CASE WHEN vec_id >= cuts.c2 THEN 1 ELSE 0 END)
                AS BIGINT) AS rows_b2,
           CAST(COUNT(*) AS BIGINT) AS rows_total
    FROM c, cuts
    """,
)
def ivf_compaction_receipt_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The compaction's STORAGE-ACCOUNTING receipt (VERDICT r11 item 7b
    — the OPTIMIZE receipt every table format emits): after the same
    staged lifecycle as ivf_compaction_probe_embeddings (batch-0 fit,
    two pointer-flip staged commits, gc'd fold), the returned row states
    what the maintenance job did — batches folded, generation dirs
    before/after, and per-generation row counts — with every claim
    derived from the ACTUAL on-disk state and pointer files, while the
    oracle states what the receipt MUST read from the cut arithmetic
    alone. Row-count columns gate data conservation per generation;
    the generation counts gate that three physical dirs really became
    one.

    In-query invariants (the filesystem half SQL cannot see):
    (1) committed-view row count is IDENTICAL before and after the fold
    — compaction conserves data; (2) total bytes under the index dir do
    not grow across the fold and the file count strictly drops (the
    whole point of the OPTIMIZE job: probe cost per list grows with
    file count until staged dirs fold); (3) gc left exactly one
    generation dir. File/byte totals themselves are measured and
    asserted but NOT returned — parquet file sizes vary with task
    parallelism and codec framing, so they gate directionally in-query
    rather than bit-exactly cross-engine.

    Scale shape: identical to the compaction gate — the receipt adds
    one committed-view count before and after plus an os.walk of the
    (bounded) index dir; no extra Spark jobs over the corpus."""
    import os
    import shutil
    import tempfile

    from app_insights_generator_spark.streaming._state import flip_latest
    from app_insights_generator_spark.streaming.ivf_stream import (
        _batch_path,
        compact_streaming_index,
        read_streaming_index,
    )

    embs = _embs(spark, sf_dir)
    c1, c2 = embs.agg(
        F.expr("max(vec_id) * 3 DIV 5").cast("long"),
        F.expr("max(vec_id) * 4 DIV 5").cast("long"),
    ).first()
    b0 = embs.filter((F.col("vec_id") >= _RECALL_NQ) & (F.col("vec_id") < c1))
    b1 = embs.filter((F.col("vec_id") >= c1) & (F.col("vec_id") < c2))
    b2 = embs.filter(F.col("vec_id") >= c2)

    def _gen_dirs(index_dir: str) -> list[str]:
        gens = [
            d
            for d in os.listdir(index_dir)
            if d == "lists" or d.startswith("lists_base_v")
        ]
        broot = os.path.join(index_dir, "lists_batches")
        if os.path.isdir(broot):
            gens += [os.path.join("lists_batches", d) for d in os.listdir(broot)]
        return sorted(gens)

    def _du(index_dir: str) -> tuple[int, int]:
        n_files = total = 0
        for root, _dirs, files in os.walk(index_dir):
            for fname in files:
                if fname.endswith(".parquet"):
                    n_files += 1
                    total += os.path.getsize(os.path.join(root, fname))
        return n_files, total

    index_dir = tempfile.mkdtemp(prefix="aig_ivf_receipt_")
    try:
        centroids, assigned = S.build_ivf_index(
            b0, "embedding", "vec_id", n_lists=16
        )
        S.write_ivf_index(index_dir, centroids, assigned)
        flip_latest(index_dir, 0)
        for bid, batch in ((1, b1), (2, b2)):
            S.assign_to_index(
                batch, index_dir, "embedding", "vec_id"
            ).write.mode("overwrite").partitionBy("list_id").parquet(
                _batch_path(index_dir, bid)
            )
            flip_latest(index_dir, bid)

        gens_before = _gen_dirs(index_dir)
        files_before, bytes_before = _du(index_dir)
        _, lists_before = read_streaming_index(spark, index_dir)
        rows_before = lists_before.count()

        n_folded = compact_streaming_index(spark, index_dir, gc=True)

        gens_after = _gen_dirs(index_dir)
        files_after, bytes_after = _du(index_dir)
        _, lists_after = read_streaming_index(spark, index_dir)
        rows_after = lists_after.count()

        if rows_after != rows_before:  # invariant (1): conservation
            raise AssertionError(
                f"compaction changed the committed row count: "
                f"{rows_before} -> {rows_after}"
            )
        # Same per-file layout allowance as the dedup receipt: the byte
        # claim gates payload growth, not parquet metadata re-chunking;
        # capped at 10% of pre-fold payload (ADVICE r12) so the allowance
        # can never exceed what a duplicated small table would add.
        byte_allowance = min(
            32 * 1024 * max(1, files_before), max(4096, bytes_before // 10)
        )
        if files_after >= files_before or bytes_after > bytes_before + byte_allowance:
            raise AssertionError(  # invariant (2): the OPTIMIZE claim
                f"fold did not shrink storage: files {files_before} -> "
                f"{files_after}, bytes {bytes_before} -> {bytes_after}"
            )
        if len(gens_after) != 1:  # invariant (3): one generation left
            raise AssertionError(f"gc left generations {gens_after}")

        seg = (
            lists_after.agg(
                F.sum((F.col("id") < c1).cast("long")).alias("rows_b0"),
                F.sum(
                    ((F.col("id") >= c1) & (F.col("id") < c2)).cast("long")
                ).alias("rows_b1"),
                F.sum((F.col("id") >= c2).cast("long")).alias("rows_b2"),
                F.count(F.lit(1)).cast("long").alias("rows_total"),
            )
            .localCheckpoint(eager=True)  # pin: the temp dir is removed
        )
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)

    return seg.select(
        F.lit(n_folded).cast("long").alias("n_folded"),
        F.lit(len(gens_before)).cast("long").alias("gens_before"),
        F.lit(len(gens_after)).cast("long").alias("gens_after"),
        "rows_b0",
        "rows_b1",
        "rows_b2",
        "rows_total",
    )


_REFIT_COS_FLOOR = 0.99


@register(
    "ivf_refit_decision_embeddings",
    f"""
    WITH cut AS (SELECT MAX(vec_id) * 4 // 5 AS c FROM embeddings),
    e AS (
      SELECT vid, d, CAST(floor(x * 1000000) AS BIGINT) + 1000000 AS v
      FROM (SELECT vec_id AS vid, generate_subscripts(embedding, 1) AS d,
                   unnest(embedding::DOUBLE[]) AS x
            FROM embeddings WHERE vec_id >= {_RECALL_NQ})
    ),
    seg AS (
      SELECT vid, CASE WHEN vid >= cut.c THEN 'batch' ELSE 'old' END AS sg
      FROM (SELECT DISTINCT vid FROM e), cut
    ),
    counts AS (SELECT sg, CAST(COUNT(*) AS BIGINT) AS n FROM seg GROUP BY sg),
    cent AS (
      SELECT sg, d, CAST(SUM(v) // COUNT(*) AS BIGINT) - 1000000 AS c
      FROM e JOIN seg USING (vid) GROUP BY sg, d
    ),
    agg AS (
      SELECT CAST(SUM(a.c * b.c) AS BIGINT) AS dot_q,
             CAST(SUM(a.c * a.c) AS BIGINT) AS n2_old,
             CAST(SUM(b.c * b.c) AS BIGINT) AS n2_batch
      FROM cent a JOIN cent b ON a.d = b.d
      WHERE a.sg = 'old' AND b.sg = 'batch'
    ),
    cosd AS (
      SELECT dot_q, n2_old, n2_batch,
             ROUND(CASE WHEN n2_old > 0 AND n2_batch > 0
                   THEN dot_q / sqrt(CAST(n2_old AS DOUBLE) * n2_batch)
                   ELSE 0.0 END + 1e-9, 6) AS cos_centroid
      FROM agg
    )
    SELECT (SELECT n FROM counts WHERE sg = 'old') AS n_old,
           (SELECT n FROM counts WHERE sg = 'batch') AS n_batch,
           dot_q, n2_old, n2_batch, cos_centroid,
           CASE WHEN cos_centroid >= {_REFIT_COS_FLOOR}
                THEN 'keep' ELSE 'refit' END AS decision
    FROM cosd
    """,
)
def ivf_refit_decision_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The serving loop's CONTROL PLANE (VERDICT r10 item 7a): the
    refit-vs-keep verdict row for the persisted IVF index. Every IVF
    deployment must decide when frozen centroids have gone stale; this
    query gates that decision end-to-end:

    - The DRIFT INSTRUMENT (SQL-gated, engine-exact): cosine between
      the old corpus's mean embedding and the ingest batch's, through
      the one quantization home (quantized_long_form — integer per-dim
      centroid means, int64 dot/norms, single final float cosine, the
      split_centroid_drift discipline). Segments mirror the incremental
      probe gate: old = [{_RECALL_NQ}, max*4 DIV 5), batch = the top
      fifth. decision = 'keep' iff the 6dp cosine >= {_REFIT_COS_FLOOR}
      (identical rounded value both engines, so the CASE branches
      identically).
    - The AUDIT COUPLING (in-query invariants, every gate run): the
      real persisted index is built on the old corpus, refreshed with
      the batch against FROZEN centroids, probed by the
      {_RECALL_NQ}-query panel, and measured against brute-force truth.
      A 'keep' verdict must be CONSISTENT with the measured audit —
      overall AND new-batch-restricted recall@{_RECALL_K} >=
      {_RECALL_FLOOR_BP} bp — otherwise the query raises: the control
      plane may never emit 'keep' while the audit says the frozen
      quantizer is failing. (A 'refit' verdict on this fixture would
      mean the fixture drifted; the audit would catch the recall side.)

    Scale shape: drift is one corpus scan to (segment, dim) partial
    sums (map-side combine, 2·dims groups) + a dims-row join; the audit
    is the already-bounded incremental-probe machinery (fit on a
    deterministic sample, O(batch) refresh, partition-pruned probes).

    Reference parity: no counterpart; §2.10 serving-loop extension.
    Registered on ROTATION_NEXT (round-12 rotation; post-sweep addition)."""
    import shutil
    import tempfile

    embs = _embs(spark, sf_dir)
    cut = embs.agg(F.expr("max(vec_id) * 4 DIV 5").cast("long")).first()[0]
    corpus_old = embs.filter(
        (F.col("vec_id") >= _RECALL_NQ) & (F.col("vec_id") < cut)
    )
    batch = embs.filter(F.col("vec_id") >= cut)

    # --- drift instrument (the gated row) --------------------------------
    e = S.quantized_long_form(embs.filter(F.col("vec_id") >= _RECALL_NQ))
    seg = embs.filter(F.col("vec_id") >= _RECALL_NQ).select(
        F.col("vec_id").alias("vid"),
        F.when(F.col("vec_id") >= cut, "batch").otherwise("old").alias("sg"),
    )
    counts = {
        r["sg"]: r["n"]
        for r in seg.groupBy("sg").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        ).collect()
    }
    cent = (
        e.join(seg, "vid")
        .groupBy("sg", "d")
        .agg(F.expr("CAST(SUM(v) DIV COUNT(1) AS LONG) - 1000000").alias("c"))
    )
    a = cent.filter(F.col("sg") == "old").select(
        F.col("d").alias("ad"), F.col("c").alias("ca")
    )
    b = cent.filter(F.col("sg") == "batch").select("d", F.col("c").alias("cb"))
    agg = b.join(F.broadcast(a), F.col("d") == F.col("ad")).agg(
        F.sum(F.expr("ca * cb")).cast("long").alias("dot_q"),
        F.sum(F.expr("ca * ca")).cast("long").alias("n2_old"),
        F.sum(F.expr("cb * cb")).cast("long").alias("n2_batch"),
    )
    verdict = agg.select(
        F.lit(int(counts["old"])).cast("long").alias("n_old"),
        F.lit(int(counts["batch"])).cast("long").alias("n_batch"),
        "dot_q",
        "n2_old",
        "n2_batch",
        F.round(
            F.when(
                (F.col("n2_old") > 0) & (F.col("n2_batch") > 0),
                F.col("dot_q")
                / F.sqrt(F.col("n2_old").cast("double") * F.col("n2_batch")),
            ).otherwise(F.lit(0.0))
            + F.lit(1e-9),
            6,
        ).alias("cos_centroid"),
    ).withColumn(
        "decision",
        F.when(F.col("cos_centroid") >= _REFIT_COS_FLOOR, "keep").otherwise(
            "refit"
        ),
    ).localCheckpoint(eager=True)
    decision = verdict.select("decision").first()[0]

    # --- audit coupling: 'keep' must agree with the measured recall ------
    queries = embs.filter(F.col("vec_id") < _RECALL_NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    index_dir = tempfile.mkdtemp(prefix="aig_ivf_refit_")
    try:
        centroids, assigned = S.build_ivf_index(
            corpus_old, "embedding", "vec_id", n_lists=16
        )
        S.write_ivf_index(index_dir, centroids, assigned)
        S.refresh_ivf_index(batch, index_dir, "embedding", "vec_id")
        ivf = (
            S.ann_probe_persisted(
                spark, index_dir, queries, k=_RECALL_K, n_probe=3
            )
            .select("qid", "id")
            .collect()
        )
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
    ivf_pairs = {(r["qid"], r["id"]) for r in ivf}

    corpus = embs.filter(F.col("vec_id") >= _RECALL_NQ).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("cv")
    )
    sim = F.round(S.cosine(F.col("cv"), F.col("qv")) + 1e-9, 6).alias("sim")
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("id"))
    truth = [
        (r["qid"], r["id"])
        for r in corpus.crossJoin(F.broadcast(queries))
        .select("qid", "id", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _RECALL_K)
        .select("qid", "id")
        .collect()
    ]
    recall_bp = (
        10000
        * sum(1 for t in truth if t in ivf_pairs)
        // (_RECALL_K * _RECALL_NQ)
    )
    new_truth = [t for t in truth if t[1] >= cut]
    new_recall_bp = (
        10000 * sum(1 for t in new_truth if t in ivf_pairs) // len(new_truth)
        if new_truth
        else 10000
    )
    if decision == "keep" and (
        recall_bp < _RECALL_FLOOR_BP or new_recall_bp < _RECALL_FLOOR_BP
    ):
        raise AssertionError(
            f"control-plane contradiction: drift verdict 'keep' but the "
            f"measured audit fails (recall {recall_bp}bp, new-batch "
            f"{new_recall_bp}bp vs floor {_RECALL_FLOOR_BP}bp) — the frozen "
            "quantizer is stale and the decision rule missed it"
        )
    return verdict


@register(
    "jaccard_join_prefix_documents",
    f"""
    WITH {_JACCARD_ALL_PAIRS_CTES}
    SELECT id_a, id_b, ROUND(jaccard + 1e-9, 4) AS jaccard
    FROM jac WHERE jaccard >= 0.5
    """,
    tier="sf0.01",
)
def jaccard_join_prefix_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.5 self-join via prefix filtering
    (operators/dedup.py jaccard_join_prefix_filter) — zero false
    negatives by the prefix lemma, so unlike the MinHash path the oracle
    equality needs NO recall argument at all: output == the O(n^2)
    all-pairs truth set by construction, at prefix-join cost. The
    deterministic third dedup candidate strategy (MinHash = probabilistic
    bands, SimHash = bit distance, prefix filter = exact)."""
    pairs = D.jaccard_join_prefix_filter(
        _docs(spark, sf_dir), "doc_id", "text", shingle_n=3, threshold=0.5
    )
    return pairs.select(
        "id_a", "id_b", F.round(F.col("jaccard") + 1e-9, 4).alias("jaccard")
    )


@register(
    "multimodal_gif_codec_features",
    """
    WITH ids AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 100),
    dims AS (
      SELECT media_id,
             1 + media_id % 3 AS n,
             3 * (2 + media_id % 5) AS w,
             2 * (2 + media_id % 4) AS h
      FROM ids
    ),
    px AS (
      SELECT d.media_id, d.n, d.w, d.h,
             (3 * y.y + 7 * x.x + 5 * f.f + d.media_id) % 256 AS r
      FROM dims d,
           LATERAL (SELECT unnest(range(0, d.n)) AS f) f,
           LATERAL (SELECT unnest(range(0, d.h)) AS y) y,
           LATERAL (SELECT unnest(range(0, d.w)) AS x) x
    )
    SELECT media_id,
           'image_gif' AS media_type,
           CAST(ANY_VALUE(w) AS INT) AS width,
           CAST(ANY_VALUE(h) AS INT) AS height,
           CAST(ANY_VALUE(n) * 70 AS BIGINT) AS duration_ms,
           CAST(SUM(r) AS BIGINT) AS payload_sum
    FROM px GROUP BY media_id
    """,
)
def multimodal_gif_codec_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL animated-GIF decode end to end: GIF89a payloads with
    variable-width LZW entropy coding (operators/codecs.py — clear/EOI
    codes, 12-bit dictionary growth + reset, sub-block framing, per-frame
    Graphic Control Extensions) are generated distributed, then parsed
    back by the pure-numpy decoder inside Arrow-batched mapInPandas. The
    oracle predicts width, height, duration, and the decoded R-channel
    sum in CLOSED FORM from the id alone (identity-R palette: R-sum ==
    index sum), so one wrong LZW code width, dictionary entry, or block
    boundary hash-mismatches the gate. Extends the real-codec family to
    {WAV, BMP, PNG, JPEG, MP4, GIF} — LZW joins DEFLATE and Huffman/DCT
    as the third real entropy-coding stack."""
    from app_insights_generator_spark.operators.multimodal import (
        extract_real_media_features,
        synthesize_gif_media,
    )

    ids = _docs(spark, sf_dir).filter(F.col("doc_id") < 100).select(
        F.col("doc_id").alias("media_id")
    )
    return extract_real_media_features(synthesize_gif_media(ids, "media_id"))


# --- Gopher document-level quality rules (non-repetition panel) --------------


@register(
    "gopher_quality_rules_documents",
    f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS w FROM documents
    ), m AS (
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_words,
             CAST(CASE WHEN len(w) > 0
                  THEN 100 * len(list_aggregate(w, 'string_agg', '')) // len(w)
                  ELSE -1 END AS BIGINT) AS mean_word_len_x100,
             CAST(CASE WHEN len(w) > 0
                  THEN 10000 * len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
                       // len(w)
                  ELSE -1 END AS BIGINT) AS alpha_word_bp,
             CAST(len(list_filter(['the', 'and', 'of', 'to', 'in'],
                                  s -> list_contains(w, s))) AS BIGINT)
               AS n_stop_hits
      FROM t
    )
    SELECT doc_id, n_words, mean_word_len_x100, alpha_word_bp, n_stop_hits,
           (n_words BETWEEN 50 AND 100000) AS ok_word_count,
           (mean_word_len_x100 BETWEEN 300 AND 1000) AS ok_mean_word_len,
           (alpha_word_bp >= 8000) AS ok_alpha_words,
           (n_stop_hits >= 2) AS ok_stopwords,
           ((n_words BETWEEN 50 AND 100000)
            AND (mean_word_len_x100 BETWEEN 300 AND 1000)
            AND (alpha_word_bp >= 8000)
            AND (n_stop_hits >= 2)) AS keep
    FROM m
    """,
)
def gopher_quality_rules_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher/MassiveText document-level quality rules that are NOT
    repetition-based (Rae et al. 2021, Table A1 — the companion panel to
    gopher_repetition_documents): word count in [50, 100k], mean word
    length in [3, 10] chars (x100 integer), >= 80% of words containing an
    alphabetic character (basis points), and >= 2 distinct required
    stopwords present — plus the per-rule verdicts and the conjunction
    `keep`. All thresholds are integers, so both engines floor
    identically; empty docs encode -1 (never NULL in an int final).
    C4's line-level rules (terminal punctuation, >= 3-word lines —
    Raffel et al. 2020 §2.2) degenerate on this corpus (single-line,
    punctuation-free synthetic text) and are exercised on constructed
    text in tests/test_text.py instead.

    Scale: shuffle-free — one projection over the corpus, every metric a
    higher-order array function on the tokenized column (JVM codegen, no
    Python). The filter verdict is a pure scan at 100 TB.

    Rotated into the round-6 gate window (pre-sweep addition).

    Reference parity: none (main.py has no text surface); §2.6 curation
    extension."""
    docs = _docs(spark, sf_dir)
    toked = docs.select("doc_id", T.tokens(F.col("text")).alias("w"))
    n = F.size("w").cast("long")
    alpha = F.size(F.filter(F.col("w"), lambda x: x.rlike("[a-z]"))).cast("long")
    stops = F.array([F.lit(s) for s in T.LANG_MARKERS["en"]])
    stop_hits = F.size(
        F.filter(stops, lambda s: F.array_contains(F.col("w"), s))
    ).cast("long")
    m = toked.select(
        "doc_id",
        n.alias("n_words"),
        F.expr(
            "CAST(CASE WHEN size(w) > 0 THEN 100 * length(array_join(w, '')) "
            "DIV size(w) ELSE -1 END AS BIGINT)"
        ).alias("mean_word_len_x100"),
        F.when(n > 0, F.expr("CAST(10000 AS BIGINT)") * alpha)
        .otherwise(F.lit(None))
        .alias("_alpha_raw"),
        stop_hits.alias("n_stop_hits"),
    ).select(
        "doc_id",
        "n_words",
        "mean_word_len_x100",
        F.expr(
            "CAST(CASE WHEN n_words > 0 THEN _alpha_raw DIV n_words "
            "ELSE -1 END AS BIGINT)"
        ).alias("alpha_word_bp"),
        "n_stop_hits",
    )
    rules = m.select(
        "*",
        F.col("n_words").between(50, 100000).alias("ok_word_count"),
        F.col("mean_word_len_x100").between(300, 1000).alias("ok_mean_word_len"),
        (F.col("alpha_word_bp") >= 8000).alias("ok_alpha_words"),
        (F.col("n_stop_hits") >= 2).alias("ok_stopwords"),
    )
    return rules.withColumn(
        "keep",
        F.col("ok_word_count")
        & F.col("ok_mean_word_len")
        & F.col("ok_alpha_words")
        & F.col("ok_stopwords"),
    )


# --- Linear quality-classifier inference (fixed weights, integer) ------------


@register(
    "quality_linear_scores_documents",
    f"""
    WITH t AS (
      SELECT doc_id, {_NORM} AS s, {_TOKS} AS w FROM documents
    ), feat AS (
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_tokens,
             CAST(CASE WHEN len(w) > 0
                  THEN 100 * len(list_aggregate(w, 'string_agg', '')) // len(w)
                  ELSE 0 END AS BIGINT) AS mwl_x100,
             CAST(CASE WHEN len(w) > 0 THEN
                  10000 * ({" + ".join(_sql_occurrences("(' ' || s || ' ')", f" {_w} ") for _w in T.LANG_MARKERS["en"])})
                        // len(w) ELSE 0 END AS BIGINT) AS stop_bp,
             CAST(CASE WHEN len(replace(s, ' ', '')) > 0 THEN
                  10000 * length(regexp_replace(s, '[^0-9]', '', 'g'))
                        // len(replace(s, ' ', ''))
                  ELSE 0 END AS BIGINT) AS digit_bp
      FROM t
    )
    SELECT doc_id, n_tokens, mwl_x100, stop_bp, digit_bp,
           CAST(500000 + 300 * LEAST(n_tokens, 200)
                - 500 * abs(mwl_x100 - 450)
                + 40 * stop_bp - 30 * digit_bp AS BIGINT) AS score_micro,
           (500000 + 300 * LEAST(n_tokens, 200)
                - 500 * abs(mwl_x100 - 450)
                + 40 * stop_bp - 30 * digit_bp) >= 510000 AS keep
    FROM feat
    """,
)
def quality_linear_scores_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier INFERENCE: the fastText/logistic-scorer
    deployment shape every curation pipeline runs — a fixed trained
    weight vector dotted with cheap per-document features (token count
    capped at 200, mean word length deviation, stopword density, digit
    density), thresholded into a keep verdict. Weights live in micro-units
    and every feature is an integer ratio (bp / x100), so the score is
    exact int64 arithmetic — the model is a pure codegen'd expression, no
    UDF, no serialized model object, no float drift between engines.

    Scale: shuffle-free scan; at 100 TB the scorer streams through the
    corpus at parquet-read speed, which is precisely why linear scorers
    (not transformer classifiers) are the first filtering stage of
    CCNet/fastText-style curation (Wenzek et al. 2020).

    Rotated into the round-6 gate window (pre-sweep addition).

    Reference parity: none; §2.6 curation extension — the trained-model
    complement to the rule panel gopher_quality_rules_documents."""
    docs = _docs(spark, sf_dir)
    base = docs.select(
        "doc_id",
        T.normalized_text(F.col("text")).alias("s"),
        T.tokens(F.col("text")).alias("w"),
    )
    padded = F.concat(F.lit(" "), F.col("s"), F.lit(" "))
    stop_occ = F.lit(0)
    for word in T.LANG_MARKERS["en"]:
        stop_occ = stop_occ + T.occurrences(padded, f" {word} ")
    feat = base.select(
        "doc_id",
        F.size("w").cast("long").alias("n_tokens"),
        F.expr(
            "CAST(CASE WHEN size(w) > 0 THEN 100 * length(array_join(w, '')) "
            "DIV size(w) ELSE 0 END AS BIGINT)"
        ).alias("mwl_x100"),
        F.when(
            F.size("w") > 0,
            (F.lit(10000).cast("long") * stop_occ.cast("long")),
        )
        .otherwise(F.lit(None))
        .alias("_stop_raw"),
        F.expr(
            "CAST(CASE WHEN length(replace(s, ' ', '')) > 0 THEN "
            "10000 * length(regexp_replace(s, '[^0-9]', '')) "
            "DIV length(replace(s, ' ', '')) ELSE 0 END AS BIGINT)"
        ).alias("digit_bp"),
    ).select(
        "doc_id",
        "n_tokens",
        "mwl_x100",
        F.expr(
            "CAST(CASE WHEN n_tokens > 0 THEN _stop_raw DIV n_tokens "
            "ELSE 0 END AS BIGINT)"
        ).alias("stop_bp"),
        "digit_bp",
    )
    score = (
        F.lit(500000).cast("long")
        + 300 * F.least(F.col("n_tokens"), F.lit(200).cast("long"))
        - 500 * F.abs(F.col("mwl_x100") - 450)
        + 40 * F.col("stop_bp")
        - 30 * F.col("digit_bp")
    )
    return feat.select(
        "*",
        score.alias("score_micro"),
        (score >= 510000).alias("keep"),
    )


# --- Duplicate-cluster size profile (dedup-health dashboard) -------------------


@register(
    "dedup_cluster_profile_documents",
    """
    WITH comp AS (SELECT * FROM ({COMPONENTS})),
    sizes AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS sz
              FROM comp GROUP BY component),
    tot AS (SELECT CAST(SUM(sz) AS BIGINT) AS n_total FROM sizes)
    SELECT sz AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs,
           CAST(SUM(sz) * 10000 // MIN(tot.n_total) AS BIGINT) AS doc_share_bp
    FROM sizes, tot
    GROUP BY sz
    """,
    tier="sf0.01",
)
def dedup_cluster_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster SIZE DISTRIBUTION — the dedup-health dashboard
    row (is the corpus mostly singletons with a thin near-dup tail, or
    is one boilerplate template swallowing it? The shape decides whether
    keep-one-per-cluster dedup saves 2% or 40% of the token budget):
    histogram of connected-component sizes over the MinHash near-dup
    graph -> [cluster_size, n_clusters, n_docs, doc_share_bp], docs
    covered exactly once (singletons are size-1 components).

    Composes the gated dedup_components_documents (the oracle embeds
    that query's registered recursive-CTE oracle as a derived table, the
    cohens_kappa pattern, so the two gates share one component
    definition); sf0.01 oracle tier inherited from the all-pairs truth
    set.

    Scale: one component-keyed count + one size-keyed count over the
    (corpus-sized) label table, plus a 1-row total broadcast back — the
    histogram is bounded by the largest cluster size, tiny at any scale.

    Reference parity: no counterpart; §2.3 curation extension.
    Registered on ROTATION_NEXT (round-10 window; post-sweep addition)."""
    comp = dedup_components_documents(spark, sf_dir)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    tot = sizes.agg(F.sum("sz").cast("long").alias("n_total"))
    return (
        sizes.groupBy(F.col("sz").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("sz").cast("long").alias("n_docs"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "cluster_size",
            "n_clusters",
            "n_docs",
            F.expr("CAST(n_docs * 10000 DIV n_total AS LONG)").alias(
                "doc_share_bp"
            ),
        )
    )


ORACLES["dedup_cluster_profile_documents"] = ORACLES[
    "dedup_cluster_profile_documents"
].replace("{COMPONENTS}", ORACLES["dedup_components_documents"])


# --- Inter-labeler agreement (Cohen's kappa) ----------------------------------


@register(
    "cohens_kappa_quality_documents",
    f"""
    WITH g AS (SELECT doc_id, ok_word_count AS gk
               FROM ({{GOPHER}})),
    l AS (SELECT doc_id, keep AS lk
          FROM ({{LINEAR}})),
    j AS (SELECT gk, lk FROM g JOIN l USING (doc_id)),
    c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN gk AND lk THEN 1 ELSE 0 END) AS BIGINT) AS n11,
                 CAST(SUM(CASE WHEN gk AND NOT lk THEN 1 ELSE 0 END) AS BIGINT) AS n10,
                 CAST(SUM(CASE WHEN NOT gk AND lk THEN 1 ELSE 0 END) AS BIGINT) AS n01,
                 CAST(SUM(CASE WHEN NOT gk AND NOT lk THEN 1 ELSE 0 END) AS BIGINT) AS n00
          FROM j)
    SELECT n, n11, n10, n01, n00,
           CAST((n11 + n00) * 10000 // n AS BIGINT) AS po_bp,
           CAST(((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)) * 10000 // (n*n)
             AS BIGINT) AS pe_bp,
           CAST(CASE WHEN n*n = (n11+n10)*(n11+n01) + (n01+n00)*(n10+n00) THEN 0
                ELSE (n*(n11+n00) - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)))
                     * 10000
                     // (n*n - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)))
                END AS BIGINT) AS kappa_bp
    FROM c
    """,
)
def cohens_kappa_quality_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (Cohen 1960) between the repo's two deterministic
    quality labelers — the Gopher panel's word-count rule (the one rule
    that VARIES on this corpus: the full `keep` conjunction is
    constant-false here because ok_stopwords never fires on the
    stopword-free synthetic text, which would degenerate kappa to the
    trivial 0) and the linear scorer's threshold verdict: the standard inter-annotator /
    inter-filter agreement statistic a curation team reads before
    swapping one filter for another (raw agreement po overstates
    consensus when both labelers mostly say keep; kappa corrects for the
    chance-agreement floor pe).

    Exactness: the full 2x2 contingency table is integer counts; po, pe
    and kappa = (po - pe)/(1 - pe) are emitted in basis points via pure
    int64 arithmetic — kappa_bp = (N*agree - E) * 10000 DIV (N^2 - E)
    with E = r1*c1 + r0*c0, truncation toward zero identical in both
    engines (negative kappa included; the degenerate pe=1 case — both
    labelers constant — encodes 0, guarded by CASE in both). Headroom:
    N^2 * 10000 ~ 2.5e11 at sf0.1, ~1e7x margin.

    The ORACLE embeds the two scorers' own registered oracle SQL as
    derived tables, so the three gates can never drift apart on a
    labeler's definition; the Spark side composes the registered query
    callables the same way.

    Scale: two shuffle-free scorer scans + one doc_id-keyed join + a
    1-row aggregate; the join is the only exchange.

    Reference parity: no counterpart; §2.6 curation extension.
    Registered on ROTATION_NEXT (round-10 window; post-sweep addition)."""
    g = gopher_quality_rules_documents(spark, sf_dir).select(
        "doc_id", F.col("ok_word_count").alias("gk")
    )
    lin = quality_linear_scores_documents(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("lk")
    )
    c = (
        g.join(lin, "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.expr("CASE WHEN gk AND lk THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n11"),
            F.sum(F.expr("CASE WHEN gk AND NOT lk THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n10"),
            F.sum(F.expr("CASE WHEN NOT gk AND lk THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n01"),
            F.sum(F.expr("CASE WHEN NOT gk AND NOT lk THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n00"),
        )
    )
    e = "((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))"
    return c.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.expr("CAST((n11 + n00) * 10000 DIV n AS LONG)").alias("po_bp"),
        F.expr(f"CAST({e} * 10000 DIV (n*n) AS LONG)").alias("pe_bp"),
        F.expr(
            f"CAST(CASE WHEN n*n = {e} THEN 0 "
            f"ELSE (n*(n11+n00) - {e}) * 10000 DIV (n*n - {e}) END AS LONG)"
        ).alias("kappa_bp"),
    )


# Splice the two labelers' registered oracles in AFTER registration so the
# kappa gate provably shares their definitions (f-string interpolation at
# decoration time would race the dict insert order).
ORACLES["cohens_kappa_quality_documents"] = (
    ORACLES["cohens_kappa_quality_documents"]
    .replace("{GOPHER}", ORACLES["gopher_quality_rules_documents"])
    .replace("{LINEAR}", ORACLES["quality_linear_scores_documents"])
)


# --- Embedding centroid drift across the train/val/test split ------------------


@register(
    "split_centroid_drift_embeddings",
    """
    WITH e AS (
      SELECT vid, d, CAST(floor(x * 1000000) AS BIGINT) + 1000000 AS v
      FROM (SELECT vec_id AS vid, generate_subscripts(embedding, 1) AS d,
                   unnest(embedding::DOUBLE[]) AS x
            FROM embeddings)
    ),
    sp AS (
      SELECT vid,
             CASE WHEN ((strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 4096
                      + (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) * 256
                      + (strpos('0123456789abcdef', substring(hx, 3, 1)) - 1) * 16
                      + (strpos('0123456789abcdef', substring(hx, 4, 1)) - 1)) % 100 < 80
                  THEN 'train'
                  WHEN ((strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 4096
                      + (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) * 256
                      + (strpos('0123456789abcdef', substring(hx, 3, 1)) - 1) * 16
                      + (strpos('0123456789abcdef', substring(hx, 4, 1)) - 1)) % 100 < 90
                  THEN 'val' ELSE 'test' END AS split
      FROM (SELECT DISTINCT vid,
                   substring(sha256(CAST(vid AS VARCHAR)), 1, 4) AS hx
            FROM e)
    ),
    cent AS (
      SELECT split, d, CAST(SUM(v) // COUNT(*) AS BIGINT) - 1000000 AS c
      FROM e JOIN sp USING (vid) GROUP BY split, d
    ),
    agg AS (
      SELECT b.split AS other_split,
             CAST(SUM(a.c * b.c) AS BIGINT) AS dot_q,
             CAST(SUM(a.c * a.c) AS BIGINT) AS n2_train,
             CAST(SUM(b.c * b.c) AS BIGINT) AS n2_other
      FROM cent a JOIN cent b ON a.d = b.d
      WHERE a.split = 'train' AND b.split <> 'train'
      GROUP BY b.split
    )
    SELECT 'train_vs_' || other_split AS pair, dot_q, n2_train, n2_other,
           ROUND(CASE WHEN n2_train > 0 AND n2_other > 0
                 THEN dot_q / sqrt(CAST(n2_train AS DOUBLE) * n2_other)
                 ELSE 0.0 END + 1e-9, 6) AS cos_centroid
    FROM agg
    """,
)
def split_centroid_drift_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift between dataset splits: cosine between the
    TRAIN split's mean embedding and each held-out split's — the
    representation-level companion to the scalar drift family (a val set
    whose centroid swings away from train means the split is not iid in
    embedding space, e.g. a topic or language landed disproportionately
    on one side of the hash). Emitted per pair: exact integer centroid
    dot/norms and the 6dp cosine.

    Exactness: vectors go through the ONE quantization home
    (quantized_long_form: floor(x*1e6)+1e6 — the offset keeps every
    per-dim sum positive so DIV is floor in both engines; subtracting
    the offset AFTER the integer mean recovers the signed centroid
    exactly). Per-dim centroid sums/means and all three inner products
    are pure int64 — the only float is the final scalar cosine, the
    tfidf/sqrt discipline. Headroom: c <= 2e6, c^2 * 64 dims ~ 2.6e14.

    Split assignment is the portable sha256-bucket convention keyed on
    vec_id, so the audit composes with the split-keyed document gates
    (doc_id == vec_id in this corpus).

    Scale: one corpus scan to (split, dim) partial sums (map-side
    combine, 3*64 groups), then a dim-keyed join of two 64-row centroid
    tables — nothing downstream of the first aggregate sees corpus-sized
    data.

    Reference parity: no counterpart; §2.4 drift extension.
    Registered on ROTATION_NEXT (round-10 window; post-sweep addition)."""
    e = S.quantized_long_form(_embs(spark, sf_dir))
    bucket = (
        F.conv(
            F.substring(F.sha2(F.col("vec_id").cast("string"), 256), 1, 4), 16, 10
        )
        .cast("int")
        % 100
    )
    # split tags come from the source id column directly — tagging off the
    # exploded long form would re-run the explosion for the distinct pass
    sp = _embs(spark, sf_dir).select(
        F.col("vec_id").alias("vid"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )
    cent = (
        e.join(sp, "vid")
        .groupBy("split", "d")
        .agg(F.expr("CAST(SUM(v) DIV COUNT(1) AS LONG) - 1000000").alias("c"))
    )
    a = cent.filter(F.col("split") == "train").select(
        F.col("d").alias("ad"), F.col("c").alias("ca")
    )
    b = cent.filter(F.col("split") != "train").select(
        F.col("split").alias("other_split"), "d", F.col("c").alias("cb")
    )
    agg = (
        b.join(F.broadcast(a), F.col("d") == F.col("ad"))
        .groupBy("other_split")
        .agg(
            F.sum(F.expr("ca * cb")).cast("long").alias("dot_q"),
            F.sum(F.expr("ca * ca")).cast("long").alias("n2_train"),
            F.sum(F.expr("cb * cb")).cast("long").alias("n2_other"),
        )
    )
    return agg.select(
        F.concat(F.lit("train_vs_"), F.col("other_split")).alias("pair"),
        "dot_q",
        "n2_train",
        "n2_other",
        F.round(
            F.when(
                (F.col("n2_train") > 0) & (F.col("n2_other") > 0),
                F.col("dot_q")
                / F.sqrt(F.col("n2_train").cast("double") * F.col("n2_other")),
            ).otherwise(F.lit(0.0))
            + F.lit(1e-9),
            6,
        ).alias("cos_centroid"),
    )


# --- Quality-scorer ROC-AUC against the rule label -----------------------------


@register(
    "roc_auc_quality_documents",
    """
    WITH gq AS (SELECT doc_id, ok_word_count AS y FROM ({GOPHER})),
    lq AS (SELECT doc_id, score_micro AS s FROM ({LINEAR})),
    t AS (SELECT s, CASE WHEN y THEN 1 ELSE 0 END AS is_p
          FROM gq JOIN lq USING (doc_id)),
    g AS (SELECT s, CAST(SUM(is_p) AS BIGINT) AS cp,
                 CAST(SUM(1 - is_p) AS BIGINT) AS cn,
                 CAST(COUNT(*) AS BIGINT) AS cv
          FROM t GROUP BY s),
    c AS (SELECT cp, cn, cv,
                 CAST(COALESCE(SUM(cv) OVER (ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS f_below
          FROM g),
    m AS (SELECT CAST(SUM(cp) AS BIGINT) AS np, CAST(SUM(cn) AS BIGINT) AS nn,
                 CAST(SUM(cp * (2 * f_below + cv + 1)) AS BIGINT) AS r2_p
          FROM c)
    SELECT np, nn,
           CAST(r2_p - np * (np + 1) AS BIGINT) AS u2_p,
           CAST(CASE WHEN np * nn = 0 THEN 0
                ELSE (r2_p - np * (np + 1)) * 500000 // (np * nn)
                END AS BIGINT) AS auc_ppm
    FROM m
    """,
)
def roc_auc_quality_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the linear quality score as a CLASSIFIER for the Gopher
    word-count rule — the threshold-free companion to
    cohens_kappa_quality_documents (kappa compares the two labelers at
    their shipped thresholds; AUC asks whether the continuous score
    RANKS rule-passing docs above failing ones at any threshold — the
    number a curation team reads before moving a filter cutoff).

    Exactness: AUC == Mann-Whitney U / (n_pos * n_neg), computed on the
    doubled-midrank integer lattice (mannwhitney_drift's discipline: a
    score with f_below smaller rows and cv ties has doubled average rank
    2*f_below + cv + 1), so ties in score_micro are midranked exactly
    and no float enters the gate; auc_ppm = 500000 means chance. The
    oracle embeds both scorers' registered oracle SQL (the kappa
    pattern) so the three quality gates share one definition; the
    n_pos*n_neg = 0 degenerate encodes 0 by CASE in both engines.

    Scale: two shuffle-free scorer scans, one doc_id join, one shuffle
    to the distinct-score grid, one window over that bounded grid, one
    scalar aggregate — the mannwhitney plan with a join in front.

    Reference parity: no counterpart; §2.6 curation extension.
    Registered on ROTATION_NEXT (round-10 window; post-sweep addition)."""
    gq = gopher_quality_rules_documents(spark, sf_dir).select(
        "doc_id", F.expr("CASE WHEN ok_word_count THEN 1 ELSE 0 END").alias("is_p")
    )
    lq = quality_linear_scores_documents(spark, sf_dir).select(
        "doc_id", F.col("score_micro").alias("s")
    )
    g = (
        gq.join(lq, "doc_id")
        .groupBy("s")
        .agg(
            F.sum("is_p").cast("long").alias("cp"),
            F.sum(F.expr("1 - is_p")).cast("long").alias("cn"),
            F.count(F.lit(1)).cast("long").alias("cv"),
        )
    )
    wcum = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    c = g.select(
        "cp",
        "cn",
        "cv",
        F.coalesce(F.sum("cv").over(wcum), F.lit(0)).cast("long").alias("f_below"),
    )
    m = c.agg(
        F.sum("cp").cast("long").alias("np"),
        F.sum("cn").cast("long").alias("nn"),
        F.sum(F.expr("cp * (2 * f_below + cv + 1)")).cast("long").alias("r2_p"),
    )
    return m.select(
        "np",
        "nn",
        F.expr("CAST(r2_p - np * (np + 1) AS LONG)").alias("u2_p"),
        F.expr(
            "CAST(CASE WHEN np * nn = 0 THEN 0 "
            "ELSE (r2_p - np * (np + 1)) * 500000 DIV (np * nn) END AS LONG)"
        ).alias("auc_ppm"),
    )


ORACLES["roc_auc_quality_documents"] = (
    ORACLES["roc_auc_quality_documents"]
    .replace("{GOPHER}", ORACLES["gopher_quality_rules_documents"])
    .replace("{LINEAR}", ORACLES["quality_linear_scores_documents"])
)


# --- Image perceptual near-dup (dHash over real decoded pixels) --------------


@register(
    "image_dhash_neardup",
    """
    WITH ids AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 100),
    co AS (
      SELECT media_id,
             37 + 11 * ((media_id - media_id % 2) % 13) AS a,
             5 * ((media_id - media_id % 2) % 5 + 1) AS b,
             media_id % 2 AS odd
      FROM ids
    ),
    g AS (
      SELECT media_id, i, j,
             (a * ([0,1,3,5,7,8,10,12,14][j+1]) + b * (2*i)
              + CASE WHEN odd = 1 AND i = 0 AND j = 0 THEN 128 ELSE 0 END) % 256
               AS v
      FROM co, (SELECT unnest(range(8)) AS i), (SELECT unnest(range(9)) AS j)
    ),
    h AS (
      SELECT l.media_id,
             CAST(SUM(CASE WHEN r.v > l.v THEN
                    CASE WHEN l.i*8 + l.j = 63 THEN -9223372036854775808
                         ELSE (1::BIGINT << (l.i*8 + l.j)) END
                  ELSE 0 END) AS BIGINT) AS dhash
      FROM g l JOIN g r
        ON r.media_id = l.media_id AND r.i = l.i AND r.j = l.j + 1
      WHERE l.j < 8
      GROUP BY l.media_id
    )
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
    FROM h a JOIN h b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
    """,
)
def image_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE near-duplicate detection over REAL decoded pixels: 16x16
    wrap-gradient BMPs (odd ids = planted near-dups of their even
    sibling, one perturbed pixel) are decoded by the real BMP codec, a
    64-bit perceptual dHash computed from the 8x9 downsample's
    horizontal gradient signs (operators/multimodal.py image_dhash),
    then paired with the SAME banded hamming join SimHash uses
    (operators/dedup.py hamming_band_pairs — 4 x 16-bit bands, zero
    false negatives for hamming <= 3 by pigeonhole).

    The oracle reproduces hash AND pairs in CLOSED FORM from the id
    alone (the gradient, the sampling grid, the bit packing, and an
    exact O(n^2) hamming join in SQL) — so one wrong decoded pixel, a
    misaligned sampling index, or a bit-packing sign error anywhere in
    encode/decode/hash flips the gate. This is the image-modality twin
    of text near-dup: decode -> signature -> banded join, all three
    stages shared machinery.

    Scale: pixels are touched exactly once (Arrow-batched decode);
    signatures are 16 bytes/image; the join is equi on band chunks —
    candidate volume tracks true collisions, never n^2. 100 TB of
    images reduces to a signatures table joinable on any cluster.

    Rotated into the round-6 gate window (pre-sweep addition)."""
    from app_insights_generator_spark.operators.dedup import hamming_band_pairs
    from app_insights_generator_spark.operators.multimodal import (
        image_dhash,
        synthesize_dhash_images,
    )

    ids = _docs(spark, sf_dir).filter(F.col("doc_id") < 100).select(
        F.col("doc_id").alias("media_id")
    )
    hashes = image_dhash(synthesize_dhash_images(ids, "media_id"))
    return hamming_band_pairs(hashes, "media_id", "dhash", max_hamming=3).select(
        F.col("id_a"), F.col("id_b"), F.col("hamming")
    )


# --- Audio loudness windows (real WAV PCM, exact integer statistics) ---------


@register(
    "audio_loudness_windows",
    """
    WITH ids AS (
      SELECT doc_id AS media_id, 256 * (4 + doc_id % 8) AS n
      FROM documents WHERE doc_id < 100 AND doc_id % 2 = 1
    ),
    w AS (
      SELECT media_id, n, unnest(range(n // 200)) AS w_idx FROM ids
    )
    SELECT media_id, CAST(w_idx AS BIGINT) AS w_idx,
           CAST(list_sum(list_transform(range(200),
                  t -> (((200 * w_idx + t) % 256 - 128) * 64)
                     * (((200 * w_idx + t) % 256 - 128) * 64))) AS BIGINT) AS ssq,
           CAST(list_max(list_transform(range(200),
                  t -> abs(((200 * w_idx + t) % 256 - 128) * 64))) AS BIGINT) AS peak
    FROM w
    """,
)
def audio_loudness_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO loudness profiling over REAL decoded PCM: the sawtooth WAV
    fixtures (sample_i = ((i % 256) - 128) * 64) are decoded by the real
    RIFF/WAVE codec and profiled in 200-sample windows — exact integer
    sum-of-squares (RMS^2 x window) and peak absolute sample per window
    (operators/multimodal.py audio_window_profile). The window length is
    deliberately coprime-ish to the 256-sample period so consecutive
    windows carry different phases — every row distinct, any off-by-one
    in chunk walking or sample decoding shifts a window and flips the
    gate. The oracle computes both statistics in closed form from the
    sawtooth formula (range/list_transform sums, no codec).

    Silence and clipping detection — the audio curation filters — are
    pure predicates on (ssq, peak) over this profile.

    Rotated into the round-6 gate window (pre-sweep addition)."""
    from app_insights_generator_spark.operators.multimodal import (
        audio_window_profile,
        synthesize_real_media,
    )

    ids = (
        _docs(spark, sf_dir)
        .filter((F.col("doc_id") < 100) & (F.col("doc_id") % 2 == 1))
        .select(F.col("doc_id").alias("media_id"))
    )
    media = synthesize_real_media(ids, "media_id")
    return audio_window_profile(media, "media_id", window=200)


# --- Token-distribution Gini impurity (integer-exact diversity metric) -------


@register(
    "token_gini_by_source",
    f"""
    WITH tok AS (
      SELECT source, unnest({_TOKS}) AS term
      FROM documents
    ),
    c AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tok GROUP BY source, term
    )
    SELECT source,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(1000000 - 1000000 * SUM(cnt * cnt) // (SUM(cnt) * SUM(cnt))
                AS BIGINT) AS gini_ppm
    FROM c GROUP BY source
    """,
)
def token_gini_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution Gini impurity in parts-per-million:
    1 - sum(p_i^2) over the unigram distribution — the diversity metric
    that needs NO logarithm (unlike Shannon entropy, whose float log2
    can never hash-gate across engines). sum(p^2) is computed
    cross-multiplied (sum(c^2)/n^2) so the whole statistic is exact
    int64 arithmetic; low gini = a corpus slice dominated by few tokens
    (the boilerplate smell the repetition filters catch per-document,
    measured here per-SOURCE).

    Scale: one explode + one (source, term) groupBy with map-side
    combine (the shuffle carries distinct terms, not occurrences), then
    a per-source fold over the term-count table. int64 headroom:
    sum(cnt)^2 < 8.5e18 holds to ~2.9e9 tokens per source; past that,
    compute in per-shard strata or move the two sums to DECIMAL(38).

    Rotated into the round-6 gate window (pre-sweep addition)."""
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "source", F.explode(T.tokens(F.col("text"))).alias("term")
    )
    c = tok.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    return c.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.expr(
            "CAST(1000000 - 1000000 * SUM(cnt * cnt) "
            "DIV (SUM(cnt) * SUM(cnt)) AS BIGINT)"
        ).alias("gini_ppm"),
    )


# --- Video scene-change detection (motion energy over real MP4 frames) -------


@register(
    "video_scene_changes_mp4",
    """
    WITH ids AS (
      SELECT doc_id AS media_id, 3 + doc_id % 3 AS cut
      FROM documents WHERE doc_id < 60
    ),
    g AS (
      SELECT media_id, f,
             abs(((3*x + 5*y + 11*c + 2*f
                   + (CASE WHEN f >= cut THEN 97 ELSE 0 END) + media_id) % 256)
               - ((3*x + 5*y + 11*c + 2*(f-1)
                   + (CASE WHEN f-1 >= cut THEN 97 ELSE 0 END) + media_id) % 256))
               AS d
      FROM ids,
           (SELECT unnest(range(1, 8)) AS f),
           (SELECT unnest(range(8)) AS y),
           (SELECT unnest(range(8)) AS x),
           (SELECT unnest(range(3)) AS c)
    )
    SELECT media_id, CAST(f AS INTEGER) AS frame_idx,
           CAST(SUM(d) AS BIGINT) AS energy,
           (SUM(d) >= 5000) AS is_cut
    FROM g GROUP BY media_id, f
    """,
)
def video_scene_changes_mp4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIDEO scene-change detection over REAL decoded frames: MP4s with
    a planted hard cut (frame cut = 3 + id % 3 jumps every pixel by
    +97) are parsed by the real ISO BMFF decoder, and adjacent-frame
    MOTION ENERGY — the exact integer sum of per-pixel |diff| — is the
    change statistic (operators/multimodal.py scene_change_energy). The
    energy form matters: a difference of frame brightness SUMS
    telescopes to ~0 under mod-256 wraparound for ANY uniform shift, so
    the naive statistic misses hard cuts entirely; per-pixel absolute
    energy separates within-scene drift (~770) from the cut (~23,000)
    by 30x. The oracle enumerates every pixel of every frame pair in
    closed form — decoder, frame order, and energy arithmetic all pinned.

    This is the video-modality member of the curation family: shot
    segmentation for frame-dedup and sampling (pick one frame per shot,
    not per fixed stride) is the standard pre-training video prep step.

    Scale: decode + energy are per-video (Arrow-batched, pixels never
    shuffle); output is (video, frame) rows. Registered for the
    round-7 gate window (post-sweep addition — the committed
    GATE_SWEEP_r06 window predates it)."""
    from app_insights_generator_spark.operators.multimodal import (
        scene_change_energy,
        synthesize_scene_mp4,
    )

    ids = _docs(spark, sf_dir).filter(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("media_id")
    )
    media = synthesize_scene_mp4(ids, "media_id")
    return scene_change_energy(media).withColumn(
        "is_cut", F.col("energy") >= 5000
    )


@register(
    "image_patchify_features",
    """
    WITH ids AS (
      SELECT doc_id AS media_id,
             37 + 11 * ((doc_id - doc_id % 2) % 13) AS a,
             5 * ((doc_id - doc_id % 2) % 5 + 1) AS b,
             doc_id % 2 AS odd
      FROM documents WHERE doc_id < 100
    ),
    cells AS (
      SELECT media_id, py, px, y, x,
             (a * (px * 4 + x) + b * (py * 4 + y)
              + CASE WHEN odd = 1 AND py = 0 AND px = 0 AND y = 0 AND x = 0
                     THEN 128 ELSE 0 END) % 256 AS v
      FROM ids,
           (SELECT unnest(range(4)) AS py), (SELECT unnest(range(4)) AS px),
           (SELECT unnest(range(4)) AS y), (SELECT unnest(range(4)) AS x)
    )
    SELECT media_id, CAST(py AS INTEGER) AS py, CAST(px AS INTEGER) AS px,
           CAST(SUM(v) AS BIGINT) AS r_sum,
           CAST(MIN(v) AS BIGINT) AS r_min,
           CAST(MAX(v) AS BIGINT) AS r_max
    FROM cells GROUP BY media_id, py, px
    """,
)
def image_patchify_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style PATCHIFY over real decoded pixels: the 16x16 wrap-
    gradient BMPs split into a 4x4 grid of 4x4 patches, each reported
    with exact integer R-channel sum/min/max (operators/multimodal.py
    image_patchify). The oracle enumerates every pixel of every patch in
    closed form — decode, the reshape's row/column orientation (the
    classic patchify bug is a transposed grid, which flips r_sum between
    (py,px) and (px,py)), and the odd-id perturbation landing in patch
    (0,0) only, are all pinned by the hash. Patch metadata, not pixels,
    is what flows downstream — the same metadata-over-payload discipline
    as the rest of the multimodal surface.

    Registered for the round-7 gate window (post-sweep addition)."""
    from app_insights_generator_spark.operators.multimodal import (
        image_patchify,
        synthesize_dhash_images,
    )

    ids = _docs(spark, sf_dir).filter(F.col("doc_id") < 100).select(
        F.col("doc_id").alias("media_id")
    )
    return image_patchify(synthesize_dhash_images(ids, "media_id"), patch=4)


@register(
    "image_dedup_canonical",
    """
    WITH RECURSIVE ids AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id < 100
    ),
    co AS (
      SELECT media_id,
             37 + 11 * ((media_id - media_id % 2) % 13) AS a,
             5 * ((media_id - media_id % 2) % 5 + 1) AS b,
             media_id % 2 AS odd
      FROM ids
    ),
    g AS (
      SELECT media_id, i, j,
             (a * ([0,1,3,5,7,8,10,12,14][j+1]) + b * (2*i)
              + CASE WHEN odd = 1 AND i = 0 AND j = 0 THEN 128 ELSE 0 END) % 256
               AS v
      FROM co, (SELECT unnest(range(8)) AS i), (SELECT unnest(range(9)) AS j)
    ),
    h AS (
      SELECT l.media_id,
             CAST(SUM(CASE WHEN r.v > l.v THEN
                    CASE WHEN l.i*8 + l.j = 63 THEN -9223372036854775808
                         ELSE (1::BIGINT << (l.i*8 + l.j)) END
                  ELSE 0 END) AS BIGINT) AS dhash
      FROM g l JOIN g r
        ON r.media_id = l.media_id AND r.i = l.i AND r.j = l.j + 1
      WHERE l.j < 8
      GROUP BY l.media_id
    ),
    truth AS (
      SELECT a.media_id AS id_a, b.media_id AS id_b
      FROM h a JOIN h b ON a.media_id < b.media_id
      WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM truth
      UNION
      SELECT id_b AS src, id_a AS dst FROM truth
    ),
    walk(node, comp) AS (
      SELECT media_id, media_id FROM ids
      UNION
      SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.node
    )
    SELECT node AS media_id, MIN(comp) AS component,
           (node = MIN(comp)) AS is_canonical
    FROM walk GROUP BY node
    """,
)
def image_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END image deduplication: real BMP decode -> dHash ->
    banded hamming join -> connected components (hash-min propagation,
    the SAME operator text dedup uses) -> canonical selection (min id
    per duplicate cluster). This is the complete 100 TB image-dedup
    pipeline as one composition of already-gated stages — pixels are
    touched once, signatures shuffle once, and the keep/drop verdict is
    one boolean per image. The oracle recomputes hashes, the exact pair
    set, AND the transitive closure declaratively (recursive CTE), so a
    drift anywhere in the four-stage chain flips the gate.

    Registered for the round-7 gate window (post-sweep addition)."""
    from app_insights_generator_spark.operators.dedup import (
        connected_components,
        hamming_band_pairs,
    )
    from app_insights_generator_spark.operators.multimodal import (
        image_dhash,
        synthesize_dhash_images,
    )

    ids = _docs(spark, sf_dir).filter(F.col("doc_id") < 100).select(
        F.col("doc_id").alias("media_id")
    )
    hashes = image_dhash(synthesize_dhash_images(ids, "media_id"))
    pairs = hamming_band_pairs(hashes, "media_id", "dhash", max_hamming=3)
    comp = connected_components(pairs, ids, "media_id")
    return comp.select(
        F.col("media_id"),
        F.col("component"),
        (F.col("media_id") == F.col("component")).alias("is_canonical"),
    )


@register(
    "audio_decimate_wav",
    """
    WITH ids AS (
      SELECT doc_id AS media_id, 256 * (4 + doc_id % 8) AS n
      FROM documents WHERE doc_id < 100 AND doc_id % 2 = 1
    )
    SELECT media_id,
           CAST(2000 AS INTEGER) AS rate_out,
           CAST((n + 3) // 4 AS BIGINT) AS n_samples,
           CAST(list_sum(list_transform(range((n + 3) // 4),
                  t -> ((4 * t % 256 - 128) * 64) * ((4 * t % 256 - 128) * 64)))
                AS BIGINT) AS ssq,
           CAST(list_max(list_transform(range((n + 3) // 4),
                  t -> abs((4 * t % 256 - 128) * 64))) AS BIGINT) AS peak
    FROM ids
    """,
)
def audio_decimate_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio RESAMPLING (integer 4x decimation) through a full real
    codec round trip: sawtooth WAVs are decoded, strided, re-encoded at
    2 kHz, decoded again, and profiled — the oracle predicts the count
    (ceil(n/4): the stride keeps sample 0), exact sum of squares, and
    peak of the decimated signal in closed form. Together with
    audio_loudness_windows (windowed profile) and the silence/clipping
    predicates this completes the audio prep surface: decode, profile,
    resample — each stage exact-integer and gate-pinned.

    Registered for the round-7 gate window (post-sweep addition)."""
    from app_insights_generator_spark.operators.multimodal import (
        audio_decimate,
        synthesize_real_media,
    )

    ids = (
        _docs(spark, sf_dir)
        .filter((F.col("doc_id") < 100) & (F.col("doc_id") % 2 == 1))
        .select(F.col("doc_id").alias("media_id"))
    )
    return audio_decimate(synthesize_real_media(ids, "media_id"), factor=4)


# --- PMI collocations (pointwise mutual information over word bigrams) --------


@register(
    "pmi_collocations_documents",
    r"""
    WITH toks AS (
      SELECT string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    bg AS (
      SELECT t[i] AS w1, t[i+1] AS w2
      FROM toks, unnest(range(1, len(t))) AS u(i)
      WHERE len(t) >= 2
    ),
    cnt AS (SELECT w1, w2, COUNT(*) AS n_xy FROM bg GROUP BY w1, w2),
    m1 AS (SELECT w1, CAST(SUM(n_xy) AS BIGINT) AS c1 FROM cnt GROUP BY w1),
    m2 AS (SELECT w2, CAST(SUM(n_xy) AS BIGINT) AS c2 FROM cnt GROUP BY w2),
    tot AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n FROM cnt)
    SELECT w1, w2, n_xy,
           n_xy * n * 1000000 // (c1 * c2) AS pmi_ppm
    FROM cnt JOIN m1 USING (w1) JOIN m2 USING (w2) CROSS JOIN tot
    WHERE n_xy >= 5
    """,
)
def pmi_collocations_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information over adjacent
    word pairs: PMI = log(P(xy) / (P(x·)P(·y))) reported as the exact
    integer ratio n_xy*N*1e6 DIV (c1*c2) (log is monotone, so the ppm
    ratio ranks identically and hashes identically across engines).
    Marginals use the directional convention — c1 = bigrams STARTING
    with w1, c2 = bigrams ENDING with w2 — the standard bigram PMI
    estimator.

    Plan economics: ONE pass over the corpus builds the bigram counts
    (explode + groupBy with map-side combine); both marginals and the
    grand total are re-aggregations of that vocab²-bounded count table,
    never of the corpus, and the final assembly is broadcast joins of
    vocab-sized sides. int64 headroom: n_xy*N*1e6 ~ 9e16 at sf0.1 for a
    degenerate single-pair corpus; a real 1e9-bigram corpus needs the
    scale constant dropped to 1e3 or DECIMAL — same discipline as
    bm25_documents.

    Registered for the round-7 gate window (post-sweep addition)."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(T.tokens(F.col("text")).alias("t")).filter(F.size("t") >= 2)
    bg = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at("t", i).alias("w1"),
                    F.element_at("t", i + 1).alias("w2"),
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    cnt = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_xy"))
    m1 = cnt.groupBy("w1").agg(F.sum("n_xy").alias("c1"))
    m2 = cnt.groupBy("w2").agg(F.sum("n_xy").alias("c2"))
    tot = cnt.agg(F.sum("n_xy").alias("n"))
    return (
        cnt.join(F.broadcast(m1), "w1")
        .join(F.broadcast(m2), "w2")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n_xy") >= 5)
        .select(
            "w1",
            "w2",
            "n_xy",
            F.expr("n_xy * n * 1000000 DIV (c1 * c2)").alias("pmi_ppm"),
        )
    )


# --- applyInArrow grouped map (per-source adaptive histogram) ------------------


@register(
    "arrow_adaptive_histogram_documents",
    """
    WITH ext AS (
      SELECT source, MIN(n_chars) AS lo, MAX(n_chars) AS hi
      FROM documents GROUP BY source
    ),
    b AS (
      SELECT d.source AS source,
             (d.n_chars - e.lo) // ((e.hi - e.lo) // 10 + 1) AS bin,
             e.lo + ((d.n_chars - e.lo) // ((e.hi - e.lo) // 10 + 1))
                  * ((e.hi - e.lo) // 10 + 1) AS bin_lo
      FROM documents d JOIN ext e USING (source)
    )
    SELECT source, bin, bin_lo, COUNT(*) AS n_docs
    FROM b GROUP BY source, bin, bin_lo
    """,
)
def arrow_adaptive_histogram_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().applyInArrow (SPARK-46253): per-source ADAPTIVE-width
    length histogram — bin width derives from each group's own min/max,
    which SQL needs a second pass over the fact table for (the oracle's
    extent-join), but the Arrow grouped map computes in one columnar
    scan of the group it already holds: pc.min_max, integer divide,
    value_counts, straight on the transferred buffers with no pandas
    materialization (operators/arrowgroup.py). All arithmetic is int64,
    so both engines hash identically.

    Registered for the round-7 gate window (post-sweep addition)."""
    from app_insights_generator_spark.operators.arrowgroup import (
        adaptive_histogram_by_source,
    )

    docs = _docs(spark, sf_dir).select("source", "n_chars")
    return adaptive_histogram_by_source(docs)


# --- int8 embedding quantization ------------------------------------------------


@register(
    "quantize_embeddings_int8",
    """
    WITH q AS (
      SELECT vec_id,
             CAST(list_min(embedding) AS DOUBLE) AS mn,
             CAST(list_max(embedding) AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE)
               AS d,
             embedding
      FROM embeddings
    ),
    qq AS (
      SELECT vec_id,
             CAST(FLOOR(d * 1000000) AS BIGINT) AS scale_micro,
             CASE WHEN d = 0
                  THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(embedding,
                         x -> CAST(FLOOR((CAST(x AS DOUBLE) - mn) * 255 / d)
                                   AS BIGINT))
             END AS qv
      FROM q
    )
    SELECT vec_id, scale_micro,
           CAST(list_sum(qv) AS BIGINT) AS sum_q,
           CAST(list_min(qv) AS BIGINT) AS q_min,
           CAST(list_max(qv) AS BIGINT) AS q_max
    FROM qq
    """,
)
def quantize_embeddings_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric per-vector int8 quantization — the 4x storage/bandwidth
    cut every 100 TB embedding pipeline applies before ANN indexing:
    q_i = floor((v_i - min) * 255 / (max - min)) with the per-vector
    range as the dequantization scale (emitted in micro-units). The gate
    hashes the quantized summary (sum/min/max of codes + scale), which
    pins every code: float32 inputs are cast to DOUBLE before any
    arithmetic in BOTH engines (float->double is exact; mixed-precision
    promotion rules are not), and the remaining ops are the same IEEE
    double sequence in both, so floor() lands identically — the
    ratio-of-exact-inputs determinism rule applied to floats. Constant
    vectors (range 0) quantize to all-zero codes by the d=0 guard, not
    by a 0/0 NaN.

    Plan: a pure projection — per-row higher-order functions, zero
    exchanges, codegen'd JVM-side; nothing about it changes at any
    scale.

    Registered for the round-7 gate window (post-sweep addition)."""
    q = _embs(spark, sf_dir).select(
        "vec_id",
        F.expr("CAST(array_min(embedding) AS DOUBLE)").alias("mn"),
        F.expr(
            "CAST(array_max(embedding) AS DOUBLE)"
            " - CAST(array_min(embedding) AS DOUBLE)"
        ).alias("d"),
        "embedding",
    )
    qq = q.select(
        "vec_id",
        F.expr("CAST(FLOOR(d * 1000000) AS BIGINT)").alias("scale_micro"),
        F.expr(
            "CASE WHEN d = 0"
            " THEN transform(embedding, x -> CAST(0 AS BIGINT))"
            " ELSE transform(embedding,"
            " x -> CAST(FLOOR((CAST(x AS DOUBLE) - mn) * 255 / d) AS BIGINT))"
            " END"
        ).alias("qv"),
    )
    return qq.select(
        "vec_id",
        "scale_micro",
        F.expr("CAST(aggregate(qv, 0L, (a, x) -> a + x) AS BIGINT)").alias("sum_q"),
        F.expr("CAST(array_min(qv) AS BIGINT)").alias("q_min"),
        F.expr("CAST(array_max(qv) AS BIGINT)").alias("q_max"),
    )


@register(
    "sq8_adc_search_embeddings",
    f"""
    WITH eall AS (
      SELECT vid, d, CAST(floor(x * {_KM_SCALE}) AS BIGINT) + {_KM_OFF} AS v
      FROM (SELECT vec_id AS vid, generate_subscripts(embedding, 1) AS d,
                   unnest(embedding::DOUBLE[]) AS x
            FROM embeddings)
    ),
    stats AS (SELECT d, MIN(v) AS vmin, MAX(v) AS vmax FROM eall GROUP BY d),
    recon AS (
      SELECT e.vid, e.d,
             s.vmin + (CASE WHEN s.vmax = s.vmin THEN 0
                            ELSE ((e.v - s.vmin) * 255) // (s.vmax - s.vmin)
                       END * (s.vmax - s.vmin)) // 255 AS rv
      FROM eall e JOIN stats s USING (d)
    ),
    q AS (SELECT d, v AS qv FROM eall WHERE vid = 0),
    sq8 AS (
      SELECT r.vid, CAST(SUM((r.rv - q.qv) * (r.rv - q.qv)) AS BIGINT)
               AS sq8_dist
      FROM recon r JOIN q USING (d) WHERE r.vid <> 0 GROUP BY r.vid
    ),
    exact AS (
      SELECT e.vid, CAST(SUM((e.v - q.qv) * (e.v - q.qv)) AS BIGINT)
               AS exact_dist
      FROM eall e JOIN q USING (d) WHERE e.vid <> 0 GROUP BY e.vid
    ),
    ranked AS (
      SELECT exact.vid, exact_dist, sq8_dist,
             ROW_NUMBER() OVER (ORDER BY exact_dist, exact.vid) AS exact_rank,
             ROW_NUMBER() OVER (ORDER BY sq8_dist, exact.vid) AS sq8_rank
      FROM exact JOIN sq8 ON sq8.vid = exact.vid
    )
    SELECT vid AS vec_id, exact_dist, sq8_dist, exact_rank, sq8_rank
    FROM ranked WHERE exact_rank <= 10
    """,
)
def sq8_adc_search_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR QUANTIZATION search — the other classical ANN compression
    next to PQ (the SQ8 index family in public FAISS): every dimension
    learns one per-CORPUS [min, max] range, codes are the 8-bit level
    `(v - min_d) * 255 div (max_d - min_d)`, and search is asymmetric —
    the query keeps its exact values while each candidate is
    reconstructed from its codes (`min_d + code * range_d div 255`).
    This completes the encode->search symmetry the PQ family already
    has (pq_codes / pq_adc_search): quantize_embeddings_int8 is the
    per-VECTOR encode summary; this is the per-DIMENSION codebook with
    the search half. Gated exactly like pq_adc_search: the exact
    integer-quantized top-10 is the truth anchor, each neighbor rides
    with its SQ8 distance and SQ8 rank, so the stats table, every code,
    every reconstruction, and both rankings hash bit-for-bit; the
    exact-vs-SQ8 rank gap IS the measured 8-bit quantization cost. All
    arithmetic is integer on the shared fixed-point grid
    (quantized_long_form), and every numerator is non-negative so
    Spark's truncating `div` and DuckDB's flooring `//` agree.

    Plan: the stats table is 64 rows (one groupBy over the long form,
    then broadcast); encode+reconstruct is one map pass; the scan side
    touches codes only — at 100 TB the corpus is stored as int8 codes
    (4x bandwidth cut) and the per-dim stats ride in the index
    metadata, exactly the SQ8 serving shape. The exact side is the
    deliberate O(n) truth anchor (same posture as cosine_topk /
    pq_adc_search).

    Registered post-round-12-sweep; on ROTATION_NEXT for the r13 window."""
    from app_insights_generator_spark.operators.similarity import (
        quantized_long_form,
    )

    e_all = quantized_long_form(_embs(spark, sf_dir), "vec_id", "embedding",
                                _KM_SCALE, _KM_OFF)
    stats = e_all.groupBy("d").agg(
        F.min("v").alias("vmin"), F.max("v").alias("vmax")
    )
    recon = e_all.join(F.broadcast(stats), "d").select(
        "vid",
        "d",
        F.expr(
            "vmin + (CASE WHEN vmax = vmin THEN 0L"
            " ELSE ((v - vmin) * 255) DIV (vmax - vmin) END"
            " * (vmax - vmin)) DIV 255"
        ).alias("rv"),
    )
    q = e_all.filter(F.col("vid") == 0).select("d", F.col("v").alias("qv"))
    sq8 = (
        recon.filter(F.col("vid") != 0)
        .join(F.broadcast(q), "d")
        .groupBy("vid")
        .agg(F.sum(F.expr("(rv - qv) * (rv - qv)")).cast("long").alias("sq8_dist"))
    )
    exact = (
        e_all.filter(F.col("vid") != 0)
        .join(F.broadcast(q), "d")
        .groupBy("vid")
        .agg(F.sum(F.expr("(v - qv) * (v - qv)")).cast("long").alias("exact_dist"))
    )
    ranked = exact.join(sq8, "vid").select(
        "vid",
        "exact_dist",
        "sq8_dist",
        F.row_number().over(Window.orderBy("exact_dist", "vid")).alias("exact_rank"),
        F.row_number().over(Window.orderBy("sq8_dist", "vid")).alias("sq8_rank"),
    )
    return ranked.filter(F.col("exact_rank") <= 10).select(
        F.col("vid").alias("vec_id"),
        "exact_dist",
        "sq8_dist",
        "exact_rank",
        "sq8_rank",
    )


@register(
    "matryoshka_prefix_recall_embeddings",
    f"""
    WITH eall AS (
      SELECT vid, d, CAST(floor(x * {_KM_SCALE}) AS BIGINT) + {_KM_OFF} AS v
      FROM (SELECT vec_id AS vid, generate_subscripts(embedding, 1) AS d,
                   unnest(embedding::DOUBLE[]) AS x
            FROM embeddings)
    ),
    q AS (SELECT d, v AS qv FROM eall WHERE vid = 0),
    sq AS (
      SELECT e.vid, e.d, (e.v - q.qv) * (e.v - q.qv) AS sqd
      FROM eall e JOIN q USING (d) WHERE e.vid <> 0
    ),
    dists AS (
      SELECT vid,
             CAST(SUM(sqd) AS BIGINT) AS full_dist,
             CAST(SUM(CASE WHEN d <= 16 THEN sqd ELSE 0 END) AS BIGINT)
               AS p16_dist,
             CAST(SUM(CASE WHEN d <= 32 THEN sqd ELSE 0 END) AS BIGINT)
               AS p32_dist
      FROM sq GROUP BY vid
    ),
    ranked AS (
      SELECT vid, full_dist, p16_dist, p32_dist,
             ROW_NUMBER() OVER (ORDER BY full_dist, vid) AS full_rank,
             ROW_NUMBER() OVER (ORDER BY p16_dist, vid) AS p16_rank,
             ROW_NUMBER() OVER (ORDER BY p32_dist, vid) AS p32_rank
      FROM dists
    )
    SELECT vid AS vec_id, full_dist, p16_dist, p32_dist,
           full_rank, p16_rank, p32_rank
    FROM ranked WHERE full_rank <= 10
    """,
)
def matryoshka_prefix_recall_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MATRYOSHKA over-fetch audit (Kusupati et al. 2022, "Matryoshka
    Representation Learning") — the DESIGN-PARAMETER companion to
    matryoshka_recall_embeddings: that query reports recall@10 of a
    single prefix tier (16 dims, cosine, 20-query panel), which decides
    WHETHER a prefix tier is viable; this one reports, for the exact
    full-width top-10 of one query, each true neighbor's prefix-16 AND
    prefix-32 distances and RANKS — which decides HOW a staged funnel
    must be sized: the max prefix rank within the true top-10 IS the
    over-fetch factor the shortlist needs at that width, and the
    p16→p32 rank contraction measures nesting monotonicity across two
    widths (recall@k at one width cannot answer either). Also a
    different ranking space on purpose — squared L2 on the shared
    fixed-point integer grid (bit-exact, no rounded-cosine bias recipe
    needed). One scan computes all three distances as conditional sums
    over the shared (vid, d, squared-delta) long form — the prefixes
    are free once the full distance is being accumulated. Spark's
    0-based posexplode dims and DuckDB's 1-based generate_subscripts
    both select exactly the first 16/32 dimensions.

    Plan: one broadcast of the 64-row query slice, one groupBy(vid)
    with three conditional partial aggregates — map-side combined, no
    extra exchange vs the plain exact top-k; the global top-10 window
    ranks a corpus-sized but 4-column-narrow table. At 100 TB the
    shortlist side runs at prefix width against an int8/PQ code store
    and only the ~2-3x over-fetched shortlist touches full vectors.

    Registered post-round-12-sweep; on ROTATION_NEXT for the r13 window."""
    from app_insights_generator_spark.operators.similarity import (
        quantized_long_form,
    )

    e_all = quantized_long_form(_embs(spark, sf_dir), "vec_id", "embedding",
                                _KM_SCALE, _KM_OFF)
    q = e_all.filter(F.col("vid") == 0).select("d", F.col("v").alias("qv"))
    sq = (
        e_all.filter(F.col("vid") != 0)
        .join(F.broadcast(q), "d")
        .select("vid", "d", F.expr("(v - qv) * (v - qv)").alias("sqd"))
    )
    dists = sq.groupBy("vid").agg(
        F.sum("sqd").cast("long").alias("full_dist"),
        F.sum(F.when(F.col("d") < 16, F.col("sqd")).otherwise(F.lit(0)))
        .cast("long")
        .alias("p16_dist"),
        F.sum(F.when(F.col("d") < 32, F.col("sqd")).otherwise(F.lit(0)))
        .cast("long")
        .alias("p32_dist"),
    )
    ranked = dists.select(
        "vid",
        "full_dist",
        "p16_dist",
        "p32_dist",
        F.row_number().over(Window.orderBy("full_dist", "vid")).alias("full_rank"),
        F.row_number().over(Window.orderBy("p16_dist", "vid")).alias("p16_rank"),
        F.row_number().over(Window.orderBy("p32_dist", "vid")).alias("p32_rank"),
    )
    return ranked.filter(F.col("full_rank") <= 10).select(
        F.col("vid").alias("vec_id"),
        "full_dist",
        "p16_dist",
        "p32_dist",
        "full_rank",
        "p16_rank",
        "p32_rank",
    )


@register(
    "dedup_components_star_documents",
    f"""
    WITH RECURSIVE {_JACCARD_ALL_PAIRS_CTES},
    truth AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.5),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM truth
      UNION
      SELECT id_b AS src, id_a AS dst FROM truth
    ),
    walk(node, comp) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.node
    )
    SELECT node AS doc_id, MIN(comp) AS component FROM walk GROUP BY node
    """,
    tier="sf0.01",
)
def dedup_components_star_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by ALTERNATING LARGE-STAR/SMALL-STAR
    contraction (Kiveris et al. 2014, operators/graph.py
    connected_components_star) over the same MinHash pair graph as
    dedup_components_documents — output-identical by construction (same
    recursive-closure oracle, same hash), different convergence law:
    rounds = O(log n) in OBSERVED graph size vs hash-min's O(diameter).
    Dedup clusters are shallow, so hash-min wins there; a 100 TB
    arbitrary-topology graph (web graphs, long chains) needs this
    variant — the diameter-vs-log crossover is pinned on a 200-node path
    in tests/test_graph.py (star: 6 rounds; hash-min: budget-limited at
    200).

    Registered for the round-7 gate window (post-sweep addition)."""
    from app_insights_generator_spark.operators.graph import connected_components_star

    docs = _docs(spark, sf_dir)
    pairs = D.near_dedup_minhash(docs, "doc_id", "text", shingle_n=3, threshold=0.5)
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    return connected_components_star(edges, docs, "doc_id")


# --- Deterministic negative sampling for contrastive training -------------------


@register(
    "negative_samples_embeddings",
    """
    WITH n AS (SELECT COUNT(*) AS n_vecs FROM embeddings),
    cand AS (
      SELECT a.vec_id, a.label AS anchor_label, j.j AS j,
             (a.vec_id * 2654435761 + j.j * 40503 + 7) % n.n_vecs AS neg_id
      FROM embeddings a
      CROSS JOIN n
      CROSS JOIN (SELECT unnest(range(0, 4)) AS j) j
    )
    SELECT c.vec_id, c.j, c.neg_id,
           CASE WHEN c.neg_id <> c.vec_id AND b.label <> c.anchor_label
                THEN 1 ELSE 0 END AS is_valid
    FROM cand c JOIN embeddings b ON b.vec_id = c.neg_id
    """,
)
def negative_samples_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: k=4
    candidate negatives per anchor from a HASH sequence over the dense
    id space ((id*Knuth + j*stride + 7) mod N) instead of an RNG — the
    repo's zero-randomness sampling rule (train/val split, PPS,
    systematic samplers) applied to the contrastive-pairs shape, so the
    drawn pairs are reproducible across runs, engines, partitionings,
    and retries (an RNG-sampled training set is unauditable). Candidates
    colliding with the anchor or sharing its label are flagged invalid
    (label lookup via one id-equi-join) rather than silently resampled —
    the downstream loss masks them, keeping the per-anchor count exact.

    Plan: pure projection + explode + one equi-join on the id (broadcast
    when the vector table is dim-only; shuffle hash at corpus scale) —
    no RNG state, no skew (hash sequence is uniform mod N).

    Registered for the round-7 gate window (post-sweep addition)."""
    embs = _embs(spark, sf_dir).select("vec_id", "label")
    # lazy twin of the oracle's CROSS JOIN n: no eager driver count() job
    n = embs.agg(F.count(F.lit(1)).alias("n_vecs"))
    cand = (
        embs.select(
            "vec_id",
            F.col("label").alias("anchor_label"),
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j"),
        )
        .crossJoin(F.broadcast(n))
        .select(
            "vec_id",
            "anchor_label",
            "j",
            F.expr("(vec_id * 2654435761 + j * 40503 + 7) % n_vecs").alias("neg_id"),
        )
    )
    b = embs.select(F.col("vec_id").alias("neg_id"), F.col("label").alias("neg_label"))
    return cand.join(b, "neg_id").select(
        "vec_id",
        "j",
        "neg_id",
        F.expr(
            "CASE WHEN neg_id <> vec_id AND neg_label <> anchor_label"
            " THEN 1 ELSE 0 END"
        ).alias("is_valid"),
    )


# --- Hard-negative mining (top similar, different label) -------------------------


@register(
    "hard_negatives_embeddings",
    """
    WITH a AS (SELECT vec_id AS a_id, label AS a_label,
                      embedding::DOUBLE[] AS av
               FROM embeddings WHERE vec_id < 20),
    c AS (SELECT vec_id AS n_id, label AS n_label,
                 embedding::DOUBLE[] AS nv
          FROM embeddings),
    s AS (
      SELECT a_id, n_id,
             ROUND(CASE WHEN sqrt(list_dot_product(av, av))
                             * sqrt(list_dot_product(nv, nv)) > 0
                   THEN list_dot_product(av, nv)
                        / (sqrt(list_dot_product(av, av))
                           * sqrt(list_dot_product(nv, nv)))
                   ELSE 0.0 END + 1e-9, 6) AS cos_sim
      FROM a, c
      WHERE n_id <> a_id AND n_label <> a_label
    ),
    r AS (SELECT a_id, n_id, cos_sim,
                 ROW_NUMBER() OVER (PARTITION BY a_id
                                    ORDER BY cos_sim DESC, n_id) AS rn
          FROM s)
    SELECT a_id, n_id, cos_sim, rn FROM r WHERE rn <= 3
    """,
)
def hard_negatives_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-negative mining for contrastive training: per anchor, the 3
    most-similar vectors with a DIFFERENT label — the negatives that
    actually move a contrastive loss (random negatives, see
    negative_samples_embeddings, are mostly easy). Ranking is by the
    ROUNDED similarity with id tie-break in BOTH engines, so rounding
    can never reorder across the hash.

    The gated form scans anchors×corpus exactly with a bounded anchor
    set (20) — cost is anchors·N, the same truth-anchor posture as
    oracle_exact_cosine_pairs. The 100 TB path swaps the exact scan for
    the IVF/LSH candidate generation already gated (ann_topk_ivf /
    similarity_join_lsh) and keeps THIS ranking+label-filter stage
    unchanged — mining quality then degrades only by ANN recall, which
    ann_recall_ivf_embeddings measures (4900bp@10).

    Registered for the round-7 gate window (post-sweep addition)."""
    embs = _embs(spark, sf_dir)
    anchors = embs.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_label"),
        F.col("embedding").alias("av"),
    )
    corpus = embs.select(
        F.col("vec_id").alias("n_id"),
        F.col("label").alias("n_label"),
        F.col("embedding").alias("nv"),
    )
    s = (
        corpus.crossJoin(F.broadcast(anchors))
        .filter((F.col("n_id") != F.col("a_id")) & (F.col("n_label") != F.col("a_label")))
        .select(
            "a_id",
            "n_id",
            F.round(S.cosine(F.col("av"), F.col("nv")) + 1e-9, 6).alias("cos_sim"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("a_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    )
    return s.withColumn("rn", rn).filter(F.col("rn") <= 3)


# --- Curriculum ordering + tokenizer fertility ----------------------------------


@register(
    "curriculum_order_documents",
    f"""
    WITH scored AS (
      SELECT doc_id,
             ROUND({_quality_score_sql()} + 1e-9, 1) AS q
      FROM documents
    ),
    deciled AS (
      SELECT doc_id, q,
             NTILE(10) OVER (ORDER BY q, doc_id) AS decile
      FROM scored
    ),
    pos AS (
      SELECT doc_id, decile,
             ROW_NUMBER() OVER (PARTITION BY decile ORDER BY doc_id) AS pos
      FROM deciled
    )
    SELECT doc_id, CAST(decile AS BIGINT) AS decile, pos,
           (pos - 1) * 10 + (decile - 1) AS curriculum_rank
    FROM pos
    WHERE (pos - 1) * 10 + (decile - 1) < 200
    """,
)
def curriculum_order_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-preserving curriculum order: documents are quality-deciled
    (NTILE over rounded score with doc_id tie-break — the equidepth
    discipline) and then ROUND-ROBIN interleaved across deciles, so any
    prefix of the training order carries the full quality distribution —
    the property a naive quality-sorted order destroys (the model sees
    only boilerplate for the first epoch chunk). Rank arithmetic is pure
    integers; the first 200 slots are gated.

    Plan: one pass to score (scalar expressions), the two windows run on
    (score, id) pairs — at 100 TB the global NTILE becomes the
    pre-aggregated-histogram decile assignment that
    length_percentiles_by_source already demonstrates; the interleave
    stays a projection.

    Registered for the round-7 gate window (post-sweep addition)."""
    docs = _docs(spark, sf_dir)
    scored = docs.select(
        "doc_id",
        F.round(T.quality_score(F.col("text")) + 1e-9, 1).alias("q"),
    )
    deciled = scored.withColumn(
        "decile", F.ntile(10).over(Window.orderBy("q", "doc_id"))
    )
    pos = deciled.withColumn(
        "pos", F.row_number().over(Window.partitionBy("decile").orderBy("doc_id"))
    )
    return pos.select(
        "doc_id",
        F.col("decile").cast("long").alias("decile"),
        "pos",
        F.expr("(pos - 1) * 10 + (decile - 1)").alias("curriculum_rank"),
    ).filter(F.col("curriculum_rank") < 200)


@register(
    "tokenizer_fertility_documents",
    r"""
    SELECT lang,
           CAST(SUM(len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS n_bpe,
           CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS n_words,
           CAST(SUM(len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) * 10000
             // CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT)
             AS fertility_bp
    FROM documents
    GROUP BY lang
    """,
)
def tokenizer_fertility_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY by language — subword tokens per whitespace
    word in basis points, the standard multilingual-tokenizer health
    metric (high fertility = a language pays more sequence length per
    word, i.e. gets less context and more compute per sentence). Uses
    the repo's BPE-ish pre-tokenization (letter runs / digit runs /
    single symbols) against single-space word splits; exact integer
    sums + DIV, one aggregation pass, |langs| output rows.

    Registered for the round-7 gate window (post-sweep addition)."""
    docs = _docs(spark, sf_dir)
    per = docs.select(
        "lang",
        T.bpe_token_count(F.col("text")).cast("long").alias("b"),
        F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("w"),
    )
    return per.groupBy("lang").agg(
        F.sum("b").alias("n_bpe"),
        F.sum("w").alias("n_words"),
        F.expr("SUM(b) * 10000 DIV SUM(w)").alias("fertility_bp"),
    )


# --- Product quantization (PQ) codes ---------------------------------------------

_PQ_M, _PQ_SUBDIM, _PQ_K = 4, 16, 4


def _pq_sub_ctes(s: int) -> str:
    """One subspace's namespaced unrolled k-means chain (the EXACT
    _km_iter_cte recurrence, prefixed s{s}_): slice dims [16s+1, 16s+16],
    k=4 codewords, 2 Lloyd iterations, init = k lowest vids, plus the
    FINAL re-assignment {p}af vs the post-update codebook so emitted
    codes index the codebook they ship with."""
    lo, hi = _PQ_SUBDIM * s + 1, _PQ_SUBDIM * (s + 1)
    p = f"s{s}_"
    out = [
        f"{p}e AS (SELECT vid, d, v FROM eall WHERE d BETWEEN {lo} AND {hi})",
        f"""{p}init AS (
      SELECT vid, ROW_NUMBER() OVER (ORDER BY vid) - 1 AS cid
      FROM (SELECT DISTINCT vid FROM {p}e ORDER BY vid LIMIT {_PQ_K}))""",
        f"{p}c0 AS (SELECT i.cid, e.d, e.v FROM {p}e e JOIN {p}init i USING (vid))",
        _km_iter_cte(1, p, f"{p}e"),
        _km_iter_cte(2, p, f"{p}e"),
        _km_final_assign_cte(p, f"{p}e", f"{p}c2"),
    ]
    return ",\n    ".join(out)


@register(
    "pq_codes_embeddings",
    f"""
    WITH eall AS (
      SELECT vid, d, CAST(floor(x * {_KM_SCALE}) AS BIGINT) + {_KM_OFF} AS v
      FROM (SELECT vec_id AS vid, generate_subscripts(embedding, 1) AS d,
                   unnest(embedding::DOUBLE[]) AS x
            FROM embeddings)
    ),
    {_pq_sub_ctes(0)},
    {_pq_sub_ctes(1)},
    {_pq_sub_ctes(2)},
    {_pq_sub_ctes(3)}
    SELECT s0_af.vid AS vec_id,
           s0_af.cid AS code0, s1_af.cid AS code1,
           s2_af.cid AS code2, s3_af.cid AS code3,
           CAST(s0_af.dist + s1_af.dist + s2_af.dist + s3_af.dist AS BIGINT)
             AS q_dist
    FROM s0_af JOIN s1_af USING (vid) JOIN s2_af USING (vid)
    JOIN s3_af USING (vid)
    """,
)
def pq_codes_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT QUANTIZATION (Jégou et al. 2011) — the compression behind
    billion-scale ANN: the 64-dim space splits into 4 independent
    16-dim subspaces, each learns its own k-means codebook (here k=4
    for a gateable toy codebook; production uses 256 = one byte per
    subspace), and every vector is stored as its 4-tuple of codeword
    ids plus the exact integer quantization distortion. Everything
    reuses the ENGINE-EXACT distributed Lloyd's machinery
    (operators/similarity.py kmeans_fixed_point) run once per subspace
    over sliced vectors, so the full PQ fit + assignment unrolls into
    chained SQL CTEs (four namespaced copies of the
    kmeans_clusters_embeddings oracle) and hashes bit-for-bit.

    Scale: the 4 subspace fits are independent (pipeline-able); per fit
    the cost is the kmeans broadcast-join recurrence on a 16-dim slice
    — a quarter of the full-space work each. Storage story: 64 floats
    -> 4 small ints (with int8/scale in quantize_embeddings_int8, the
    other half of the compression toolkit); ADC search then scans
    codes, not vectors.

    Registered for the round-7 gate window (post-sweep addition)."""
    from app_insights_generator_spark.operators.similarity import (
        assign_to_centroids,
        kmeans_fixed_point,
        quantized_long_form,
    )

    embs = _embs(spark, sf_dir)
    parts = []
    for s in range(_PQ_M):
        sliced = embs.select(
            "vec_id",
            F.expr(
                f"slice(embedding, {_PQ_SUBDIM * s + 1}, {_PQ_SUBDIM})"
            ).alias("sub"),
        )
        _assign, cent = kmeans_fixed_point(
            sliced, "vec_id", "sub", k=_PQ_K, n_iter=2,
            scale=_KM_SCALE, offset=_KM_OFF,
        )
        # FINAL re-assignment vs the post-update codebook: the codes must
        # index the codebook they ship with (kmeans' in-loop assignment
        # is vs the previous centroids — r06 review finding)
        codes = assign_to_centroids(
            quantized_long_form(sliced, "vec_id", "sub", _KM_SCALE, _KM_OFF),
            cent,
        )
        parts.append(
            codes.select(
                F.col("vid"),
                F.col("cid").alias(f"code{s}"),
                F.col("dist").alias(f"_d{s}"),
            )
        )
    joined = parts[0]
    for p in parts[1:]:
        joined = joined.join(p, "vid")
    return joined.select(
        F.col("vid").alias("vec_id"),
        "code0",
        "code1",
        "code2",
        "code3",
        F.expr("CAST(_d0 + _d1 + _d2 + _d3 AS BIGINT)").alias("q_dist"),
    )


@register(
    "pq_adc_search_embeddings",
    f"""
    WITH eall AS (
      SELECT vid, d, CAST(floor(x * {_KM_SCALE}) AS BIGINT) + {_KM_OFF} AS v
      FROM (SELECT vec_id AS vid, generate_subscripts(embedding, 1) AS d,
                   unnest(embedding::DOUBLE[]) AS x
            FROM embeddings)
    ),
    {_pq_sub_ctes(0)},
    {_pq_sub_ctes(1)},
    {_pq_sub_ctes(2)},
    {_pq_sub_ctes(3)},
    q AS (SELECT d, v FROM eall WHERE vid = 0),
    lut0 AS (SELECT c.cid, SUM((c.v - q.v) * (c.v - q.v)) AS ld
             FROM s0_c2 c JOIN q USING (d) GROUP BY c.cid),
    lut1 AS (SELECT c.cid, SUM((c.v - q.v) * (c.v - q.v)) AS ld
             FROM s1_c2 c JOIN q USING (d) GROUP BY c.cid),
    lut2 AS (SELECT c.cid, SUM((c.v - q.v) * (c.v - q.v)) AS ld
             FROM s2_c2 c JOIN q USING (d) GROUP BY c.cid),
    lut3 AS (SELECT c.cid, SUM((c.v - q.v) * (c.v - q.v)) AS ld
             FROM s3_c2 c JOIN q USING (d) GROUP BY c.cid),
    adc AS (
      SELECT a0.vid,
             CAST(l0.ld + l1.ld + l2.ld + l3.ld AS BIGINT) AS adc_dist
      FROM s0_af a0 JOIN s1_af a1 USING (vid)
      JOIN s2_af a2x USING (vid) JOIN s3_af a3 USING (vid)
      JOIN lut0 l0 ON l0.cid = a0.cid
      JOIN lut1 l1 ON l1.cid = a1.cid
      JOIN lut2 l2 ON l2.cid = a2x.cid
      JOIN lut3 l3 ON l3.cid = a3.cid
    ),
    exact AS (
      SELECT e.vid, CAST(SUM((e.v - q.v) * (e.v - q.v)) AS BIGINT) AS exact_dist
      FROM eall e JOIN q USING (d)
      WHERE e.vid <> 0  -- the query itself is not a neighbor candidate
      GROUP BY e.vid
    ),
    ranked AS (
      SELECT exact.vid, exact_dist, adc_dist,
             ROW_NUMBER() OVER (ORDER BY exact_dist, exact.vid) AS exact_rank,
             ROW_NUMBER() OVER (ORDER BY adc_dist, exact.vid) AS adc_rank
      FROM exact JOIN adc ON adc.vid = exact.vid
    )
    SELECT vid AS vec_id, exact_dist, adc_dist, exact_rank, adc_rank
    FROM ranked WHERE exact_rank <= 10
    """,
)
def pq_adc_search_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC search — the OTHER half of product quantization: a query
    builds one tiny lookup table per subspace (distance from its slice
    to each codeword, 4x4 entries here), and every corpus vector's
    approximate distance is just the sum of 4 LUT entries selected by
    its codes — no vector math at scan time, which is why PQ serves
    billion-vector ANN. Gated exactly: the exact top-10 (quantized
    integer distances, the truth anchor) rides with each neighbor's ADC
    distance and ADC rank, so codebooks, codes, LUTs, and both rankings
    all hash bit-for-bit; the exact-vs-ADC rank gap IS the measured
    quantization cost of the toy 2-bit codebooks.

    Plan: the subspace fits reuse kmeans_fixed_point; LUTs are
    centroid-table-sized (broadcast); the scan side touches only the
    code tuples. The exact side is the deliberate O(n) truth anchor
    (same posture as cosine_topk/ann_recall).

    Registered for the round-7 gate window (post-sweep addition)."""
    from app_insights_generator_spark.operators.similarity import (
        assign_to_centroids,
        kmeans_fixed_point,
        quantized_long_form,
    )

    embs = _embs(spark, sf_dir)
    code_cols, lut_tables = [], []
    for s in range(_PQ_M):
        sliced = embs.select(
            "vec_id",
            F.expr(f"slice(embedding, {_PQ_SUBDIM * s + 1}, {_PQ_SUBDIM})").alias(
                "sub"
            ),
        )
        _assign, cent = kmeans_fixed_point(
            sliced, "vec_id", "sub", k=_PQ_K, n_iter=2,
            scale=_KM_SCALE, offset=_KM_OFF,
        )
        codes_s = assign_to_centroids(
            quantized_long_form(sliced, "vec_id", "sub", _KM_SCALE, _KM_OFF),
            cent,
        )
        code_cols.append(codes_s.select("vid", F.col("cid").alias(f"c{s}")))
        qslice = (
            quantized_long_form(
                sliced.filter(F.col("vec_id") == 0), "vec_id", "sub",
                _KM_SCALE, _KM_OFF,
            ).select("d", F.col("v").alias("qv"))
        )
        lut = (
            cent.join(F.broadcast(qslice), "d")
            .groupBy("cid")
            .agg(F.sum(F.expr("(v - qv) * (v - qv)")).alias(f"ld{s}"))
            .withColumnRenamed("cid", f"c{s}")
        )
        lut_tables.append(lut)
    codes = code_cols[0]
    for c in code_cols[1:]:
        codes = codes.join(c, "vid")
    adc = codes
    for s, lut in enumerate(lut_tables):
        adc = adc.join(F.broadcast(lut), f"c{s}")
    adc = adc.select(
        "vid", F.expr("CAST(ld0 + ld1 + ld2 + ld3 AS BIGINT)").alias("adc_dist")
    )
    e_all = quantized_long_form(embs, "vec_id", "embedding", _KM_SCALE, _KM_OFF)
    q_all = e_all.filter(F.col("vid") == 0).select("d", F.col("v").alias("qv"))
    exact = (
        e_all.filter(F.col("vid") != 0)  # the query is not a candidate
        .join(F.broadcast(q_all), "d")
        .groupBy("vid")
        .agg(F.sum(F.expr("(v - qv) * (v - qv)")).cast("long").alias("exact_dist"))
    )
    ranked = exact.join(adc, "vid").select(
        "vid",
        "exact_dist",
        "adc_dist",
        F.row_number().over(Window.orderBy("exact_dist", "vid")).alias("exact_rank"),
        F.row_number().over(Window.orderBy("adc_dist", "vid")).alias("adc_rank"),
    )
    return ranked.filter(F.col("exact_rank") <= 10).select(
        F.col("vid").alias("vec_id"),
        "exact_dist",
        "adc_dist",
        "exact_rank",
        "adc_rank",
    )


def _pq_sub_ctes_split(s: int) -> str:
    """The persist-and-refresh variant of :func:`_pq_sub_ctes`: the
    codebook is fitted on the OLD corpus only ({p}ef from eold — the
    persisted index's training set), while the FINAL assignment runs
    over ALL vectors ({p}ea from eall — old codes unchanged, the new
    batch encoded against the FROZEN codebook). Same namespaced Lloyd
    recurrence (_km_iter_cte) verbatim."""
    lo, hi = _PQ_SUBDIM * s + 1, _PQ_SUBDIM * (s + 1)
    p = f"s{s}_"
    out = [
        f"{p}ef AS (SELECT vid, d, v FROM eold WHERE d BETWEEN {lo} AND {hi})",
        f"{p}ea AS (SELECT vid, d, v FROM eall WHERE d BETWEEN {lo} AND {hi})",
        f"""{p}init AS (
      SELECT vid, ROW_NUMBER() OVER (ORDER BY vid) - 1 AS cid
      FROM (SELECT DISTINCT vid FROM {p}ef ORDER BY vid LIMIT {_PQ_K}))""",
        f"{p}c0 AS (SELECT i.cid, e.d, e.v FROM {p}ef e JOIN {p}init i USING (vid))",
        _km_iter_cte(1, p, f"{p}ef"),
        _km_iter_cte(2, p, f"{p}ef"),
        _km_final_assign_cte(p, f"{p}ea", f"{p}c2"),
    ]
    return ",\n    ".join(out)


@register(
    "pq_incremental_codes_embeddings",
    f"""
    WITH cut AS (SELECT MAX(vec_id) * 4 // 5 AS c FROM embeddings),
    eall AS (
      SELECT vid, d, CAST(floor(x * {_KM_SCALE}) AS BIGINT) + {_KM_OFF} AS v
      FROM (SELECT vec_id AS vid, generate_subscripts(embedding, 1) AS d,
                   unnest(embedding::DOUBLE[]) AS x
            FROM embeddings)
    ),
    eold AS (SELECT e.vid, e.d, e.v FROM eall e, cut WHERE e.vid < cut.c),
    {_pq_sub_ctes_split(0)},
    {_pq_sub_ctes_split(1)},
    {_pq_sub_ctes_split(2)},
    {_pq_sub_ctes_split(3)}
    SELECT s0_af.vid AS vec_id,
           s0_af.cid AS code0, s1_af.cid AS code1,
           s2_af.cid AS code2, s3_af.cid AS code3,
           CAST(s0_af.dist + s1_af.dist + s2_af.dist + s3_af.dist AS BIGINT)
             AS q_dist,
           CAST(s0_af.vid >= cut.c AS INT) AS is_new
    FROM s0_af JOIN s1_af USING (vid) JOIN s2_af USING (vid)
    JOIN s3_af USING (vid), cut
    """,
)
def pq_incremental_codes_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Persist-and-refresh for the PQ half of the index family (VERDICT
    r09 item 4 named "centroids + codebooks + list assignments" — the
    IVF half is ann_incremental_probe_embeddings): the 4 subspace
    codebooks are fitted on the EXISTING corpus only (first 4/5 of the
    vec_id space, data-relative cut), WRITTEN TO PARQUET together with
    the old corpus's codes, then today's ingest batch (top 1/5) is
    encoded against the codebooks READ BACK FROM DISK — frozen, no
    refit, O(batch) — and appended. The returned code table is served
    from the persisted files.

    Unlike the IVF probe (whose numpy quantizer needs an in-query
    recall invariant), the PQ fit is the ENGINE-EXACT integer Lloyd
    recurrence, so this gate is FULLY hash-checked: the oracle refits
    the same codebooks on the old corpus in SQL (_pq_sub_ctes_split —
    fit CTEs over eold, final assignment over eall) and every code,
    distortion, and is_new flag must match bit-for-bit. That pins the
    codebook parquet roundtrip, the frozen-encode path, AND that old
    codes are unchanged by the refresh in one check.

    Scale shape: fit cost is the kmeans broadcast-join recurrence per
    16-dim subspace over the old corpus (done once, persisted); refresh
    cost is one assign half-step over the batch (codebook is
    centroid-table-sized, broadcast); the ADC serve path reads codes,
    never vectors. Codebook staleness shows up as rising q_dist on new
    batches — monitorable from this very output (is_new partitions it)."""
    import shutil
    import tempfile

    from app_insights_generator_spark.operators.similarity import (
        assign_to_centroids,
        kmeans_fixed_point,
        quantized_long_form,
    )

    embs = _embs(spark, sf_dir)
    cut = embs.agg(F.expr("max(vec_id) * 4 DIV 5").cast("long")).first()[0]
    old = embs.filter(F.col("vec_id") < cut)
    batch = embs.filter(F.col("vec_id") >= cut)

    idx = tempfile.mkdtemp(prefix="aig_pq_index_")
    try:
        # Build: fit per-subspace codebooks on the OLD corpus, persist
        # codebooks + old codes.
        for s in range(_PQ_M):
            sl = F.expr(f"slice(embedding, {_PQ_SUBDIM * s + 1}, {_PQ_SUBDIM})")
            sliced_old = old.select("vec_id", sl.alias("sub"))
            _a, cent = kmeans_fixed_point(
                sliced_old, "vec_id", "sub", k=_PQ_K, n_iter=2,
                scale=_KM_SCALE, offset=_KM_OFF,
            )
            cent.select(
                F.lit(s).alias("subspace"), "cid", "d", "v"
            ).write.mode("append").parquet(f"{idx}/codebooks")
            assign_to_centroids(
                quantized_long_form(
                    sliced_old, "vec_id", "sub", _KM_SCALE, _KM_OFF
                ),
                cent,
            ).select(
                F.lit(s).alias("subspace"), "vid", "cid", "dist"
            ).write.mode("append").parquet(f"{idx}/codes")

        # Refresh: encode the batch against the codebooks read back from
        # disk (frozen — the fit never reruns), append-only.
        books = spark.read.parquet(f"{idx}/codebooks")
        for s in range(_PQ_M):
            sl = F.expr(f"slice(embedding, {_PQ_SUBDIM * s + 1}, {_PQ_SUBDIM})")
            cent_s = books.filter(F.col("subspace") == s).select(
                "cid", "d", "v"
            )
            assign_to_centroids(
                quantized_long_form(
                    batch.select("vec_id", sl.alias("sub")),
                    "vec_id", "sub", _KM_SCALE, _KM_OFF,
                ),
                cent_s,
            ).select(
                F.lit(s).alias("subspace"), "vid", "cid", "dist"
            ).write.mode("append").parquet(f"{idx}/codes")

        # Serve: the returned table comes from the persisted codes.
        codes = spark.read.parquet(f"{idx}/codes")
        parts = [
            codes.filter(F.col("subspace") == s).select(
                "vid",
                F.col("cid").alias(f"code{s}"),
                F.col("dist").alias(f"_d{s}"),
            )
            for s in range(_PQ_M)
        ]
        joined = parts[0]
        for p in parts[1:]:
            joined = joined.join(p, "vid")
        out = joined.select(
            F.col("vid").alias("vec_id"),
            "code0",
            "code1",
            "code2",
            "code3",
            F.expr("CAST(_d0 + _d1 + _d2 + _d3 AS BIGINT)").alias("q_dist"),
            (F.col("vid") >= cut).cast("int").alias("is_new"),
        ).localCheckpoint(eager=True)  # pin: the temp index dir is removed
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    return out


_PQ_REFIT_BP = 12000  # refit when new-batch mean distortion > 1.2x old


@register(
    "pq_refit_decision_embeddings",
    f"""
    WITH cut AS (SELECT MAX(vec_id) * 4 // 5 AS c FROM embeddings),
    eall AS (
      SELECT vid, d, CAST(floor(x * {_KM_SCALE}) AS BIGINT) + {_KM_OFF} AS v
      FROM (SELECT vec_id AS vid, generate_subscripts(embedding, 1) AS d,
                   unnest(embedding::DOUBLE[]) AS x
            FROM embeddings)
    ),
    eold AS (SELECT e.vid, e.d, e.v FROM eall e, cut WHERE e.vid < cut.c),
    {{s0}},
    {{s1}},
    {{s2}},
    {{s3}},
    codes AS (
      SELECT s0_af.vid AS vid,
             CAST(s0_af.dist + s1_af.dist + s2_af.dist + s3_af.dist
                  AS BIGINT) AS q_dist,
             CAST(s0_af.vid >= cut.c AS INT) AS is_new,
             s0_af.cid AS c0, s1_af.cid AS c1,
             s2_af.cid AS c2, s3_af.cid AS c3
      FROM s0_af JOIN s1_af USING (vid) JOIN s2_af USING (vid)
      JOIN s3_af USING (vid), cut
    ),
    m AS (
      SELECT CAST(SUM(CASE WHEN is_new = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_old,
             CAST(SUM(CASE WHEN is_new = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_batch,
             CAST(SUM(CASE WHEN is_new = 0 THEN q_dist ELSE 0 END)
                  AS BIGINT) AS qd_old_sum,
             CAST(SUM(CASE WHEN is_new = 1 THEN q_dist ELSE 0 END)
                  AS BIGINT) AS qd_new_sum,
             CAST(LEAST(COUNT(DISTINCT c0), COUNT(DISTINCT c1),
                        COUNT(DISTINCT c2), COUNT(DISTINCT c3))
                  AS BIGINT) AS codes_used_min
      FROM codes
    )
    SELECT n_old, n_batch,
           CAST(qd_old_sum // n_old AS BIGINT) AS qd_old_mean,
           CAST(qd_new_sum // n_batch AS BIGINT) AS qd_new_mean,
           CAST((qd_new_sum // n_batch) * 10000 // (qd_old_sum // n_old)
                AS BIGINT) AS drift_bp,
           codes_used_min,
           CASE WHEN (qd_new_sum // n_batch) * 10000
                     // (qd_old_sum // n_old) > {_PQ_REFIT_BP}
                THEN 'refit' ELSE 'keep' END AS decision
    FROM m
    """.format(
        s0=_pq_sub_ctes_split(0),
        s1=_pq_sub_ctes_split(1),
        s2=_pq_sub_ctes_split(2),
        s3=_pq_sub_ctes_split(3),
    ),
)
def pq_refit_decision_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PQ half of the serving loop's CONTROL PLANE (VERDICT r11
    item 7a — the twin of ivf_refit_decision_embeddings): the
    refit-vs-keep verdict row for the persisted PQ codebooks. Codebook
    staleness is exactly what pq_incremental's own output already
    measures — the quantization distortion ``q_dist`` of new-batch rows
    encoded against the FROZEN codebooks fitted on the old corpus — so
    the decision row aggregates the SERVED code table (built, persisted,
    refreshed, and read back by pq_incremental_codes_embeddings — the
    full lifecycle runs inside this gate) by ``is_new``:
    ``drift_bp`` = new-batch mean distortion vs old-corpus mean in
    basis points; > {_PQ_REFIT_BP} (a 1.2x rise) -> 'refit'. Measured
    10,263–10,271 bp on the fixtures (the expected out-of-sample gap),
    verdict 'keep' with real headroom on both sides.

    Every number is engine-exact: q_dist is the integer Lloyd
    distortion, means are integer DIV, the ratio is integer bp — no
    doubles anywhere (qd sums ~3.6e14, means ~9e11, mean*10000 ~9e15:
    all inside int64 at every gate tier). ``codes_used_min`` (the
    LEAST across subspaces of distinct codewords in use) rides along as
    the fit-sanity audit, and the in-query invariant pins the coupling
    the IVF twin established: a 'keep' verdict can never coexist with a
    collapsed codebook (codes_used_min < {_PQ_K} raises).

    Scale shape: one conditional aggregation over the served code table
    (codes, never vectors) on top of pq_incremental's own shape; the
    decision row is 1 row regardless of corpus size."""
    codes = pq_incremental_codes_embeddings(spark, sf_dir)
    m = codes.agg(
        F.sum((F.col("is_new") == 0).cast("long")).alias("n_old"),
        F.sum((F.col("is_new") == 1).cast("long")).alias("n_batch"),
        F.sum(
            F.when(F.col("is_new") == 0, F.col("q_dist")).otherwise(F.lit(0))
        ).alias("qd_old_sum"),
        F.sum(
            F.when(F.col("is_new") == 1, F.col("q_dist")).otherwise(F.lit(0))
        ).alias("qd_new_sum"),
        F.least(
            F.countDistinct("code0"),
            F.countDistinct("code1"),
            F.countDistinct("code2"),
            F.countDistinct("code3"),
        ).cast("long").alias("codes_used_min"),
    ).localCheckpoint(eager=True)  # fan-out: invariant + verdict row

    used = m.first()["codes_used_min"]
    if used < _PQ_K:
        raise AssertionError(
            f"codebook collapse: only {used} of {_PQ_K} codewords in use "
            "in some subspace — the distortion-based keep/refit verdict "
            "would be meaningless on a degenerate fit"
        )

    mean_old = F.expr("qd_old_sum DIV n_old")
    mean_new = F.expr("qd_new_sum DIV n_batch")
    drift = F.expr(
        "(qd_new_sum DIV n_batch) * 10000 DIV (qd_old_sum DIV n_old)"
    )
    return m.select(
        "n_old",
        "n_batch",
        mean_old.cast("long").alias("qd_old_mean"),
        mean_new.cast("long").alias("qd_new_mean"),
        drift.cast("long").alias("drift_bp"),
        "codes_used_min",
        F.when(drift > _PQ_REFIT_BP, F.lit("refit"))
        .otherwise(F.lit("keep"))
        .alias("decision"),
    )


# --- Temperature-scaled mixture weights ------------------------------------------


@register(
    "mixture_temperature_documents",
    r"""
    WITH t AS (
      SELECT lang,
             CAST(SUM(len(list_filter(string_split_regex(trim(text), '\s+'),
                                      x -> x != ''))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    s AS (
      SELECT lang, n_tokens,
             CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS isqrt_t
      FROM t
    ),
    tot AS (SELECT CAST(SUM(isqrt_t) AS BIGINT) AS z,
                   CAST(SUM(n_tokens) AS BIGINT) AS nz FROM s)
    SELECT lang, n_tokens,
           n_tokens * 10000 // nz AS natural_bp,
           isqrt_t * 10000 // z AS temp_bp
    FROM s, tot
    """,
)
def mixture_temperature_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-scaled sampling weights (alpha = 0.5, the XLM-R /
    multilingual-pretraining formula w_l ∝ n_l^alpha): low-resource
    languages are upsampled relative to their natural token share
    without drowning high-resource ones — emitted next to the natural
    (alpha=1) share so the rebalancing is visible per language.
    Exactness: n^0.5 goes through FLOOR(SQRT(double)) — sqrt is
    IEEE-correctly-rounded and floor lands both engines on the same
    BIGINT — after which every share is an integer DIV over
    order-independent integer sums (no summing of irrational doubles,
    whose partition order would flip the hash). Complements
    mixture_weights_documents (uniform rebalance).

    One aggregation pass to |langs| rows; everything after is a
    broadcast of a 1-row total.

    Registered for the round-7 gate window (post-sweep addition)."""
    docs = _docs(spark, sf_dir)
    t = docs.groupBy("lang").agg(
        F.sum(F.size(T.tokens(F.col("text"))).cast("long")).alias("n_tokens")
    )
    s = t.withColumn(
        "isqrt_t",
        F.expr("CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)"),
    )
    tot = s.agg(
        F.sum("isqrt_t").alias("z"), F.sum("n_tokens").alias("nz")
    )
    return s.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        F.expr("n_tokens * 10000 DIV nz").alias("natural_bp"),
        F.expr("isqrt_t * 10000 DIV z").alias("temp_bp"),
    )


# --- Winnowing fingerprints (MOSS) --------------------------------------------


@register(
    "winnowing_fingerprints_documents",
    f"""
    WITH base AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    g AS (
      SELECT doc_id,
             GREATEST(len(toks) - 3, 0) AS m,
             CASE WHEN len(toks) >= 4
                  THEN list_transform(range(1, len(toks) - 3 + 1),
                         i -> md5(array_to_string(list_slice(toks, i, i + 3), ' ')))
                  ELSE [] END AS grams
      FROM base
    ),
    s AS (
      SELECT doc_id, m,
             GREATEST(m - 3, CASE WHEN m >= 1 THEN 1 ELSE 0 END) AS n_windows,
             CASE WHEN m >= 1
                  THEN list_distinct(list_transform(
                         range(1, GREATEST(m - 3, 1) + 1),
                         j -> list_aggregate(list_slice(grams, j, j + 3), 'min')))
                  ELSE [] END AS sel
      FROM g
    ),
    ex AS (SELECT doc_id, unnest(sel) AS h FROM s),
    dup AS (SELECT h FROM ex GROUP BY h HAVING COUNT(*) >= 2),
    sh AS (SELECT e.doc_id, COUNT(*) AS shared_sel
           FROM ex e JOIN dup USING (h) GROUP BY e.doc_id)
    SELECT s.doc_id,
           CAST(m AS BIGINT) AS n_grams,
           CAST(n_windows AS BIGINT) AS n_windows,
           CAST(len(sel) AS BIGINT) AS n_selected,
           CAST(CASE WHEN n_windows = 0 THEN 0
                ELSE len(sel) * 10000 // n_windows END AS BIGINT) AS density_bp,
           CAST(COALESCE(sh.shared_sel, 0) AS BIGINT) AS shared_sel
    FROM s LEFT JOIN sh USING (doc_id)
    """,
)
def winnowing_fingerprints_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Winnowing fingerprint selection (operators/dedup.py
    winnowing_stats; Schleimer-Wilkerson-Aiken 2003, the MOSS document
    fingerprinting algorithm): 4-token gram md5 hashes, window w=4
    minima, per-document selected-set stats plus the cross-corpus
    shared-fingerprint count. Completes the fingerprinting family next
    to fingerprint_documents (whole-doc md5), fingerprint_rolling
    (Karp-Rabin) and duplicate_spans (every duplicated window): winnowing
    keeps the GUARANTEED-coverage sparse subset (~2/(w+1) density; any
    shared run of w+k-1 tokens shares a fingerprint), which is what an
    index at 100 TB can actually store.

    The Spark side is relational (exploded gram rows + sliding window
    MIN — see winnowing_stats for why the array formulation loses 16x to
    lambda inlining); the oracle keeps the array formulation, which is
    exactly equivalent and fast in DuckDB. Everything emitted is an
    integer and the hash order is lexicographic hex — no drift classes.

    Reference parity: no counterpart; §2.3 dedup/fingerprint extension.

    Registered as a round-8 rotation candidate (post-sweep addition)."""
    from app_insights_generator_spark.operators.dedup import winnowing_stats

    return winnowing_stats(_docs(spark, sf_dir), "doc_id", "text", k=4, w=4)


# --- n-gram novelty decay (corpus curation ordering signal) --------------------


@register(
    "ngram_novelty_documents",
    f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) = 0 THEN ['']
                  WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(range(1, len(toks) - 1),
                                      i -> array_to_string(toks[i:i+2], ' ')) END)
               AS grams
      FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
    ),
    ex AS (SELECT doc_id, unnest(grams) AS g FROM sh),
    fst AS (SELECT g, MIN(doc_id) AS first_doc FROM ex GROUP BY g),
    per AS (
      SELECT e.doc_id,
             COUNT(*) AS n_grams,
             SUM(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END) AS n_new
      FROM ex e JOIN fst f USING (g)
      GROUP BY e.doc_id
    )
    SELECT doc_id,
           CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_new AS BIGINT) AS n_new,
           CAST(n_new * 10000 // n_grams AS BIGINT) AS novelty_bp
    FROM per
    """,
)
def ngram_novelty_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY in canonical corpus order (doc_id):
    of a document's distinct 3-gram shingles, how many appear for the
    FIRST time in the corpus at this document. The novelty-decay curve
    is the curation signal behind dedup-aware data valuation — late
    documents full of already-seen n-grams add little lexical coverage
    and are the first candidates to drop or downsample; it is also the
    growth diagnostic (Heaps' law) a corpus report tracks across
    versions. Shares its shingle definition (and edge cases) with the
    Jaccard dedup family, so 'novel' means exactly 'would not have hit
    the dedup index'.

    Plan: one explode of DISTINCT per-doc shingles (pinned — it feeds two
    aggregations), one groupBy(gram) for the global first-occurrence
    (MIN doc_id — associative, exact), then n_new per doc is simply the
    COUNT of first-occurrence rows grouped by their first_doc — the
    round-13 form (guide §2.4): the old plan joined the FULL exploded
    gram table back to the first-occurrence table on the string gram key
    just to test ``first_doc == doc_id``, a second full-gram-table
    shuffle that the per-first_doc count makes redundant. Rows proved
    identical at sf0.1 (5,000 docs); local timing a wash (the pin
    dominates at this SF), the removed string-keyed shuffle+join is the
    100 TB saving. All counts integers, ratio in basis points by integer
    DIV — no drift classes. At 100 TB the gram table is the same shuffle
    the MinHash index already pays; no new scale cost class.

    Reference parity: no counterpart; §2.3 curation-analytics extension.

    Registered as a round-8 rotation candidate (post-sweep addition)."""
    docs = _docs(spark, sf_dir)
    # Two projections on purpose (the shingles_from_tokens contract):
    # an inline tokens() expression would be re-evaluated once per
    # transform element — measured 2x end-to-end on this query alone.
    toked = docs.select(
        "doc_id", T.tokens(T.normalized_text(F.col("text"))).alias("toks")
    )
    sh = toked.select(
        "doc_id",
        F.array_distinct(T.shingles_from_tokens(F.col("toks"), 3)).alias("grams"),
    )
    ex = sh.select("doc_id", F.explode("grams").alias("g")).localCheckpoint(
        eager=True
    )
    n_grams = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    n_new = (
        ex.groupBy("g")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy(F.col("first_doc").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    per = n_grams.join(n_new, "doc_id", "left")
    return per.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.coalesce(F.col("n_new"), F.lit(0)).cast("long").alias("n_new"),
        F.expr(
            "CAST(coalesce(n_new, 0) * 10000 DIV n_grams AS LONG)"
        ).alias("novelty_bp"),
    )


# --- SemDeDup: cluster-partitioned semantic dedup ------------------------------


@register(
    "semdedup_embeddings",
    """
    WITH v AS (
      SELECT vec_id,
             embedding::DOUBLE[] AS e,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS n,
             (CASE WHEN embedding[1] >= 0 THEN 4 ELSE 0 END
            + CASE WHEN embedding[22] >= 0 THEN 2 ELSE 0 END
            + CASE WHEN embedding[43] >= 0 THEN 1 ELSE 0 END) AS cl
      FROM embeddings
    ),
    dups AS (
      SELECT DISTINCT b.vec_id
      FROM v a JOIN v b ON a.cl = b.cl AND a.vec_id < b.vec_id
      WHERE a.n * b.n > 0
        AND list_dot_product(a.e, b.e) / (a.n * b.n) >= 0.3
    )
    SELECT v.vec_id,
           CAST(cl AS INT) AS cluster,
           (d.vec_id IS NOT NULL) AS is_dup
    FROM v LEFT JOIN dups d ON d.vec_id = v.vec_id
    """,
)
def semdedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table (operators/similarity.py
    semdedup_flags; Abbas et al. 2023): hyperplane-sign clusters from
    dimensions (1, 22, 43), within-cluster cosine >= 0.3 against a
    smaller-id neighbor marks a semantic duplicate. This is the
    SCALE-PATH twin of dedup_embedding_cosine_embeddings: same verdict
    semantics, but candidate pairs are bounded by cluster size instead
    of corpus² (the pair set is a strict subset of the exact all-pairs
    set the oracle_exact_cosine_pairs gate already hash-anchors at the
    same threshold, so no new float-boundary class).

    Reference parity: no counterpart; §2.3 dedup-family extension.

    sign_dims is pinned EXPLICITLY here for cross-round hash stability;
    the operator's default derives ceil(log2(n)/2) sign bits from the
    corpus (semdedup_sign_dims — the paper's k ~ sqrt(n)), which would
    re-partition the clusters whenever the table grew.

    Registered as a round-8 rotation candidate (post-sweep addition)."""
    return S.semdedup_flags(
        _embs(spark, sf_dir), "embedding", "vec_id", threshold=0.3,
        sign_dims=(1, 22, 43),
    )


# --- Directed containment join (subset / quotation detection) -------------------


@register(
    "containment_join_documents",
    f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) = 0 THEN ['']
                  WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_transform(range(1, len(toks) - 1),
                                      i -> array_to_string(toks[i:i+2], ' ')) END)
               AS grams
      FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
    ),
    -- inverted-index form, exact and far cheaper than all-pairs
    -- list_intersect: grams are DISTINCT per doc, so the per-pair match
    -- count over the exploded join IS |A intersect B|, and any pair with
    -- containment >= t > 0 shares >= 1 gram (zero false negatives).
    ex AS (SELECT doc_id, unnest(grams) AS g FROM sh),
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    ),
    sz AS (SELECT doc_id, len(grams) AS size_a FROM sh)
    SELECT id_a, id_b,
           CAST(size_a AS BIGINT) AS size_a,
           CAST(inter AS BIGINT) AS inter,
           CAST(inter * 10000 // size_a AS BIGINT) AS containment_bp
    FROM cand JOIN sz ON sz.doc_id = cand.id_a
    WHERE inter * 10000 >= 6000 * size_a
    """,
)
def containment_join_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment join at t=0.60 (operators/dedup.py
    containment_join_prefix_filter): every ordered pair where >= 60% of
    A's distinct 3-gram shingles appear in B — the subset/quotation
    relation Jaccard misses (union denominator). The Spark side under
    test is the prefix-filtered candidate path (zero false negatives by
    the containment prefix lemma, exact-integer verify); the oracle is
    brute-force directed all-pairs, so any candidate-generation bug
    fails the hash compare. All outputs and the threshold predicate are
    pure int64 (basis points), no float class.

    Reference parity: no counterpart; §2.3 dedup-family extension
    alongside jaccard_join_prefix_documents.

    Registered as a round-8 rotation candidate (post-sweep addition)."""
    return D.containment_join_prefix_filter(
        _docs(spark, sf_dir), "doc_id", "text", shingle_n=3, threshold_bp=6000
    )


# --- Split-document boundary detection (tail -> head continuation) --------------


@register(
    "split_doc_overlap_documents",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    hk AS (SELECT doc_id, array_to_string(list_slice(toks, 1, 3), ' ') AS boundary
           FROM t WHERE len(toks) >= 3),
    tk AS (SELECT doc_id,
                  array_to_string(list_slice(toks, len(toks) - 2, len(toks)), ' ')
                    AS boundary
           FROM t WHERE len(toks) >= 3)
    SELECT tk.doc_id AS id_a, hk.doc_id AS id_b, tk.boundary AS boundary
    FROM tk JOIN hk USING (boundary)
    WHERE tk.doc_id <> hk.doc_id
    """,
)
def split_doc_overlap_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-document continuation candidates: document A's last 3
    tokens exactly equal document B's first 3 tokens — the signature of
    one source document split across crawl records (pagination,
    chunked ingestion), which re-joining repairs BEFORE dedup/training
    (a split doc defeats both exact dedup and context-window packing).
    Emits directed (id_a tail-side, id_b head-side, boundary) pairs.

    Plan: two narrow projections of the token array's ends, one
    equi-join keyed on the 3-token boundary string — fully distributed,
    no candidate explosion (boundary keys are near-unique; hot
    boilerplate boundaries would surface as fanout and are exactly the
    rows a curator wants to see). At 100 TB this is one shuffle of
    ~40-byte keys, the cheapest join class in the engine.

    Reference parity: no counterpart; §2.3 curation extension.

    Registered as a round-8 rotation candidate (post-sweep addition)."""
    docs = _docs(spark, sf_dir)
    t = docs.select(
        "doc_id", T.tokens(T.normalized_text(F.col("text"))).alias("toks")
    ).filter(F.size("toks") >= 3)
    hk = t.select(
        F.col("doc_id").alias("id_b"),
        F.array_join(F.slice(F.col("toks"), 1, 3), " ").alias("boundary"),
    )
    tk = t.select(
        F.col("doc_id").alias("id_a"),
        F.array_join(
            F.slice(F.col("toks"), F.size("toks") - 2, 3), " "
        ).alias("boundary"),
    )
    return (
        tk.join(hk, "boundary")
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b", "boundary")
    )


# --- Matryoshka truncated-dimension recall audit ---------------------------------

_MRL_DIMS = 16  # truncated prefix width audited against the full 64 dims


@register(
    "matryoshka_recall_embeddings",
    f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < {_RECALL_NQ}
    ),
    c AS (
      SELECT vec_id AS id, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id >= {_RECALL_NQ}
    ),
    sf AS (
      SELECT q.qid, c.id,
             ROUND(CASE WHEN sqrt(list_dot_product(c.cv, c.cv))
                             * sqrt(list_dot_product(q.qv, q.qv)) > 0
                        THEN list_dot_product(c.cv, q.qv)
                             / (sqrt(list_dot_product(c.cv, c.cv))
                                * sqrt(list_dot_product(q.qv, q.qv)))
                        ELSE 0.0 END + 1e-9, 6) AS sim
      FROM c CROSS JOIN q
    ),
    st AS (
      SELECT q.qid, c.id,
             ROUND(CASE WHEN sqrt(list_dot_product(c.cv[1:{_MRL_DIMS}], c.cv[1:{_MRL_DIMS}]))
                             * sqrt(list_dot_product(q.qv[1:{_MRL_DIMS}], q.qv[1:{_MRL_DIMS}])) > 0
                        THEN list_dot_product(c.cv[1:{_MRL_DIMS}], q.qv[1:{_MRL_DIMS}])
                             / (sqrt(list_dot_product(c.cv[1:{_MRL_DIMS}], c.cv[1:{_MRL_DIMS}]))
                                * sqrt(list_dot_product(q.qv[1:{_MRL_DIMS}], q.qv[1:{_MRL_DIMS}])))
                        ELSE 0.0 END + 1e-9, 6) AS sim
      FROM c CROSS JOIN q
    ),
    rf AS (SELECT qid, id FROM (
             SELECT qid, id,
                    ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY sim DESC, id) AS rn
             FROM sf) WHERE rn <= {_RECALL_K}),
    rt AS (SELECT qid, id FROM (
             SELECT qid, id,
                    ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY sim DESC, id) AS rn
             FROM st) WHERE rn <= {_RECALL_K})
    SELECT rf.qid,
           CAST(COUNT(rt.id) AS BIGINT) AS n_overlap,
           CAST(COUNT(rt.id) * 10000 // {_RECALL_K} AS BIGINT) AS recall_bp,
           CAST(SUM(rf.id) AS BIGINT) AS full_idsum
    FROM rf LEFT JOIN rt ON rf.qid = rt.qid AND rf.id = rt.id
    GROUP BY rf.qid
    """,
)
def matryoshka_recall_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation audit (Kusupati et al. 2022, MRL):
    recall@10 of exact cosine search over the FIRST 16 of 64 dimensions
    against exact search over all 64, per query of the standard 20-query
    panel. This is the measurement that decides whether a prefix-
    truncated index tier (store 16 dims hot, re-rank survivors at 64) is
    viable for a given embedding column — the memory/recall trade is
    4x storage for whatever recall this reports. Both sides are exact
    and fully SQL-expressible, so the whole audit is hash-gated (unlike
    the IVF audit, whose approximate side needs an in-query invariant);
    similarities are rounded to 6 dp with the engine-wide +1e-9 bias
    before the (sim DESC, id) rank, the proven tie-safe recipe from
    ann_recall_ivf.

    Scale shape: both sides broadcast the 20-query panel and never
    shuffle the corpus; the window top-k is per-query. The truncated
    side reads 4x less vector data — exactly the scan saving the tier
    would realize.

    Reference parity: no counterpart; §2.3 similarity extension.

    Registered as a round-8 rotation candidate (post-sweep addition)."""
    embs = _embs(spark, sf_dir)
    queries = embs.filter(F.col("vec_id") < _RECALL_NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    corpus = embs.filter(F.col("vec_id") >= _RECALL_NQ).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("cv")
    )
    joined = corpus.crossJoin(F.broadcast(queries))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("id"))

    def topk(sim_col):
        return (
            joined.select("qid", "id", F.round(sim_col + F.lit(1e-9), 6).alias("sim"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _RECALL_K)
            .select("qid", "id")
        )

    full = topk(S.cosine(F.col("cv"), F.col("qv")))
    # Explicit renames: full and trunc share the `joined` lineage, and a
    # same-name join condition on self-join-derived frames mis-resolves
    # (the classic duplicate-attribute trap) — measured scrambling idsums.
    trunc = topk(
        S.cosine(
            F.slice(F.col("cv"), 1, _MRL_DIMS), F.slice(F.col("qv"), 1, _MRL_DIMS)
        )
    ).select(F.col("qid").alias("tqid"), F.col("id").alias("tid"))
    return (
        full.join(
            trunc,
            (F.col("qid") == F.col("tqid")) & (F.col("id") == F.col("tid")),
            "left",
        )
        .groupBy("qid")
        .agg(
            F.count("tid").cast("long").alias("n_overlap"),
            F.expr(f"CAST(COUNT(tid) * 10000 DIV {_RECALL_K} AS LONG)").alias(
                "recall_bp"
            ),
            F.sum("id").cast("long").alias("full_idsum"),
        )
    )


# --- TF-IDF nearest neighbors via inverted index (embedding-free similarity) ----

#: Quantized-idf lookup: bucket b = (df * 1024) DIV n_docs in [0, 1024] maps
#: to round(ln(1025 / (b + 1)) * 1e6) ppm. Precomputed in PYTHON and inlined
#: as integer literals into BOTH engines (the _BENFORD_PPM treatment), so no
#: engine evaluates ln at query time — a JVM-vs-libm last-ulp difference at
#: a ROUND boundary could otherwise flip an integer weight and the gate hash
#: (ADVICE r07). b=1024 (df == n_docs, a term in every doc) gives exactly 0.
_IDF_PPM_1024 = [round(__import__("math").log(1025 / (b + 1)) * 1e6) for b in range(1025)]

_IDF_VALUES_SQL = ", ".join(
    f"({b}, {ppm})" for b, ppm in enumerate(_IDF_PPM_1024)
)


#: Shared oracle CTE block (tfidf top-3 per panel query doc, final CTE
#: ``ttop(qid, cid, dot, cos_sim, rn)``): used verbatim by both
#: tfidf_neighbors_documents and sparse_dense_agreement_documents so the
#: two gates cannot drift apart on the sparse side's definition.
_TFIDF_TOPK3_CTES = f"""
    tok AS (
      SELECT doc_id, unnest(toks) AS term
      FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
    ),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY doc_id, term),
    stats AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf),
    idf(bucket, idf_ppm) AS (VALUES {_IDF_VALUES_SQL}),
    w AS (
      SELECT tf.doc_id, tf.term, tf.tf * CAST(idf_ppm AS BIGINT) AS w
      FROM tf JOIN stats USING (term), n
      JOIN idf ON idf.bucket = (df * 1024) // n_docs
    ),
    nrm AS (SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS n2
            FROM w GROUP BY doc_id),
    tdots AS (
      SELECT q.doc_id AS qid, c.doc_id AS cid,
             CAST(SUM(q.w * c.w) AS BIGINT) AS dot
      FROM w q JOIN w c ON q.term = c.term AND q.doc_id <> c.doc_id
      WHERE q.doc_id < 20
      GROUP BY 1, 2
    ),
    tscored AS (
      SELECT d.qid, d.cid, d.dot,
             ROUND(d.dot / sqrt(CAST(a.n2 AS DOUBLE) * b.n2) + 1e-9, 6)
               AS cos_sim
      FROM tdots d JOIN nrm a ON a.doc_id = d.qid
                   JOIN nrm b ON b.doc_id = d.cid
      WHERE a.n2 > 0 AND b.n2 > 0
    ),
    ttop AS (
      SELECT qid, cid, dot, cos_sim, rn
      FROM (SELECT qid, cid, dot, cos_sim,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY cos_sim DESC, cid) AS rn
            FROM tscored)
      WHERE rn <= 3
    )
"""


@register(
    "tfidf_neighbors_documents",
    f"""
    WITH {_TFIDF_TOPK3_CTES}
    SELECT qid, cid, dot, cos_sim, CAST(rn AS BIGINT) AS rank FROM ttop
    """,
)
def tfidf_neighbors_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-free text similarity search: top-3 TF-IDF cosine
    neighbors for the 20-query panel, computed through an INVERTED INDEX
    (term-keyed join) instead of any dense-vector scan — the classic
    sparse retrieval complement to the embedding ANN family (BM25 ranks
    query TERMS; this ranks whole-document vectors against each other).

    Exactness design: idf is a QUANTIZED integer-ppm weight looked up
    from the Python-precomputed _IDF_PPM_1024 table — df/N snapped to
    1/1024 buckets by exact integer arithmetic ((df*1024) DIV n_docs),
    bucket b mapping to round(ln(1025/(b+1))*1e6). NEITHER engine
    evaluates ln at query time (ADVICE r07: ROUND(ln(...)*1e6) computed
    independently per engine risks a last-ulp flip of the integer
    weight exactly at a rounding boundary; the literals make the class
    impossible, the _BENFORD_PPM treatment). Per-doc weights,
    norms-squared, and every dot product are EXACT BIGINT sums —
    order-independent, hash-stable — and the only per-pair float is the
    final dot/sqrt(n2a*n2b) (sqrt is IEEE-correctly-rounded), rounded
    6dp with the engine bias before the (cos DESC, id) tie-safe rank.
    A raw float-weight formulation would sum hundreds of doubles per
    pair — the forbidden partition-order class. The 1/1024 df-share
    quantization caps rare-term idf at ln(1025)~6.93 (standard
    smoothing territory) and merges df values closer than N/1024 —
    the resolution/scale dial is the table size. int64 headroom:
    w <= tf * 6.94e6, w*w sums ~2.4e15 per 50-term doc — ~1e4x margin.

    Scale: the inverted-index join fans out per term as df_q * df_c; on
    real (Zipfian) corpora high-df terms carry near-zero idf and are
    dropped by a df cap before the join (the standard stopword prune —
    this synthetic corpus's 30-word vocabulary makes every term common,
    so no cap is applied and the panel bound |Q| * N does the work).
    Query-side weights broadcast at panel size.

    Reference parity: no counterpart; §2.3 similarity extension.

    Registered as a round-8 rotation candidate (post-sweep addition)."""
    return _tfidf_topk3(spark, _docs(spark, sf_dir))


def _tfidf_topk3(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Shared builder for the panel's tfidf top-3 (see
    tfidf_neighbors_documents for the exactness design); also feeds
    sparse_dense_agreement_documents so both gates rank with the
    identical sparse scorer."""
    tok = docs.select(
        "doc_id", F.explode(T.tokens(T.normalized_text(F.col("text")))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    stats = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n = tf.agg(F.count_distinct("doc_id").cast("long").alias("n_docs"))
    idf = spark.createDataFrame(
        list(enumerate(_IDF_PPM_1024)), "bucket long, idf_ppm long"
    )
    w = (
        tf.join(stats, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("bucket", F.expr("df * 1024 DIV n_docs"))
        .join(F.broadcast(idf), "bucket")
        .select("doc_id", "term", F.expr("tf * idf_ppm").alias("w"))
    )
    nrm = w.groupBy("doc_id").agg(F.sum(F.expr("w * w")).cast("long").alias("n2"))
    q = w.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("qid"), "term", F.col("w").alias("wq")
    )
    c = w.select(F.col("doc_id").alias("cid"), "term", F.col("w").alias("wc"))
    # The PANEL side is the broadcast build at any corpus size (without
    # the hint AQE broadcasts whichever side is small at test scale —
    # the corpus — which flips to a corpus shuffle at 100 TB).
    dots = (
        c.join(F.broadcast(q), "term")
        .filter(F.col("qid") != F.col("cid"))
        .groupBy("qid", "cid")
        .agg(F.sum(F.expr("wq * wc")).cast("long").alias("dot"))
    )
    na = nrm.select(F.col("doc_id").alias("qid"), F.col("n2").alias("n2a"))
    nb = nrm.select(F.col("doc_id").alias("cid"), F.col("n2").alias("n2b"))
    scored = (
        dots.join(na, "qid")
        .join(nb, "cid")
        .filter((F.col("n2a") > 0) & (F.col("n2b") > 0))
        .select(
            "qid",
            "cid",
            "dot",
            F.round(
                F.col("dot") / F.sqrt(F.col("n2a").cast("double") * F.col("n2b"))
                + F.lit(1e-9),
                6,
            ).alias("cos_sim"),
        )
    )
    wr = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 3)
        .select("qid", "cid", "dot", "cos_sim", F.col("rn").cast("long").alias("rank"))
    )


def _dense_topk3(embs: DataFrame) -> DataFrame:
    """Shared builder: exact dense-cosine top-3 per 20-doc panel query ->
    [dqid, dcid, drank]. The broadcast panel joins the corpus once (one
    scan, panel-keyed rank window); sequential-fold double cosine rounded
    6dp with the engine bias before the tie-safe (cos DESC, id) rank —
    the oracle_exact_cosine_pairs float discipline. Feeds
    sparse_dense_agreement_documents and rrf_fusion_documents."""
    q = embs.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("dqid"), F.col("embedding").alias("qv")
    )
    c = embs.select(F.col("vec_id").alias("dcid"), F.col("embedding").alias("cv"))
    dsc = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("dqid") != F.col("dcid"))
        .select(
            "dqid",
            "dcid",
            F.round(S.cosine(F.col("cv"), F.col("qv")) + F.lit(1e-9), 6).alias(
                "cos_sim"
            ),
        )
    )
    wr = Window.partitionBy("dqid").orderBy(F.col("cos_sim").desc(), F.col("dcid"))
    return (
        dsc.withColumn("drank", F.row_number().over(wr))
        .filter(F.col("drank") <= 3)
        .select("dqid", "dcid", "drank")
    )


#: Shared oracle CTE block (dense exact-cosine top-3 per panel query,
#: final CTE ``dtop(qid, cid, drank)``): twin of _dense_topk3, shared by
#: sparse_dense_agreement_documents and rrf_fusion_documents.
_DENSE_TOPK3_CTES = """
    dv AS (SELECT vec_id, embedding::DOUBLE[] AS e,
                  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                    AS vnorm
           FROM embeddings),
    dsc AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid,
             ROUND(CASE WHEN q.vnorm * c.vnorm > 0
                   THEN list_dot_product(q.e, c.e) / (q.vnorm * c.vnorm)
                   ELSE 0.0 END + 1e-9, 6) AS cos_sim
      FROM dv q JOIN dv c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < 20
    ),
    dtop AS (
      SELECT qid, cid, CAST(rn AS BIGINT) AS drank FROM (
        SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cos_sim DESC, cid) AS rn
        FROM dsc) WHERE rn <= 3
    )
"""


# --- Sparse-vs-dense retrieval agreement audit ----------------------------------


@register(
    "sparse_dense_agreement_documents",
    f"""
    WITH {_TFIDF_TOPK3_CTES},
    {_DENSE_TOPK3_CTES},
    dsum AS (SELECT qid, CAST(SUM(cid) AS BIGINT) AS dense_idsum
             FROM dtop GROUP BY qid)
    SELECT t.qid,
           CAST(COUNT(d.cid) AS BIGINT) AS n_agree,
           CAST(COUNT(d.cid) * 10000 // 3 AS BIGINT) AS agree_bp,
           CAST(SUM(t.cid) AS BIGINT) AS tfidf_idsum,
           MIN(ds.dense_idsum) AS dense_idsum
    FROM ttop t
    LEFT JOIN dtop d ON d.qid = t.qid AND d.cid = t.cid
    JOIN dsum ds ON ds.qid = t.qid
    GROUP BY t.qid
    """,
)
def sparse_dense_agreement_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-check of the repo's TWO similarity surfaces against each
    other (VERDICT r08 item #7: tfidf neighbors and embedding top-k were
    never compared): for the standard 20-doc query panel, compute top-3
    neighbors by (a) the inverted-index TF-IDF scorer — via the SAME
    shared builder the gated tfidf_neighbors_documents uses — and (b)
    exact dense cosine over the embeddings table (doc_id == vec_id in
    the synthetic corpus), and emit per query the overlap count,
    agreement in basis points, and both neighbor-set id sums. The
    retrieval-eval staple (sparse/dense agreement ~ how much a hybrid
    retriever would gain) and a standing audit: a silent regression in
    EITHER scorer moves the agreement row even if that scorer's own gate
    query happens to still pass its invariants.

    Exactness: the sparse side is the integer-weight machinery (exact
    BIGINT dots, quantized-idf literals); the dense side is the
    sequential-fold double cosine both engines evaluate identically
    (the oracle_exact_cosine_pairs precedent), rounded 6dp with the
    engine bias before the tie-safe (cos DESC, id) rank. Overlap counts
    and id sums are integers — no new float surface.

    Scale: the dense side joins the broadcast 20-row panel against the
    corpus (one scan, TakeOrdered-per-query via the rank window after a
    panel-keyed shuffle of 20*N rows); the sparse side is the gated
    inverted-index plan. Both are panel-bounded — never corpus x corpus.

    Reference parity: no counterpart; §2.3 similarity extension.
    Registered on ROTATION_NEXT (round-10 window; post-sweep addition)."""
    docs = _docs(spark, sf_dir)
    t = _tfidf_topk3(spark, docs).select("qid", "cid")
    dtop = _dense_topk3(_embs(spark, sf_dir)).select("dqid", "dcid")
    dsum = dtop.groupBy(F.col("dqid").alias("qid")).agg(
        F.sum("dcid").cast("long").alias("dense_idsum")
    )
    return (
        t.join(
            dtop,
            (F.col("qid") == F.col("dqid")) & (F.col("cid") == F.col("dcid")),
            "left",
        )
        .groupBy("qid")
        .agg(
            F.count("dcid").cast("long").alias("n_agree"),
            F.expr("CAST(COUNT(dcid) * 10000 DIV 3 AS LONG)").alias("agree_bp"),
            F.sum("cid").cast("long").alias("tfidf_idsum"),
        )
        .join(dsum, "qid")
    )


# --- Mutual information between corpus facets ----------------------------------


@register(
    "mutual_information_source_lang_documents",
    f"""
    WITH nll(bucket, nll_ppm) AS (VALUES {{NLL_VALUES}}),
    cells AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
              FROM documents GROUP BY source, lang),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
    hx AS (
      SELECT CAST(SUM((sc * 1000000 // n) * nll_ppm) AS BIGINT) AS v
      FROM (SELECT source, CAST(SUM(c) AS BIGINT) AS sc FROM cells GROUP BY source),
           tot JOIN nll ON nll.bucket = sc * 1024 // n
    ),
    hy AS (
      SELECT CAST(SUM((lc * 1000000 // n) * nll_ppm) AS BIGINT) AS v
      FROM (SELECT lang, CAST(SUM(c) AS BIGINT) AS lc FROM cells GROUP BY lang),
           tot JOIN nll ON nll.bucket = lc * 1024 // n
    ),
    hxy AS (
      SELECT CAST(SUM((c * 1000000 // n) * nll_ppm) AS BIGINT) AS v
      FROM cells, tot JOIN nll ON nll.bucket = c * 1024 // n
    )
    SELECT 'h_source_ppm2' AS component, v AS value_ppm2 FROM hx
    UNION ALL SELECT 'h_lang_ppm2', v FROM hy
    UNION ALL SELECT 'h_joint_ppm2', v FROM hxy
    UNION ALL SELECT 'mi_ppm2', hx.v + hy.v - hxy.v FROM hx, hy, hxy
    """,
)
def mutual_information_source_lang_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mutual information between the corpus's source and language
    facets, MI = H(source) + H(lang) - H(source, lang) — the curation
    statistic that says whether ingest feeds are language-specialized
    (high MI: dropping a source silently drops a language) or mixed
    (MI ~ 0: source-level reweighting is language-neutral). Emitted as
    four rows [component, value_ppm2]: the three entropies and their MI
    combination, each in ppm^2 units (divide by 1e12 for nats).

    Exactness: the JSD/tfidf quantized-log recipe — every probability is
    snapped to 1/1024 share buckets by integer arithmetic (cnt*1024 DIV
    N) and mapped through the Python-precomputed _IDF_PPM_1024 table
    (entry b = -ln((b+1)/1025) in ppm), so each entropy term is
    (cnt*1e6 DIV N) * nll_ppm — pure int64 products, no ln in either
    engine. Quantization makes the MI combination approximate as a
    STATISTIC (error ~ entropy resolution at 1/1024, and tiny negatives
    are possible for near-independent facets) but EXACT as a gate: both
    engines compute identical integers. int64 headroom: terms <=
    1e6 * 7e6 = 7e12 per bucket, ~1e6x margin on the summed entropies.

    Scale: one corpus scan to the (source x lang) cell table (bounded by
    facet cardinalities, here 100 rows — pinned so the three entropy
    branches don't re-scan the corpus), then three tiny aggregates and
    broadcast table lookups.

    Reference parity: no counterpart; §2.4 corpus-analytics extension.
    Registered on ROTATION_NEXT (round-10 window; post-sweep addition)."""
    docs = _docs(spark, sf_dir)
    cells = (
        docs.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)  # fan-out: 3 entropy branches below
    )
    tot = cells.agg(F.sum("c").cast("long").alias("n"))
    nll = spark.createDataFrame(
        list(enumerate(_IDF_PPM_1024)), "bucket long, nll_ppm long"
    )

    def entropy(counts: DataFrame, cnt_col: str) -> DataFrame:
        return (
            counts.crossJoin(F.broadcast(tot))
            .withColumn("bucket", F.expr(f"{cnt_col} * 1024 DIV n"))
            .join(F.broadcast(nll), "bucket")
            .agg(
                F.sum(F.expr(f"({cnt_col} * 1000000 DIV n) * nll_ppm"))
                .cast("long")
                .alias("v")
            )
        )

    hx = entropy(
        cells.groupBy("source").agg(F.sum("c").cast("long").alias("sc")), "sc"
    )
    hy = entropy(
        cells.groupBy("lang").agg(F.sum("c").cast("long").alias("lc")), "lc"
    )
    hxy = entropy(cells, "c")

    def tag(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("component"), F.col("v").alias("value_ppm2")
        )

    mi = (
        hx.select(F.col("v").alias("vx"))
        .crossJoin(hy.select(F.col("v").alias("vy")))
        .crossJoin(hxy.select(F.col("v").alias("vxy")))
        .select(
            F.lit("mi_ppm2").alias("component"),
            F.expr("vx + vy - vxy").cast("long").alias("value_ppm2"),
        )
    )
    return (
        tag(hx, "h_source_ppm2")
        .unionByName(tag(hy, "h_lang_ppm2"))
        .unionByName(tag(hxy, "h_joint_ppm2"))
        .unionByName(mi)
    )


ORACLES["mutual_information_source_lang_documents"] = ORACLES[
    "mutual_information_source_lang_documents"
].replace("{NLL_VALUES}", _IDF_VALUES_SQL)


# --- Per-source unigram entropy (lexical diversity) ------------------------------


@register(
    "unigram_entropy_by_source_documents",
    """
    WITH nll(bucket, nll_ppm) AS (VALUES {NLL_VALUES}),
    toks AS (
      SELECT source,
             unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS word
      FROM documents
    ),
    t AS (SELECT source, word FROM toks WHERE word <> ''),
    cells AS (
      SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c
      FROM t GROUP BY source, word
    ),
    per_src AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM cells GROUP BY source
    ),
    h AS (
      SELECT cells.source,
             CAST(SUM((c * 1000000 // n) * nll_ppm) AS BIGINT) AS h_ppm2
      FROM cells JOIN per_src USING (source)
      JOIN nll ON nll.bucket = c * 1024 // n
      GROUP BY cells.source
    )
    SELECT p.source, p.n AS n_tokens, p.v AS n_types, h.h_ppm2
    FROM per_src p JOIN h USING (source)
    """,
)
def unigram_entropy_by_source_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shannon entropy of each source's token unigram distribution — the
    LEXICAL-diversity member of the diversity family (Simpson covers
    facet concentration, token_gini covers token inequality, Zipf/Heaps
    cover the shape; entropy is the bits-per-token number a curation
    dashboard reads before mixing sources: a low-entropy feed is
    boilerplate-heavy regardless of its size). Emitted per source:
    exact token and type counts plus the entropy in ppm² units
    (divide by 1e12 for nats).

    Exactness: the mutual_information/tfidf quantized-log recipe —
    probabilities snap to 1/1024 share buckets by integer arithmetic
    (c*1024 DIV n) and map through the Python-precomputed _IDF_PPM_1024
    table, so each term is (c*1e6 DIV n)*nll_ppm — pure int64 products,
    no ln in either engine; identical integers both sides. Rare words
    (c/n < 1/1024) land in bucket 0 = -ln(1/1025), the table's
    documented resolution floor. int64 headroom: per-word terms
    <= 1e6 * 6.9e6 ~ 7e12; summed over a 1e5-type vocabulary ~ 7e17,
    inside range with ~13x margin.

    Scale: explode is a generator (no shuffle); ONE wide shuffle to the
    (source, word) cell grain with map-side combine, then per-source
    aggregates over the vocabulary-sized cell table and a broadcast
    1025-row log-table join — the word_frequency plan shape with a
    second bounded aggregate on top.

    Reference parity: no counterpart; §2.4 corpus-analytics extension.
    Registered on ROTATION_NEXT (round-12 rotation; post-sweep addition)."""
    docs = _docs(spark, sf_dir)
    t = docs.select(
        "source",
        F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("word"),
    ).filter(F.col("word") != "")
    cells = (
        t.groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)  # fan-out: totals + entropy branches
    )
    per_src = cells.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    nll = spark.createDataFrame(
        list(enumerate(_IDF_PPM_1024)), "bucket long, nll_ppm long"
    )
    h = (
        cells.join(F.broadcast(per_src.select("source", "n")), "source")
        .withColumn("bucket", F.expr("c * 1024 DIV n"))
        .join(F.broadcast(nll), "bucket")
        .groupBy("source")
        .agg(
            F.sum(F.expr("(c * 1000000 DIV n) * nll_ppm"))
            .cast("long")
            .alias("h_ppm2")
        )
    )
    return per_src.join(h, "source").select(
        "source",
        F.col("n").alias("n_tokens"),
        F.col("v").alias("n_types"),
        "h_ppm2",
    )


ORACLES["unigram_entropy_by_source_documents"] = ORACLES[
    "unigram_entropy_by_source_documents"
].replace("{NLL_VALUES}", _IDF_VALUES_SQL)


# --- Per-source KL divergence vs the corpus unigram distribution -----------------


@register(
    "kl_source_vs_corpus_documents",
    """
    WITH nll(bucket, nll_ppm) AS (VALUES {NLL_VALUES}),
    toks AS (
      SELECT source,
             unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS word
      FROM documents
    ),
    t AS (SELECT source, word FROM toks WHERE word <> ''),
    cells AS (
      SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c
      FROM t GROUP BY source, word
    ),
    per_src AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cells GROUP BY source
    ),
    wtot AS (
      SELECT word, CAST(SUM(c) AS BIGINT) AS cw FROM cells GROUP BY word
    ),
    tot AS (SELECT CAST(SUM(cw) AS BIGINT) AS nt FROM wtot),
    terms AS (
      SELECT cells.source,
             (c * 1000000 // n) AS p_ppm,
             sn.nll_ppm AS self_nll,
             qn.nll_ppm AS corpus_nll
      FROM cells
      JOIN per_src USING (source)
      JOIN wtot USING (word), tot
      JOIN nll sn ON sn.bucket = c * 1024 // n
      JOIN nll qn ON qn.bucket = cw * 1024 // nt
    )
    SELECT source,
           CAST(SUM(p_ppm * self_nll) AS BIGINT) AS h_ppm2,
           CAST(SUM(p_ppm * corpus_nll) AS BIGINT) AS ce_ppm2,
           CAST(SUM(p_ppm * corpus_nll) - SUM(p_ppm * self_nll) AS BIGINT)
             AS kl_ppm2
    FROM terms GROUP BY source
    """,
)
def kl_source_vs_corpus_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KL divergence of each source's token unigram distribution from
    the pooled corpus distribution — the domain-shift-in-nats number a
    mixture-reweighting job reads next to the per-source entropy
    (unigram_entropy_by_source): KL(p_s ‖ q) = H(p_s, q) − H(p_s),
    emitted per source as the self-entropy, the cross-entropy against
    the corpus, and their difference, all in ppm² units. A source with
    near-zero KL is lexically interchangeable with the pool; a high-KL
    source is the one whose up/down-weighting actually moves the
    mixture.

    Exactness: the quantized-log recipe with TWO table lookups per
    (source, word) cell — the self probability bucket c·1024 DIV n_s
    and the corpus bucket c_w·1024 DIV n_total — so both entropy sums
    are pure int64 products of snapped shares and precomputed −ln ppm
    values; identical integers both engines. Like the MI gate, the
    quantization makes KL approximate AS A STATISTIC (resolution
    1/1024; tiny negative KL is possible for a source that IS the
    pool) but exact as a gate. q(w) > 0 always — the corpus contains
    every source's words — so there is no undefined-support case.

    Scale: explode, ONE wide shuffle to the (source, word) grain with
    map-side combine, a word-keyed join of the cell table against the
    vocabulary-sized word-total table (both sides already aggregated),
    broadcast 1-row total + 1025-row log tables, per-source rollup.

    Reference parity: no counterpart; §2.4 corpus-analytics extension.
    Registered on ROTATION_NEXT (round-12 rotation; post-sweep addition)."""
    docs = _docs(spark, sf_dir)
    t = docs.select(
        "source",
        F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("word"),
    ).filter(F.col("word") != "")
    cells = (
        t.groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)  # fan-out: per-src, word totals, terms
    )
    per_src = cells.groupBy("source").agg(
        F.sum("c").cast("long").alias("n")
    )
    wtot = cells.groupBy("word").agg(F.sum("c").cast("long").alias("cw"))
    tot = wtot.agg(F.sum("cw").cast("long").alias("nt"))
    nll = spark.createDataFrame(
        list(enumerate(_IDF_PPM_1024)), "bucket long, nll_ppm long"
    )
    terms = (
        cells.join(F.broadcast(per_src), "source")
        .join(wtot, "word")
        .crossJoin(F.broadcast(tot))
        .withColumn("p_ppm", F.expr("c * 1000000 DIV n"))
        .withColumn("sb", F.expr("c * 1024 DIV n"))
        .withColumn("qb", F.expr("cw * 1024 DIV nt"))
        .join(
            F.broadcast(nll.select(F.col("bucket").alias("sb"),
                                   F.col("nll_ppm").alias("self_nll"))),
            "sb",
        )
        .join(
            F.broadcast(nll.select(F.col("bucket").alias("qb"),
                                   F.col("nll_ppm").alias("corpus_nll"))),
            "qb",
        )
    )
    return terms.groupBy("source").agg(
        F.sum(F.expr("p_ppm * self_nll")).cast("long").alias("h_ppm2"),
        F.sum(F.expr("p_ppm * corpus_nll")).cast("long").alias("ce_ppm2"),
        F.expr(
            "CAST(SUM(p_ppm * corpus_nll) - SUM(p_ppm * self_nll) AS LONG)"
        ).alias("kl_ppm2"),
    )


ORACLES["kl_source_vs_corpus_documents"] = ORACLES[
    "kl_source_vs_corpus_documents"
].replace("{NLL_VALUES}", _IDF_VALUES_SQL)


# --- Reciprocal-rank-fusion hybrid retrieval -------------------------------------


@register(
    "rrf_fusion_documents",
    f"""
    WITH {_TFIDF_TOPK3_CTES},
    {_DENSE_TOPK3_CTES},
    contrib AS (
      SELECT qid, cid, CAST(1000000 // (60 + rn) AS BIGINT) AS c FROM ttop
      UNION ALL
      SELECT qid, cid, CAST(1000000 // (60 + drank) AS BIGINT) AS c FROM dtop
    ),
    fused AS (
      SELECT qid, cid, CAST(SUM(c) AS BIGINT) AS rrf_score
      FROM contrib GROUP BY qid, cid
    )
    SELECT qid, cid, rrf_score, CAST(rn AS BIGINT) AS fused_rank
    FROM (SELECT qid, cid, rrf_score,
                 ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY rrf_score DESC, cid) AS rn
          FROM fused)
    WHERE rn <= 3
    """,
)
def rrf_fusion_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by Reciprocal Rank Fusion (Cormack, Clarke &
    Buettcher, SIGIR 2009): fuse the sparse (TF-IDF inverted index) and
    dense (exact embedding cosine) top-3 lists per panel query with
    score(d) = sum over lists of 1/(60 + rank_d), and emit the fused
    top-3. THE standard way production search combines lexical and
    vector retrieval — it completes the sparse/dense pair the agreement
    audit measures into the operator a user would actually run.

    Exactness: rank contributions are integers — 1e6 DIV (60 + rank)
    with rank in 1..3 gives exactly {{16393, 16129, 15873}}; fused
    scores are small integer sums and the fused order is (score DESC,
    cid), so there is NO float anywhere in this query beyond the two
    upstream builders' already-gated 6dp ranking. Both engines compute
    the identical integers.

    Scale: both inputs are the shared panel-bounded builders (broadcast
    panel x corpus, never corpus x corpus); fusion itself touches at
    most 2 * k * |panel| rows — driver-negligible at any corpus size.

    Reference parity: no counterpart; §2.3 similarity extension.
    Registered on ROTATION_NEXT (round-10 window; post-sweep addition)."""
    docs = _docs(spark, sf_dir)
    t = _tfidf_topk3(spark, docs).select(
        "qid", "cid", F.expr("CAST(1000000 DIV (60 + rank) AS LONG)").alias("c")
    )
    d = _dense_topk3(_embs(spark, sf_dir)).select(
        F.col("dqid").alias("qid"),
        F.col("dcid").alias("cid"),
        F.expr("CAST(1000000 DIV (60 + drank) AS LONG)").alias("c"),
    )
    fused = (
        t.unionByName(d)
        .groupBy("qid", "cid")
        .agg(F.sum("c").cast("long").alias("rrf_score"))
    )
    wr = Window.partitionBy("qid").orderBy(F.col("rrf_score").desc(), F.col("cid"))
    return (
        fused.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 3)
        .select(
            "qid", "cid", "rrf_score", F.col("rn").cast("long").alias("fused_rank")
        )
    )


# --- Cross-split contamination audit (winnowing x leakage-safe split) -----------


@register(
    "cross_split_contamination_documents",
    f"""
    WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g AS (
      SELECT doc_id, GREATEST(len(toks) - 3, 0) AS m,
             CASE WHEN len(toks) >= 4
                  THEN list_transform(range(1, len(toks) - 3 + 1),
                         i -> md5(array_to_string(list_slice(toks, i, i + 3), ' ')))
                  ELSE [] END AS grams
      FROM base
    ),
    s AS (
      SELECT doc_id,
             CASE WHEN m >= 1
                  THEN list_distinct(list_transform(
                         range(1, GREATEST(m - 3, 1) + 1),
                         j -> list_aggregate(list_slice(grams, j, j + 3), 'min')))
                  ELSE [] END AS sel
      FROM g
    ),
    sp AS (
      SELECT doc_id,
             CASE WHEN {{bucket}} < 80 THEN 'train'
                  WHEN {{bucket}} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id,
                   sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                     AS fp
            FROM documents)
    ),
    ex AS (
      SELECT sp.split, s.doc_id, unnest(s.sel) AS h
      FROM s JOIN sp USING (doc_id)
    ),
    hs AS (
      SELECT h, CAST(COUNT(DISTINCT split) AS BIGINT) AS n_splits
      FROM ex GROUP BY h
    )
    SELECT ex.split,
           CAST(COUNT(DISTINCT ex.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_fp,
           CAST(SUM(CASE WHEN hs.n_splits >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_leaked,
           CAST(SUM(CASE WHEN hs.n_splits >= 2 THEN 1 ELSE 0 END) * 10000
                // COUNT(*) AS BIGINT) AS leak_bp
    FROM ex JOIN hs USING (h)
    GROUP BY ex.split
    """.replace(
        "{bucket}",
        f"({sql_hex_to_int('substring(sha256(CAST(fp AS VARCHAR)), 1, 4)', 4)}"
        " % 100)",
    ),
)
def cross_split_contamination_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-split CONTAMINATION audit — the composition that answers
    'after the leakage-safe split, how much near-duplicate text still
    straddles train/test?': winnowing fingerprints (guaranteed coverage
    of any shared w+k-1-token run) per document, split assignment from
    the content-fingerprint hash (leakage_safe_split's rule), and per
    split the share of fingerprints also selected in ANOTHER split.
    Exact duplicates land in one split by construction, so every leaked
    fingerprint here is a NEAR-duplicate or shared-boilerplate signal —
    the number an eval-integrity review reports (and the regression
    metric for tightening dedup before a training run).

    All counts integers; the winnowing set and split rule are exactly
    the gated primitives (operators/dedup.py winnowing_fingerprint_rows;
    trainprep's sha-bucket), so this query adds composition, not new
    drift surface.

    Scale: the fingerprint explode is the winnowing shuffle; the
    split tag is a pure projection; the leak join is keyed on the
    32-hex fingerprint. Reference parity: no counterpart; §2.3
    curation extension.

    Registered as a round-8 rotation candidate (post-sweep addition)."""
    from app_insights_generator_spark.operators.dedup import (
        winnowing_fingerprint_rows,
    )

    docs = _docs(spark, sf_dir)
    sel = winnowing_fingerprint_rows(docs, "doc_id", "text", k=4, w=4).select(
        "doc_id", "wmin"
    ).distinct()
    bucket = (
        F.conv(
            F.substring(
                F.sha2(F.sha2(T.normalized_text(F.col("text")), 256), 256), 1, 4
            ),
            16,
            10,
        ).cast("int")
        % 100
    )
    sp = docs.select(
        "doc_id",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )
    ex = sel.join(sp, "doc_id")
    hs = ex.groupBy("wmin").agg(
        F.count_distinct("split").cast("long").alias("n_splits")
    )
    return (
        ex.join(hs, "wmin")
        .groupBy("split")
        .agg(
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_fp"),
            F.sum(F.when(F.col("n_splits") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_leaked"),
            F.expr(
                "CAST(SUM(CASE WHEN n_splits >= 2 THEN 1 ELSE 0 END) * 10000"
                " DIV COUNT(1) AS LONG)"
            ).alias("leak_bp"),
        )
    )


# --- Bigram-LM perplexity quality filter (CCNet-style) --------------------------


@register(
    "bigram_nll_quality_documents",
    f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    bg AS (
      SELECT doc_id, toks[i] AS prev, toks[i + 1] AS cur
      FROM tok, LATERAL unnest(range(1, len(toks))) t(i)
      WHERE len(toks) >= 2
    ),
    c2 AS (SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS n2
           FROM bg GROUP BY prev, cur),
    c1 AS (SELECT prev, CAST(SUM(n2) AS BIGINT) AS n1 FROM c2 GROUP BY prev),
    nll(bucket, nll_ppm) AS (VALUES {_IDF_VALUES_SQL}),
    scored AS (
      SELECT bg.doc_id, nll_ppm
      FROM bg JOIN c2 USING (prev, cur) JOIN c1 USING (prev)
      JOIN nll ON nll.bucket = (n2 * 1024) // n1
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(nll_ppm) AS BIGINT) AS nll_sum_ppm,
           CAST(SUM(nll_ppm) // COUNT(*) AS BIGINT) AS avg_nll_ppm
    FROM scored GROUP BY doc_id
    """,
)
def bigram_nll_quality_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality scoring — the CCNet recipe (Wenzek et al.
    2020: score each document under a language model; outliers on BOTH
    tails are junk) with a self-trained bigram LM standing in for KenLM:
    per document, the mean negative log-likelihood of its bigrams under
    corpus-wide bigram statistics p(cur|prev) = c2(prev,cur)/c1(prev).

    Exactness design: the SAME quantized-log recipe as
    tfidf_neighbors_documents — p is snapped to 1/1024 share buckets by
    exact integer arithmetic ((n2*1024) DIV n1) and the negative log
    comes from the Python-precomputed _IDF_PPM_1024 table (entry b =
    round(ln(1025/(b+1))*1e6) ppm = -ln((b+1)/1025), which smooths
    p=0 buckets automatically), so per-doc NLL sums and the DIV mean
    are exact BIGINTs in both engines and no ln is ever evaluated at
    query time. Documents shorter than 2 tokens have no bigrams and are
    (correctly) absent.

    Scale: bigram counting is one map-side-combining shuffle; the LM
    table (vocab², bounded — and Zipf-truncatable by a min-count prune)
    broadcasts back onto the corpus bigram stream at 100 TB, so scoring
    is a projection. The NLL lookup table joins broadcast (1,025 rows).

    Reference parity: no counterpart; §2.3 text-quality extension
    (completes the Gopher/C4/linear-scorer family with the perplexity
    dimension). Registered on ROTATION_NEXT (round-9 window)."""
    docs = _docs(spark, sf_dir)
    t = docs.select(
        "doc_id", T.tokens(T.normalized_text(F.col("text"))).alias("toks")
    ).filter(F.size("toks") >= 2)
    bg = t.select(
        "doc_id",
        F.expr(
            "explode(transform(sequence(0, size(toks) - 2),"
            " i -> struct(toks[i] AS prev, toks[i + 1] AS cur)))"
        ).alias("b"),
    ).select("doc_id", "b.prev", "b.cur")
    c2 = bg.groupBy("prev", "cur").agg(F.count(F.lit(1)).cast("long").alias("n2"))
    c1 = c2.groupBy("prev").agg(F.sum("n2").cast("long").alias("n1"))
    nll = spark.createDataFrame(
        list(enumerate(_IDF_PPM_1024)), "bucket long, nll_ppm long"
    )
    scored = (
        bg.join(c2, ["prev", "cur"])
        .join(c1, "prev")
        .withColumn("bucket", F.expr("n2 * 1024 DIV n1"))
        .join(F.broadcast(nll), "bucket")
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("nll_ppm").cast("long").alias("nll_sum_ppm"),
        F.expr("SUM(nll_ppm) DIV COUNT(1)").cast("long").alias("avg_nll_ppm"),
    )


# --- Top principal component via integer power iteration ------------------------


def _top_pc_oracle(iterations: int = 5, scale: int = 1_000_000, width: int = 64) -> str:
    """Unrolled-iteration SQL twin of operators/similarity.py
    power_iteration_top_pc (the pagerank-oracle pattern: fixed iteration
    count -> chained CTEs, no recursion extension needed). Every division
    is BIGINT truncate-toward-zero in both engines."""
    ctes = [
        f"""e AS (
      SELECT vec_id, i AS d,
             CAST(ROUND(CAST(embedding[i] AS DOUBLE) * {scale} + 1e-9)
                  AS BIGINT) AS vi
      FROM embeddings, LATERAL unnest(range(1, {width + 1})) t(i))""",
        "meta AS (SELECT COUNT(*) AS n FROM embeddings)",
        f"mean AS (SELECT d, SUM(vi) // (SELECT n FROM meta) AS mean_ppm"
        f" FROM e GROUP BY d)",
        "c AS (SELECT vec_id, e.d, vi - mean_ppm AS c FROM e JOIN mean USING (d))",
        f"w0 AS (SELECT i AS d, CAST({scale} AS BIGINT) AS w"
        f" FROM unnest(range(1, {width + 1})) t(i))",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"""y{i} AS (
      SELECT vec_id, SUM(c.c * w.w) // {scale} AS ys
      FROM c JOIN w{i - 1} w USING (d) GROUP BY vec_id)"""
        )
        ctes.append(
            f"""wp{i} AS (
      SELECT d, SUM(c.c * ys) // {scale} AS wr
      FROM c JOIN y{i} USING (vec_id) GROUP BY d)"""
        )
        ctes.append(
            f"""nrm{i} AS (
      SELECT GREATEST(ABS(wr), 1) AS m,
             CASE WHEN wr >= 0 THEN 1 ELSE -1 END AS sgn
      FROM wp{i} ORDER BY ABS(wr) DESC, d LIMIT 1)"""
        )
        ctes.append(
            f"w{i} AS (SELECT d, sgn * wr * {scale} // m AS w FROM wp{i}, nrm{i})"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT mean.d AS dim, CAST(mean_ppm AS BIGINT) AS mean_ppm,
           CAST(w AS BIGINT) AS weight_ppm
    FROM mean JOIN w{iterations} USING (d)"""
    )


@register("top_pc_power_iteration_embeddings", _top_pc_oracle())
def top_pc_power_iteration_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embeddings table
    (operators/similarity.py power_iteration_top_pc): 5 integer
    fixed-point power-iteration rounds over the ppm-centered matrix,
    max-abs normalization with a deterministic global sign — the
    embedding-drift / whitening primitive. The oracle unrolls the same
    recurrence as chained CTEs (the pagerank pattern), so the gate pins
    an ITERATIVE linear-algebra loop across engines bit-for-bit; pytest
    separately checks the integer result against a float reference of
    the same 5 rounds (quantization-only error) and full eigenvector
    convergence on a planted-direction corpus. On THIS near-isotropic
    synthetic table (lambda2/lambda1 ~ 0.93) 5 rounds are a
    deterministic fixture, not a converged eigenvector — `iterations`
    is the dial (~40 rounds converge here; measured).

    Reference parity: no counterpart; §2.3 embedding-analytics
    extension. Registered on ROTATION_NEXT (round-9 window)."""
    return S.power_iteration_top_pc(
        _embs(spark, sf_dir), "embedding", "vec_id", iterations=5
    )


# --- Leave-one-out 1-NN label accuracy (embedding-quality eval) ------------------


@register(
    "knn_label_accuracy_embeddings",
    """
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e,
                      sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
               FROM embeddings),
    sims AS (
      SELECT a.vec_id, a.label AS a_label, b.label AS b_label,
             ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY ROUND(list_dot_product(a.e, b.e) / (a.n * b.n) + 1e-9, 6)
                        DESC, b.vec_id) AS rn
      FROM v a JOIN v b ON a.vec_id <> b.vec_id
      WHERE a.n > 0 AND b.n > 0
    )
    SELECT a_label AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN a_label = b_label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           CAST(SUM(CASE WHEN a_label = b_label THEN 1 ELSE 0 END) * 10000
                // COUNT(*) AS BIGINT) AS accuracy_bp
    FROM sims WHERE rn = 1 GROUP BY a_label
    """,
)
def knn_label_accuracy_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 1-NN label accuracy — the standard embedding-quality
    eval (does nearest-in-cosine mean same-class?), reported per label as
    exact integer counts + basis points. The neighbor argmax uses the
    engine-wide 6dp+1e-9 rounded cosine with the (sim DESC, id) tie-break
    (the matryoshka_recall ranking recipe), so both engines pick the
    identical neighbor.

    EXACT all-pairs BY DESIGN — the bounded truth-anchor class
    (oracle_exact_cosine_pairs' documented never-production family): this
    is the evaluation harness for the ANN operators, whose candidate
    generation (IVF lists, LSH bands, SemDeDup clusters) is the 100 TB
    path; at scale the same accuracy audit runs on a fixed EVAL SAMPLE
    (thousands of rows), not the corpus.

    Reference parity: no counterpart; §2.3 embedding-analytics extension.
    Registered on ROTATION_NEXT (round-9 window)."""
    embs = _embs(spark, sf_dir)
    base = embs.select(
        "vec_id",
        "label",
        F.col("embedding").alias("_v"),
        S.norm(F.col("embedding")).alias("_n"),
    )
    a, b = base.alias("a"), base.alias("b")
    # Arrow-batched pair cosine (S.pair_cosine — identical result): the
    # norm pre-filter guarantees denom > 0, where pair_cosine's
    # when-branch IS dot/denom; round + 1e-9 stays JVM-side unchanged.
    sim = F.round(
        S.pair_cosine(
            F.col("a._v"), F.col("b._v"), F.col("a._n"), F.col("b._n")
        )
        + F.lit(1e-9),
        6,
    )
    sims = (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .filter((F.col("a._n") > 0) & (F.col("b._n") > 0))
        .select(
            F.col("a.vec_id").alias("vid"),
            F.col("a.label").alias("a_label"),
            F.col("b.label").alias("b_label"),
            sim.alias("s"),
            F.col("b.vec_id").alias("bid"),
        )
    )
    w = Window.partitionBy("vid").orderBy(F.col("s").desc(), F.col("bid"))
    nn = sims.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return nn.groupBy(F.col("a_label").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum(F.expr("CASE WHEN a_label = b_label THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_correct"),
        F.expr(
            "CAST(SUM(CASE WHEN a_label = b_label THEN 1 ELSE 0 END) * 10000"
            " DIV COUNT(1) AS LONG)"
        ).alias("accuracy_bp"),
    )


# --- Near-dup rate per source (curation dashboard) -------------------------------


@register(
    "dedup_rate_by_source_documents",
    f"""
    WITH {_JACCARD_ALL_PAIRS_CTES},
    dup AS (
      SELECT DISTINCT id_b AS doc_id FROM jac WHERE jaccard >= 0.5
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(dup.doc_id) AS BIGINT) AS n_dups,
           CAST(COUNT(dup.doc_id) * 10000 // COUNT(*) AS BIGINT) AS dup_bp
    FROM documents d LEFT JOIN dup ON dup.doc_id = d.doc_id
    GROUP BY d.source
    """,
    tier="sf0.01",
)
def dedup_rate_by_source_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate rate PER SOURCE — the curation-dashboard staple
    (which ingest feeds are flooding the corpus with copies; the number
    that decides source-level mixture reweighting before token budgets
    are spent): a document counts as a dup if the MinHash+LSH+verify
    pipeline (operators/dedup.py near_dedup_minhash, threshold 0.5 —
    the dedup_minhash_documents machinery, whose pair set equals the
    exact truth set on this corpus, equality argument in that
    docstring) flags it with a smaller-id near neighbor. Exact integer
    counts + basis points per source.

    Scale: the pair pipeline is the gated banded-LSH path; the rollup
    adds one left join of the dup-id set onto the doc->source projection
    and a source-grain aggregate. The dup-id side is O(dup_rate x
    corpus) — at 100 TB with a realistic 10-50% near-dup rate that is
    billions of ids, so the join is deliberately NOT broadcast-hinted
    (VERDICT r08 #2: a forced broadcast ignores
    autoBroadcastJoinThreshold and OOMs the driver exactly when the
    dashboard matters most); AQE sizes it at runtime and will still
    pick a broadcast when the set really is small.

    Oracle-tier note: the ORACLE (not the operator) is the O(n^2) exact
    all-pairs Jaccard — at sf0.1 that is 12.5M list-intersect pairs and
    DuckDB did not finish in 45 min (measured round 8), so deep local
    checks for this query run at the sf0.01 gate tier (11s, the tier
    the driver samples), the dedup_minhash_documents precedent; the
    Spark side is sanity-run at sf0.1 (5,000 docs, 244 dups, bp
    bounds) without the cross-engine compare.

    Reference parity: no counterpart; §2.3 curation-report extension.
    Registered on ROTATION_NEXT (round-9 window)."""
    docs = _docs(spark, sf_dir)
    dup = (
        D.near_dedup_minhash(docs, "doc_id", "text", shingle_n=3, threshold=0.5)
        .select(F.col("id_b").alias("dup_id"))
        .distinct()
    )
    return (
        docs.select("doc_id", "source")
        .join(dup, docs.doc_id == F.col("dup_id"), "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count("dup_id").cast("long").alias("n_dups"),
            F.expr("CAST(COUNT(dup_id) * 10000 DIV COUNT(1) AS LONG)").alias(
                "dup_bp"
            ),
        )
    )


# --- DSIR importance-resampling weights ------------------------------------------


@register(
    "dsir_importance_documents",
    f"""
    WITH nll(bucket, nll_ppm) AS (VALUES {{NLL_VALUES}}),
    tok AS (
      SELECT d.doc_id, unnest({_TOKS}) AS term, d.lang
      FROM documents d
    ),
    h AS (
      SELECT doc_id, lang,
             {{HEX4}} % 128 AS bucket
      FROM tok
    ),
    rawb AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS rc FROM h GROUP BY bucket),
    tgtb AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS tc
             FROM h WHERE lang = 'en' GROUP BY bucket),
    rtot AS (SELECT CAST(SUM(rc) AS BIGINT) AS rt FROM rawb),
    ttot AS (SELECT CAST(SUM(tc) AS BIGINT) AS tt FROM tgtb),
    delta AS (
      SELECT r.bucket,
             nr.nll_ppm - nt.nll_ppm AS delta_ppm
      FROM rawb r LEFT JOIN tgtb t ON t.bucket = r.bucket, rtot, ttot
      JOIN nll nr ON nr.bucket = r.rc * 1024 // rt
      JOIN nll nt ON nt.bucket = COALESCE(t.tc, 0) * 1024 // tt
    ),
    docbkt AS (
      SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS c
      FROM h GROUP BY doc_id, bucket
    ),
    docw AS (
      SELECT db.doc_id, CAST(SUM(db.c * d.delta_ppm) AS BIGINT) AS logw_ppm
      FROM docbkt db JOIN delta d ON d.bucket = db.bucket
      GROUP BY db.doc_id
    ),
    ranked AS (
      SELECT doc_id, logw_ppm,
             CAST(ROW_NUMBER() OVER (ORDER BY logw_ppm DESC, doc_id)
                  AS BIGINT) AS rank
      FROM docw
    )
    SELECT r.rank, r.doc_id, d.source, d.lang, r.logw_ppm
    FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
    WHERE r.rank <= 50
    """,
)
def dsir_importance_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.,
    NeurIPS 2023) — over hashed unigram features: build a 128-bucket
    bag-of-words model of the TARGET distribution (the lang='en' slice,
    standing in for "looks like the high-quality reference corpus") and
    of the RAW corpus, score every document by its estimated importance
    log w(x) = sum_tokens [log p_target(bucket) - log p_raw(bucket)],
    and emit the top-50 selection — the distribution-matching data
    selector that picks pretraining documents resembling a target
    domain without training a classifier.

    Exactness: token -> bucket is the feature_hashing md5 recipe
    (first 4 hex digits mod 128 — cross-engine stable, no engine hash
    builtin); each model probability is snapped to 1/1024 share buckets
    by integer arithmetic and mapped through the Python-precomputed
    _IDF_PPM_1024 table, so delta(bucket) = nll_raw - nll_target and
    every doc score is a pure int64 sum of count * delta_ppm — no ln
    and no float anywhere (the JSD/MI recipe). Buckets unseen in the
    target snap to share-bucket 0 (nll = ln 1025), the quantizer's
    built-in smoothing — no explicit add-one needed. int64 headroom:
    |delta| <= 7e6 ppm, so a 1M-token doc stays below 7e12.

    Scale: one explode + two bucket-grain aggregates (128 rows each —
    the model tables BROADCAST no matter the corpus size; that fixed
    feature width is DSIR's whole point) + one (doc, bucket) aggregate
    joined against the broadcast delta table, then a global top-50
    (TakeOrderedAndProject, no full sort materialization).

    Reference parity: no counterpart; §2.6 curation extension — the
    distribution-MATCHING selector next to the threshold selectors
    (quality_linear_scores, bigram_nll) and the mixture reweighters.
    Registered on ROTATION_NEXT (round-10 window; post-sweep addition)."""
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(
                F.split(T.normalized_text(F.col("text")), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("term"),
    )
    # Pre-aggregate to the (doc, lang, bucket) grain BEFORE pinning: the
    # three fan-out consumers (raw model, target model, doc scores) all
    # consume counts, never individual token rows, so materializing the
    # exploded token table was pure waste — one map-side-partial groupBy
    # collapses it to <= docs x 128 rows, and the pinned table (plus every
    # downstream scan and shuffle) shrinks by the tokens-per-doc factor
    # (guide §2.3: aggregate before you shuffle). Counts are identical:
    # rc/tc/c below are sums of these partial counts.
    h = (
        tok.select(
            "doc_id",
            "lang",
            (F.conv(F.substring(F.md5("term"), 1, 4), 16, 10).cast("long") % 128)
            .alias("bucket"),
        )
        .groupBy("doc_id", "lang", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        .localCheckpoint(eager=True)  # fan-out: raw model, target model, doc counts
    )
    # Both models in ONE aggregation over the pinned table: tc is the
    # lang='en' slice as a conditional sum (NULL when no target rows hit
    # the bucket — exactly the rows the old rawb LEFT JOIN tgtb produced,
    # and the COALESCE(tc, 0) below is unchanged), so the second scan of
    # h and the bucket-grain join disappear from the plan.
    models = h.groupBy("bucket").agg(
        F.sum("_c").cast("long").alias("rc"),
        F.sum(F.when(F.col("lang") == "en", F.col("_c"))).cast("long").alias("tc"),
    )
    rtot = models.agg(F.sum("rc").cast("long").alias("rt"))
    ttot = models.agg(F.sum("tc").cast("long").alias("tt"))
    nll = spark.createDataFrame(
        list(enumerate(_IDF_PPM_1024)), "b long, nll_ppm long"
    )
    nr = nll.select(F.col("b").alias("br"), F.col("nll_ppm").alias("nllr"))
    nt = nll.select(F.col("b").alias("bt"), F.col("nll_ppm").alias("nllt"))
    delta = (
        models
        .crossJoin(F.broadcast(rtot))
        .crossJoin(F.broadcast(ttot))
        .join(F.broadcast(nr), F.expr("rc * 1024 DIV rt") == F.col("br"))
        .join(
            F.broadcast(nt),
            F.expr("COALESCE(tc, 0) * 1024 DIV tt") == F.col("bt"),
        )
        .select("bucket", F.expr("nllr - nllt").alias("delta_ppm"))
    )
    docbkt = h.groupBy("doc_id", "bucket").agg(
        F.sum("_c").cast("long").alias("c")
    )
    docw = (
        docbkt.join(F.broadcast(delta), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.expr("c * delta_ppm")).cast("long").alias("logw_ppm"))
    )
    w_rank = Window.orderBy(F.col("logw_ppm").desc(), F.col("doc_id"))
    ranked = docw.select(
        F.row_number().over(w_rank).cast("long").alias("rank"),
        "doc_id",
        "logw_ppm",
    ).filter(F.col("rank") <= 50)
    return ranked.join(docs.select("doc_id", "source", "lang"), "doc_id").select(
        "rank", "doc_id", "source", "lang", "logw_ppm"
    )


ORACLES["dsir_importance_documents"] = (
    ORACLES["dsir_importance_documents"]
    .replace("{NLL_VALUES}", _IDF_VALUES_SQL)
    .replace(
        "{HEX4}",
        sql_hex_to_int("substring(md5(term), 1, 4)", 4),
    )
)


# --- KMV (bottom-k) distinct-vocabulary sketch with exact audit -------------------


@register(
    "kmv_vocab_ndv_sources",
    f"""
    WITH tok AS (
      SELECT DISTINCT d.source, unnest({_TOKS}) AS term
      FROM documents d
    ),
    h AS (
      SELECT DISTINCT source,
             {{HEX8}} + 1 AS hv
      FROM tok
    ),
    ranked AS (
      SELECT source, hv,
             CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv)
                  AS BIGINT) AS rk
      FROM h
    ),
    exact AS (
      SELECT source, CAST(COUNT(DISTINCT term) AS BIGINT) AS exact_ndv
      FROM tok GROUP BY source
    ),
    kth AS (
      SELECT source,
             CAST(MAX(CASE WHEN rk = 64 THEN hv END) AS BIGINT) AS kth_hash
      FROM ranked GROUP BY source
    ),
    persrc AS (
      SELECT e.source, e.exact_ndv, k.kth_hash
      FROM exact e JOIN kth k ON k.source = e.source
    ),
    uh AS (
      SELECT hv, CAST(ROW_NUMBER() OVER (ORDER BY hv) AS BIGINT) AS rk
      FROM (SELECT DISTINCT hv FROM h)
    ),
    uni AS (
      SELECT '__union__' AS source,
             (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) FROM tok) AS exact_ndv,
             CAST(MAX(CASE WHEN rk = 64 THEN hv END) AS BIGINT) AS kth_hash
      FROM uh
    ),
    allrows AS (
      SELECT * FROM persrc UNION ALL SELECT * FROM uni
    )
    SELECT source, exact_ndv, COALESCE(kth_hash, 0) AS kth_hash,
           CASE WHEN kth_hash IS NULL THEN exact_ndv
                ELSE 63 * 4294967296 // kth_hash END AS kmv_est
    FROM allrows
    """,
)
def kmv_vocab_ndv_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / bottom-k distinct-count sketch (Bar-Yossef et al. 2002;
    the theta-sketch core) over each source's token vocabulary, with
    the exact NDV alongside as the audit anchor: hash every distinct
    (source, term) into a 32-bit space (md5 first 8 hex digits — the
    cross-engine-stable feature_hashing recipe), keep each source's 64
    smallest distinct hash values, and estimate NDV = (k-1) * 2^32 /
    h_(k). The '__union__' row merges the sketches the KMV way — the
    union's bottom-64 IS the bottom-64 of the pooled hash sets — which
    is the mergeability that makes bottom-k the distributed-NDV
    workhorse (and, unlike HLL, the estimate is pure integer
    arithmetic, so BOTH engines compute the identical sketch, kth
    value, and estimate — no invariant-framing needed, the gap the
    HLL queries had to audit around).

    Exactness: everything is int64 — hashes in [1, 2^32], the rank-64
    selection, and the (k-1)*2^32 DIV h_k estimate (max 63*2^32 ~
    2.7e11). Sources with vocabulary < 64 fall back to their exact
    count (kth IS NULL -> exact, emitted with kth_hash 0).

    Scale: one explode + distinct to the (source, term) grain, one
    distinct hash projection, and a per-source window on values that a
    TOP-64-per-key aggregation bounds; the exact-NDV audit column is
    the gate-scale anchor (at 100 TB the sketch IS the product and the
    exact side runs on samples — the ann_recall/percentile_sketch
    audit discipline).

    Reference parity: no counterpart; §2.4 sketch-family extension —
    the mergeable-bottom-k member next to HLL (bitmap), CMS (counts),
    and the percentile sketch.
    Registered on ROTATION_NEXT (round-10 window; post-sweep addition)."""
    docs = _docs(spark, sf_dir)
    tok = (
        docs.select(
            "source",
            F.explode(
                F.filter(
                    F.split(T.normalized_text(F.col("text")), r"\s+"),
                    lambda t: t != F.lit(""),
                )
            ).alias("term"),
        )
        .distinct()
        .localCheckpoint(eager=True)  # fan-out: hashes + exact NDV audits
    )
    h = tok.select(
        "source",
        (F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long") + 1)
        .alias("hv"),
    ).distinct()
    w_src = Window.partitionBy("source").orderBy("hv")
    ranked = h.select(
        "source", "hv", F.row_number().over(w_src).cast("long").alias("rk")
    )
    kth = ranked.groupBy("source").agg(
        F.max(F.when(F.col("rk") == 64, F.col("hv")))
        .cast("long")
        .alias("kth_hash")
    )
    exact = tok.groupBy("source").agg(
        F.countDistinct("term").cast("long").alias("exact_ndv")
    )
    persrc = exact.join(kth, "source")
    # Union kth: only the 64 smallest distinct hashes matter, so a
    # sort+limit (planned as distributed TakeOrderedAndProject) replaces
    # the unpartitioned row_number window — the old plan shuffled EVERY
    # distinct hash to one task and sorted them all there, the classic
    # global-window scale cliff (guide §2.4). max-of-bottom-64 == the
    # rank-64 value; fewer than 64 distinct hashes -> NULL, as before.
    uh = h.select("hv").distinct().orderBy("hv").limit(64)
    ukth = uh.agg(
        F.when(F.count(F.lit(1)) >= 64, F.max("hv"))
        .cast("long")
        .alias("kth_hash")
    )
    uexact = tok.agg(F.countDistinct("term").cast("long").alias("exact_ndv"))
    uni = uexact.crossJoin(F.broadcast(ukth)).select(
        F.lit("__union__").alias("source"), "exact_ndv", "kth_hash"
    )
    allrows = persrc.select("source", "exact_ndv", "kth_hash").unionByName(uni)
    return allrows.select(
        "source",
        "exact_ndv",
        F.coalesce("kth_hash", F.lit(0)).cast("long").alias("kth_hash"),
        F.expr(
            "CASE WHEN kth_hash IS NULL THEN exact_ndv"
            " ELSE 63 * 4294967296 DIV kth_hash END"
        )
        .cast("long")
        .alias("kmv_est"),
    )


ORACLES["kmv_vocab_ndv_sources"] = ORACLES["kmv_vocab_ndv_sources"].replace(
    "{HEX8}", sql_hex_to_int("substring(md5(term), 1, 8)", 8)
)


# --- Vocabulary coverage curve (tokenizer budget planning) ------------------------


@register(
    "vocab_coverage_curve_documents",
    f"""
    WITH tok AS (
      SELECT unnest({_TOKS}) AS term FROM documents
    ),
    tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY term),
    ranked AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS rn,
             CAST(SUM(cnt) OVER (ORDER BY cnt DESC, term
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER () AS BIGINT) AS total,
             CAST(COUNT(*) OVER () AS BIGINT) AS n_types
      FROM tc
    ),
    ks AS (SELECT CAST(unnest([64, 256, 1024, 4096, 16384]) AS BIGINT) AS k)
    SELECT ks.k,
           r.rn AS types_used,
           r.cum AS covered_tokens,
           r.total AS total_tokens,
           r.cum * 10000 // r.total AS coverage_bp
    FROM ks JOIN ranked r ON r.rn = LEAST(ks.k, r.n_types)
    """,
)
def vocab_coverage_curve_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Vocabulary coverage curve — what share of all corpus TOKENS a
    top-k TYPE vocabulary covers, for k in {{64, 256, 1k, 4k, 16k}} —
    the tokenizer-budget planning curve (how big a word-level vocab
    must be before <unk> rates are tolerable; the empirical face of
    Zipf's law the way heaps_vocab_growth is of Heaps'). Ranks ties
    deterministically by (count DESC, term), and a k beyond the
    observed vocabulary clamps to the full-vocab row (LEAST(k,
    n_types) — coverage 100% with types_used = n_types, rather than a
    silently missing row).

    Exactness: counts, ranks, cumulative sums, and coverage_bp =
    cum * 10000 DIV total are all int64; no float anywhere.

    Plan: one explode + term-grain aggregate (map-side combined), one
    window over the VOCABULARY grid (bounded by distinct types, not
    token volume), one broadcast 5-row join. At 100 TB the vocab grid
    window is the only single-partition step and is vocabulary-bounded;
    the standard mitigation (pre-bucket by count then window within
    bucket) applies if the type space itself explodes.

    Reference parity: no counterpart; §2.6 curation extension next to
    zipf_rank_frequency / heaps_vocab_growth / tokenizer_fertility.
    Registered on ROTATION_NEXT (round-10 window; post-sweep addition)."""
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        F.explode(
            F.filter(
                F.split(T.normalized_text(F.col("text")), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("term")
    )
    tc = tok.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w_rank = Window.orderBy(F.col("cnt").desc(), F.col("term"))
    wall = Window.partitionBy()
    ranked = tc.select(
        F.row_number().over(w_rank).cast("long").alias("rn"),
        F.sum("cnt")
        .over(w_rank.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum"),
        F.sum("cnt").over(wall).cast("long").alias("total"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n_types"),
    )
    ks = spark.createDataFrame(
        [(64,), (256,), (1024,), (4096,), (16384,)], "k long"
    )
    return (
        F.broadcast(ks)
        .join(ranked, F.expr("rn = LEAST(k, n_types)"))
        .select(
            "k",
            F.col("rn").alias("types_used"),
            F.col("cum").alias("covered_tokens"),
            F.col("total").alias("total_tokens"),
            F.expr("cum * 10000 DIV total").alias("coverage_bp"),
        )
    )


# --- McNemar's paired test between the two quality labelers ------------------------


@register(
    "mcnemar_quality_documents",
    f"""
    WITH g AS (SELECT doc_id, ok_word_count AS gk
               FROM ({{GOPHER}})),
    l AS (SELECT doc_id, keep AS lk
          FROM ({{LINEAR}})),
    j AS (SELECT gk, lk FROM g JOIN l USING (doc_id)),
    c AS (SELECT
            CAST(SUM(CASE WHEN gk AND NOT lk THEN 1 ELSE 0 END) AS BIGINT) AS n10,
            CAST(SUM(CASE WHEN NOT gk AND lk THEN 1 ELSE 0 END) AS BIGINT) AS n01
          FROM j)
    SELECT n10, n01,
           (n10 - n01) * (n10 - n01) AS diff_sq,
           CASE WHEN n10 + n01 = 0 THEN 0.0
                ELSE CAST((n10 - n01) * (n10 - n01) AS DOUBLE) / (n10 + n01)
           END AS mcnemar_chi2,
           CASE WHEN n10 + n01 = 0 THEN 0.0
                ELSE CAST((ABS(n10 - n01) - 1) * (ABS(n10 - n01) - 1)
                          AS DOUBLE) / (n10 + n01)
           END AS mcnemar_chi2_cc
    FROM c
    """,
)
def mcnemar_quality_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test (McNemar 1947) between the two quality labelers —
    the DIRECTIONAL companion of cohens_kappa: kappa measures agreement,
    McNemar asks whether the DISAGREEMENTS are one-sided (does the
    linear scorer systematically keep what the word-count rule drops,
    or vice versa?), which is the question that decides whether swapping
    filters shifts corpus composition or just reshuffles noise. Only the
    discordant cells matter: chi2 = (n10-n01)^2/(n10+n01), emitted raw
    and with the Edwards continuity correction.

    Exactness: counts and diff_sq are int64; the two chi-squares are
    single final IEEE divisions of exact integers (acf discipline) with
    the zero-discordance CASE guard. The oracle embeds both labelers'
    registered oracle SQL as derived tables (the kappa discipline), so
    the three gates can never drift on a labeler's definition.

    Scale: identical shape to kappa — two scorer scans, one doc_id-keyed
    join, a 1-row aggregate.

    Reference parity: no counterpart; §2.6 curation extension.
    Registered on ROTATION_NEXT (round-10 window; post-sweep addition)."""
    g = gopher_quality_rules_documents(spark, sf_dir).select(
        "doc_id", F.col("ok_word_count").alias("gk")
    )
    lin = quality_linear_scores_documents(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("lk")
    )
    c = g.join(lin, "doc_id").agg(
        F.sum(F.expr("CASE WHEN gk AND NOT lk THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n10"),
        F.sum(F.expr("CASE WHEN NOT gk AND lk THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n01"),
    )
    return c.select(
        "n10",
        "n01",
        F.expr("(n10 - n01) * (n10 - n01)").alias("diff_sq"),
        F.expr(
            "CASE WHEN n10 + n01 = 0 THEN 0.0"
            " ELSE CAST((n10 - n01) * (n10 - n01) AS DOUBLE) / (n10 + n01)"
            " END"
        ).alias("mcnemar_chi2"),
        F.expr(
            "CASE WHEN n10 + n01 = 0 THEN 0.0"
            " ELSE CAST((ABS(n10 - n01) - 1) * (ABS(n10 - n01) - 1)"
            " AS DOUBLE) / (n10 + n01) END"
        ).alias("mcnemar_chi2_cc"),
    )


ORACLES["mcnemar_quality_documents"] = (
    ORACLES["mcnemar_quality_documents"]
    .replace("{GOPHER}", ORACLES["gopher_quality_rules_documents"])
    .replace("{LINEAR}", ORACLES["quality_linear_scores_documents"])
)


# --- Pseudo-count shrinkage of per-source quality means ---------------------------

_SHRINK_K = 50


@register(
    "shrunk_source_quality_documents",
    f"""
    WITH scored AS (
      SELECT source,
             CAST(ROUND(({{Q}} + 1e-9) * 10) AS BIGINT) AS q10
      FROM documents
    ),
    per AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q10) AS BIGINT) AS s
      FROM scored GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS d, CAST(SUM(s) AS BIGINT) AS t
            FROM per)
    SELECT source, n, s,
           CAST(s AS DOUBLE) / (10.0 * n) AS raw_mean,
           CAST(s * d + {_SHRINK_K} * t AS DOUBLE)
             / (10.0 * (n + {_SHRINK_K}) * d) AS shrunk_mean,
           CAST({_SHRINK_K} * 10000 // (n + {_SHRINK_K}) AS BIGINT)
             AS shrink_weight_bp
    FROM per, tot
    """,
)
def shrunk_source_quality_documents(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pseudo-count (empirical-Bayes-style) shrinkage of per-source mean
    quality toward the corpus grand mean — the stabilizer a curation
    dashboard needs before ranking or thresholding SOURCES: a 30-doc
    source's raw mean is mostly noise, so each source mean is blended
    with the grand mean at weight k/(n_s+k), k={_SHRINK_K} pseudo-docs
    (the add-k smoothing form of the James-Stein idea with a fixed
    prior strength; per-source shrink weight emitted in integer bp so
    the blend itself is hash-pinned). Quality is the exact 1-decimal
    score scaled to int (q10), per-source sums/counts and the
    grand-mean rational (t/d) stay exact int64, and both means are
    final float expressions of exact integers with identical text in
    both engines — no float is ever summed across rows.

    Plan: one scan + per-source aggregate (20 rows), one 1-row total
    broadcast; the scan projects only (source, text).

    Reference parity: no counterpart; §2.3 curation extension.
    Registered on ROTATION_NEXT (round-11 window; post-sweep addition)."""
    docs = _docs(spark, sf_dir)
    # the shared scorer expression (JVM-side, no UDF), scaled to int
    scored = docs.select(
        "source",
        F.round((T.quality_score(F.col("text")) + F.lit(1e-9)) * 10)
        .cast("long")
        .alias("q10"),
    )
    per = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("q10").cast("long").alias("s"),
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("d"), F.sum("s").cast("long").alias("t")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        "s",
        F.expr("CAST(s AS DOUBLE) / (10.0 * n)").alias("raw_mean"),
        F.expr(
            f"CAST(s * d + {_SHRINK_K} * t AS DOUBLE)"
            f" / (10.0 * (n + {_SHRINK_K}) * d)"
        ).alias("shrunk_mean"),
        F.expr(f"CAST({_SHRINK_K} * 10000 DIV (n + {_SHRINK_K}) AS BIGINT)")
        .alias("shrink_weight_bp"),
    )


ORACLES["shrunk_source_quality_documents"] = ORACLES[
    "shrunk_source_quality_documents"
].replace("{Q}", _quality_score_sql())
