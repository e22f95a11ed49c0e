"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side built-ins (whole-stage codegen) — no Python in the hot path.
Each returns a Column so callers compose them into any plan. Semantics are
deliberately SQL-expressible so the DuckDB oracle can mirror them exactly.

Reference parity: the reference does per-record text munging in its readers
and models (title cleanup, language normalization — core/model/work.py,
core/model/language.py in NYPL/sfr-ingest-pipeline, reconstructed; SURVEY.md
§2.8 F1/F3); here the same class of work is vectorized and declarative.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokens = maximal runs of non-whitespace (same regex on the DuckDB side).
_TOKEN_RE = r"\S+"

# Tiny stopword inventories per language for the marker-based language-ID
# heuristic. Word-boundary regexes keep Spark and DuckDB semantics identical.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|is)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|los|las|es|y)\b",
}

STOPWORD_RE = r"\b(the|a|an|of|and|or|to|in|is)\b"


def token_count(col: Column | str) -> Column:
    """Number of whitespace-delimited tokens (0 for empty/null-ish text)."""
    return F.size(F.regexp_extract_all(F.col(col) if isinstance(col, str) else col,
                                       F.lit(_TOKEN_RE), F.lit(0)))


def stopword_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(STOPWORD_RE))


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"[.,;:!?]"))


def quality_score(col: Column | str) -> Column:
    """Deterministic quality heuristic: log-length + stopword ratio - punct
    density. The exact formula matters less than it being reproducible in
    ANSI SQL for the oracle; rounded to 4 decimals by callers for stable
    float comparison."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c).cast("double")
    stop = stopword_count(c).cast("double")
    punct = punct_count(c).cast("double")
    safe_tok = F.greatest(n_tok, F.lit(1.0))
    return (
        F.log(F.lit(1.0) + n_tok) * F.lit(0.5)
        + (stop / safe_tok) * F.lit(2.0)
        - (punct / safe_tok)
    )


def lang_id(col: Column | str) -> Column:
    """Marker-word language ID: the language whose stopword markers hit most;
    ties broken by fixed priority en > de > fr > es; no hits -> 'und'."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(c)
    counts = {k: F.regexp_count(low, F.lit(v)) for k, v in LANG_MARKERS.items()}
    best = F.greatest(*counts.values())
    out = F.lit("und")
    # reversed priority: later .when wins earlier in the chain semantics, so
    # build en first by chaining in priority order
    expr = F.when(best == 0, F.lit("und"))
    for lang in ["en", "de", "fr", "es"]:
        expr = expr.when(counts[lang] == best, F.lit(lang))
    return expr.otherwise(out)


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the lowercased alphanumeric skeleton —
    a cheap canonical-form hash for exact-ish dedup (whitespace/punct/case
    insensitive)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", ""))


# GPT-2-style pre-tokenizer regex (public pattern), minus the \s+(?!\S)
# lookahead — RE2 (DuckDB) has no lookahead, and dropping it only changes
# how trailing whitespace groups, identically on both engines. Counts are
# verified byte-equal between Spark (Java regex) and DuckDB (RE2).
BPE_TOKEN_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish token count: the GPT-2 pre-tokenization segmentation (letters
    / digits / punctuation runs with leading-space affinity + English
    contractions). A training-data cost proxy that tracks real BPE token
    counts far closer than whitespace splitting, while staying a pure
    codegen regex — no vocab, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), F.lit(0)))


# Word = maximal lowercase-alphanumeric run; the unit for TF-IDF and the
# repetition statistics below (same regex on the DuckDB side).
WORD_RE = r"[a-z0-9]+"


def _words(docs, id_col: str, text_col: str):
    """One (id, term) row per word occurrence — the exploded token stream
    both tfidf_top_terms and repetition_stats aggregate over."""
    return docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), F.lit(0))
        ).alias("term"),
    )


def tfidf_top_terms(docs, id_col: str, text_col: str, k: int = 3):
    """Top-``k`` TF-IDF terms per document.

    tfidf = tf * ln(n_docs / df); ranked per document by (rounded score
    desc, term asc) so the ordering is deterministic and oracle-mirrorable
    (ln agreement at 4-dp rounding between JVM and DuckDB is already proven
    by ``quality_scores``).

    Scale shape (round 6): explode -> ONE doc-term tf hash aggregation
    (map-side partial) -> term-partitioned window count for df -> per-doc
    window for the rank. The previous join formulation derived df from a
    second aggregation over the tf subtree, and Spark planned that as a
    full second evaluation of the tokenize+tf lineage (no ReusedExchange
    even at runtime) — the corpus was tokenized twice. The window count
    reuses the single tf stream; measured identical rows, ~10% faster at
    sf0.1, and half the tokenization work, which dominates at corpus
    scale. No driver actions: n_docs rides in as a 1-row broadcast cross
    join. All codegen, no Python.
    """
    from pyspark.sql import Window

    tf = (
        _words(docs, id_col, text_col)
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4),
        )
    )

    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rk")
    )


def repetition_stats(docs, id_col: str, text_col: str):
    """Gopher-style within-document repetition statistics (Rae et al. 2021,
    'Scaling Language Models' quality rules, public): per document —

    * ``n_words``     total word count;
    * ``top_word_frac``    occurrences of the most frequent word / n_words;
    * ``dup_bigram_frac``  duplicated word-bigram occurrences / total bigrams
      (1 - distinct/total; 0.0 when the doc has < 2 words).

    Shape: explode words and bigrams once each, two hash aggregations per
    stream (map-side partial), join the two per-doc stat rows. Linear in
    corpus size — never the O(distinct x length) per-row array fold a
    higher-order-function version would cost on long documents.
    """
    words = _words(docs, id_col, text_col)
    wstats = (
        words.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_words"),
            F.max("cnt").alias("top_cnt"),
        )
    )
    # bigrams via a self-zip of the per-doc word array: arrays_zip of the
    # word list with itself shifted by one, built WITHOUT re-reading the doc
    arr = docs.select(
        F.col(id_col),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(WORD_RE), F.lit(0)
        ).alias("ws"),
    )
    bigrams = arr.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(slice(ws, 1, greatest(size(ws) - 1, 0)), "
                "(w, i) -> concat(w, ' ', element_at(ws, i + 2)))"
            )
        ).alias("bg"),
    )
    bstats = (
        bigrams.groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.count(F.lit(1)).alias("n_distinct_bigrams"),
        )
    )
    safe_w = F.greatest(F.col("n_words"), F.lit(1)).cast("double")
    safe_b = F.greatest(F.coalesce(F.col("n_bigrams"), F.lit(0)), F.lit(1)).cast("double")
    return (
        wstats.join(bstats, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_words"),
            F.round(F.col("top_cnt") / safe_w, 4).alias("top_word_frac"),
            F.round(
                (F.coalesce(F.col("n_bigrams"), F.lit(0))
                 - F.coalesce(F.col("n_distinct_bigrams"), F.lit(0))) / safe_b, 4
            ).alias("dup_bigram_frac"),
        )
    )
