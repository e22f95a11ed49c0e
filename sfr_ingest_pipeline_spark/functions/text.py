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
