"""Scalar text functions — column expressions first, UDFs only where
semantics genuinely need Python.

Coverage of the reference's string/regex surface (SURVEY.md §2.7):
F1 token counting, F5 markdown table/warning strip, F6 paragraph
classification, F7 nougat unescape, F8 filename-from-URL, F9
form-name-from-path, F10 length — plus the text-analysis columns a
training-data pipeline needs (language id, quality scoring,
fingerprinting).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType, StringType

__all__ = [
    "token_count_col",
    "bpe_token_count",
    "clean_markdown",
    "classify_paragraph",
    "unescape_nougat",
    "filename_from_url",
    "form_name_from_path",
    "exact_fingerprint",
    "quality_columns",
    "lang_id",
    "PII_PATTERNS",
    "redact_pii",
    "pii_hit_counts",
]

# --------------------------------------------------------------------------
# F1 — token counting
# --------------------------------------------------------------------------
# The reference counts tokens with tiktoken (`pipeline1.py:69-72`, the
# single most-called scalar function). tiktoken is not available here, so
# the engine ships two deterministic tokenizers behind the same contract:
#   * whitespace tokens — pure Catalyst expression, SQL-oracle-able;
#   * BPE-ish regex tokens — GPT-2-style pre-tokenizer regex in a pandas
#     UDF (the regex needs lookahead, which stays in Python's `re`).


def token_count_col(text: Column) -> Column:
    """Whitespace token count as a native expression (JVM codegen)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\S+"), F.lit(0)))


# GPT-2 pre-tokenizer pattern (public: openai/gpt-2 encoder.py); counts
# pre-tokens, a deterministic stand-in for tiktoken counts.
_BPE_SPLIT = re.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+""",
)


def bpe_token_count_py(text: str) -> int:
    if not text:
        return 0
    return len(_BPE_SPLIT.findall(text))


@pandas_udf(IntegerType())
def bpe_token_count(texts: pd.Series) -> pd.Series:
    """BPE-ish token count (Arrow-batched; the tiktoken stand-in)."""
    return texts.fillna("").map(bpe_token_count_py).astype("int32")


# --------------------------------------------------------------------------
# F5 — markdown table/warning strip (pipeline1.py:114-134)
# --------------------------------------------------------------------------

_MD_STRIP_PATTERNS = (
    r"\\begin\{table\}.*?\n",
    r"\\end\{table\}.*?\n",
    r"\\begin\{tabular\}.*?\n",
    r"\\end\{tabular\}.*?\n",
)


def clean_markdown(text: Column) -> Column:
    """Strip LaTeX table markers and `+++…+++` warning blocks.

    Chained ``regexp_replace``; the warning block uses DOTALL via the
    inline ``(?s)`` flag (reference uses ``re.DOTALL``).
    """
    out = text
    for pat in _MD_STRIP_PATTERNS:
        out = F.regexp_replace(out, pat, "\n")
    out = F.regexp_replace(out, r"(?s)\+\+\+(.*?)\+\+\+", "\n")
    return out


# --------------------------------------------------------------------------
# F6 — paragraph semantic classification (pipeline1.py:151-162)
# --------------------------------------------------------------------------


def classify_paragraph(para: Column) -> Column:
    """Prefix classification; test order matters (### before ## before #),
    matching the reference's if/elif chain exactly."""
    return (
        F.when(para.startswith("###"), "Heading3")
        .when(para.startswith("##"), "Heading2")
        .when(para.startswith("#"), "Heading1")
        .when(para.startswith("**"), "Bold")
        .when(para.startswith("*"), "Bullet")
        .otherwise("Paragraph")
    )


# --------------------------------------------------------------------------
# F7 — nougat response unescape (pipeline1.py:514)
# --------------------------------------------------------------------------


def unescape_nougat(text: Column) -> Column:
    out = F.regexp_replace(text, r"\\n\\n", "\n\n")
    out = F.regexp_replace(out, r"\\n", "\n")
    out = F.regexp_replace(out, r"\\\\", "\\\\")
    return out


# --------------------------------------------------------------------------
# F8/F9 — path and URL munging (pipeline1.py:383-388, 671-672)
# --------------------------------------------------------------------------


def filename_from_url(url: Column, fallback: Column) -> Column:
    """Regex group `/([^/]+\\.pdf)$`, else the synthesized fallback id."""
    extracted = F.regexp_extract(url, r"/([^/]+\.pdf)$", 1)
    return F.when(extracted != "", extracted).otherwise(fallback)


def form_name_from_path(path: Column) -> Column:
    """Basename minus extension (reference strips `.mmd`)."""
    return F.regexp_replace(
        F.element_at(F.split(path, "/"), -1), r"\.[A-Za-z0-9]+$", ""
    )


# --------------------------------------------------------------------------
# Text analysis for training-data pipelines (beyond-reference, first-class)
# --------------------------------------------------------------------------


def exact_fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint: md5 of casefolded,
    whitespace-collapsed text. Exact-dedup key at any scale (group/join
    on a 32-char hex instead of multi-KB strings)."""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(normalized)


_STOPWORDS = (
    "the|a|an|and|or|of|to|in|is|it|that|for|on|with|as|was|at|by|be|this",
)


def quality_columns(text: Column) -> dict[str, Column]:
    """Quality-scoring feature columns (all native expressions):
    char length, token count, mean token length, punctuation ratio,
    stopword ratio, uppercase ratio."""
    n_chars = F.length(text)
    n_tokens = token_count_col(text)
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), F.lit(0)))
    n_upper = F.size(F.regexp_extract_all(text, F.lit(r"[A-Z]"), F.lit(0)))
    n_stop = F.size(
        F.regexp_extract_all(
            F.lower(text), F.lit(r"\b(?:" + _STOPWORDS[0] + r")\b"), F.lit(0)
        )
    )
    safe_chars = F.when(n_chars > 0, n_chars.cast("double")).otherwise(F.lit(1.0))
    safe_tokens = F.when(n_tokens > 0, n_tokens.cast("double")).otherwise(F.lit(1.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": F.round(n_chars.cast("double") / safe_tokens, 4),
        "punct_ratio": F.round(n_punct.cast("double") / safe_chars, 4),
        "upper_ratio": F.round(n_upper.cast("double") / safe_chars, 4),
        "stopword_ratio": F.round(n_stop.cast("double") / safe_tokens, 4),
    }


def line_dedup_columns(text: Column) -> dict[str, Column]:
    """Within-document repetition removal (the Gopher/C4 "duplicate
    line" filter): drop repeated lines keeping FIRST occurrence, and
    report how much of the document was repetition.

    Entirely document-local — ``array_distinct`` preserves first-seen
    order, so the whole operator is one codegen projection with ZERO
    shuffles at any corpus size. Returns columns:
    n_lines, n_dup_lines, clean_chars (length of the re-joined
    deduplicated text), dup_char_frac ((len - clean)/len, NULL for
    empty docs).
    """
    lines = F.split(text, "\n")
    uniq = F.array_distinct(lines)
    clean_chars = F.length(F.array_join(uniq, "\n"))
    n_chars = F.length(text)
    return {
        "n_lines": F.size(lines).cast("bigint"),
        "n_dup_lines": (F.size(lines) - F.size(uniq)).cast("bigint"),
        "clean_chars": clean_chars.cast("bigint"),
        "dup_char_frac": F.when(
            n_chars > 0,
            F.round((n_chars - clean_chars).cast("double") / n_chars, 6),
        ),
    }


# PII scrubbing for training corpora: ordered (pattern, replacement)
# pairs. Patterns restrict themselves to the syntax RE2 and Java regex
# share (no lookbehind, no backrefs) so a SQL oracle — or a Trino/Flink
# sibling job — can apply byte-identical redaction.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\+?1[ .-]?)?(?:\(\d{3}\)|\d{3})[ .-]?\d{3}[ .-]?\d{4}\b", "<PHONE>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b(?:\d[ -]?){13,16}\b", "<CARD>"),
)


def redact_pii(
    text: Column, patterns: tuple[tuple[str, str], ...] = PII_PATTERNS
) -> Column:
    """Replace email/phone/SSN/card-number shapes with typed placeholder
    tags. Pure native ``regexp_replace`` chain — stays in whole-stage
    codegen, no Python in the hot path. Order matters (emails first so
    digit runs inside addresses aren't half-eaten by the card rule).
    Pass a ``patterns`` subset to redact only some categories (an
    oracle-mirrored query must apply exactly the patterns its SQL
    text does)."""
    out = text
    for pattern, tag in patterns:
        out = F.regexp_replace(out, pattern, tag)
    return out


def pii_hit_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts (how much PII a document leaks) —
    ``regexp_extract_all``+``size`` keeps it native and countable
    without a second redaction pass."""
    names = ("emails", "phones", "ssns", "cards")
    return {
        name: F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))
        for name, (pattern, _) in zip(names, PII_PATTERNS)
    }


# Tiny per-language marker lists for the n-gram/stopword language-ID
# heuristic. Deterministic and dependency-free; real deployments swap in
# fastText/CLD3 behind the same column contract.
_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "del", "se", "las"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
    "de": ("der", "die", "und", "das", "den", "von", "zu", "mit", "ist", "des"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "他", "这", "不"),
}


@pandas_udf(StringType())
def lang_id(texts: pd.Series) -> pd.Series:
    """Stopword-hit language ID over a fixed language set ('und' when no
    marker hits). Arrow-batched; one compiled matcher per executor."""

    def _score(text: str) -> str:
        if not text:
            return "und"
        tokens = text.lower().split()
        if not tokens:
            return "und"
        token_set = set(tokens)
        best_lang, best_hits = "und", 0
        for lang, markers in _LANG_MARKERS.items():
            if lang == "zh":
                hits = sum(text.count(ch) for ch in markers)
            else:
                hits = sum(1 for m in markers if m in token_set)
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        return best_lang

    return texts.map(_score)
