"""Token-aware document chunking — the reference's hardest operators
(F2/F3/F4 + F5/F6/W2/A1), re-expressed Spark-first.

The packing fold is inherently sequential WITHIN a document (carry
state is data-dependent), so it runs as a grouped-map
``applyInPandas``: parallel across documents — at 100 TB the unit of
parallelism is the document, exactly like the reference's per-file
loop but distributed — with a faithful sequential fold inside.
Everything around it (markdown cleaning, paragraph classification,
section numbering, ordered section concat) is pure Catalyst
expressions and windows.

Reference semantics reproduced exactly (quirks included):

- ``chunkCreator`` (pipeline1.py:75-104): lines are stripped, blanks
  skipped; a line whose own token count exceeds the limit routes to
  the oversized list and flushes a non-empty buffer; the grow test is
  ``tokens(buffer + line) < LIMIT`` — strict ``<`` and NO delimiter in
  the tested concatenation — while the actual append IS
  ``buffer + delimiter + line``, so the very first append carries a
  leading delimiter; an emitted buffer may be the empty string when the
  first non-oversized line's tokens land exactly at the limit.
- word-level second pass (pipeline1.py:692-697): oversized lines split
  to a flat word list and re-packed with ' ' as the delimiter;
  second-pass words that STILL exceed the limit are silently dropped
  (the reference discards ``oversizedWords``).
- ``ChunkId`` (pipeline1.py:699-700): ``FormName + '_' + pandas index``
  where the index comes from a ``pd.concat`` WITHOUT ignore_index — so
  second-pass chunk ids restart at 0 and can duplicate first-pass ids.
  Reproduced verbatim; ``vector_id`` recomputation downstream
  (pipeline2.py:130-132) is what actually feeds the vector index.
- ``nougatChunkCreator`` (pipeline1.py:106-253): clean → split('\n')
  keeping only non-empty paragraphs but numbering them by their
  ORIGINAL split index → classify by prefix precedence → section
  numbering where every pre-first-heading paragraph gets its OWN
  section → '\n'-join per section → section-level pack with buffer
  token count recomputed per iteration → oversized sections re-split
  by line with the first '#'-prefixed sentence carried as a shared
  heading prefix (concatenated to continuation chunks WITHOUT a
  delimiter).
"""

from __future__ import annotations

import re
from typing import Callable, Iterable, Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..functions.minibpe import minibpe_count
from ..functions.textfns import bpe_token_count_py

__all__ = [
    "TOKENIZERS",
    "pack_lines",
    "pack_words_second_pass",
    "pypdf_chunk_table",
    "nougat_chunk_table",
    "nougat_sections_py",
    "sectionize_expr",
]


def _ws_count(text: str) -> int:
    return len(text.split())


def _tiktoken_count(text: str, _cache: dict = {}) -> int:
    """Real tiktoken ``num_tokens`` (pipeline1.py:68-71). The encoding
    loads lazily ONCE PER PROCESS (module-level cache), so each executor
    pays the BPE table load a single time and nothing un-picklable is
    captured in UDF closures.

    Cluster caveat: ``encoding_for_model`` downloads the BPE file on a
    COLD cache — on an offline/locked-down cluster, pre-seed
    ``TIKTOKEN_CACHE_DIR`` on every executor image (or ship the cache
    via ``--archives``) or the first UDF call per executor raises
    mid-stage. The driver-side ``find_spec`` gate cannot detect a cold
    executor cache."""
    enc = _cache.get("enc")
    if enc is None:
        import tiktoken  # import-gated optional dependency

        enc = _cache["enc"] = tiktoken.encoding_for_model("gpt-3.5-turbo")
    return len(enc.encode(text))


#: Pluggable token counters behind the reference's ``num_tokens``
#: contract (pipeline1.py:68-71 wraps tiktoken). ``ws``/``bpe`` are
#: deterministic stand-ins that work everywhere; ``tiktoken`` matches
#: the reference's actual chunk boundaries when the library is present
#: (same gating pattern as the pypdf/PIL optional codecs).
TOKENIZERS: dict[str, Callable[[str], int]] = {
    "ws": _ws_count,
    "bpe": bpe_token_count_py,
    # Genuine merge-based byte-level BPE (stdlib-only, deterministic
    # self-trained table) whose counts are NON-additive across join
    # seams like real cl100k — always available, so the fold goldens
    # exercise seam-sensitive counting even without tiktoken. See
    # functions/minibpe.py.
    "minibpe": minibpe_count,
}

try:
    import importlib.util

    if importlib.util.find_spec("tiktoken") is not None:
        TOKENIZERS["tiktoken"] = _tiktoken_count
except Exception:  # pragma: no cover - spec probe failure == absent
    pass


# --------------------------------------------------------------------------
# F2 — the greedy line-packing fold (chunkCreator, pipeline1.py:75-104)
# --------------------------------------------------------------------------


def pack_lines(
    lines: Iterable[str],
    delimiter: str,
    token_limit: int,
    count_tokens: Callable[[str], int] = _ws_count,
) -> tuple[list[str], list[str]]:
    """Faithful greedy pack. Returns (chunks, oversized_lines).

    The reference recomputes ``num_tokens(buffer + line)`` on every
    step (O(n²) token work). For whitespace counting we keep the exact
    same decisions with O(n) work via the seam rule:
    ``ws_count(a + b) = ws_count(a) + ws_count(b) - 1`` iff a ends and
    b starts with non-space (the concatenation merges two tokens) —
    NB the tested concat has no delimiter, exactly like the reference.
    Other tokenizers recount the concatenation (still exact).
    """
    incremental = count_tokens is _ws_count

    chunks: list[str] = []
    oversized: list[str] = []
    buffer = ""
    buffer_count = 0  # ws tokens of `buffer`, maintained when incremental

    for raw in lines:
        line = raw.strip()
        if line == "":
            continue
        line_count = count_tokens(line)
        if line_count > token_limit:
            oversized.append(line)
            if buffer != "":
                chunks.append(buffer)
                buffer = ""
                buffer_count = 0
            continue
        if incremental:
            merged = (
                1
                if buffer and not buffer[-1].isspace() and not line[0].isspace()
                else 0
            )
            grow_count = buffer_count + line_count - merged
        else:
            grow_count = count_tokens(buffer + line)
        if grow_count < token_limit:
            appended = buffer + delimiter + line
            buffer = appended
            if incremental:
                # the APPENDED text includes the delimiter; recompute the
                # seam only (delimiter may or may not be whitespace)
                if delimiter.strip() == "":
                    buffer_count = buffer_count + line_count if buffer_count else count_tokens(appended)
                else:
                    buffer_count = count_tokens(appended)
        else:
            chunks.append(buffer)  # may be "" — reference does the same
            buffer = line
            buffer_count = line_count

    if buffer != "":
        chunks.append(buffer)
    return chunks, oversized


def pack_words_second_pass(
    oversized_lines: Sequence[str],
    token_limit: int,
    count_tokens: Callable[[str], int] = _ws_count,
) -> list[str]:
    """F3 (pipeline1.py:692-697): oversized lines → flat word list →
    re-pack with ' ' delimiter; still-oversized words are discarded."""
    flat_words = [w for line in oversized_lines for w in line.strip().split()]
    chunks, _dropped = pack_lines(flat_words, " ", token_limit, count_tokens)
    return chunks


# --------------------------------------------------------------------------
# pypdf path as a grouped-map operator
# --------------------------------------------------------------------------

_CHUNK_OUT_SCHEMA = StructType(
    [
        StructField("Content", StringType()),
        StructField("TokenCount", IntegerType()),
        StructField("FormName", StringType()),
        StructField("ChunkId", StringType()),
    ]
)


def pypdf_chunk_table(
    docs: DataFrame,
    *,
    form_col: str = "FormName",
    text_col: str = "text",
    token_limit: int = 1000,
    tokenizer: str = "ws",
) -> DataFrame:
    """One row per document in → N chunk rows out (UDTF-shaped), with
    the reference's two-pass pack and ChunkId quirks.

    Scale: each input row is one complete document, so rows are
    independent — ``mapInPandas`` packs them partition-local with ZERO
    shuffle (a ``groupBy(form)`` would move every text byte through an
    exchange for nothing). Parallelism = input partitions; no collect,
    no driver loop.
    """
    count_tokens = TOKENIZERS[tokenizer]

    def _pack_rows(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            out_rows: list[tuple[str, int, str, str]] = []
            for row in pdf.itertuples(index=False):
                form = getattr(row, form_col)
                lines = (getattr(row, text_col) or "").split("\n")
                first, oversized = pack_lines(
                    lines, "\n", token_limit, count_tokens
                )
                second = (
                    pack_words_second_pass(oversized, token_limit, count_tokens)
                    if oversized
                    else []
                )
                # pandas-concat-without-ignore_index quirk: ids restart per pass
                for idx, chunk in enumerate(first):
                    out_rows.append(
                        (chunk, count_tokens(chunk), form, f"{form}_{idx}")
                    )
                for idx, chunk in enumerate(second):
                    out_rows.append(
                        (chunk, count_tokens(chunk), form, f"{form}_{idx}")
                    )
            yield pd.DataFrame(
                out_rows, columns=["Content", "TokenCount", "FormName", "ChunkId"]
            )

    prepared = docs.select(
        F.col(form_col).cast("string").alias(form_col),
        F.col(text_col).cast("string").alias(text_col),
    )
    return prepared.mapInPandas(_pack_rows, _CHUNK_OUT_SCHEMA)


# --------------------------------------------------------------------------
# W2 — section numbering as pure window expressions
# --------------------------------------------------------------------------


def sectionize_expr(
    is_heading: Column,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column],
) -> Column:
    """Section number per the reference's loop (pipeline1.py:167-179):
    headings open a new section; every paragraph BEFORE the first
    heading opens its own section; paragraphs after a heading join the
    current section.

    Encoded as an indicator cumsum: indicator = heading OR
    no-heading-seen-strictly-before; Section = running sum.
    """
    from pyspark.sql.window import Window

    w_before = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_upto = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    heading_seen_before = (
        F.coalesce(F.max(is_heading.cast("int")).over(w_before), F.lit(0)) == 1
    )
    indicator = F.when(is_heading | ~heading_seen_before, 1).otherwise(0)
    return F.sum(indicator).over(w_upto)


# --------------------------------------------------------------------------
# nougat path: clean → paragraphs → classify → sectionize → section
# concat → section-level pack with heading carry
# --------------------------------------------------------------------------

_MD_TABLE_PATTERNS = (
    r"\\begin\{tabular\}.*?\n",
    r"\\end\{tabular\}.*?\n",
    r"\\begin\{table\}.*?\n",
    r"\\end\{table\}.*?\n",
)


def _clean_markdown_py(text: str) -> str:
    # F5 (pipeline1.py:114-134): tabular/table markers then +++warnings+++
    for pat in _MD_TABLE_PATTERNS:
        text = re.sub(pat, "\n", text)
    return re.sub(r"\+\+\+(.*?)\+\+\+", "\n", text, flags=re.DOTALL)


def _classify_py(paragraph: str) -> str:
    # F6 (pipeline1.py:151-162): precedence ### > ## > # > ** > *
    if paragraph.startswith("###"):
        return "Heading3"
    if paragraph.startswith("##"):
        return "Heading2"
    if paragraph.startswith("#"):
        return "Heading1"
    if paragraph.startswith("**"):
        return "Bold"
    if paragraph.startswith("*"):
        return "Bullet"
    return "Paragraph"


_HEADINGS = {"Heading1", "Heading2", "Heading3"}


def nougat_semantics_py(
    form: str, text: str, count_tokens: Callable[[str], int]
) -> pd.DataFrame:
    """The per-paragraph semantics table (pipeline1.py:109-179):
    ParaNumber is the ORIGINAL '\n'-split index (blank paragraphs are
    dropped but still advance the counter)."""
    cleaned = _clean_markdown_py(text)
    rows = []
    cumulative = 0
    section = 0
    first_heading_seen = False
    for para_number, paragraph in enumerate(cleaned.split("\n")):
        if len(paragraph) == 0:
            continue
        tokens = count_tokens(paragraph)
        cumulative += tokens
        semantics = _classify_py(paragraph)
        if semantics in _HEADINGS:
            first_heading_seen = True
            section += 1
        elif not first_heading_seen:
            section += 1
        rows.append(
            (
                form,
                para_number,
                paragraph,
                len(paragraph),
                semantics,
                section,
                tokens,
                cumulative,
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "FormName",
            "ParaNumber",
            "ParaContent",
            "ParaCharacterCount",
            "ParaSemantics",
            "Section",
            "TokenCount",
            "CummulativeTokenCount",
        ],
    )


def nougat_sections_py(text: str) -> list[str]:
    """Section texts ('\n'-joined paragraphs per section, order
    preserved) straight from the raw text — same semantics as
    ``nougat_semantics_py`` + the per-section groupby (A1), but plain
    lists: no per-document pandas frame/groupby (measured ~2× faster in
    the hot chunking path; the DataFrame form remains for callers that
    want the intermediate table)."""
    cleaned = _clean_markdown_py(text)
    sections: list[list[str]] = []
    first_heading_seen = False
    for paragraph in cleaned.split("\n"):
        if len(paragraph) == 0:
            continue
        semantics = _classify_py(paragraph)
        if semantics in _HEADINGS or not first_heading_seen:
            sections.append([])
            if semantics in _HEADINGS:
                first_heading_seen = True
        sections[-1].append(paragraph)
    return ["\n".join(paras) for paras in sections]


def _pack_sections_py(
    section_texts: list[str], token_limit: int, count_tokens: Callable[[str], int]
) -> list[str]:
    """Section-level greedy pack (pipeline1.py:190-216) + oversized
    re-split with shared-heading carry (pipeline1.py:218-248)."""
    chunks: list[str] = []
    oversized_sections: list[str] = []
    buffer = ""
    buffer_tokens = 0
    for section in section_texts:
        tokens = count_tokens(section)
        if tokens > token_limit:
            oversized_sections.append(section)
            if buffer != "":
                chunks.append(buffer)
                buffer = ""
        elif tokens + buffer_tokens < token_limit:
            buffer = buffer + "\n" + section
        else:
            chunks.append(buffer)  # may be "" at an exact-limit first section
            buffer = section
        # reference recomputes the buffer count at the END of every
        # iteration (pipeline1.py:208) — including after oversized routing
        buffer_tokens = count_tokens(buffer)
    if buffer != "":
        chunks.append(buffer)

    for oversized in oversized_sections:
        # re.split(r'(.*?)\n') keeps captured lines; strip + drop blanks
        sentences = [s.strip() for s in re.split(r"(.*?)\n", oversized) if s.strip()]
        shared_heading = ""
        if sentences and sentences[0].startswith("#"):
            shared_heading = sentences[0]
            sentences = sentences[1:]
        buffer = shared_heading
        buffer_tokens = 0  # quirk: the heading's own tokens are NOT counted
        for sentence in sentences:
            if count_tokens(sentence) + buffer_tokens < token_limit:
                buffer = buffer + "\n" + sentence
            else:
                chunks.append(buffer)
                # heading is prepended WITHOUT a delimiter (pipeline1.py:237)
                buffer = shared_heading + sentence
            buffer_tokens = count_tokens(buffer)
        if buffer != "":
            chunks.append(buffer)
    return chunks


def nougat_chunk_table(
    docs: DataFrame,
    *,
    form_col: str = "FormName",
    text_col: str = "text",
    token_limit: int = 1000,
    tokenizer: str = "ws",
) -> DataFrame:
    """Full nougat chunking path, shuffle-free: one document per input
    row → rows are independent → ``mapInPandas`` (see pypdf_chunk_table
    scale note)."""
    count_tokens = TOKENIZERS[tokenizer]

    def _pack_rows(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            out_rows: list[tuple[str, int, str, str]] = []
            for row in pdf.itertuples(index=False):
                form = getattr(row, form_col)
                # A1: '\n'-join per section, paragraph order preserved
                section_texts = nougat_sections_py(getattr(row, text_col) or "")
                chunks = _pack_sections_py(section_texts, token_limit, count_tokens)
                for idx, chunk in enumerate(chunks):
                    out_rows.append(
                        (chunk, count_tokens(chunk), form, f"{form}_{idx}")
                    )
            yield pd.DataFrame(
                out_rows, columns=["Content", "TokenCount", "FormName", "ChunkId"]
            )

    prepared = docs.select(
        F.col(form_col).cast("string").alias(form_col),
        F.col(text_col).cast("string").alias(text_col),
    )
    return prepared.mapInPandas(_pack_rows, _CHUNK_OUT_SCHEMA)


def semantics_table(
    docs: DataFrame,
    *,
    form_col: str = "FormName",
    text_col: str = "text",
    tokenizer: str = "ws",
) -> DataFrame:
    """The per-paragraph semantics table as a distributed operator
    (schema = pipeline1.py:109), for pipelines that want the
    intermediate rather than final chunks."""
    count_tokens = TOKENIZERS[tokenizer]
    from ..schemas import SEMANTICS_SCHEMA

    def _sem_rows(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in SEMANTICS_SCHEMA.fields]
        for pdf in pdfs:
            frames = [
                nougat_semantics_py(
                    getattr(row, form_col), getattr(row, text_col) or "", count_tokens
                )
                for row in pdf.itertuples(index=False)
            ]
            if not frames:
                yield pd.DataFrame(columns=cols)
                continue
            out = pd.concat(frames, ignore_index=True)
            out["CummulativeTokenCount"] = out["CummulativeTokenCount"].astype("int64")
            yield out

    prepared = docs.select(
        F.col(form_col).cast("string").alias(form_col),
        F.col(text_col).cast("string").alias(text_col),
    )
    return prepared.mapInPandas(_sem_rows, SEMANTICS_SCHEMA)
