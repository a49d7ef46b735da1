"""Self-contained byte-level BPE token counter (``minibpe``).

Purpose: the reference counts tokens with tiktoken's cl100k BPE
(``pipeline1.py:68-71``), whose counts are NON-ADDITIVE across join
seams — ``count(a + " " + b) != count(a) + 1 + count(b)`` in general,
because the space attaches to ``b``'s first pre-token and changes its
merge sequence.  The chunk folds (``operators/chunking.py``) recount
``num_tokens(buf + line)`` at every step precisely because of this, and
a tokenizer whose counts ARE seam-additive (whitespace, or the plain
GPT-2 pre-tokenizer regex in ``textfns.bpe_token_count_py``) cannot
catch a fold that wrongly assumes additivity.

``minibpe`` is a genuine byte-pair encoder — the published Sennrich
et al. / GPT-2 algorithm: pre-tokenize with the GPT-2 regex, then merge
the byte pair with the lowest learned rank until no learned pair
remains.  The merge table is TRAINED deterministically at first use
from the embedded seed corpus below (a few hundred bytes of ordinary
English plus the greek-letter vocabulary the chunking golden corpus is
built from), so the module carries no external data files and needs no
network.  It is NOT tiktoken and never claims tiktoken parity — for
real cl100k boundaries use the ``tiktoken`` tokenizer where the package
exists, or the recorded fixture produced by
``tools/record_tiktoken_fixture.py``.

Used as a third differential tokenizer in the chunking goldens
(``tests/test_chunking.py``) so the engine-vs-oracle fold comparison
always exercises merge-based, seam-sensitive counts even on a bare
sandbox.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

__all__ = ["minibpe_count", "minibpe_encode", "merge_table"]

# GPT-2 pre-tokenizer (public: openai/gpt-2 encoder.py, also used by
# textfns._BPE_SPLIT). Spaces attach to the FOLLOWING word, which is
# what makes merged counts seam-sensitive.
_PRETOKEN = re.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+""",
)

# Deterministic training seed: generic English so common pairs ("th",
# "he", " a", "er", …) earn merges, plus the greek-letter words used by
# tests/test_chunking.py:make_doc so merges actually fire on the golden
# corpus, with and without a leading space.
_SEED = (
    "the quick brown fox jumps over the lazy dog and then the other "
    "dog follows after a while because there was nothing better to do "
    "that afternoon in the meadow where alpha beta gamma delta omega "
    "sigma theta zeta alpha beta gamma delta omega sigma theta zeta "
    "alpha beta gamma delta omega sigma theta zeta words repeat so the "
    "pair statistics favour whole greek names with their leading space "
    "alpha beta gamma delta omega sigma theta zeta "
    # concatenated junction forms: these teach merges that SPAN the
    # boundary where the fold's delimiterless grow probe
    # (num_tokens(buffer + i), pipeline1.py:91) glues two words
    # together — real cl100k likewise has tokens crossing such seams,
    # which is precisely what makes its counts non-additive there.
    "zetaalpha alphabeta betagamma gammadelta deltaomega omegasigma "
    "sigmatheta thetazeta zetaalpha alphabeta betagamma gammadelta "
    "deltaomega omegasigma sigmatheta thetazeta zetaalpha alphabeta "
    "betagamma gammadelta deltaomega omegasigma sigmatheta thetazeta "
)

_N_MERGES = 384

_state: dict = {}


def _train(seed: str, n_merges: int) -> Dict[Tuple[int, int], int]:
    """Classic BPE training (Sennrich et al. 2016, algorithm 1).

    Words are pre-token byte sequences with multiplicities; each round
    merges the globally most frequent adjacent pair (ties broken by the
    smaller pair tuple, so training is fully deterministic).
    """
    from collections import Counter

    words: Counter = Counter()
    for tok in _PRETOKEN.findall(seed):
        words[tuple(tok.encode("utf-8"))] += 1

    ranks: Dict[Tuple[int, int], int] = {}
    # token ids: 0-255 raw bytes, 256+ minted per merge
    next_id = 256
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for w, c in words.items():
            for i in range(len(w) - 1):
                pairs[(w[i], w[i + 1])] += c
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] < 2:
            break
        ranks[best] = rank
        merged: Counter = Counter()
        for w, c in words.items():
            out: List[int] = []
            i = 0
            while i < len(w):
                if i < len(w) - 1 and (w[i], w[i + 1]) == best:
                    out.append(next_id)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            merged[tuple(out)] += c
        words = merged
        # remember what the minted id expands from so later merges can
        # chain (ranks key on current-token-id pairs, as in GPT-2)
        next_id += 1
    return ranks


def _get_state() -> dict:
    st = _state
    if "ranks" not in st:
        ranks = _train(_SEED, _N_MERGES)
        # invert mint order: pair -> minted id (256 + rank)
        st["ranks"] = ranks
        st["mint"] = {pair: 256 + rank for pair, rank in ranks.items()}
        st["cache"] = {}
    return st


def _encode_pretoken(tok: str, st: dict) -> List[int]:
    cached = st["cache"].get(tok)
    if cached is not None:
        return cached
    ranks = st["ranks"]
    mint = st["mint"]
    seq: List[int] = list(tok.encode("utf-8"))
    while len(seq) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        pair = (seq[best_i], seq[best_i + 1])
        seq = seq[:best_i] + [mint[pair]] + seq[best_i + 2 :]
    if len(st["cache"]) < 1_000_000:  # bound executor-side memory
        st["cache"][tok] = seq
    return seq


def minibpe_encode(text: str) -> List[int]:
    """Token-id sequence for *text* (byte ids 0-255, merges 256+)."""
    st = _get_state()
    out: List[int] = []
    for tok in _PRETOKEN.findall(text):
        out.extend(_encode_pretoken(tok, st))
    return out


def minibpe_count(text: str) -> int:
    """``num_tokens`` contract (pipeline1.py:68-71) over minibpe."""
    if not text:
        return 0
    st = _get_state()
    n = 0
    for tok in _PRETOKEN.findall(text):
        n += len(_encode_pretoken(tok, st))
    return n


def merge_table() -> Dict[Tuple[int, int], int]:
    """The learned (pair -> rank) table, for tests/inspection."""
    return dict(_get_state()["ranks"])
