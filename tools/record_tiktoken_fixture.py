#!/usr/bin/env python
"""Record real-tiktoken (cl100k) token counts for the chunking golden
corpus into ``tests/fixtures/cl100k_counts.json``.

Run this ONCE in an environment where ``tiktoken`` is installed:

    python tools/record_tiktoken_fixture.py

and commit the resulting fixture.  From then on, every environment —
including sandboxes without tiktoken — asserts the chunk folds against
the REAL cl100k boundaries via the ``cl100k_recorded`` tokenizer param
in ``tests/test_chunking.py`` (VERDICT r02 #4).

How it works: the golden corpus (``DOCS``/``LIMIT`` in
tests/test_chunking.py) is deterministic, and the fold queries
``num_tokens`` on a deterministic set of strings (every stripped line,
every ``buffer + line`` grow probe, every second-pass word fold — both
the engine fold and the transcribed reference oracle).  We replay every
golden path driver-side with a recording wrapper around tiktoken's
counter and persist each queried string -> count.  The replay covers
the distributed table tests too, because ``pypdf_chunk_table`` /
``nougat_chunk_table`` execute the same fold functions over the same
rows.  The fixture-backed counter raises on any unseen string, so a
corpus change makes the tests fail loudly rather than drift.

Reference parity target: ``pipeline1.py:68-71`` (``num_tokens`` wraps
``tiktoken.encoding_for_model("gpt-3.5-turbo")``).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def replay(count, tc) -> None:
    """Drive every golden fold path (engine AND transcribed oracle) over
    the test corpus with *count* as the tokenizer, so a recording
    wrapper observes the full set of ``num_tokens`` query strings.
    *tc* is the imported ``tests/test_chunking`` module.

    Covered engine paths mirror ``operators/chunking.py`` exactly:
    ``pack_lines`` grow probes, ``pack_words_second_pass``, the nougat
    section fold, and the final ``count(chunk)`` emission probes of
    ``_pack_rows``.  ``tests/test_chunking.py::
    test_fixture_replay_covers_all_fold_queries`` asserts this replay
    is complete (a dict built from it backs a full distributed golden
    run with no misses), so fixture staleness cannot creep in silently.
    """
    from assignment3_qachatapplication_vectorembeddings_spark.operators.chunking import (
        _pack_sections_py,
        nougat_sections_py,
        pack_lines,
        pack_words_second_pass,
    )

    for _, text in tc.DOCS:
        lines = text.split("\n")
        # engine + oracle line fold (first pass), incl. the engine's
        # final count(chunk) probes (chunking.py _pack_rows)
        first, oversized = pack_lines(lines, "\n", tc.LIMIT, count)
        for c in first:
            count(c)
        tc.oracle_chunk_creator(lines, "\n", tc.LIMIT, count)
        # second pass over oversized lines (engine + oracle)
        if oversized:
            for c in pack_words_second_pass(oversized, tc.LIMIT, count):
                count(c)
            words = [w for line in oversized for w in line.strip().split()]
            tc.oracle_chunk_creator(words, " ", tc.LIMIT, count)
        # engine nougat section fold + its final count(chunk) probes
        for c in _pack_sections_py(nougat_sections_py(text), tc.LIMIT, count):
            count(c)
        # full pypdf + nougat table oracles (cover oracle section folds)
        tc.oracle_pypdf("f", text, tc.LIMIT, count)
        tc.oracle_nougat_chunks("f", text, tc.LIMIT, count)


def main() -> int:
    try:
        import tiktoken
    except ImportError:
        print("tiktoken is not installed — run this in a tiktoken-capable env")
        return 1

    # Import the corpus + oracles + engine folds from the test module so
    # the recorded query set is exactly what the tests exercise.
    sys.path.insert(0, str(REPO / "tests"))
    import test_chunking as tc

    enc = tiktoken.encoding_for_model("gpt-3.5-turbo")
    log: dict[str, int] = {}

    def count(s: str) -> int:
        n = log.get(s)
        if n is None:
            n = log[s] = len(enc.encode(s))
        return n

    replay(count, tc)

    out = REPO / "tests" / "fixtures" / "cl100k_counts.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(log, ensure_ascii=False, sort_keys=True))
    print(f"recorded {len(log)} distinct count() queries -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
