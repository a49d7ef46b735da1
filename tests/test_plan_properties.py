"""Physical-plan regression pins: the scale-posture claims as tests.

If one of these fails after a change, the query still returns correct
rows but has silently lost its 100 TB execution shape (pushdown gone,
broadcast became shuffle, top-k became full sort) — exactly the class
of regression value-hash gates can't see.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from assignment3_qachatapplication_vectorembeddings_spark.plans.corpus import CORPUS


def _plan(spark, sf_dir, name: str) -> str:
    df = CORPUS[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_topk_compiles_to_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "topk_cosine")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort stage


def test_filtered_topk_pushes_predicate_into_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "topk_cosine_filtered")
    assert "PushedFilters" in plan and "In(label, [1,2,3])" in plan


def test_projection_prunes_columns_and_pushes_filters(spark, sf_dir):
    plan = _plan(spark, sf_dir, "projection_filter")
    assert "GreaterThanOrEqual(p_size,10)" in plan
    # scan schema restricted to what the query reads (no p_type etc.)
    assert "p_type" not in plan


def test_dim_joins_broadcast(spark, sf_dir):
    for q in ("fk_join_broadcast", "shipping_priority", "returned_items"):
        assert "BroadcastHashJoin" in _plan(spark, sf_dir, q), q


def test_point_lookup_pushdown(spark, sf_dir):
    assert "EqualTo(c_custkey,42)" in _plan(spark, sf_dir, "point_lookup")


def test_aggregations_have_partial_phase(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    assert "HashAggregate" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_chunking_has_no_exchange(spark, sf_dir):
    # one-doc-per-row chunking must stay shuffle-free (mapInPandas)
    plan = _plan(spark, sf_dir, "pypdf_chunks")
    assert "Exchange" not in plan


def test_bm25_single_wide_shuffle(spark, sf_dir):
    # the only wide exchange is the (doc, term) tf agg; term stats and
    # corpus stats arrive via broadcast
    plan = _plan(spark, sf_dir, "bm25_topk")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-k, no global sort


def test_dataset_split_no_pre_agg_exchange(spark, sf_dir):
    # id-hash bucketing is map-side; the only exchange is the final
    # 3-group aggregation
    plan = _plan(spark, sf_dir, "dataset_split")
    # formatted explain lists each node twice (tree + detail): 2 real
    # exchanges = partial->final agg + the 3-row output sort
    assert plan.count("Exchange") <= 4
    assert "partial_count" in plan  # map-side combine before the shuffle


def test_quality_bins_broadcasts_scalar_stats(spark, sf_dir):
    plan = _plan(spark, sf_dir, "quality_bins")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_contamination_semi_join_shape(spark, sf_dir):
    plan = _plan(spark, sf_dir, "contamination_check")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_scale_growing_tables_not_pinned_broadcast(spark, sf_dir):
    # customer/part must reach their joins WITHOUT a user-forced
    # broadcast hint: at this sf AQE may still choose broadcast at
    # runtime, but the *static* plan must not pin it (ResolvedHint
    # would appear in the analyzed plan of a hinted join)
    for q in ("large_orders", "promo_revenue"):
        df = CORPUS[q].fn(spark, sf_dir)
        analyzed = df._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" not in analyzed, q


def test_gopher_bigrams_not_inlined_per_iteration(spark, sf_dir):
    # regression pin for the CollapseProject O(n^2) trap: indexing an
    # aliased computed array inside a transform lambda inlines the whole
    # tokenization per ITERATION (measured 17x on the bigram stage).
    # The zip_with formulation keeps the split count per output column
    # bounded — if this count explodes, someone reintroduced toks[i].
    plan = _plan(spark, sf_dir, "gopher_quality")
    assert plan.count("split(") <= 16, (
        f"tokenization appears {plan.count('split(')}x in the plan — "
        "aliased-array indexing inside a lambda is being inlined per iteration"
    )


def test_line_dedup_is_single_codegen_projection(spark, sf_dir):
    plan = _plan(spark, sf_dir, "line_dedup")
    assert "Exchange" not in plan  # document-local at any corpus size


def test_dup_spans_no_cartesian_and_hashed_grams(spark, sf_dir):
    """Substring dedup must stay banded: no cartesian/nested-loop pair
    generation, and on the (default) broadcast path the span emission
    is the Arrow mapInPandas stage over the CHECKPOINTED gram-array
    table — the xxhash64 gram hashing ran once upstream of the
    checkpoint (lineage truncation hides it from this plan by design),
    and no per-gram join or per-doc window remains downstream. The
    gram-string-free exchange property is pinned where the hashing
    lives: test_dedup's broadcast/window path-identity test plus the
    hashed_gram_table schema (h is bigint, never a gram string)."""
    plan = _plan(spark, sf_dir, "dup_spans")
    assert "CartesianProduct" not in plan
    assert "MapInPandas" in plan or "xxhash64" in plan
    assert "Window" not in plan  # the old per-doc window path is gone


def test_dsir_ratio_table_broadcasts(spark, sf_dir):
    """Token instances must NOT shuffle to meet the 8192-row ratio
    table — the scoring join has to be a broadcast."""
    plan = _plan(spark, sf_dir, "dsir_weights")
    assert "BroadcastHashJoin" in plan
    # top-100 selection must not be a global sort
    assert "TakeOrderedAndProject" in plan


def test_novelty_verify_join_not_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "novelty_check")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pack_sequences_single_walk_exchange(spark, sf_dir):
    """The packing walk is one hash exchange on the bucket feeding
    FlatMapGroupsInPandas — no global sort before the walk."""
    plan = _plan(spark, sf_dir, "pack_sequences")
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan


def test_sliding_passages_zero_exchange(spark, sf_dir):
    """Passage generation is pure per-row array algebra — any Exchange
    in this plan is a regression."""
    plan = _plan(spark, sf_dir, "sliding_passages")
    assert "Exchange" not in plan
    assert "codegen id" in plan


def test_weighted_sample_take_ordered_and_pushdown(spark, sf_dir):
    plan = _plan(spark, sf_dir, "weighted_sample")
    assert "TakeOrderedAndProject" in plan
    assert "GreaterThan(n_chars,0)" in plan  # filter reached the scan
    assert "Exchange" not in plan  # one scan, no shuffle


def test_scd2_single_user_exchange(spark, sf_dir):
    """All four window/group stages key on user_id — exactly one
    hash exchange (plus the final TakeOrdered), never re-shuffles."""
    plan = _plan(spark, sf_dir, "scd2_intervals")
    # formatted output prints the tree node bare; count the numbered
    # detail entries instead
    assert sum(1 for ln in plan.splitlines()
               if ln.strip().startswith("(") and ln.rstrip().endswith("Exchange")) == 1


def test_pmi_vocab_joins_broadcast(spark, sf_dir):
    """The unigram-count table re-joins the bigram table twice — both
    joins must be broadcasts, not shuffle joins on bigram keys."""
    plan = _plan(spark, sf_dir, "pmi_collocations")
    assert plan.count("BroadcastHashJoin") >= 2
