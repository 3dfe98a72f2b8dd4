"""Golden tests for the span-marking dedup family (operators/simdedup.py):
repeated_ngram_spans — the fixed-k ExactSubstr span dedup (Lee et al.
arXiv:2107.06499) — and contaminated_spans — benchmark n-gram
decontamination (GPT-3 arXiv:2005.14165 App. C).  The q61 oracle-parity
run covers the sf0.01 corpus; these pin the semantics on handcrafted
docs: cross-doc duplication, within-doc repetition, the keep-first
exemption, min_count, island merging of overlapping AND touching spans,
sub-k docs, and eval-overlap marking.
"""

import pytest

from pcrawler_spark.operators.simdedup import (contaminated_spans,
                                               repeated_ngram_spans)


def _spans(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # operator output order is unspecified (r7, the q62 contract) —
    # this bounded consumer sorts its own slice
    return sorted(tuple(r) for r in repeated_ngram_spans(df, **kw).collect())


def _contam(spark, docs, bench, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    b = spark.createDataFrame(bench, "doc_id long, text string")
    return sorted(tuple(r) for r in contaminated_spans(df, b, **kw).collect())


def test_no_global_sort_in_span_operator_plan(spark):
    """The span operators must not end in a global Sort (span output is
    corpus-sized on a near-dup-heavy corpus; output order is unspecified).
    The only Sort allowed is the window's per-partition sort inside the
    island merge — i.e. no Exchange rangepartitioning anywhere."""
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b c d")],
                               "doc_id long, text string")
    for op in (repeated_ngram_spans(df, k=3),
               contaminated_spans(df, df, k=3)):
        plan = op._jdf.queryExecution().executedPlan().toString()
        assert "rangepartitioning" not in plan, plan


def test_cross_doc_duplicate_passage_cuts_only_the_copy(spark):
    docs = [(1, "a b c d e f g h"), (2, "x a b c d e y z")]
    # shared 3-grams: "a b c" "b c d" "c d e"; doc 1 holds the corpus-wide
    # first occurrence of each, so only doc 2's copy is marked, and the
    # three overlapping hits (pos 1,2,3) merge into one island [1, 6)
    assert _spans(spark, docs, k=3) == [(2, 1, 6, 3)]


def test_within_doc_repetition_exempts_first_occurrence(spark):
    docs = [(3, "p q r p q r p q r")]
    # grams: pqr@{0,3,6} qrp@{1,4} rpq@{2,5}; first of each (pos 0,1,2)
    # survives, hits {3,4,5,6} merge into [3, 9)
    assert _spans(spark, docs, k=3) == [(3, 3, 9, 4)]


def test_keep_first_false_marks_every_occurrence(spark):
    docs = [(1, "a b c d e f g h"), (2, "x a b c d e y z")]
    assert _spans(spark, docs, k=3, keep_first=False) == [
        (1, 0, 5, 3),
        (2, 1, 6, 3),
    ]


def test_min_count_threshold_and_touching_span_merge(spark):
    docs = [(3, "p q r p q r p q r")]
    # min_count=3 keeps only pqr (count 3); hits at pos 3 and 6 — spans
    # [3,6) and [6,9) touch (prev_end == start) and must merge
    assert _spans(spark, docs, k=3, min_count=3) == [(3, 3, 9, 2)]


def test_disjoint_islands_stay_separate(spark):
    # the duplicated grams sit at pos 0 and pos 5 of doc 2 with a gap:
    # two islands, not one
    docs = [
        (1, "a b c z1 z2 d e f"),
        (2, "a b c q1 q2 d e f"),
    ]
    assert _spans(spark, docs, k=3) == [(2, 0, 3, 1), (2, 5, 8, 1)]


def test_docs_shorter_than_k_produce_no_grams(spark):
    docs = [(1, "s t"), (2, "s t"), (3, "a b c d"), (4, "a b c d")]
    # doc 1/2 have no 3-grams at all; doc 3/4 share both of theirs
    assert _spans(spark, docs, k=3) == [(4, 0, 4, 2)]


def test_unique_corpus_yields_empty(spark):
    docs = [(1, "a b c d"), (2, "e f g h")]
    assert _spans(spark, docs, k=3) == []


def test_contam_marks_eval_overlap_and_merges_islands(spark):
    # doc 1 shares "a b c d e" with the eval doc → 3-gram hits at pos
    # 1,2,3 merge into [1, 6); doc 2 has no overlap and is absent
    docs = [(1, "x a b c d e y z"), (2, "p q r s t u")]
    bench = [(100, "a b c d e")]
    assert _contam(spark, docs, bench, k=3) == [(1, 1, 6, 3)]


def test_contam_no_keep_first_exemption(spark):
    # unlike repeated spans there is NO canonical surviving copy: every
    # corpus doc overlapping the eval set is marked, including the one
    # whose text the eval gram appeared in "first"
    docs = [(1, "a b c d"), (2, "a b c e")]
    bench = [(100, "z a b c z2")]
    assert _contam(spark, docs, bench, k=3) == [(1, 0, 3, 1), (2, 0, 3, 1)]


def test_contam_disjoint_hits_stay_separate_islands(spark):
    docs = [(1, "a b c m1 m2 m3 d e f")]
    bench = [(100, "a b c"), (101, "d e f")]
    assert _contam(spark, docs, bench, k=3) == [(1, 0, 3, 1), (1, 6, 9, 1)]


def test_contam_corpus_internal_duplication_alone_is_clean(spark):
    # corpus-internal repetition without eval overlap is NOT contamination
    docs = [(1, "p q r s"), (2, "p q r s")]
    bench = [(100, "u v w x")]
    assert _contam(spark, docs, bench, k=3) == []


def test_contam_sub_k_docs_and_bench_produce_no_grams(spark):
    docs = [(1, "a b"), (2, "a b c d")]
    bench = [(100, "a b")]
    assert _contam(spark, docs, bench, k=3) == []
