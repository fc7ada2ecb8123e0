"""Operator tests: BM25 retrieval, holdout contamination report, and
deterministic contrastive negative sampling (round-4 session 4)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from es_ch_sync_spark.operators.sampling import (
    contamination_report,
    negative_sample_pairs,
)
from es_ch_sync_spark.operators.text import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_handchecked(spark):
    """Single-term query over two docs of equal length: the doc with the
    higher tf must score higher, and the exact Lucene-variant formula is
    verified against a hand computation."""
    docs = _docs(
        spark,
        [
            (1, "spark spark spark flink"),  # tf=3, dl=4
            (2, "spark beam storm samza"),  # tf=1, dl=4
            (3, "duck goose swan heron"),  # no match
        ],
    )
    rows = {r["doc_id"]: r for r in bm25_topk(docs, ["spark"], k=10).collect()}
    assert set(rows) == {1, 2}  # doc 3 never surfaces
    assert rows[1]["bm25"] > rows[2]["bm25"]
    # hand computation: N=3, df=2, avgdl=4, dl=4 → len norm term = k1
    k1, b = 1.2, 0.75
    idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    for tf, doc in ((3, 1), (1, 2)):
        comp = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * 4 / 4.0))
        expect = math.floor(comp * 1e6 + 0.5) / 1e6
        assert abs(rows[doc]["bm25"] - expect) < 1e-9
        assert rows[doc]["n_matched"] == 1


def test_bm25_rare_term_outweighs_common(spark):
    """A doc matching only a rare term outranks a doc matching only a
    ubiquitous term at equal tf/dl — the idf ordering property."""
    rows = [(i, "common filler words here") for i in range(10)]
    rows += [(100, "common rareword filler pad"), (101, "common other filler pad")]
    docs = _docs(spark, rows)
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(docs, ["rareword", "common"], k=20).collect()
    }
    assert got[100] > got[101]


def test_contamination_report_bounds(spark):
    """A holdout doc whose text replicates a train doc verbatim has
    dirty_ratio 1.0; one with a disjoint vocabulary has 0.0."""
    # find ids landing in train vs test under the default split
    base = [(i, "alpha beta gamma delta epsilon zeta eta") for i in range(400)]
    df = _docs(spark, base)
    from es_ch_sync_spark.operators.sampling import assign_split

    splits = {r["doc_id"]: r["split"] for r in assign_split(df).collect()}
    test_ids = [i for i, s in splits.items() if s == "test"]
    assert test_ids, "default split produced no test docs in 400"
    dirty_id, clean_id = test_ids[0], test_ids[1]
    rows = [
        (i, "alpha beta gamma delta epsilon zeta eta")
        for i in range(400)
        if i not in (dirty_id, clean_id)
    ]
    rows += [(dirty_id, "alpha beta gamma delta epsilon zeta eta")]
    rows += [(clean_id, "one two three four five six seven")]
    rep = {
        r["doc_id"]: r
        for r in contamination_report(_docs(spark, rows), ngram_k=5).collect()
    }
    assert rep[dirty_id]["dirty_ratio"] == 1.0
    assert rep[clean_id]["dirty_ratio"] == 0.0
    assert rep[clean_id]["n_grams"] == 3  # 7 words → 3 distinct 5-grams


def test_negative_sampling_contract(spark):
    """Exactly k negatives per anchor, never the anchor itself, all ids in
    [0, N), and bit-identical across two runs (no RNG state)."""
    docs = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(200)], "doc_id long, source string"
    )
    out1 = negative_sample_pairs(docs, k=4, anchor_every=50).collect()
    out2 = negative_sample_pairs(docs, k=4, anchor_every=50).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    per_anchor = {}
    for r in out1:
        assert r["neg_id"] != r["anchor_id"]
        assert 0 <= r["neg_id"] < 200
        assert r["neg_source"] == f"src{r['neg_id'] % 3}"
        per_anchor.setdefault(r["anchor_id"], set()).add(r["slot"])
    # anchors are every 50th POSITION in the dense (bucket, id) order:
    # exactly N/anchor_every of them, ids arbitrary
    assert len(per_anchor) == 4
    assert all(slots == {0, 1, 2, 3} for slots in per_anchor.values())


def test_negative_sampling_sparse_and_string_ids(spark):
    """The r4 dense-id contract is gone: sparse numeric ids and string ids
    both yield exactly k negatives per anchor with no dropped slots (the
    old h-mod-N scheme landed on missing ids and silently lost pairs)."""
    sparse = spark.createDataFrame(
        [(i * 97 + 13, f"s{i % 4}") for i in range(120)],
        "doc_id long, source string",
    )
    ids = {r["doc_id"] for r in sparse.select("doc_id").collect()}
    out = negative_sample_pairs(sparse, k=3, anchor_every=40).collect()
    per_anchor = {}
    for r in out:
        assert r["neg_id"] in ids and r["neg_id"] != r["anchor_id"]
        per_anchor.setdefault(r["anchor_id"], set()).add(r["slot"])
    assert len(per_anchor) == 3  # 120 positions / 40
    assert all(slots == {0, 1, 2} for slots in per_anchor.values())

    strs = spark.createDataFrame(
        [(f"doc-{i:04d}", f"s{i % 2}") for i in range(60)],
        "doc_id string, source string",
    )
    sout = negative_sample_pairs(strs, k=2, anchor_every=20).collect()
    sper = {}
    for r in sout:
        assert r["neg_id"].startswith("doc-") and r["neg_id"] != r["anchor_id"]
        sper.setdefault(r["anchor_id"], set()).add(r["slot"])
    assert len(sper) == 3 and all(s == {0, 1} for s in sper.values())
    # determinism holds for string ids too
    assert sorted(map(tuple, sout)) == sorted(
        map(tuple, negative_sample_pairs(strs, k=2, anchor_every=20).collect())
    )


def test_negative_sampling_collision_deflects(spark):
    """With a 1-row corpus every hash collides with the anchor; the
    deflection rule (h+1) mod N maps back to 0 — documented degenerate
    case: the guard prevents (a,a) only when N > 1."""
    docs = spark.createDataFrame([(0, "s"), (1, "t")], "doc_id long, source string")
    out = negative_sample_pairs(docs, k=8, anchor_every=1).collect()
    for r in out:
        assert r["neg_id"] != r["anchor_id"]


def test_dup_span_merging_handchecked(spark):
    """Two docs share an 8-token run embedded at different offsets:
    overlapping duplicated 3-grams must merge into ONE maximal span per
    doc, and clean_text keeps exactly the non-shared tokens in order."""
    from es_ch_sync_spark.operators.dedup import remove_dup_spans

    shared = "q w e r t y u i"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"a b {shared} c d"),
            (2, f"x {shared} y z"),
            (3, "totally distinct words only here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in remove_dup_spans(docs, k=3).collect()}
    assert 3 not in rows
    # shared run = 8 tokens -> six 3-gram hits merge into one span of 8
    assert rows[1]["n_spans"] == 1 and rows[1]["n_dup_tokens"] == 8
    assert rows[2]["n_spans"] == 1 and rows[2]["n_dup_tokens"] == 8
    assert rows[1]["clean_text"] == "a b c d"
    assert rows[2]["clean_text"] == "x y z"


def test_dup_span_within_doc_repetition(spark):
    """A doc repeating its own k-gram is self-duplicated (corpus count
    > 1 includes within-doc repeats); a fully-duplicated doc cleans to
    the empty string."""
    from es_ch_sync_spark.operators.dedup import remove_dup_spans

    docs = spark.createDataFrame(
        [(1, "p q r p q r"), (2, "m n o unique tail words")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in remove_dup_spans(docs, k=3).collect()}
    # "p q r" occurs at positions 1 and 4 -> spans [1,4) and [4,7) merge
    assert rows[1]["n_spans"] == 1
    assert rows[1]["n_dup_tokens"] == 6
    assert rows[1]["clean_text"] == ""
    assert 2 not in rows


def test_dup_span_disjoint_spans_stay_separate(spark):
    """Two duplicated regions separated by unique tokens produce two
    spans, and the gap tokens survive."""
    from es_ch_sync_spark.operators.dedup import remove_dup_spans

    docs = spark.createDataFrame(
        [
            (1, "a1 a2 a3 GAPX b1 b2 b3"),
            (2, "a1 a2 a3 OTHER b1 b2 b3"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in remove_dup_spans(docs, k=3).collect()}
    assert rows[1]["n_spans"] == 2 and rows[1]["n_dup_tokens"] == 6
    assert rows[1]["clean_text"] == "gapx"  # normalize_text lowercases
    assert rows[2]["clean_text"] == "other"


def test_boilerplate_chunks_handchecked(spark):
    """Planted boilerplate: a 4-token footer shared by three docs is cut
    from all of them; doc-unique chunks survive; a doc made ENTIRELY of
    the footer empties out; repetition within one doc does NOT count
    toward document frequency."""
    from es_ch_sync_spark.operators.dedup import remove_boilerplate_chunks

    footer = "all rights reserved worldwide"
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta " + footer),
            (1, "epsilon zeta eta theta " + footer),
            (2, footer),
            # the same 4-gram repeated twice WITHIN one doc only:
            (3, "iota kappa lambda mu iota kappa lambda mu"),
            (4, "unique words entirely here nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in remove_boilerplate_chunks(
            docs, chunk_tokens=4, min_docs=2
        ).collect()
    }
    assert rows[0]["clean_text"] == "alpha beta gamma delta"
    assert rows[0]["n_boiler_chunks"] == 1 and rows[0]["n_chunks"] == 2
    assert rows[1]["clean_text"] == "epsilon zeta eta theta"
    assert rows[2]["clean_text"] == ""  # fully-templated doc empties out
    # within-doc repetition is NOT boilerplate (df = 1 doc)
    assert rows[3]["n_boiler_chunks"] == 0
    assert rows[3]["clean_text"] == "iota kappa lambda mu iota kappa lambda mu"
    assert rows[4]["n_boiler_chunks"] == 0


def test_ranking_metrics_hand_computed(spark):
    """k=3, one query: run = [miss, rel-2 doc, rel-1 doc], qrels has a
    third relevant doc never retrieved.  MRR = 1/2; recall@3 = 2/3;
    nDCG = (2·w(2) + 1·w(3)) / (2·w(1) + 1·w(2) + 1·w(3)) with
    w(r) = round(1e6/log2(r+1)) — integer weights, one float division."""
    from pyspark.sql import functions as F  # noqa: F401

    from es_ch_sync_spark.operators.analytics import ranking_metrics

    run = spark.createDataFrame(
        [(1, "X", 1), (1, "A", 2), (1, "B", 3)],
        "query_id int, doc_id string, rank int",
    )
    qrels = spark.createDataFrame(
        [(1, "A", 2), (1, "B", 1), (1, "C", 1)],
        "query_id int, doc_id string, rel int",
    )
    r = ranking_metrics(run, qrels, k=3).collect()[0]
    w1, w2, w3 = 1000000, 630930, 500000
    assert r["n_ret"] == 3 and r["n_rel"] == 3 and r["n_rel_ret"] == 2
    assert r["mrr"] == 0.5
    assert r["recall_at_k"] == round(2 / 3, 6)
    assert r["ndcg_at_k"] == round((2 * w2 + w3) / (2 * w1 + w2 + w3), 6)

    # no relevant docs for the query -> NULL metrics, never 0/0
    none = spark.createDataFrame([(9, "Z", 5)], "query_id int, doc_id string, rel int")
    r2 = ranking_metrics(run, none.filter("rel < 0"), k=3).collect()[0]
    assert r2["mrr"] is None and r2["recall_at_k"] is None and r2["ndcg_at_k"] is None


def test_ranking_metrics_zero_recall_query_scores_mrr_zero(spark):
    """A query WITH relevant docs that retrieves none in the top-k gets
    mrr = 0.0 and recall = 0.0 (trec_eval convention) — NULL there would
    inflate averaged MRR; a query with NO relevant docs stays NULL."""
    from es_ch_sync_spark.operators.analytics import ranking_metrics

    run = spark.createDataFrame(
        [(1, "X", 1), (1, "Y", 2)], "query_id int, doc_id string, rank int"
    )
    qrels = spark.createDataFrame(
        [(1, "A", 1)], "query_id int, doc_id string, rel int"
    )
    r = ranking_metrics(run, qrels, k=2).collect()[0]
    assert r["n_rel"] == 1 and r["n_rel_ret"] == 0
    assert r["mrr"] == 0.0 and r["recall_at_k"] == 0.0
    assert r["ndcg_at_k"] == 0.0


def test_ranking_metrics_qrels_only_query_not_dropped(spark):
    """A query that has relevant qrels but ZERO rows in the run must
    still appear in the output with mrr = recall = ndcg = 0.0 (output
    keys are run ∪ qrels queries, full-outer — r9 ADVICE #1): deriving
    keys from run rows alone would silently drop it and inflate
    averaged MRR, the exact failure the trec_eval convention targets."""
    from es_ch_sync_spark.operators.analytics import ranking_metrics

    run = spark.createDataFrame(
        [(1, "A", 1)], "query_id int, doc_id string, rank int"
    )
    qrels = spark.createDataFrame(
        [(1, "A", 1), (2, "B", 2)], "query_id int, doc_id string, rel int"
    )
    rows = {r["query_id"]: r for r in ranking_metrics(run, qrels, k=3).collect()}
    assert set(rows) == {1, 2}  # query 2 has no run rows yet survives
    r2 = rows[2]
    assert r2["n_ret"] == 0 and r2["n_rel"] == 1 and r2["n_rel_ret"] == 0
    assert r2["mrr"] == 0.0 and r2["recall_at_k"] == 0.0
    assert r2["ndcg_at_k"] == 0.0
    # the retrieving query is unaffected
    assert rows[1]["mrr"] == 1.0 and rows[1]["recall_at_k"] == 1.0


def test_bm25_from_postings_matches_bm25_topk(spark):
    """bm25_topk_from_postings over a shared bm25_posting_table is
    value-identical to bm25_topk per query: same df-per-term, same
    n_docs/avgdl census (docs with zero matching terms still count via
    the NULL-term census row), same micro-unit rounding."""
    from es_ch_sync_spark.operators.text import (
        bm25_posting_table,
        bm25_topk,
        bm25_topk_from_postings,
    )

    docs = _docs(
        spark,
        [
            (1, "spark spark spark flink"),
            (2, "spark beam storm samza"),
            (3, "duck goose swan heron"),  # matches neither query
            (4, "flink flink beam beam beam"),
        ],
    )
    queries = [["spark"], ["flink", "beam"]]
    all_terms = sorted({t for q in queries for t in q})
    posting, stats = bm25_posting_table(docs, all_terms, checkpoint=False)
    for terms in queries:
        got = sorted(
            bm25_topk_from_postings(posting, stats, terms, k=10).collect()
        )
        want = sorted(bm25_topk(docs, terms, k=10).collect())
        assert got == want
    # the census row kept doc 3: n_docs/avgdl cover the WHOLE corpus
    s = stats.collect()[0]
    assert s["n_docs"] == 4 and abs(s["avgdl"] - 17 / 4) < 1e-12


def test_rm3_expansion_laws(spark):
    """RM3 on a planted corpus: terms co-occurring with the query in the
    feedback docs outrank terms from non-retrieved docs (which must not
    appear at all); query terms are flagged, not dropped; weights are
    exact integers (tf·bm25_m div dl summed)."""
    from es_ch_sync_spark.operators.text import rm3_expansion

    docs = _docs(
        spark,
        [
            (1, "spark streams shuffle shuffle"),
            (2, "spark shuffle partition"),
            (3, "duck goose swan heron"),  # never retrieved for 'spark'
        ],
    )
    out = rm3_expansion(docs, ["spark"], k_docs=2, k_terms=10).collect()
    by_term = {r["term"]: r for r in out}
    assert "duck" not in by_term  # non-feedback docs contribute nothing
    assert by_term["spark"]["is_query_term"] is True
    assert by_term["shuffle"]["is_query_term"] is False
    # shuffle occurs 3x across both feedback docs; partition once
    assert by_term["shuffle"]["n_docs"] == 2
    assert by_term["shuffle"]["weight_m"] > by_term["partition"]["weight_m"]
    # exact integer check: weight(partition) = 1 * bm25_m(doc2) div 3
    import math

    k1, b = 1.2, 0.75
    idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    comp2 = idf * (1 * (k1 + 1)) / (1 + k1 * (1 - b + b * 3 / (11 / 3)))
    bm_m2 = round(round(comp2, 6) * 1e6)
    assert by_term["partition"]["weight_m"] == bm_m2 // 3


def test_qld_topk_handchecked(spark):
    """3-doc corpus, mu=10: per-term micro-nat contributions recomputed
    in Python; docs without any query term are not scored; missing terms
    take the pure background probability."""
    from es_ch_sync_spark.operators.text import qld_topk

    docs = spark.createDataFrame(
        [(1, "spark spark merge"), (2, "spark other other other"), (3, "other other")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           qld_topk(docs, ["spark", "merge"], k=10, mu=10).collect()}
    assert set(out) == {1, 2}

    def lnm(num, den):
        return round((math.log(num) - math.log(den)) * 1e6)

    # N=9, cf_spark=3, cf_merge=1
    d1 = lnm(2 * 9 + 10 * 3, 13 * 9) + lnm(1 * 9 + 10 * 1, 13 * 9)
    d2 = lnm(1 * 9 + 10 * 3, 14 * 9) + lnm(0 * 9 + 10 * 1, 14 * 9)
    assert out[1]["qld"] == d1 / 1e6 and out[1]["n_matched"] == 2
    assert out[2]["qld"] == d2 / 1e6 and out[2]["n_matched"] == 1
    assert out[1]["qld"] > out[2]["qld"]


def test_rbo_identical_rankings_is_one_minus_p_pow_k(spark):
    """RBO truncated at k of two IDENTICAL rankings = 1 - p^k (every
    depth overlaps fully); the registered query's weight vector obeys
    the same identity against a Python recomputation on real data."""
    from es_ch_sync_spark.queries_pipeline import _RBO_K, _RBO_P, _RBO_W

    # identity of the weights themselves: sum(w_d * d) = 1 - p^k
    assert round(sum(w * d for w, d in zip(_RBO_W, range(1, _RBO_K + 1))), 12) \
        == round(1 - _RBO_P ** _RBO_K, 12)


def test_rbo_query_matches_python_recomputation(spark, sf_dir):
    from es_ch_sync_spark import queries_pipeline as qp
    from es_ch_sync_spark.operators.text import bm25_topk, qld_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = [r["doc_id"] for r in bm25_topk(docs, qp._BM25_TERMS, k=10).collect()]
    b = [r["doc_id"] for r in
         qld_topk(docs, qp._BM25_TERMS, k=10, mu=2000).collect()]
    xs = [len(set(a[:d]) & set(b[:d])) for d in range(1, 11)]
    expect = round(sum(w * x for w, x in zip(qp._RBO_W, xs)), 6)
    got = qp.q_rbo_bm25_vs_qld(spark, sf_dir).collect()[0]
    assert got["rbo"] == expect and got["overlap_at_k"] == xs[-1]
