"""BM25 retrieval (operators/retrieval.py): hand-computed planted case,
ranking sanity on the corpus, and the no-tolerance integer contract."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from rgr_pdal_topo_spark.operators import retrieval
from rgr_pdal_topo_spark.sources.tables import load_table


def _py_bm25(docs, queries):
    """Pure-Python replay of the exact quantized pipeline."""
    toks = {d: t.split() for d, t in docs}
    n = len(docs)
    s = sum(len(t) for t in toks.values())
    df = {}
    for t in toks.values():
        for tok in set(t):
            df[tok] = df.get(tok, 0) + 1
    out = {}
    for qid, qtext in queries:
        for doc_id, t in toks.items():
            hits = 0
            score = 0
            for tok in set(qtext.split()):
                tf = t.count(tok)
                if tf == 0:
                    continue
                hits += 1
                idf_q = math.floor(
                    math.log((2 * n + 2) / (2 * df[tok] + 1))
                    * retrieval.IDF_SCALE + 0.5
                )
                score += math.floor(
                    (idf_q * 22 * tf * s)
                    / (10 * tf * s + 3 * s + 9 * len(t) * n)
                    * retrieval.Q13
                )
            if hits:
                out[(qid, doc_id)] = (hits, score)
    return out


def test_bm25_planted_matches_python_replay(spark):
    docs = [
        (0, "apple banana apple"),
        (1, "banana cherry"),
        (2, "cherry cherry cherry date"),
        (3, "elderberry fig"),
    ]
    queries = ((0, "apple cherry"), (1, "banana"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["qid"], r["doc_id"]): (r["n_hits"], r["score_q13"])
        for r in retrieval.bm25_scores(df, queries).collect()
    }
    assert got == _py_bm25(docs, queries)


def test_bm25_ranking_properties_on_corpus(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = retrieval.bm25_scores(docs)
    rows = out.collect()
    assert len(rows) > 0
    # scores are positive ints; more hits never scores zero
    assert all(r["score_q13"] > 0 for r in rows)
    # per query, the top doc by score contains every scoring token at
    # least as often as... (weak sanity: top doc has max n_hits or a
    # higher tf mix) — pin just that a full-hit doc outranks the median
    for qid in {r["qid"] for r in rows}:
        qs = sorted(
            (r for r in rows if r["qid"] == qid),
            key=lambda r: -r["score_q13"],
        )
        full = [r for r in qs if r["n_hits"] == max(x["n_hits"] for x in qs)]
        assert full[0]["score_q13"] >= qs[len(qs) // 2]["score_q13"]


def test_bm25_idf_orders_rarity(spark):
    # a token in 1 of 4 docs must out-idf a token in 3 of 4
    docs = [
        (0, "rare common"), (1, "common x"), (2, "common y"), (3, "z w"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        (r["qid"], r["doc_id"]): r["score_q13"]
        for r in retrieval.bm25_scores(
            df, ((0, "rare"), (1, "common"))
        ).collect()
    }
    # doc 0 contains both; rare must contribute more there
    assert out[(0, 0)] > out[(1, 0)]


def test_kwic_planted_snippets(spark):
    docs = [
        (0, "a b TARGET c d e"),        # interior hit: full 5-window
        (1, "TARGET x y"),              # hit at pos 1: left-clamped
        (2, "p q r s TARGET"),          # hit at end: right-clamped
        (3, "nothing here"),            # no hit: absent from output
        (4, "u TARGET v TARGET w"),     # earliest hit wins
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["hit_pos"], r["snippet"])
        for r in retrieval.kwic_snippets(df, ((0, "TARGET"),)).collect()
    }
    assert got == {
        0: (3, "a b TARGET c d"),
        1: (1, "TARGET x y"),
        2: (5, "r s TARGET"),
        4: (2, "u TARGET v TARGET"),
    }


def test_kwic_earliest_across_query_tokens(spark):
    df = spark.createDataFrame(
        [(0, "x beta y alpha z")], "doc_id long, text string"
    )
    got = retrieval.kwic_snippets(df, ((0, "alpha beta"),)).collect()
    assert got[0]["hit_pos"] == 2  # beta at 2 beats alpha at 4
    assert got[0]["snippet"] == "x beta y alpha"


def test_search_results_topk_and_snippet_join(spark):
    """The composed page: rnk is the exact BM25 order (score DESC,
    doc_id tiebreak), the k-cut holds, and every row carries the same
    snippet the solo KWIC stage emits."""
    docs = [
        (0, "alpha beta gamma"),
        (1, "alpha alpha beta"),       # more 'alpha' mass than doc 0
        (2, "delta delta delta"),
        (3, "alpha beta beta gamma"),
        (4, "epsilon zeta"),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    qs = ((7, "alpha"),)
    got = {
        r["doc_id"]: (r["rnk"], r["score_q13"], r["snippet"])
        for r in retrieval.search_results(df, queries=qs, k=2).collect()
    }
    # only the k=2 best alpha docs survive
    assert set(got) <= {0, 1, 3} and len(got) == 2
    ranks = sorted((v[0], d) for d, v in got.items())
    assert [r for r, _ in ranks] == [1, 2]
    # scores and order match the solo stage exactly
    solo = {
        r["doc_id"]: r["score_q13"]
        for r in retrieval.bm25_scores(df, queries=qs).collect()
    }
    order = sorted(solo, key=lambda d: (-solo[d], d))[:2]
    assert [d for _, d in ranks] == order
    for d, (_, sc, sn) in got.items():
        assert sc == solo[d]
    # snippets equal the solo KWIC output for those (qid, doc) pairs
    kw = {
        r["doc_id"]: r["snippet"]
        for r in retrieval.kwic_snippets(df, queries=qs).collect()
    }
    for d, (_, _, sn) in got.items():
        assert sn == kw[d]


def test_doc_keywords_rare_term_wins(spark):
    """A term unique to one document out-scores its frequent common
    terms (idf dominates), and the replayed tf*idf_q contract matches
    exactly."""
    import math
    import os
    import tempfile

    from rgr_pdal_topo_spark.queries import QUERIES

    rows = [
        (0, "common common common zebra", "en"),
        (1, "common common other words here", "en"),
        (2, "common other words more text", "en"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {
        (r.doc_id, r.rnk): (r.tok, r.tf, r.score_q)
        for r in QUERIES["doc_keywords"](spark, d).collect()
    }

    def idf_q(n, df):
        return math.floor(math.log((2 * n + 2) / (2 * df + 1)) * 256 + 0.5)

    # doc 0: zebra df=1 -> idf_q(3,1)=ln(8/3)*256; common df=3 ->
    # ln(8/7)*256; tf 3 * small idf still loses to 1 * big idf
    z = idf_q(3, 1)
    c = idf_q(3, 3)
    assert got[(0, 1)] == ("zebra", 1, 1 * z)
    assert got[(0, 2)] == ("common", 3, 3 * c)
    assert 1 * z > 3 * c


def test_phrase_hits_planted(spark):
    # doc 1: "a b c" twice (positions 1 and 4), plus a decoy "a b" with
    # no "c" after; doc 2: tokens present but never consecutive;
    # doc 3: phrase at the very start and very end.
    docs = [
        (1, "a b c a b c a b x"),
        (2, "a x b x c a c b"),
        (3, "a b c x x a b c"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.qid, r.doc_id): (r.n_hits, r.first_pos)
        for r in retrieval.phrase_hits(df, ((7, "a b c"),)).collect()
    }
    assert got == {(7, 1): (2, 1), (7, 3): (2, 1)}


def test_phrase_hits_repeated_token_phrase(spark):
    # "b b" inside "b b b" overlaps: anchors 1 and 2 both qualify.
    df = spark.createDataFrame(
        [(1, "b b b"), (2, "b x b")], "doc_id long, text string"
    )
    got = {
        (r.qid, r.doc_id): (r.n_hits, r.first_pos)
        for r in retrieval.phrase_hits(df, ((0, "b b"),)).collect()
    }
    assert got == {(0, 1): (2, 1)}


def test_phrase_hits_single_token_equals_tf(spark):
    df = spark.createDataFrame(
        [(1, "z a z"), (2, "a a a")], "doc_id long, text string"
    )
    got = {
        (r.qid, r.doc_id): (r.n_hits, r.first_pos)
        for r in retrieval.phrase_hits(df, ((0, "z"),)).collect()
    }
    assert got == {(0, 1): (2, 1)}


def test_phrase_hits_contained_in_bm25_rows(spark):
    docs = load_table(spark, SF_DIR, "documents")
    ph = {
        (r.qid, r.doc_id)
        for r in retrieval.phrase_hits(docs).collect()
    }
    bm = {
        (r.qid, r.doc_id)
        for r in retrieval.bm25_scores(docs).collect()
    }
    assert ph and ph <= bm


def test_postings_gaps_hand_computed(spark):
    """Two tokens with known posting lists: 'a' in docs {0, 1, 9}
    (gaps 1, 1, 8 -> bits 1, 1, 4), 'b' in doc {6} (gap 7 -> bits 3).
    Census: bits 1 x2 (1 varint byte each), bits 3 x1, bits 4 x1."""
    docs = spark.createDataFrame(
        [
            (0, "a"),
            (1, "a"),
            (9, "a x"),
            (6, "b"),
        ],
        "doc_id long, text string",
    )
    from rgr_pdal_topo_spark.operators.retrieval import (
        postings_gap_census,
    )

    got = {
        r["gap_bits"]: (r["n_gaps"], r["varint_bytes"])
        for r in postings_gap_census(docs).collect()
    }
    # token 'x' in doc 9: gap 10 -> bits 4 (joins the bits-4 bucket)
    # token 'b' in doc 6: gap 7 -> bits 3
    assert got[1] == (2, 2)
    assert got[3] == (1, 1)
    assert got[4] == (2, 2)  # gaps 8 and 10, one varint byte each
    assert set(got) == {1, 3, 4}


def test_search_rrf_hand_computed_fusion(spark):
    """Hand-checkable fusion: doc A ranks 1 in BM25 and 2 in phrase,
    doc B ranks 2/1, doc C appears ONLY in BM25 (rank 3) -> its phrase
    contribution is 0 and r_phrase is NULL; rrf_q values are the exact
    floor-divisions of 2^20."""
    from rgr_pdal_topo_spark.operators.retrieval import search_fused

    docs = spark.createDataFrame(
        [
            # qid 0 tokens: "slow hash batch"
            (1, "slow hash batch slow hash batch slow"),  # A: top bm25,
                                                          # 2 phrase hits
            (2, "slow hash batch x x x"),                 # B: 1 phrase hit
            (3, "slow x x"),                              # C: bm25 only
        ],
        "doc_id long, text string",
    )
    out = {
        (r["qid"], r["doc_id"]): r
        for r in search_fused(docs).collect()
        if r["qid"] == 0
    }
    a, b, c = out[(0, 1)], out[(0, 2)], out[(0, 3)]
    # A: 2 phrase occurrences -> phrase rank 1; longest/most tokens ->
    # check consistency rather than assuming bm25 order:
    ra, pa = a["r_bm25"], a["r_phrase"]
    assert pa == 1 and b["r_phrase"] == 2
    assert c["r_phrase"] is None
    div = lambda r: (1 << 20) // (60 + r) if r is not None else 0  # noqa
    for row in (a, b, c):
        assert row["rrf_q"] == div(row["r_bm25"]) + div(row["r_phrase"])
