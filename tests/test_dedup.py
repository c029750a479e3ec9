"""Dedup operator tests: shingling, LSH recall/selectivity, bucket caps,
digest-keyed exact dedup.

The recall test builds a controlled corpus: base docs drawn from disjoint
seeded vocabularies (near-zero cross Jaccard) plus one near-duplicate per
base doc (one token substituted -> 3-shingle Jaccard ~0.7), and asserts the
LSH candidate set finds the planted pairs without drowning in noise.
"""

from __future__ import annotations

import random

import pytest

from rgr_pdal_topo_spark.operators import dedup


def _corpus(n_base: int = 30, n_tok: int = 20, seed: int = 7):
    rng = random.Random(seed)
    rows = []
    for i in range(n_base):
        toks = [f"w{i}_{rng.randrange(10**6)}" for _ in range(n_tok)]
        rows.append((i, " ".join(toks)))
        dup = list(toks)
        dup[n_tok // 2] = "CHANGED"
        rows.append((1000 + i, " ".join(dup)))
    return rows


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_corpus(), "doc_id long, text string")


def test_shingles_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b c"), (3, "a b c d"), (4, "")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.shingle) for r in dedup.shingles(df, k=3).collect()
    }
    assert got == {(2, "a b c"), (3, "a b c"), (3, "b c d")}


def test_minhash_lsh_recall_and_selectivity(docs):
    sig = dedup.minhash_signatures(dedup.shingle_ids(docs))
    pairs = dedup.minhash_candidate_pairs(sig).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    planted = {(i, 1000 + i) for i in range(30)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.9, f"LSH recall {recall} < 0.9 on planted near-dups"
    # selectivity: disjoint-vocab pairs should essentially never collide
    n_docs = 60
    all_pairs = n_docs * (n_docs - 1) // 2
    assert len(got) <= len(planted) + 0.02 * all_pairs, (
        f"{len(got)} candidates for {len(planted)} true pairs — banding "
        "is not selective"
    )


def test_bucket_cap_prevents_quadratic_blowup(spark):
    # 20 identical docs -> every band bucket has 20 members; with a cap of
    # 10 the capped join must produce NO pairs (the group belongs to exact
    # dedup), with the default cap it produces all 190.
    df = spark.createDataFrame(
        [(i, "the same exact document text repeated verbatim here")
         for i in range(20)],
        "doc_id long, text string",
    )
    sig = dedup.minhash_signatures(dedup.shingle_ids(df))
    assert dedup.minhash_candidate_pairs(sig, max_bucket=10).count() == 0
    assert dedup.minhash_candidate_pairs(sig).count() == 190


def test_exact_dedup_digest_grouping(spark):
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "aaa")],
        "doc_id long, text string",
    )
    got = {
        (r.canonical_doc, r.group_size)
        for r in dedup.exact_duplicates(df).collect()
    }
    assert got == {(1, 3), (2, 1)}
    # the aggregate key must be the md5 digest, not the text column
    plan = dedup.exact_duplicates(df)._jdf.queryExecution().executedPlan()
    assert "md5" in plan.toString().lower()


def test_horner_hash_matches_duckdb(spark, ddb):
    samples = ["hello", "a", "", "Zw3 9!", "über tok"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    expr = dedup.horner_hash_sql("h")
    got = [
        r.tid
        for r in df.selectExpr("md5(s) AS h")
        .selectExpr(f"{expr} AS tid")
        .collect()
    ]
    exp = [
        ddb.execute(
            f"SELECT {expr} FROM (SELECT md5(?) AS h)", [s]
        ).fetchone()[0]
        for s in samples
    ]
    assert got == exp
    assert all(0 <= t < dedup.MINHASH_P for t in got)
