"""Multimodal plumbing, checkpoint lineage, streaming-vs-batch parity."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_DIR

from pyspark.sql import functions as F


def test_multimodal_features_deterministic(spark):
    from rgr_pdal_topo_spark.operators import multimodal as mm
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(50)
    payloads = mm.attach_payload(docs)
    a = mm.extract_features(payloads).toPandas().sort_values("doc_id")
    b = mm.extract_features(payloads).toPandas().sort_values("doc_id")
    assert len(a) == 50
    assert all(len(v) == mm.FEATURE_DIM for v in a.feature)
    for va, vb in zip(a.feature, b.feature):
        np.testing.assert_array_equal(va, vb)
    # payload_bytes metadata consistent with binary length
    assert (a.payload_bytes > 0).all()


def test_multimodal_strict_raises(spark):
    from rgr_pdal_topo_spark.operators import multimodal as mm
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(2)
    payloads = mm.attach_payload(docs)
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        mm.extract_features(payloads, strict=True).collect()


def test_frame_sample_shapes(spark):
    from rgr_pdal_topo_spark.operators import multimodal as mm
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(20)
    frames = mm.frame_sample(mm.attach_payload(docs)).toPandas()
    assert (frames.frame_offset == frames.frame_idx * 64).all()
    assert frames.groupby("doc_id").frame_idx.max().max() <= 7


def test_lineage_resume_equals_single_shot(spark, tmp_path):
    from rgr_pdal_topo_spark.plans.lineage import BatchCheckpointer
    from rgr_pdal_topo_spark.synth import points_df

    pts = points_df(spark, SF_DIR)

    def transform(df):
        return df.groupBy("batch_id", "cls").agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("z"), 6).alias("sz")
        )

    # single shot
    cp1 = BatchCheckpointer(str(tmp_path / "one"), n_batches=8)
    full = transform(
        pts.withColumn("batch_id", F.pmod(F.col("pid"), F.lit(8)).cast("int"))
    ).toPandas().sort_values(["batch_id", "cls"]).reset_index(drop=True)

    # interrupted run: first process only batches 0-3 (simulate failure)
    cp = BatchCheckpointer(str(tmp_path / "resume"), n_batches=8)
    cp.run(pts.filter(F.pmod(F.col("pid"), F.lit(8)) < 4), transform)
    assert sorted(
        r.batch_id for r in cp.completed(spark).collect()
    ) == [0, 1, 2, 3]

    # resume with the full input: only batches 4-7 are computed
    out = cp.run(pts, transform).toPandas()
    got = out.sort_values(["batch_id", "cls"]).reset_index(drop=True)
    assert (
        got[["batch_id", "cls", "n", "sz"]].values.tolist()
        == full[["batch_id", "cls", "n", "sz"]].values.tolist()
    )
    # no drift detected
    assert cp.validate(pts).count() == 0


def test_streaming_equals_batch(spark, tmp_path):
    import shutil

    from rgr_pdal_topo_spark.streaming.windows import (
        events_stream,
        hourly_counts_stream,
        run_to_memory,
    )

    # the file stream source requires a directory
    events_dir = tmp_path / "events_stream"
    events_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", events_dir / "part-0.parquet")

    stream = hourly_counts_stream(events_stream(spark, str(events_dir)))
    got = (
        run_to_memory(stream, "hourly_test")
        .toPandas()
        .sort_values(["hour", "event_type"])
        .reset_index(drop=True)
    )
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .toPandas()
        .sort_values(["hour", "event_type"])
        .reset_index(drop=True)
    )
    assert len(got) == len(batch)
    assert (got.n.to_numpy() == batch.n.to_numpy()).all()
    np.testing.assert_allclose(got.sum_value, batch.sum_value, atol=2e-6)


def test_langid_discriminates_languages(spark):
    """The driver corpus is English-shaped for every lang label, so the
    driver row only exercises the all-zero/en path — discrimination must
    be pinned here: planted function-word texts predict their language,
    and score ties keep the earlier code in the en<es<de<fr preference
    order (strict > to switch)."""
    from rgr_pdal_topo_spark.operators.textstats import langid_scores

    rows = [
        (1, "en", "the cat and the dog of a house to go"),
        (2, "es", "el perro de la casa que ladra y corre"),
        (3, "de", "der hund und die katze das ist gut"),
        (4, "fr", "le chat et les chiens de le parc"),
        (5, "tie", "la de"),  # es == fr == 2 -> es (earlier preference)
        (6, "none", "zebra quark flux"),  # all-zero -> en default
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r.doc_id: r for r in langid_scores(df).collect()}
    assert got[1].pred_lang == "en" and got[1].score_en == 6
    assert got[2].pred_lang == "es" and got[2].score_es == 5
    assert got[3].pred_lang == "de" and got[3].score_de == 5
    assert got[4].pred_lang == "fr" and got[4].score_fr == 5
    assert got[5].pred_lang == "es" and got[5].score_es == 2
    assert got[5].score_fr == 2
    assert got[6].pred_lang == "en" and got[6].score_en == 0


def test_exact_dedup_groups_on_planted_duplicates(spark):
    """The driver corpus has no exact duplicate texts (every group_size
    is 1), so real grouping must be pinned here: planted duplicate texts
    collapse to min-doc_id canonicals with correct group sizes."""
    from rgr_pdal_topo_spark.operators.dedup import exact_duplicates

    rows = [(i, "common crawl page body") for i in (5, 9, 2)] + [
        (7, "unique page"), (8, "another unique page"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.canonical_doc, r.group_size)
        for r in exact_duplicates(df).collect()
    }
    assert got == {(2, 3), (7, 1), (8, 1)}


def test_lineage_fingerprint_version_mismatch_is_loud(spark, tmp_path):
    """A manifest written by a DIFFERENT fingerprint algorithm (or one
    predating versioning) must raise a rebuild instruction, not flag
    every batch as drifted."""
    import pytest

    from rgr_pdal_topo_spark.plans.lineage import BatchCheckpointer
    from rgr_pdal_topo_spark.synth import points_df

    pts = points_df(spark, SF_DIR)

    def transform(df):
        return df.groupBy("batch_id").agg(F.count(F.lit(1)).alias("n"))

    cp = BatchCheckpointer(str(tmp_path / "fpv"), n_batches=4)
    cp.run(pts.filter(F.pmod(F.col("pid"), F.lit(4)) < 2), transform)

    # forge a legacy manifest: drop the version column entirely
    legacy = spark.read.parquet(cp.manifest_path).drop("fp_version")
    legacy.write.mode("overwrite").parquet(str(tmp_path / "legacy_mf"))
    spark.read.parquet(str(tmp_path / "legacy_mf")).write.mode(
        "overwrite"
    ).parquet(cp.manifest_path)
    assert "fp_version" not in spark.read.parquet(cp.manifest_path).columns

    with pytest.raises(RuntimeError, match="fingerprint version"):
        cp.run(pts, transform)
    with pytest.raises(RuntimeError, match="fingerprint version"):
        cp.validate(pts)


def test_session_window_stream_drains_to_batch_result(spark, tmp_path):
    """Streaming session windows (merge semantics) drained over a
    multi-file (multi-micro-batch) source equal the SAME session_window
    plan run through the batch engine — interval merges must happen
    across micro-batch boundaries.  Watermark is set far beyond the
    table's span so no event is late (the equality is about merge
    state, not late-data policy)."""
    from rgr_pdal_topo_spark.streaming.windows import (
        events_stream,
        run_to_memory,
        session_counts_stream,
    )

    events_dir = tmp_path / "events_sessions"
    # 3 files -> 3 micro-batches at maxFilesPerTrigger=1, arbitrary order
    spark.read.parquet(f"{SF_DIR}/events.parquet").repartition(3).write.parquet(
        str(events_dir)
    )

    stream = session_counts_stream(
        events_stream(spark, str(events_dir)), watermark="400 days"
    )
    got = (
        run_to_memory(stream, "sessions_test", output_mode="complete")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    batch = (
        spark.read.parquet(str(events_dir))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    assert len(got) == len(batch) > 0
    for c in ("user_id", "session_start", "session_end", "n_events"):
        assert (got[c].to_numpy() == batch[c].to_numpy()).all(), c

    # Cross-check the boundary contract end to end: per-user session
    # counts from the drained stream must equal the oracle-backed batch
    # `sessionize` query's n_sessions (lag + running-sum spelling, same
    # 30-minute gap, same strictly-greater-than-gap "new session" rule).
    from rgr_pdal_topo_spark.queries import QUERIES

    sess = (
        QUERIES["sessionize"](spark, SF_DIR)
        .toPandas()
        .set_index("user_id")["n_sessions"]
        .to_dict()
    )
    stream_counts = got.groupby("user_id").size().to_dict()
    assert stream_counts == sess


def test_session_window_boundary_semantics(spark, tmp_path):
    """Documented boundary contract: an event EXACTLY gap after the
    previous one MERGES into the session (Spark merges on touching
    [ts, ts+gap) windows), and only an event strictly beyond the gap
    opens a new one — the same closed boundary as the batch sessionize
    oracle's ``ts > prev + gap`` lag spelling."""
    import datetime as dt

    from rgr_pdal_topo_spark.streaming.windows import (
        run_to_memory,
        session_counts_stream,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + dt.timedelta(minutes=30)),              # exact gap -> MERGE (1 session)
        (2, t0),
        (2, t0 + dt.timedelta(minutes=30, seconds=1)),   # beyond -> NEW (2 sessions)
    ]
    src = tmp_path / "boundary_events"
    spark.createDataFrame(
        rows, "user_id int, ts timestamp"
    ).coalesce(1).write.parquet(str(src))
    stream = (
        spark.readStream.schema("user_id int, ts timestamp")
        .parquet(str(src))
    )
    got = (
        run_to_memory(
            session_counts_stream(stream, watermark="400 days"),
            "sessions_boundary",
            output_mode="complete",
        )
        .groupBy("user_id")
        .count()
        .toPandas()
        .set_index("user_id")["count"]
        .to_dict()
    )
    assert got == {1: 1, 2: 2}


def test_dsir_weights_separates_target_from_junk(spark):
    """DSIR sign semantics on a planted corpus: documents whose bigrams
    live only in the C4-gate-passing (target) slice must outscore
    documents built from gate-failing junk bigrams, with positive vs
    negative scores respectively; bigram counts are exact."""
    from rgr_pdal_topo_spark.operators import textstats

    rows = []
    # 6 target docs: 24 distinct tokens (pass the >= 20-token C4 gate),
    # vocabulary disjoint from the junk slice
    for i in range(6):
        rows.append((i, " ".join(f"good{i}w{j}" for j in range(24))))
    # 6 junk docs: 5 tokens (fail the gate), own vocabulary
    for i in range(6, 12):
        rows.append((i, " ".join(f"junk{i}w{j}" for j in range(5))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["score"])
        for r in textstats.dsir_weights(docs).collect()
    }
    assert set(got) == set(range(12))
    for i in range(12):
        assert got[i][0] == (23 if i < 6 else 4)
    good = [got[i][1] for i in range(6)]
    junk = [got[i][1] for i in range(6, 12)]
    # every target doc outscores every junk doc; signs separate
    assert min(good) > max(junk)
    assert all(s > 0 for s in good) and all(s < 0 for s in junk)


def test_source_quality_planted_rollup(spark):
    """Hand-computed per-source rollup: gate pass counts, token totals,
    and cross-document shingle duplication attributed to each source."""
    from rgr_pdal_topo_spark.operators import textstats

    rows = [
        # src a: one gate-passing doc (24 tokens), one failing (5)
        (0, "a", "en", " ".join(f"g{j}" for j in range(24))),
        (1, "a", "en", "x1 x2 x3 x4 x5"),
        # src b: the failing doc shares the shingle "x1 x2 x3" with doc 1;
        # the passing doc has 23 tokens
        (2, "b", "en", "x1 x2 x3 y1 y2"),
        (3, "b", "en", " ".join(f"h{j}" for j in range(23))),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    )
    got = {
        r["source"]: (
            r["n_docs"], r["n_kept"], r["total_tokens"],
            r["total_shingles"], r["total_dup_shingles"],
        )
        for r in textstats.source_quality(docs).collect()
    }
    assert got == {
        # 22 + 3 shingles; the one shared shingle counts once per side
        "a": (2, 1, 29, 25, 1),
        "b": (2, 1, 28, 24, 1),
    }


def test_token_packing_planted_boundaries(spark):
    """Hand-computed packing with chunk=512: boundary-straddling docs
    counted, contiguous cumsum bins, zero-token docs excluded."""
    from rgr_pdal_topo_spark.operators import textstats

    def words(n):
        return " ".join(f"w{j}" for j in range(n))

    rows = [
        (0, "a", ""),            # zero tokens -> excluded entirely
        (1, "a", words(300)),    # [0, 299]    bin 0
        (2, "a", words(300)),    # [300, 599]  bins 0-1 -> split
        (3, "a", words(300)),    # [600, 899]  bin 1
        (4, "b", words(100)),    # [0, 99]     bin 0
        (5, "b", words(500)),    # [100, 599]  bins 0-1 -> split
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["source"]: (r["n_docs"], r["total_tokens"], r["n_bins"],
                      r["n_split_docs"])
        for r in textstats.token_packing(docs).collect()
    }
    assert got == {"a": (3, 900, 2, 1), "b": (2, 600, 2, 1)}


def test_bigram_ppl_gibberish_scores_worse(spark):
    """Gate semantics: a document whose bigrams all occur in the clean
    (C4-gate-passing) slice scores a much lower per-token nll than a
    same-length document of corpus-unseen gibberish bigrams; counts are
    exact and every nll is positive."""
    from rgr_pdal_topo_spark.operators import textstats

    common = " ".join(f"c{j % 6}" for j in range(24))   # 24 toks, 6-word loop
    rows = [(i, common) for i in range(8)]              # clean slice (pass gate)
    rows.append((8, " ".join(f"c{j % 6}" for j in range(12))))  # fails gate
    rows.append((9, " ".join(f"z{j}" for j in range(12))))      # gibberish
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll_q"])
        for r in textstats.bigram_ppl(docs).collect()
    }
    assert set(got) == set(range(10))
    assert all(n == (23 if i < 8 else 11) for i, (n, _) in got.items())
    assert all(v > 0 for _, v in got.values())
    per_tok_seen = got[8][1] / got[8][0]     # bigrams all in the LM
    per_tok_junk = got[9][1] / got[9][0]     # bigrams/contexts all unseen
    assert per_tok_junk > 2 * per_tok_seen


def test_release_pipeline_python_replay(spark):
    """Full pure-Python replay of the composed release: exact-dedup
    winners, C4 gate, stopword langid (with tie order), hash split,
    BPE-estimate totals — over a corpus exercising every stage."""
    import hashlib
    import math

    from pyspark.sql import functions as FF

    from rgr_pdal_topo_spark.operators import dedup as dd
    from rgr_pdal_topo_spark.operators import textstats

    en = ("the a and of to " * 4).strip()          # 20 toks, passes
    es = ("el la de que y " * 4).strip()           # 20 toks, passes, es
    texts = {0: en, 1: en, 2: es, 3: "x1 x2 x3 x4 x5"}  # 1 dups 0; 3 fails
    for i in range(4, 10):
        texts[i] = ("the a and of to " * 3).strip() + (
            f" u{i} v{i} w{i} z{i} q{i}"
        )
    docs = spark.createDataFrame(
        [(i, "xx", t) for i, t in texts.items()],
        "doc_id long, lang string, text string",
    )

    prof = {
        "en": {"the", "a", "and", "of", "to"},
        "es": {"el", "la", "de", "que", "y"},
        "de": {"der", "die", "das", "und", "ist"},
        "fr": {"le", "la", "de", "et", "les"},
    }

    def replay():
        winners = {}
        for i in sorted(texts):
            winners.setdefault(texts[i], i)
        out = {}
        for i, t in texts.items():
            if winners[t] != i:
                continue
            toks = [x for x in t.split(" ") if x]
            n = len(toks)
            avg = sum(len(x) for x in toks) / n
            if not (n >= 20 and avg <= 12.0 and len(set(toks)) / n >= 0.1):
                continue
            scores = {c: sum(1 for x in toks if x in prof[c]) for c in prof}
            pred, best = "en", scores["en"]
            for c in ("es", "de", "fr"):
                if scores[c] > best:
                    pred, best = c, scores[c]
            b = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 10
            split = {8: "val", 9: "test"}.get(b, "train")
            bpe = sum(math.ceil(len(x) / 4) for x in toks)
            d = out.setdefault((split, pred), [0, 0, 0])
            d[0] += 1
            d[1] += n
            d[2] += bpe
        return {k: tuple(v) for k, v in out.items()}

    expected = replay()
    assert len(expected) >= 2        # the corpus must exercise >1 group

    winners = docs.groupBy(FF.md5("text").alias("dg")).agg(
        FF.min("doc_id").alias("doc_id")
    )
    kept = docs.join(winners.select("doc_id"), "doc_id", "left_semi")
    scored = textstats.quality_langid(kept).filter(FF.col("keep") == 1)
    out = scored.withColumn("split", dd.split_col(FF.col("doc_id")))
    rows = out.groupBy("split", "pred_lang").agg(
        FF.count(FF.lit(1)).alias("n_docs"),
        FF.sum("n_tokens").alias("total_tokens"),
        FF.sum("bpe_tokens_est").alias("total_bpe_tokens"),
    ).collect()
    got = {
        (r["split"], r["pred_lang"]): (
            r["n_docs"], r["total_tokens"], r["total_bpe_tokens"]
        )
        for r in rows
    }
    assert got == expected


def test_bpe_pair_counts_hand_computed(spark):
    """Planted case: pair counts are occurrence-weighted ('ab' twice as a
    word and once inside 'abc' -> 3), single-char words emit nothing,
    ties and ordering are (cnt DESC, pair ASC), rank is 1-based."""
    from rgr_pdal_topo_spark.operators import textstats

    docs = spark.createDataFrame(
        [(0, "ab ab abc"), (1, "bc a")], "doc_id long, text string"
    )
    got = [
        (r["rank"], r["pair"], r["cnt"])
        for r in textstats.bpe_pair_counts(docs).orderBy("rank").collect()
    ]
    assert got == [(1, "ab", 3), (2, "bc", 2)]


def test_ccnet_buckets_matches_ntile_replay(spark):
    """Pure-Python replay of the two-level rank: per-language NTILE(3)
    over (integer per-token nll, doc_id) recomputed from bigram_ppl's
    own output must reproduce ccnet_buckets' aggregation exactly —
    pinning the offset+within-rank assembly AND the (rank-1)*3 div n + 1
    tile formula against the textbook definition."""
    from rgr_pdal_topo_spark.operators import textstats

    # two languages, uneven doc counts (7 and 5) so ceil-first tile
    # sizes differ (3/2/2 and 2/2/1); per-doc nll varies via gibberish
    rows = []
    did = 0
    for lang, n_docs in (("en", 7), ("es", 5)):
        clean = " ".join(f"{lang}w{j % 6}" for j in range(24))
        for i in range(n_docs):
            junk = " ".join(f"{lang}junk{did}x{j}" for j in range(i))
            rows.append((did, (clean + " " + junk).strip(), lang))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    ppl = {
        r["doc_id"]: (r["n_bigrams"], r["nll_q"])
        for r in textstats.bigram_ppl(docs).collect()
    }
    lang_of = {r[0]: r[2] for r in rows}
    expect: dict[tuple, list] = {}
    for lang in ("en", "es"):
        scored = sorted(
            (nll * 1024 // nb, d)
            for d, (nb, nll) in ppl.items()
            if lang_of[d] == lang
        )
        n = len(scored)
        for r0, (_, d) in enumerate(scored):
            bucket = r0 * 3 // n + 1  # == NTILE(3) ceil-first sizes
            nb, nll = ppl[d]
            agg = expect.setdefault((lang, bucket), [0, 0, 0, None, None])
            agg[0] += 1
            agg[1] += nb
            agg[2] += nll
            agg[3] = nll if agg[3] is None else min(agg[3], nll)
            agg[4] = nll if agg[4] is None else max(agg[4], nll)

    got = {
        (r["lang"], r["bucket"]): [
            r["n_docs"], r["total_bigrams"], r["total_nll_q"],
            r["min_nll_q"], r["max_nll_q"],
        ]
        for r in textstats.ccnet_buckets(docs).collect()
    }
    assert got == expect
    assert {b for (_, b) in got} == {1, 2, 3}


def test_zipf_slope_python_replay(spark):
    """Pure-Python replay of the exact OLS contract: q13-pinned ln of
    rank/count, integer accumulator sums, one final ratio — on a
    planted corpus with known token frequencies (10/5/2/1 -> a clean
    descending Zipf profile) plus a single-type language that must be
    excluded (zero variance)."""
    import math

    from rgr_pdal_topo_spark.queries import QUERIES

    text_a = " ".join(["w0"] * 10 + ["w1"] * 5 + ["w2"] * 2 + ["w3"])
    rows = [(0, text_a, "aa"), (1, "only only only", "bb")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    import tempfile, os
    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    got = {r["lang"]: r for r in QUERIES["zipf_slope"](spark, d).collect()}
    assert set(got) == {"aa"}  # single-type 'bb' excluded

    q = lambda v: math.floor(math.log(float(v)) * 8192 + 0.5)
    pts = [(q(rank), q(cnt)) for rank, cnt in ((1, 10), (2, 5), (3, 2), (4, 1))]
    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
    r = got["aa"]
    assert (r["n_types"], r["sx"], r["sy"], r["sxy"], r["sxx"]) == (
        n, sx, sy, sxy, sxx
    )
    assert r["slope"] == round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    assert r["slope"] < -0.9  # a real descending profile, near Zipf's -1


def test_pmi_collocations_python_replay(spark):
    """Pure replay of the PMI contract on a planted corpus where one
    pair ('new york') always co-occurs and one frequent pair ('the a')
    is independent: the collocation must out-rank the frequent pair,
    and every pmi_q13 must equal the replayed divide-first spelling."""
    import math
    import os
    import tempfile

    from rgr_pdal_topo_spark.queries import QUERIES

    base = "the a " * 10                      # frequent independent pair
    rows = [(i, (base + "new york " * 3).strip()) for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    got = [
        (r["rank"], r["w1"], r["w2"], r["c12"], r["pmi_q13"])
        for r in QUERIES["pmi_collocations"](spark, d).orderBy("rank").collect()
    ]

    toks = [t for _, txt in rows for t in txt.split(" ")]
    from collections import Counter
    uni = Counter(toks)
    bgs = Counter()
    for _, txt in rows:
        ts = txt.split(" ")
        for i in range(len(ts) - 1):
            bgs[(ts[i], ts[i + 1])] += 1
    ntok, nbg = len(toks), sum(bgs.values())
    exp = {}
    for (w1, w2), c12 in bgs.items():
        if c12 >= 3:
            arg = c12 / nbg * (ntok / uni[w1]) * (ntok / uni[w2])
            exp[(w1, w2)] = (c12, math.floor(math.log(arg) * 8192 + 0.5))
    for rank, w1, w2, c12, q in got:
        assert exp[(w1, w2)] == (c12, q)
    ranks = {(w1, w2): rank for rank, w1, w2, _, _ in got}
    assert ranks[("new", "york")] < ranks[("the", "a")]


def test_token_entropy_python_replay(spark):
    """Pure-Python replay of the exact entropy contract on a planted
    two-language corpus: a uniform 4-token language (H = ln 4) and a
    maximally skewed one (low H), accumulators bit-equal."""
    import math
    import os
    import tempfile

    from rgr_pdal_topo_spark.queries import QUERIES

    rows = [
        (0, "a b c d", "uu"),                    # uniform: H = ln(4)
        (1, " ".join(["x"] * 9 + ["y"]), "sk"),  # skewed 9/1
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )

    got = {r["lang"]: r for r in QUERIES["token_entropy"](spark, d).collect()}
    q = lambda v: math.floor(math.log(float(v)) * 8192 + 0.5)

    for lang, counts in (("uu", [1, 1, 1, 1]), ("sk", [9, 1])):
        n = sum(counts)
        s_clnc = sum(c * q(c) for c in counts)
        r = got[lang]
        assert (r["n_tokens"], r["n_types"], r["s_clnc"], r["ln_n_q"]) == (
            n, len(counts), s_clnc, q(n)
        )
        assert r["entropy_nats"] == round(
            (q(n) * n - s_clnc) / (8192.0 * n), 6
        )
    # semantics: uniform beats skewed, and uniform ~ ln(4)
    assert abs(got["uu"]["entropy_nats"] - math.log(4)) < 1e-3
    assert got["sk"]["entropy_nats"] < got["uu"]["entropy_nats"]


def test_link_geo_bands_partitions_edges(spark):
    """The band histogram partitions the host-graph edge set exactly:
    SUM(n_links) == |distinct edges|, bands are within 0..3, and
    min <= max within every band with band edges respected."""
    from rgr_pdal_topo_spark.operators import linkgraph, pages
    from rgr_pdal_topo_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    n_edges = (
        linkgraph.extract_links(pages.linked_pages_df(spark, sf)).count()
    )
    rows = QUERIES["link_geo_bands"](spark, sf).collect()
    assert sum(r.n_links for r in rows) == n_edges
    lo = {0: 0.0, 1: 100.0, 2: 1000.0, 3: 5000.0}
    hi = {0: 100.0, 1: 1000.0, 2: 5000.0, 3: float("inf")}
    for r in rows:
        assert 0 <= r.band <= 3
        assert lo[r.band] <= r.min_km <= r.max_km < hi[r.band]


def _write_events(spark, rows, d=None):
    import os
    import tempfile

    d = d or tempfile.mkdtemp()
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


def test_funnel_steps_planted(spark):
    """Hand-built funnel semantics: order enforced (a view BEFORE the
    signup never counts), the 48 h window measured from the PREVIOUS
    stage's event, the (ts, event_id) tie rule, and users without the
    entry stage absent entirely."""
    from datetime import datetime, timedelta

    from rgr_pdal_topo_spark.queries import QUERIES

    t0 = datetime(2024, 3, 1, 12, 0, 0)
    h = lambda n: t0 + timedelta(hours=n)
    rows, eid = [], 0

    def ev(user, typ, ts):
        nonlocal eid
        rows.append((eid, ts, user, typ, 0.0, "{}"))
        eid += 1

    # user 1: clean full conversion
    ev(1, "signup", h(0)); ev(1, "view", h(1)); ev(1, "click", h(2))
    ev(1, "purchase", h(3))
    # user 2: view only BEFORE signup -> stops at stage 1
    ev(2, "view", h(-1)); ev(2, "signup", h(0)); ev(2, "click", h(1))
    # user 3: view outside the 48 h window -> stops at stage 1
    ev(3, "signup", h(0)); ev(3, "view", h(49))
    # user 4: click at the SAME ts as its view with larger event_id
    ev(4, "signup", h(0)); ev(4, "view", h(1)); ev(4, "click", h(1))
    ev(4, "purchase", h(2))
    # user 5: never signs up -> absent from every stage
    ev(5, "view", h(0)); ev(5, "click", h(1)); ev(5, "purchase", h(2))
    # user 6: each step within 48 h of the PREVIOUS step, 80 h total
    ev(6, "signup", h(0)); ev(6, "view", h(40)); ev(6, "click", h(80))

    d = _write_events(spark, rows)
    got = {
        r.stage: (r.stage_name, r.n_users)
        for r in QUERIES["funnel_steps"](spark, d).collect()
    }
    assert got == {
        1: ("signup", 5),
        2: ("view", 3),     # users 1, 4, 6
        3: ("click", 3),    # users 1, 4 (tie rule), 6 (per-step window)
        4: ("purchase", 2),  # users 1, 4
    }


def test_retention_cohorts_planted(spark):
    """Hand-built retention triangle: per-user cohort = first active
    epoch-day, one row per (cohort, offset) with exact user counts;
    multiple events on one day collapse."""
    from datetime import datetime

    from rgr_pdal_topo_spark.queries import QUERIES

    def day(n, hour=6):
        return datetime(2024, 3, 1 + n, hour, 0, 0)

    rows = [
        # user 1: days 0, 1, 3 (two events on day 0 collapse)
        (0, day(0), 1, "view", 0.0, "{}"),
        (1, day(0, 20), 1, "click", 0.0, "{}"),
        (2, day(1), 1, "view", 0.0, "{}"),
        (3, day(3), 1, "view", 0.0, "{}"),
        # user 2: cohort day 1, active days 1 and 2
        (4, day(1), 2, "view", 0.0, "{}"),
        (5, day(2), 2, "view", 0.0, "{}"),
    ]
    d = _write_events(spark, rows)
    d0 = int(datetime(2024, 3, 1).timestamp()) // 86400
    got = {
        (r.cohort_day, r.day_offset): r.n_users
        for r in QUERIES["retention_cohorts"](spark, d).collect()
    }
    assert got == {
        (d0, 0): 1, (d0, 1): 1, (d0, 3): 1,
        (d0 + 1, 0): 1, (d0 + 1, 1): 1,
    }


def test_curvature_classes_census_and_paraboloid(spark):
    """The census partitions the 100x100 universe exactly, classes stay
    in {-1, 0, 1, 9}; and on a pure paraboloid bowl every interior cell
    classifies laplacian-convex (+1) — the sign contract of the class
    bands."""
    import numpy as np
    import pandas as pd

    from rgr_pdal_topo_spark.grid import GridSpec
    from rgr_pdal_topo_spark.operators.stencils import run_stencils
    from rgr_pdal_topo_spark.queries import QUERIES, _curv_class_sql
    from pyspark.sql import functions as F

    rows = QUERIES["curvature_classes"](spark, "/root/testdata/sf0.001").collect()
    assert sum(r.n_cells for r in rows) == 10000
    assert {r.lap_class for r in rows} <= {-1, 0, 1, 9}
    assert {r.plan_class for r in rows} <= {-1, 0, 1, 9}

    g = GridSpec(x0=0.0, y0=0.0, cell=10.0, nrows=12, ncols=12)
    rr, cc = np.meshgrid(np.arange(12), np.arange(12), indexing="ij")
    z = ((rr - 5.5) ** 2 + (cc - 5.5) ** 2).astype("float64")
    df = spark.createDataFrame(
        pd.DataFrame({"cell_row": rr.ravel(), "cell_col": cc.ravel(),
                      "value": z.ravel()})
    )
    out = run_stencils(df, g, {"lap": ("laplacian", {})}, tile_cells=6)
    cls = out.select(
        "cell_row", "cell_col",
        F.expr(_curv_class_sql("round(lap, 6)")).alias("c"),
    ).collect()
    interior = [r.c for r in cls
                if 1 <= r.cell_row <= 10 and 1 <= r.cell_col <= 10]
    assert interior and set(interior) == {1}


def test_tile_pyramid_partitions_pages_per_zoom(spark):
    """Each zoom level bins EVERY geocoded page exactly once:
    SUM(n_pages) per zoom == page count, and cell counts grow
    monotonically with zoom (finer tiles split, never merge)."""
    from rgr_pdal_topo_spark.operators import pages
    from rgr_pdal_topo_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    n = pages.geo_lonlat(spark, sf).count()
    rows = QUERIES["tile_pyramid"](spark, sf).collect()
    per_zoom = {}
    cells = {}
    for r in rows:
        per_zoom[r.zoom] = per_zoom.get(r.zoom, 0) + r.n_pages
        cells[r.zoom] = cells.get(r.zoom, 0) + 1
    assert per_zoom == {5: n, 8: n, 12: n}
    assert cells[5] <= cells[8] <= cells[12]


def test_event_transitions_planted(spark):
    """Known per-user sequences: transitions count consecutive pairs in
    (ts, event_id) order, same-ts ties break by event_id, first events
    are excluded, users never mix."""
    from datetime import datetime, timedelta

    from rgr_pdal_topo_spark.queries import QUERIES

    t0 = datetime(2024, 4, 1)
    rows = [
        # user 1: view -> click -> view  (same ts on the last two:
        # event_id orders click(2) before view(3))
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + timedelta(minutes=1), 1, "click", 0.0, "{}"),
        (3, t0 + timedelta(minutes=1), 1, "view", 0.0, "{}"),
        # user 2: a single event -> contributes nothing
        (4, t0, 2, "purchase", 0.0, "{}"),
        # user 3: view -> view
        (5, t0, 3, "view", 0.0, "{}"),
        (6, t0 + timedelta(minutes=2), 3, "view", 0.0, "{}"),
    ]
    d = _write_events(spark, rows)
    got = {
        (r.prev_type, r.next_type): r.n
        for r in QUERIES["event_transitions"](spark, d).collect()
    }
    assert got == {
        ("view", "click"): 1,
        ("click", "view"): 1,
        ("view", "view"): 1,
    }


def test_corpus_rollup_levels_consistent(spark):
    """The three ROLLUP levels are mutually consistent: per-(lang,
    shard) rows sum to their lang subtotal, lang subtotals sum to the
    grand total, and grouping flags identify levels exactly."""
    from rgr_pdal_topo_spark.queries import QUERIES

    rows = QUERIES["corpus_rollup"](spark, "/root/testdata/sf0.001").collect()
    leaf = [r for r in rows if (r.g_lang, r.g_shard) == (0, 0)]
    sub = {r.lang: r for r in rows if (r.g_lang, r.g_shard) == (0, 1)}
    tot = [r for r in rows if (r.g_lang, r.g_shard) == (1, 1)]
    assert len(tot) == 1 and tot[0].lang == "ALL" and tot[0].shard == -1
    for lang, s in sub.items():
        mine = [r for r in leaf if r.lang == lang]
        assert s.n_docs == sum(r.n_docs for r in mine)
        assert s.n_tokens == sum(r.n_tokens for r in mine)
        assert s.n_chars == sum(r.n_chars for r in mine)
    assert tot[0].n_docs == sum(s.n_docs for s in sub.values()) == 500


def test_langid_confusion_planted_matrix(spark):
    """Exact matrix on a hand corpus: even-id de/es/fr docs carry the
    planted marker and classify correctly; odd ids and zh default to
    'en'; en rows are diagonal."""
    import os
    import tempfile

    from rgr_pdal_topo_spark.queries import QUERIES

    rows = [
        (0, "the a and of to", "de"),   # even -> marker -> de
        (1, "the a and of to", "de"),   # odd  -> en default
        (2, "plain words here", "es"),  # even -> es
        (3, "plain words here", "zh"),  # zh never planted -> en
        (4, "the a and", "en"),         # en -> en (diagonal)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {
        (r.lang, r.pred_lang): (r.is_correct, r.n_docs)
        for r in QUERIES["langid_confusion"](spark, d).collect()
    }
    assert got == {
        ("de", "de"): (1, 1),
        ("de", "en"): (0, 1),
        ("es", "es"): (1, 1),
        ("zh", "en"): (0, 1),
        ("en", "en"): (1, 1),
    }


def test_hotspot_cells_exceed_recomputed_expectation(spark):
    """Every returned hotspot really exceeds 2x the uniform expectation
    for its clipped window, recomputed independently in numpy from the
    same planted-augmented binned counts; and the planted cluster cell
    (50, 50) is always found."""
    import numpy as np

    from rgr_pdal_topo_spark.queries import QUERIES
    from rgr_pdal_topo_spark.synth import points_df
    from rgr_pdal_topo_spark.grid import DEFAULT_GRID as G
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    pts = points_df(spark, sf).select(
        F.expr(G.sql_row_of("y")).alias("r"),
        F.expr(G.sql_col_of("x")).alias("c"),
        "pid",
    ).collect()
    grid = np.zeros((100, 100), dtype=np.int64)
    for row in pts:
        grid[row.r, row.c] += 1
        if row.pid % 97 == 0:
            grid[50, 50] += 1
    total = grid.sum()
    got = {
        (r.cell_row, r.cell_col): (r.s9, r.m)
        for r in QUERIES["hotspot_cells"](spark, sf).collect()
    }
    assert (50, 50) in got
    for (r, c), (s9, m) in got.items():
        r0, r1 = max(0, r - 1), min(99, r + 1)
        c0, c1 = max(0, c - 1), min(99, c + 1)
        s = int(grid[r0:r1 + 1, c0:c1 + 1].sum())
        mm = (r1 - r0 + 1) * (c1 - c0 + 1)
        assert (s9, m) == (s, mm), (r, c)
        assert s * 10000 > 2 * total * mm, (r, c)


def test_crawl_segment_diff_inclusion_exclusion(spark):
    """Set-operator invariants: each segment partitions into common +
    only, both sides positive (revisions guarantee asymmetry: even
    fetch indices include f=0 for every url, odd only for
    multi-capture urls)."""
    from rgr_pdal_topo_spark.queries import QUERIES

    r = QUERIES["crawl_segment_diff"](spark, "/root/testdata/sf0.001").collect()[0]
    assert r.n_a == r.n_common + r.n_only_a
    assert r.n_b == r.n_common + r.n_only_b
    assert r.n_a > r.n_b > 0 and r.n_common > 0


def test_error_bursts_planted(spark):
    """Hand-built hours: exactly the hours above 2x the uniform error
    expectation are flagged, with exact counts."""
    from datetime import datetime, timedelta

    from rgr_pdal_topo_spark.queries import QUERIES

    t0 = datetime(2024, 5, 1)
    rows, eid = [], 0

    def ev(hour_i, typ, k):
        nonlocal eid
        for j in range(k):
            rows.append(
                (eid, t0 + timedelta(hours=hour_i, minutes=j), 1, typ,
                 0.0, "{}")
            )
            eid += 1

    # 4 observed hours; errors: 8, 1, 1, 0 (total 10).  Burst test:
    # n_err * 4 > 2 * 10  <=>  n_err > 5  -> only hour 0.
    ev(0, "error", 8); ev(0, "view", 2)
    ev(1, "error", 1); ev(1, "view", 3)
    ev(2, "error", 1)
    ev(3, "view", 5)
    d = _write_events(spark, rows)
    got = {
        r.hour: (r.n_err, r.n_events)
        for r in QUERIES["error_bursts"](spark, d).collect()
    }
    h0 = int(t0.timestamp()) // 3600
    assert got == {h0: (8, 10)}


def test_props_histogram_planted(spark):
    """Hand events: JSON k extraction, decade bucketing, and the
    missing-key NULL bucket, with exact sums and extrema."""
    from datetime import datetime

    from rgr_pdal_topo_spark.queries import QUERIES

    t0 = datetime(2024, 6, 1)
    rows = [
        (0, t0, 1, "view", 0.0, '{"k": 5}'),
        (1, t0, 1, "view", 0.0, '{"k": 9}'),
        (2, t0, 1, "view", 0.0, '{"k": 17}'),
        (3, t0, 1, "click", 0.0, '{"other": 1}'),  # no k -> NULL bucket
    ]
    d = _write_events(spark, rows)
    got = {
        (r.event_type, r.k_bucket): (r.n, r.sum_k, r.min_k, r.max_k)
        for r in QUERIES["props_histogram"](spark, d).collect()
    }
    assert got == {
        ("view", 0): (2, 14, 5, 9),
        ("view", 1): (1, 17, 17, 17),
        ("click", None): (1, None, None, None),
    }


def test_morans_i_checkerboard_vs_plane(spark):
    """Sign semantics of the Moran chain (same spelling the query
    uses): a checkerboard is strongly negative, a smooth gradient
    strongly positive."""
    import numpy as np
    import pandas as pd

    from rgr_pdal_topo_spark.queries import _MORAN_I_SQL
    from pyspark.sql import functions as F

    def moran(z: "np.ndarray") -> float:
        rr, cc = np.meshgrid(range(z.shape[0]), range(z.shape[1]),
                             indexing="ij")
        zt = spark.createDataFrame(pd.DataFrame({
            "cell_row": rr.ravel(), "cell_col": cc.ravel(),
            "z": z.ravel().astype("int64")}))
        right = zt.select(F.col("cell_row").alias("r2"),
                          (F.col("cell_col") - 1).alias("c2"),
                          F.col("z").alias("zj"))
        down = zt.select((F.col("cell_row") - 1).alias("r2"),
                         F.col("cell_col").alias("c2"),
                         F.col("z").alias("zj"))
        cond = lambda s: (F.col("cell_row") == F.col("r2")) & (
            F.col("cell_col") == F.col("c2"))
        pr = zt.join(right, cond(right)).select(
            F.col("z").alias("zi"), "zj"
        ).unionAll(zt.join(down, cond(down)).select(
            F.col("z").alias("zi"), "zj"))
        s1 = zt.agg(F.count(F.lit(1)).alias("n"),
                    F.sum("z").alias("sz"),
                    F.sum(F.col("z") * F.col("z")).alias("szz"))
        s2 = pr.agg(F.count(F.lit(1)).alias("e_cnt"),
                    F.sum(F.col("zi") * F.col("zj")).alias("sprod"),
                    F.sum(F.col("zi") + F.col("zj")).alias("sdeg"))
        return s1.crossJoin(s2).select(
            F.expr(_MORAN_I_SQL).alias("i")).collect()[0].i

    checker = np.indices((8, 8)).sum(axis=0) % 2 * 100
    plane = np.arange(64).reshape(8, 8) * 10
    assert moran(checker) < -0.9
    assert moran(plane) > 0.8


def test_cusum_prefix_identity_matches_direct_recurrence(spark, tmp_path):
    """The windowed spelling S_t = P_t - min(0, min_{j<=t} P_j) must
    equal the direct non-associative recurrence S_t = max(0, S_{t-1} +
    x_t - k) on a crafted series that exercises a rise, a RESET to
    zero, and a second rise — the identity is the whole point of the
    query, so it is pinned against the imperative loop."""
    import datetime as dt

    # hourly error counts: k will be ceil(16/8) = 2
    xs = [1, 5, 0, 0, 0, 4, 6, 0]  # total 16 over 8 hours
    rows = []
    eid = 0
    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    for h, x in enumerate(xs):
        # one non-error event pins every hour into the spine bounds
        rows.append((eid, t0 + dt.timedelta(hours=h), 1, "view", 0.0, "{}"))
        eid += 1
        for _ in range(x):
            rows.append(
                (eid, t0 + dt.timedelta(hours=h, minutes=5), 1, "error",
                 0.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    from rgr_pdal_topo_spark.queries import QUERIES

    got = {
        r["hr"].hour: (r["x"], r["s"])
        for r in QUERIES["cusum_alarms"](spark, str(tmp_path)).collect()
    }
    # direct recurrence with k = 2
    k, s, exp = 2, 0, {}
    for h, x in enumerate(xs):
        s = max(0, s + x - k)
        if s > 0:
            exp[h] = (x, s)
    assert got == exp
    # the crafted series really resets (hour 4 has S == 0 again) and
    # re-rises — otherwise this pins nothing
    assert 1 in exp and 4 not in exp and 6 in exp


def test_geary_c_checkerboard_vs_plane(spark):
    """Sign semantics of the Geary chain (same spelling the query
    uses): a checkerboard reads near 2 (maximal local contrast), a
    smooth gradient near 0 — the complement of Moran's orientation."""
    import numpy as np
    import pandas as pd

    from rgr_pdal_topo_spark.queries import _GEARY_C_SQL
    from pyspark.sql import functions as F

    def geary(z: "np.ndarray") -> float:
        rr, cc = np.meshgrid(range(z.shape[0]), range(z.shape[1]),
                             indexing="ij")
        zt = spark.createDataFrame(pd.DataFrame({
            "cell_row": rr.ravel(), "cell_col": cc.ravel(),
            "z": z.ravel().astype("int64")}))
        right = zt.select(F.col("cell_row").alias("r2"),
                          (F.col("cell_col") - 1).alias("c2"),
                          F.col("z").alias("zj"))
        down = zt.select((F.col("cell_row") - 1).alias("r2"),
                         F.col("cell_col").alias("c2"),
                         F.col("z").alias("zj"))
        cond = lambda s: (F.col("cell_row") == F.col("r2")) & (
            F.col("cell_col") == F.col("c2"))
        pr = zt.join(right, cond(right)).select(
            F.col("z").alias("zi"), "zj"
        ).unionAll(zt.join(down, cond(down)).select(
            F.col("z").alias("zi"), "zj"))
        s1 = zt.agg(F.count(F.lit(1)).alias("n"),
                    F.sum("z").alias("sz"),
                    F.sum(F.col("z") * F.col("z")).alias("szz"))
        s2 = pr.agg(
            F.count(F.lit(1)).alias("e_cnt"),
            F.sum((F.col("zi") - F.col("zj"))
                  * (F.col("zi") - F.col("zj"))).alias("sdiff2"))
        return s1.crossJoin(s2).select(
            F.expr(_GEARY_C_SQL).alias("c")).collect()[0].c

    checker = np.indices((8, 8)).sum(axis=0) % 2 * 100
    plane = np.arange(64).reshape(8, 8) * 10
    assert geary(checker) > 1.8
    assert geary(plane) < 0.2


def test_shingle_novelty_first_occurrence_credit(spark, tmp_path):
    """Hand corpus across two 10-doc batches: within-batch repeats are
    NOT novel twice (first-occurrence credit), cross-batch repeats are
    not novel at all, and n_occ counts per-doc-distinct shingles."""
    rows = [
        (0, "a b c d"),      # shingles: "a b c", "b c d"  (both new)
        (1, "a b c x"),      # "a b c" (dup of doc 0), "b c x" (new)
        (10, "a b c d e"),   # "a b c", "b c d" old; "c d e" new
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(tmp_path / "documents.parquet"))

    from rgr_pdal_topo_spark.queries import QUERIES

    got = {
        r.batch: (r.n_occ, r.n_new, r.cum_vocab, r.novelty_rate)
        for r in QUERIES["shingle_novelty"](spark, str(tmp_path)).collect()
    }
    assert got == {
        0: (4, 3, 3, 0.75),
        1: (3, 1, 4, round(1 / 3, 6)),
    }


def test_pareto_skyline_planted(spark, tmp_path):
    """Hand corpus with every skyline edge case: strict dominance on
    one axis, dominance with one tie, and a full two-coordinate tie
    (BOTH docs survive — neither dominates the other)."""
    rows = [
        (0, "a"),          # len 1, div 1 — survives (nothing shorter)
        (1, "a b"),        # len 3, div 2 — survives
        (2, "a a a"),      # len 5, div 1 — dominated by doc 0 (shorter, same div)
        (3, "a b c"),      # len 5, div 3 — survives
        (4, "x y z"),      # len 5, div 3 — ties doc 3 on BOTH: survives too
        (5, "a b c d e"),  # len 9, div 5 — survives
        (6, "a b c d d"),  # len 9, div 4 — dominated by doc 5 (same len, more div)
        (7, "aa bb"),      # len 5, div 2 — dominated by doc 1 (shorter, same div)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(tmp_path / "documents.parquet"))

    from rgr_pdal_topo_spark.queries import QUERIES

    got = {
        r.doc_id: (r.n_chars, r.n_distinct_tokens)
        for r in QUERIES["pareto_skyline"](spark, str(tmp_path)).collect()
    }
    assert got == {0: (1, 1), 1: (3, 2), 3: (5, 3), 4: (5, 3), 5: (9, 5)}


def test_pareto_skyline_frontier_is_strictly_increasing(spark):
    """On the real sf0.001 corpus the surviving (length, diversity)
    pairs must be strictly increasing in BOTH coordinates across
    distinct lengths (the defining shape of a 2-D skyline), and every
    survivor must be undominated under a brute-force pandas check."""
    from rgr_pdal_topo_spark.operators import textstats as ts
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    sky = ts.pareto_skyline(docs).toPandas()
    front = (
        sky[["n_chars", "n_distinct_tokens"]]
        .drop_duplicates()
        .sort_values("n_chars")
    )
    assert front.n_chars.is_monotonic_increasing
    assert front.n_distinct_tokens.is_monotonic_increasing
    assert front.n_distinct_tokens.diff().dropna().gt(0).all()

    stats = ts.text_stats(docs).toPandas()[
        ["doc_id", "n_chars", "n_distinct_tokens"]
    ]
    for _, s in sky.iterrows():
        dom = stats[
            (stats.n_chars <= s.n_chars)
            & (stats.n_distinct_tokens >= s.n_distinct_tokens)
            & (
                (stats.n_chars < s.n_chars)
                | (stats.n_distinct_tokens > s.n_distinct_tokens)
            )
        ]
        assert dom.empty, f"doc {s.doc_id} is dominated by {dom.doc_id.tolist()}"


def test_robust_outliers_planted(spark, tmp_path):
    """Hand corpus per the textbook MAD mechanics: odd group (exact
    middle), even group (interpolated .5 median), and a planted giant
    that the 3-MAD fence catches while the mean/stddev z-score would
    be dragged by it."""
    rows = [
        # lang 'aa': lengths 3,5,7,9,1000 -> med 7, devs {4,2,0,2,993}
        # -> MAD 2, fence 6: only the 1000-length doc is out
        (0, "aaa", "aa"), (1, "aaaaa", "aa"), (2, "a" * 7, "aa"),
        (3, "a" * 9, "aa"), (4, "a" * 1000, "aa"),
        # lang 'bb': lengths 2,4,6,8 -> med 5.0, devs {3,1,1,3}
        # -> MAD 2.0, fence 6.0: nobody is out
        (5, "bb", "bb"), (6, "bbbb", "bb"), (7, "b" * 6, "bb"),
        (8, "b" * 8, "bb"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    from rgr_pdal_topo_spark.queries import QUERIES

    got = {
        r.lang: (r.n, r.med, r.mad, r.n_outliers)
        for r in QUERIES["robust_outliers"](spark, str(tmp_path)).collect()
    }
    assert got == {
        "aa": (5, 7.0, 2.0, 1),
        "bb": (4, 5.0, 2.0, 0),
    }


def test_small_qty_revenue_boundary_and_cents(spark):
    """Planted part with quantities [1, 2, 10, 17, 20] (avg 10): the
    20% gate is STRICT (10*qty*cnt < 2*sumq), so qty 2 == 0.2*avg is
    excluded and only qty 1 survives; its price 10.005 pins the
    half-up cent quantization (-> 1001 cents)."""
    import pandas as pd

    from rgr_pdal_topo_spark.queries import QUERIES, _Q17_BRAND

    li = pd.DataFrame(
        {
            "l_partkey": [7] * 5,
            "l_quantity": [1.0, 2.0, 10.0, 17.0, 20.0],
            "l_extendedprice": [10.005, 5.0, 5.0, 5.0, 5.0],
        }
    )
    pt = pd.DataFrame({"p_partkey": [7], "p_brand": [_Q17_BRAND]})
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        li.to_parquet(os.path.join(d, "lineitem.parquet"))
        pt.to_parquet(os.path.join(d, "part.parquet"))
        [r] = QUERIES["small_qty_revenue"](spark, d).collect()
    assert (r["n_small"], r["revenue_cents"]) == (1, 1001)
    assert r["avg_yearly"] == round(1001 / 700.0, 4)


def test_chi2_independence_exact_endpoints(spark):
    """The two analytic endpoints are EXACT: a perfectly uniform 2x2
    table gives chi2_q == 0 and V == 0; a perfectly diagonal one gives
    chi2 == N and V == 1.0 (every term integer, the q13 pin is a
    no-op)."""
    import os
    import tempfile

    import pandas as pd

    from rgr_pdal_topo_spark.queries import QUERIES

    def run(rows):
        df = pd.DataFrame(
            {
                "doc_id": range(len(rows)),
                "text": ["x"] * len(rows),
                "lang": [r[0] for r in rows],
                "source": [r[1] for r in rows],
                "n_chars": [1] * len(rows),
            }
        )
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "documents.parquet"))
            [r] = QUERIES["chi2_independence"](spark, d).collect()
        return r

    uni = run(
        [("en", "s0")] * 5 + [("en", "s1")] * 5
        + [("de", "s0")] * 5 + [("de", "s1")] * 5
    )
    assert (uni["chi2_q"], uni["chi2"], uni["cramers_v"]) == (0, 0.0, 0.0)
    assert uni["dof"] == 1
    diag = run([("en", "s0")] * 10 + [("de", "s1")] * 10)
    assert diag["chi2"] == 20.0 and diag["n"] == 20
    assert diag["cramers_v"] == 1.0


def test_late_suppliers_planted(spark):
    """Planted Q21 semantics: supplier 1 is the LONE late supplier of
    multi-supplier order 1 (counts), order 2 has TWO late suppliers
    (anti-join drops both), order 3 is single-supplier (semi-join
    drops it), supplier 3 lone-late in order 4 (counts).  Exactly-90
    days is NOT late (strict >): order 5 pins the boundary."""
    import os
    import tempfile

    import pandas as pd

    from rgr_pdal_topo_spark.queries import QUERIES

    t0 = pd.Timestamp("1995-01-01")
    day = pd.Timedelta(days=1)
    rows = [  # (orderkey, suppkey, ship_offset_days)
        (1, 1, 120), (1, 2, 10),
        (2, 1, 120), (2, 2, 120),
        (3, 1, 120),
        (4, 2, 10), (4, 3, 200),
        (5, 1, 90), (5, 2, 10),  # == 90 days: on time
    ]
    li = pd.DataFrame(
        {
            "l_orderkey": [r[0] for r in rows],
            "l_suppkey": [r[1] for r in rows],
            "l_shipdate": [t0 + r[2] * day for r in rows],
        }
    ).astype({"l_shipdate": "datetime64[us]"})  # Spark rejects NANOS
    orders = pd.DataFrame(
        {"o_orderkey": [1, 2, 3, 4, 5], "o_orderdate": [t0] * 5}
    ).astype({"o_orderdate": "datetime64[us]"})
    supp = pd.DataFrame(
        {"s_suppkey": [1, 2, 3], "s_name": ["S1", "S2", "S3"]}
    )
    with tempfile.TemporaryDirectory() as d:
        li.to_parquet(os.path.join(d, "lineitem.parquet"))
        orders.to_parquet(os.path.join(d, "orders.parquet"))
        supp.to_parquet(os.path.join(d, "supplier.parquet"))
        got = {
            r["s_name"]: r["numwait"]
            for r in QUERIES["late_suppliers"](spark, d).collect()
        }
    assert got == {"S1": 1, "S3": 1}


def test_score_auc_exact_endpoints(spark):
    """AUC analytic endpoints are EXACT: perfectly separating scores
    give 1.0 (gini 1.0), perfectly reversed give 0.0, and all-tied
    scores give exactly 0.5 (the half-credit tie term) — every u2 an
    integer, the q13 pin a no-op on integer-valued components."""
    import os
    import tempfile

    import pandas as pd

    from rgr_pdal_topo_spark.queries import QUERIES

    def run(scores, labels):
        df = pd.DataFrame(
            {
                "vec_id": range(len(scores)),
                "embedding": [[float(s), 0.0] for s in scores],
                "label": labels,
            }
        )
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "embeddings.parquet"))
            [r] = QUERIES["score_auc"](spark, d).collect()
        return r

    # positives (odd labels) all score 1.0, negatives all 0.0
    sep = run([1.0, 1.0, 0.0, 0.0], [1, 3, 0, 2])
    assert (sep["auc"], sep["gini"]) == (1.0, 1.0)
    assert (sep["n_pos"], sep["n_neg"], sep["u2"]) == (2, 2, 8)
    rev = run([0.0, 0.0, 1.0, 1.0], [1, 3, 0, 2])
    assert (rev["auc"], rev["gini"]) == (0.0, -1.0)
    tie = run([0.5, 0.5, 0.5, 0.5], [1, 3, 0, 2])
    assert (tie["auc"], tie["u2"]) == (0.5, 4)


def test_segment_psi_exact_endpoints(spark):
    """Identical segments give per-bin and total PSI EXACTLY 0 (the
    ca*nb - cb*na factor vanishes); the analytic 2-lang flip case
    gives psi_total == the q13-pinned spelling of 2 * 0.5 * ln 3
    (= 144000 / 131072 rounded) — every accumulator integer."""
    import os
    import tempfile

    import pandas as pd

    from rgr_pdal_topo_spark.queries import QUERIES

    def run(doc_ids, langs):
        df = pd.DataFrame(
            {
                "doc_id": doc_ids,
                "text": ["x"] * len(doc_ids),
                "lang": langs,
                "source": ["s"] * len(doc_ids),
                "n_chars": [1] * len(doc_ids),
            }
        )
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "documents.parquet"))
            return QUERIES["segment_psi"](spark, d).collect()

    same = run([0, 1, 2, 3], ["en", "en", "de", "de"])
    assert all(r["psi_term"] == 0.0 and r["psi_total"] == 0.0 for r in same)
    # even docs all 'en', odd docs all 'de': ca'=(3,1), cb'=(1,3)
    flip = {r["lang"]: r for r in run([0, 2, 1, 3], ["en", "en", "de", "de"])}
    assert flip["en"]["psi_term"] == round(8 * 9000 / (16 * 8192.0), 6)
    assert flip["en"]["psi_total"] == round(144000 / 131072.0, 6)
    assert flip["de"]["psi_term"] == flip["en"]["psi_term"]


def test_lang_budget_waterfilling_planted(spark):
    """Hand-computed waterfilling: token counts (2, 4, 100), budget
    53 -> the two small languages are capped at their full epoch
    (2, 4) and the head language gets the exact remainder 47.0; equal
    counts (4, 4), budget 4 -> nobody capped, uniform split 2.0."""
    import os
    import tempfile

    import pandas as pd

    from rgr_pdal_topo_spark.queries import QUERIES

    def run(counts):
        df = pd.DataFrame(
            {
                "doc_id": range(len(counts)),
                "text": [" ".join(["t"] * n) for n in counts.values()],
                "lang": list(counts),
                "source": ["s"] * len(counts),
                "n_chars": [1] * len(counts),
            }
        )
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "documents.parquet"))
            return {
                r["lang"]: r
                for r in QUERIES["lang_budget"](spark, d).collect()
            }

    got = run({"aa": 2, "bb": 4, "en": 100})
    assert (got["aa"]["capped"], got["aa"]["alloc"]) == (1, 2.0)
    assert (got["bb"]["capped"], got["bb"]["alloc"]) == (1, 4.0)
    assert (got["en"]["capped"], got["en"]["alloc"]) == (0, 47.0)
    eq = run({"aa": 4, "bb": 4})
    assert all(r["capped"] == 0 and r["alloc"] == 2.0 for r in eq.values())


def test_search_ndcg_equal_grades_exact_one(spark):
    """When every candidate has the same grade, DCG == IDCG for ANY
    ranking (equal gains, identical discounts), so nDCG is EXACTLY
    1.0 — the analytic endpoint that needs no BM25 hand-computation."""
    import os
    import tempfile

    import pandas as pd

    from rgr_pdal_topo_spark.queries import QUERIES

    df = pd.DataFrame(
        {
            "doc_id": range(4),
            # each doc matches exactly ONE term of qid 2 "big data merge"
            "text": ["big x", "big y y", "data z", "merge w w w"],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [5] * 4,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        rows = QUERIES["search_ndcg"](spark, d).collect()
    assert rows, "expected at least one query with candidates"
    for r in rows:
        assert r["ndcg"] == 1.0 and r["dcg_q"] == r["idcg_q"]


def test_search_ndcg_matches_numpy_recomputation(spark):
    """Independent recomputation: rebuild nDCG@10 in numpy from the
    (oracle-verified) bm25_scores candidates at sf0.001 with the same
    q13 pinning and tie-breaks; must match the query bit-for-bit."""
    import math

    from rgr_pdal_topo_spark.operators import retrieval
    from rgr_pdal_topo_spark.queries import QUERIES
    from rgr_pdal_topo_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    bs = retrieval.bm25_scores(load_table(spark, sf, "documents")).toPandas()
    got = {
        r["qid"]: r for r in QUERIES["search_ndcg"](spark, sf).collect()
    }

    def term(rel, rk):
        gain = 7 if rel >= 3 else (3 if rel == 2 else 1)
        return math.floor(gain / math.log2(rk + 1) * 8192 + 0.5)

    for qid, grp in bs.groupby("qid"):
        grp = grp.assign(rel=grp.n_hits.clip(upper=3))
        sys = grp.sort_values(
            ["score_q13", "doc_id"], ascending=[False, True]
        ).head(10)
        idl = grp.sort_values(
            ["rel", "doc_id"], ascending=[False, True]
        ).head(10)
        dcg = sum(
            term(r, i + 1) for i, r in enumerate(sys.rel.tolist())
        )
        idcg = sum(
            term(r, i + 1) for i, r in enumerate(idl.rel.tolist())
        )
        g = got[qid]
        assert (g["dcg_q"], g["idcg_q"], g["n_cand"]) == (
            dcg, idcg, len(grp)
        )
        assert g["ndcg"] == round(dcg / idcg, 6)


def test_vrm_plane_exactly_zero_and_numpy_parity(spark):
    """A planar DEM of ANY tilt has identical unit normals everywhere,
    so interior VRM is EXACTLY 0.0 with m == 9 (the property that
    separates VRM from windowed_std, which reads tilt as roughness);
    a +/- alternating surface gives vrm > 0.  Both pinned against an
    independent numpy recomputation of the full q13 chain."""
    import math

    from rgr_pdal_topo_spark.queries import _vrm_core

    def run(zfn, n=7):
        rows = [
            (r, c, int(zfn(r, c)))
            for r in range(n)
            for c in range(n)
        ]
        zt = spark.createDataFrame(
            rows, "cell_row int, cell_col int, z long"
        )
        return {
            (r["cell_row"], r["cell_col"]): r
            for r in _vrm_core(spark, zt).collect()
        }

    # flat plane: identical normals (0, 0, 8192) exactly -> vrm 0.0
    flat = run(lambda r, c: 12345)
    interior = [
        v for (r, c), v in flat.items() if 2 <= r <= 4 and 2 <= c <= 4
    ]
    assert len(interior) == 9
    assert all(v["m"] == 9 and v["vrm"] == 0.0 for v in interior)

    # tilted plane: normals identical up to the q13 pin -> |vrm| tiny
    plane = run(lambda r, c: 3000 * r + 700 * c)
    tilted = [
        v for (r, c), v in plane.items() if 2 <= r <= 4 and 2 <= c <= 4
    ]
    assert all(abs(v["vrm"]) < 3e-4 for v in tilted)

    # irregular surface (period-2 alternation is INVISIBLE to the
    # 2-cell central difference — gradients scatter only if the
    # field varies at longer wavelengths): strictly positive VRM
    rough = run(lambda r, c: ((r * r * 37 + c * c * 91) % 6007) * 31)
    center = rough[(3, 3)]
    assert center["vrm"] > 0.01

    # independent numpy recomputation of the chain at one cell
    def nq(dx2, dy2):
        mag = math.sqrt(float(dx2 * dx2 + dy2 * dy2 + 268435456))
        return (
            math.floor(-dx2 / mag * 8192 + 0.5),
            math.floor(-dy2 / mag * 8192 + 0.5),
            math.floor(16384.0 / mag * 8192 + 0.5),
        )

    # recompute the 3x3 sum at (3,3) from first principles
    zf = lambda r, c: ((r * r * 37 + c * c * 91) % 6007) * 31
    sx = sy = sz = m = 0
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            r, c = 3 + dr, 3 + dc
            dx2 = zf(r, c + 1) - zf(r, c - 1)
            dy2 = zf(r + 1, c) - zf(r - 1, c)
            x, y, zc = nq(dx2, dy2)
            sx += x; sy += y; sz += zc; m += 1
    exp_vrm = round(
        1.0 - math.sqrt(float(sx * sx + sy * sy + sz * sz)) / (m * 8192.0),
        6,
    )
    assert (center["sx"], center["sy"], center["sz"]) == (sx, sy, sz)
    assert center["vrm"] == exp_vrm


def test_langid_kappa_exact_endpoints(spark):
    """Perfect agreement gives kappa EXACTLY 1.0; a constant-prediction
    classifier gives kappa EXACTLY 0.0 even at 50% accuracy (the
    chance-correction that separates kappa from accuracy) — every
    accumulator an exact integer, the divisions land on exact values.
    Odd doc_ids avoid the langmark injection (doc_id % 2 = 0)."""
    import os
    import tempfile

    import pandas as pd

    from rgr_pdal_topo_spark.queries import QUERIES

    def run(texts, langs):
        df = pd.DataFrame(
            {
                "doc_id": [2 * i + 1 for i in range(len(texts))],
                "text": texts,
                "lang": langs,
                "source": ["s"] * len(texts),
                "n_chars": [9] * len(texts),
            }
        )
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "documents.parquet"))
            [r] = QUERIES["langid_kappa"](spark, d).collect()
        return r

    en = "the a and of to"
    de = "der die das und ist"
    perfect = run([en, en, de, de], ["en", "en", "de", "de"])
    assert (perfect["accuracy"], perfect["kappa"]) == (1.0, 1.0)
    constant = run([en, en, en, en], ["en", "en", "de", "de"])
    assert (constant["accuracy"], constant["kappa"]) == (0.5, 0.0)


def test_score_calibration_exact_endpoints(spark):
    """A perfectly calibrated bin (score 0.5, half positive) has
    ece_term EXACTLY 0; an anti-calibrated one (score 1.0, zero
    positives) contributes its full bin mass; negative scores clip
    into bin 0."""
    import os
    import tempfile

    import pandas as pd

    from rgr_pdal_topo_spark.queries import QUERIES

    def run(scores, labels):
        df = pd.DataFrame(
            {
                "vec_id": range(len(scores)),
                "embedding": [[float(s), 0.0] for s in scores],
                "label": labels,
            }
        )
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "embeddings.parquet"))
            return {
                r["bin"]: r
                for r in QUERIES["score_calibration"](spark, d).collect()
            }

    # bin 5: two docs at 0.5, one positive -> acc == conf == 0.5
    # bin 9: two docs at 1.0, zero positive -> gap = 2*8192
    # bin 0: one negative-score doc, clipped, not positive -> gap 0
    got = run([0.5, 0.5, 1.0, 1.0, -0.7], [1, 0, 0, 2, 0])
    assert got[5]["ece_term"] == 0.0
    assert (got[5]["acc"], got[5]["conf"]) == (0.5, 0.5)
    assert got[9]["ece_term"] == round(2 * 8192 / (5 * 8192.0), 6)
    assert got[0]["s_b"] == 0 and got[0]["ece_term"] == 0.0
    assert all(
        r["ece_total"] == round(2 * 8192 / (5 * 8192.0), 6)
        for r in got.values()
    )


def test_vocab_coverage_planted(spark):
    """Hand-computed curve: counts (a:5, b:3, c:1, d:1) -> top-10
    covers everything (vocab smaller than k, n_vocab_used clamps to 4,
    coverage exactly 1.0); a 12-type corpus pins the rank-10 cut:
    top-10 of twelve singleton-heavy types covers 20/22."""
    import os
    import tempfile

    import pandas as pd

    from rgr_pdal_topo_spark.queries import QUERIES

    def run(text_rows):
        df = pd.DataFrame(
            {
                "doc_id": range(len(text_rows)),
                "text": text_rows,
                "lang": ["en"] * len(text_rows),
                "source": ["s"] * len(text_rows),
                "n_chars": [1] * len(text_rows),
            }
        )
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "documents.parquet"))
            return {
                r["k"]: r
                for r in QUERIES["vocab_coverage"](spark, d).collect()
            }

    small = run(["a a a a a", "b b b c d"])
    assert small[10]["n_vocab_used"] == 4
    assert small[10]["coverage"] == 1.0
    assert small[10]["n_tokens_covered"] == 10

    # 12 types: 'x' * 6, 'y' * 5, ten singletons t0..t9
    big = run(["x x x x x x y y y y y", " ".join(f"t{i}" for i in range(10))])
    r10 = big[10]
    assert r10["n_vocab_used"] == 10 and r10["n_vocab"] == 12
    # top-10 = x(6) + y(5) + 8 singletons (t0..t7 by text order) = 19
    assert r10["n_tokens_covered"] == 19
    assert r10["coverage"] == round(19 / 21.0, 6)
    assert big[100]["coverage"] == 1.0


def test_theil_decomposition_planted(spark):
    """Equal lengths give near-zero indices (within the q13 ln-pin
    residue, NOT exact: lq(7)+lq(4)-lq(28) = 1, not 0); a segregated
    corpus puts the inequality in the between term; and acc_t / acc_b
    match an independent numpy recomputation of the pinned chain
    bit-for-bit (so the identity acc_w = acc_t - acc_b is exact by
    construction)."""
    import math
    import os
    import tempfile

    import pandas as pd

    from rgr_pdal_topo_spark.queries import QUERIES

    def run(sources, lens):
        df = pd.DataFrame(
            {
                "doc_id": range(len(lens)),
                "text": ["x"] * len(lens),
                "lang": ["en"] * len(lens),
                "source": sources,
                "n_chars": lens,
            }
        )
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "documents.parquet"))
            [r] = QUERIES["theil_decomposition"](spark, d).collect()
        return r

    def lq(x):
        return math.floor(math.log(x) * 8192 + 0.5)

    def expected(sources, lens):
        n, s = len(lens), sum(lens)
        acc_t = sum(x * (lq(x) + lq(n) - lq(s)) for x in lens)
        groups = {}
        for g, x in zip(sources, lens):
            sg, ng = groups.get(g, (0, 0))
            groups[g] = (sg + x, ng + 1)
        acc_b = sum(
            sg * (lq(sg) + lq(n) - lq(s) - lq(ng))
            for sg, ng in groups.values()
        )
        return acc_t, acc_b

    flat = run(["a", "a", "b", "b"], [7, 7, 7, 7])
    assert (flat["acc_t"], flat["acc_b"]) == expected(
        ["a", "a", "b", "b"], [7, 7, 7, 7]
    )
    assert abs(flat["theil_total"]) < 3e-4
    assert abs(flat["theil_within"]) < 3e-4

    seg = run(["a", "a", "b", "b"], [2, 2, 8, 8])
    assert (seg["acc_t"], seg["acc_b"]) == expected(
        ["a", "a", "b", "b"], [2, 2, 8, 8]
    )
    assert seg["theil_between"] > 0.1
    assert abs(seg["theil_within"]) < 3e-4
    assert seg["theil_within"] == round(
        (seg["acc_t"] - seg["acc_b"]) / (seg["s"] * 8192.0), 6
    )


def test_lang_source_mi_exact_endpoints(spark):
    """Independence (uniform 2x2): MI is zero in the reals; the lq
    pins cancel only up to rounding, so assert the near-zero bound.
    Diagonal table: n_ij == r_i == c_j makes the MI bracket equal the
    entropy bracket TERM-BY-TERM, so acc_mi == acc_hl == acc_hs as
    exact integers and NMI is exactly 1.0."""
    import os
    import tempfile

    import pandas as pd

    from rgr_pdal_topo_spark.queries import QUERIES

    def run(rows):
        df = pd.DataFrame(
            {
                "doc_id": range(len(rows)),
                "text": ["x"] * len(rows),
                "lang": [r[0] for r in rows],
                "source": [r[1] for r in rows],
                "n_chars": [1] * len(rows),
            }
        )
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "documents.parquet"))
            [r] = QUERIES["lang_source_mi"](spark, d).collect()
        return r

    uni = run(
        [("en", "s0")] * 5 + [("en", "s1")] * 5
        + [("de", "s0")] * 5 + [("de", "s1")] * 5
    )
    assert abs(uni["mi_nats"]) < 3e-4
    diag = run([("en", "s0")] * 10 + [("de", "s1")] * 10)
    # diagonal: n_ij == r_i == c_j, so the MI bracket equals the
    # entropy bracket TERM-BY-TERM -> exact integer equality
    assert diag["acc_mi"] == diag["acc_hl"] == diag["acc_hs"]
    assert diag["nmi"] == 1.0
    assert diag["mi_nats"] == diag["h_lang"]


def test_benford_digits_planted(spark):
    """A perfect-Benford-shaped planted set (counts proportional to
    the pinned expected brackets, total = lq(10)) gives tvd_total
    EXACTLY 0; an all-9s corpus concentrates mass on one digit and its
    TV distance is hand-computable from the pinned brackets."""
    import math
    import os
    import tempfile

    import pandas as pd

    from rgr_pdal_topo_spark.queries import QUERIES

    def lq(x):
        return math.floor(math.log(x) * 8192 + 0.5)

    def run(prices):
        df = pd.DataFrame(
            {
                "o_orderkey": range(len(prices)),
                "o_totalprice": prices,
            }
        )
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "orders.parquet"))
            return {
                r["digit"]: r
                for r in QUERIES["benford_digits"](spark, d).collect()
            }

    # counts exactly lq(d+1)-lq(d) per digit -> N = lq(10) and every
    # deviation term is |c_d*lq10 - lq10*c_d| = 0
    prices = []
    for d in range(1, 10):
        prices += [d * 1.0] * (lq(d + 1) - lq(d))
    got = run(prices)
    assert all(r["tvd_total"] == 0.0 for r in got.values())
    assert got[1]["n_d"] == lq(2) - lq(1)

    nines = run([9.0] * 4)
    # TVD = 0.5 * (sum_{d<9} exp_d + (1 - exp_9)) = 1 - exp_9
    exp9 = (lq(10) - lq(9)) / lq(10)
    assert nines[9]["tvd_total"] == round(1.0 - exp9, 6)


def test_tile_skew_planted(spark):
    """Uniform layout (equal count per tile) gives max_over_mean
    EXACTLY 1.0 and gini EXACTLY 0.0; the (1, 1, 98) concentration
    matches the hand-computed sorted-rank Gini."""
    from rgr_pdal_topo_spark.queries import _tile_skew_core

    def run(counts_per_tile):
        rows = []
        for i, cnt in enumerate(counts_per_tile):
            # tile (0, i): cells at row 0, cols i*25..i*25+cnt-1 fit
            # one tile only if cnt <= 25; replicate one cell instead
            rows += [(0, i * 25)] * cnt
        df = spark.createDataFrame(rows, "cell_row int, cell_col int")
        [r] = _tile_skew_core(df).collect()
        return r

    uni = run([5, 5, 5, 5])
    assert (uni["max_over_mean"], uni["gini"]) == (1.0, 0.0)
    assert (uni["n_tiles"], uni["n_points"], uni["max_tile"]) == (4, 20, 5)

    conc = run([1, 1, 98])
    # sorted counts (1, 1, 98), ranks (1, 2, 3):
    # gini = (2*(1+2+294) - 4*100) / (3*100) = 194/300
    assert conc["gini"] == round(194 / 300.0, 6)
    assert conc["top1_share"] == 0.98


def test_customer_orders_hist_zero_bucket(spark):
    """The zero-order customer survives the left join into the
    c_count = 0 bucket (inner-joining drops it — the Q13 lesson);
    counts are exact."""
    import os
    import tempfile

    import pandas as pd

    from rgr_pdal_topo_spark.queries import QUERIES

    cust = pd.DataFrame({"c_custkey": [1, 2, 3]})
    orders = pd.DataFrame(
        {"o_orderkey": [10, 11, 12], "o_custkey": [1, 1, 2]}
    )
    with tempfile.TemporaryDirectory() as d:
        cust.to_parquet(os.path.join(d, "customer.parquet"))
        orders.to_parquet(os.path.join(d, "orders.parquet"))
        got = {
            r["c_count"]: r["custdist"]
            for r in QUERIES["customer_orders_hist"](spark, d).collect()
        }
    assert got == {0: 1, 1: 1, 2: 1}


def test_openness_analytic_endpoints(spark):
    """Flat DEM: every tangent is exactly 0 -> horizon_tan EXACTLY
    0.0 and only cells with the full 64-sample horizon (8-cell inset)
    are emitted.  A single pit sees terrain ABOVE it in every
    direction (positive); the matching peak reads negative (sign
    antisymmetry of the tangent)."""
    from rgr_pdal_topo_spark.queries import _openness_core

    def run(zfn, n=20):
        rows = [
            (r, c, int(zfn(r, c)))
            for r in range(n)
            for c in range(n)
        ]
        zt = spark.createDataFrame(
            rows, "cell_row int, cell_col int, zq long"
        )
        return {
            (r["cell_row"], r["cell_col"]): r
            for r in _openness_core(spark, zt).collect()
        }

    flat = run(lambda r, c: 5 << 20)
    # 20x20 grid, 8-cell horizon -> interior 4x4 block survives
    assert len(flat) == 16
    assert all(v["horizon_tan"] == 0.0 for v in flat.values())

    pit = run(
        lambda r, c: (5 << 20) - ((10 << 20) if (r, c) == (9, 9) else 0)
    )
    assert pit[(9, 9)]["horizon_tan"] > 0.1
    peak = run(
        lambda r, c: (5 << 20) + ((10 << 20) if (r, c) == (9, 9) else 0)
    )
    assert peak[(9, 9)]["horizon_tan"] < -0.1


def test_ks_lengths_exact_endpoints(spark):
    """Identical segment distributions give D EXACTLY 0; fully
    separated supports give D EXACTLY 1.0; the half-shifted case
    matches the hand-computed supremum."""
    import os
    import tempfile

    import pandas as pd

    from rgr_pdal_topo_spark.queries import QUERIES

    def run(lens_even, lens_odd):
        ids = [2 * i for i in range(len(lens_even))] + [
            2 * i + 1 for i in range(len(lens_odd))
        ]
        lens = lens_even + lens_odd
        df = pd.DataFrame(
            {
                "doc_id": ids,
                "text": ["x"] * len(ids),
                "lang": ["en"] * len(ids),
                "source": ["s"] * len(ids),
                "n_chars": lens,
            }
        )
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "documents.parquet"))
            [r] = QUERIES["ks_lengths"](spark, d).collect()
        return r

    same = run([3, 5, 7], [3, 5, 7])
    assert (same["dnum"], same["ks_d"]) == (0, 0.0)
    sep = run([1, 2, 3], [10, 20, 30])
    assert sep["ks_d"] == 1.0
    # A = {1, 2}, B = {2, 3}: at x=1 |1*2-0| = 2, x=2 |2*2-1*2| = 2,
    # x=3 |4-4| = 0 -> D = 2/4 = 0.5
    half = run([1, 2], [2, 3])
    assert (half["dnum"], half["ks_d"]) == (2, 0.5)


def test_semivariogram_aniso_striped_fabric(spark):
    """A row-striped surface (z depends only on cell_row) has
    along-strike gamma EXACTLY 0 at every EW lag, while NS gamma is
    positive and hand-computable: alternating +/-q stripes give
    sdiff2 = n_pairs * (2q)^2 at odd NS lags and exactly 0 at even
    ones."""
    from rgr_pdal_topo_spark.queries import _aniso_core

    q = 8192
    n = 12
    rows = [
        (r, c, q if r % 2 == 0 else -q)
        for r in range(n)
        for c in range(n)
    ]
    zt = spark.createDataFrame(rows, "cell_row int, cell_col int, z long")
    got = {
        (r["dir"], r["h"]): r for r in _aniso_core(zt).collect()
    }
    for h in range(1, 5):
        assert got[("ew", h)]["sdiff2"] == 0
        assert got[("ew", h)]["gamma"] == 0.0
    # NS odd lags: every pair differs by 2q
    for h in (1, 3):
        r = got[("ns", h)]
        assert r["sdiff2"] == r["n_pairs"] * (2 * q) ** 2
        # gamma = sdiff2 / (2 * n_pairs * 8192^2) = 2.0 exactly
        assert r["gamma"] == 2.0
    for h in (2, 4):
        assert got[("ns", h)]["sdiff2"] == 0


def test_funnel_latency_planted(spark):
    """Two converting users with hand-built stage chains (10 s and
    20 s signup->purchase, one with straddling sub-second parts to
    pin the fractional-floor rule), one non-converter: n = 2,
    min 10, max 20, med2 = 30, mean 15.0."""
    import os
    import tempfile

    import pandas as pd

    from rgr_pdal_topo_spark.queries import QUERIES

    t0 = pd.Timestamp("2024-01-01 12:00:00")
    s = pd.Timedelta(seconds=1)
    rows = []

    def chain(uid, base, deltas):
        for i, (et, dt) in enumerate(
            zip(("signup", "view", "click", "purchase"), deltas)
        ):
            rows.append((len(rows), base + dt, uid, et, 1.0, "{}"))

    # user 1: purchase at +10.9s from signup at +0.2s -> floor 10
    chain(1, t0, [0.2 * s, 2 * s, 5 * s, 11.1 * s])
    # user 2: signup +0, purchase +20s exactly
    chain(2, t0, [0 * s, 6 * s, 12 * s, 20 * s])
    # user 3: no purchase
    chain(3, t0, [0 * s, 3 * s, 4 * s, 4 * s])
    rows = [r for r in rows if not (r[2] == 3 and r[3] == "purchase")]
    ev = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).astype({"ts": "datetime64[us]"})
    with tempfile.TemporaryDirectory() as d:
        ev.to_parquet(os.path.join(d, "events.parquet"))
        [r] = QUERIES["funnel_latency"](spark, d).collect()
    assert (r["n_converts"], r["min_s"], r["max_s"]) == (2, 10, 20)
    assert r["med2_s"] == 30
    assert r["mean_s"] == 15.0


def test_heaps_law_pure_power_exact(spark):
    """A corpus built so ctok(rn) = rn^2 and ctyp(rn) = rn + 1 (the
    rn named types plus the shared filler type) fits beta ~ 0.5; the
    accumulators are pinned bit-for-bit against an independent python
    recomputation."""
    import math
    import os
    import tempfile

    import pandas as pd

    from rgr_pdal_topo_spark.queries import QUERIES

    # doc k (0-based): tokens = 2k+1 total; exactly 1 new type, the
    # rest repeats of type 't0' -> ctok(k) = (k+1)^2? sum(2i+1) =
    # (k+1)^2 yes; ctyp(k) = k+1 -> V = sqrt(ctok): beta = 0.5
    texts = []
    for k in range(20):
        toks = [f"n{k}"] + ["t0"] * (2 * k)
        texts.append(" ".join(toks))
    df = pd.DataFrame(
        {
            "doc_id": range(20),
            "text": texts,
            "lang": ["en"] * 20,
            "source": ["s"] * 20,
            "n_chars": [1] * 20,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        [r] = QUERIES["heaps_law"](spark, d).collect()

    # independent recomputation with the same pin
    def lq(v):
        return math.floor(math.log(v) * 8192 + 0.5)

    pts = []
    stride = max(20 // 10, 1)
    for rn in range(1, 21):
        if rn % stride == 0 or rn == 20:
            # rn docs: types n0..n_{rn-1} plus t0 (first at doc 1)
            ctok, ctyp = rn * rn, rn + (1 if rn >= 2 else 0)
            pts.append((lq(ctok), lq(ctyp)))
    np_, sx = len(pts), sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    beta = round((np_ * sxy - sx * sy) / (np_ * sxx - sx * sx), 6)
    assert (r["np"], r["sx"], r["sy"], r["sxy"], r["sxx"]) == (
        np_, sx, sy, sxy, sxx
    )
    assert r["heaps_beta"] == beta
    assert 0.35 < beta < 0.55  # sub-linear growth, ~sqrt


def test_traffic_fano_exact_endpoints(spark):
    """One event per hour for H hours gives fano EXACTLY 0 (clock-
    regular); all k events in one hour of an H-hour span gives the
    hand value k(H-1)/H; empty hours are counted via the span, not
    materialized."""
    import os
    import tempfile

    import pandas as pd

    from rgr_pdal_topo_spark.queries import QUERIES

    t0 = pd.Timestamp("2024-03-01 00:30:00")
    h = pd.Timedelta(hours=1)

    def run(rows):
        ev = pd.DataFrame(
            rows,
            columns=[
                "event_id", "ts", "user_id", "event_type", "value", "props",
            ],
        ).astype({"ts": "datetime64[us]"})
        with tempfile.TemporaryDirectory() as d:
            ev.to_parquet(os.path.join(d, "events.parquet"))
            return {
                r["event_type"]: r
                for r in QUERIES["traffic_fano"](spark, d).collect()
            }

    # regular: one 'a' event in each of 6 hours -> fano 0
    reg = run([(i, t0 + i * h, 1, "a", 1.0, "{}") for i in range(6)])
    assert (reg["a"]["n_hours"], reg["a"]["fano"]) == (6, 0.0)

    # burst: 4 'b' events in hour 0, span fixed to 6 hours by one 'a'
    # at each end
    rows = [(0, t0, 9, "a", 1.0, "{}"), (1, t0 + 5 * h, 9, "a", 1.0, "{}")]
    rows += [(10 + i, t0, 1, "b", 1.0, "{}") for i in range(4)]
    burst = run(rows)
    assert burst["b"]["n_hours"] == 6
    # fano = (6*16 - 16) / (6*4) = 80/24
    assert burst["b"]["fano"] == round(80 / 24.0, 6)


def test_langid_margin_planted(spark):
    """Hand-built margins: a doc with 3 'the' + 1 'der' has margin 2
    and is correct for lang=en; a doc tying en and de at 2-2 has
    margin 0 (the pairwise-min identity collapses ties); a pure-de
    doc labeled en is incorrect at its margin.  Odd doc_ids dodge
    the langmark injection."""
    import os
    import tempfile

    import pandas as pd

    from rgr_pdal_topo_spark.queries import QUERIES

    df = pd.DataFrame(
        {
            "doc_id": [1, 3, 5],
            "text": [
                "the the the der x",        # en margin 2, correct
                "the a der die x",          # 2-2 tie -> margin 0
                "der die das und ist x",    # de, labeled en -> wrong
            ],
            "lang": ["en", "en", "en"],
            "source": ["s"] * 3,
            "n_chars": [9] * 3,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        got = {
            (r["margin"], r["is_correct"]): r["n_docs"]
            for r in QUERIES["langid_margin"](spark, d).collect()
        }
    assert got[(2, 1)] == 1       # the-heavy doc
    assert got[(0, 1)] == 1       # tie resolves to en (preference order)
    assert got[(5, 0)] == 1       # pure-de doc mislabeled


def test_resample_error_analytic(spark):
    """A DEM constant within every 2x2 block round-trips EXACTLY
    (rmse 0.0); a checkerboard of +/-8192 (1.0 in z units) has every
    block mean 0, so every cell errs by exactly 1.0 -> rmse 1.0; a
    3-cell partial block exercises the 144/bn^2 = 16 branch (a 16x
    scale would be fractional there)."""
    from rgr_pdal_topo_spark.queries import _resample_error_core

    def run(rows):
        zt = spark.createDataFrame(
            rows, "cell_row int, cell_col int, z long"
        )
        [r] = _resample_error_core(zt).collect()
        return r

    # block-constant: 4x4 grid, z = block id
    bc = run([
        (r, c, 1000 * ((r // 2) * 2 + (c // 2)))
        for r in range(4) for c in range(4)
    ])
    assert (bc["sse144"], bc["rmse"]) == (0, 0.0)

    # checkerboard +/-8192: block means 0, every error exactly 1.0
    cb = run([
        (r, c, 8192 if (r + c) % 2 == 0 else -8192)
        for r in range(4) for c in range(4)
    ])
    assert cb["rmse"] == 1.0

    # 3-cell partial block: cells (0,0),(0,1),(1,0) with z 0,0,3*8192;
    # eq = z*3 - zsum: (-3*8192, -3*8192, 6*8192), factor 144/9 = 16
    pb = run([(0, 0, 0), (0, 1, 0), (1, 0, 3 * 8192)])
    eqs = [-3 * 8192, -3 * 8192, 6 * 8192]
    assert pb["sse144"] == sum(e * e * 16 for e in eqs)


def test_user_value_concentration_planted(spark):
    """Ten users with values 10..1 dollars: top-1% is ceil(0.1) = 1
    user (1000 of 5500 cents), top-50% is 5 users (4000 of 5500);
    the integer ceil spelling picks exactly these ranks."""
    import os
    import tempfile

    import pandas as pd

    from rgr_pdal_topo_spark.queries import QUERIES

    ev = pd.DataFrame(
        {
            "event_id": range(10),
            "ts": [pd.Timestamp("2024-01-01")] * 10,
            "user_id": range(10),
            "event_type": ["purchase"] * 10,
            "value": [float(10 - i) for i in range(10)],
            "props": ["{}"] * 10,
        }
    ).astype({"ts": "datetime64[us]"})
    with tempfile.TemporaryDirectory() as d:
        ev.to_parquet(os.path.join(d, "events.parquet"))
        got = {
            r["pct"]: r
            for r in QUERIES["user_value_concentration"](spark, d).collect()
        }
    assert (got[1]["n_top_users"], got[1]["top_cents"]) == (1, 1000)
    assert got[1]["value_share"] == round(1000 / 5500.0, 6)
    assert (got[50]["n_top_users"], got[50]["top_cents"]) == (5, 4000)
    assert got[50]["value_share"] == round(4000 / 5500.0, 6)
    assert got[10]["n_top_users"] == 1 and got[20]["n_top_users"] == 2


def test_events_dow_profile_planted(spark):
    """2024-01-01 was a Monday -> dow 0 by the day-count spelling; a
    planted Monday with 3 events at 09h and 1 at 17h gives the peak
    at 09 with share 0.75; a peak TIE resolves to the earlier hour."""
    import os
    import tempfile

    import pandas as pd

    from rgr_pdal_topo_spark.queries import QUERIES

    def run(stamps):
        ev = pd.DataFrame(
            {
                "event_id": range(len(stamps)),
                "ts": stamps,
                "user_id": [1] * len(stamps),
                "event_type": ["view"] * len(stamps),
                "value": [1.0] * len(stamps),
                "props": ["{}"] * len(stamps),
            }
        ).astype({"ts": "datetime64[us]"})
        with tempfile.TemporaryDirectory() as d:
            ev.to_parquet(os.path.join(d, "events.parquet"))
            return QUERIES["events_dow_profile"](spark, d).collect()

    mon9 = pd.Timestamp("2024-01-01 09:15:00")
    mon17 = pd.Timestamp("2024-01-01 17:45:00")
    rows = run([mon9, mon9, mon9, mon17])
    by_hr = {r["hr"]: r for r in rows}
    assert all(r["dow"] == 0 for r in rows)  # Monday
    assert by_hr[9]["is_peak"] == 1 and by_hr[9]["hour_share"] == 0.75
    assert by_hr[17]["is_peak"] == 0

    tie = run([mon9, mon17])
    by_hr = {r["hr"]: r for r in tie}
    assert by_hr[9]["is_peak"] == 1  # tie -> earlier hour
    assert by_hr[17]["is_peak"] == 0
