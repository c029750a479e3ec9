"""Physical-plan audits: the plans must have the scale-safe shapes
(broadcast joins for dims, pushed filters in scans, partial aggregation,
no cartesian products on fact-fact paths)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pip_join_is_broadcast(spark):
    from rgr_pdal_topo_spark.operators.joins import pip_join_rect
    from rgr_pdal_topo_spark.synth import points_df, polygons_df

    plan = _plan(
        pip_join_rect(points_df(spark, SF_DIR), polygons_df(spark, SF_DIR))
    )
    assert "Broadcast" in plan
    # the fact side must not shuffle for this join
    assert "SortMergeJoin" not in plan


def test_filter_pushdown_to_parquet(spark):
    from rgr_pdal_topo_spark.sources.tables import load_table

    df = load_table(spark, SF_DIR, "lineitem").filter(
        F.col("l_shipdate") < "1996-01-01"
    ).select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "PushedFilters" in plan
    # column pruning: the scan must not read all 11 columns
    assert "l_extendedprice" not in plan.split("ReadSchema")[-1]


def test_grid_agg_is_partial_final(spark):
    from rgr_pdal_topo_spark.grid import DEFAULT_GRID as G
    from rgr_pdal_topo_spark.operators.gridding import grid_points
    from rgr_pdal_topo_spark.synth import points_df

    plan = _plan(grid_points(points_df(spark, SF_DIR), G, output_type="idw"))
    # two HashAggregate nodes = map-side partial + final
    assert plan.count("HashAggregate") >= 2


def test_knn_grid_no_cartesian_mainpath(spark):
    from rgr_pdal_topo_spark.operators.joins import knn_join_grid
    from rgr_pdal_topo_spark.synth import gps_df, points_df

    df = knn_join_grid(
        points_df(spark, SF_DIR), gps_df(spark, SF_DIR), max_dist=100.0
    )
    plan = _plan(df)
    # the candidate join is materialized eagerly behind a localCheckpoint
    # (the final plan reads the checkpointed RDD); what must NOT appear in
    # the result plan is any cross-join residue
    assert "CartesianProduct" not in plan
    assert "Scan ExistingRDD" in plan  # checkpointed candidates


def test_profile_project_no_shuffle(spark):
    from rgr_pdal_topo_spark.operators.joins import profile_project
    from rgr_pdal_topo_spark.synth import points_df

    plan = _plan(profile_project(points_df(spark, SF_DIR)))
    assert "Exchange" not in plan  # pure narrow map: scan->project->explode
    assert "*(1)" in plan  # whole-stage codegen span


def test_whole_stage_codegen_on_points(spark):
    from rgr_pdal_topo_spark.synth import points_df

    plan = _plan(points_df(spark, SF_DIR))
    assert "*(1)" in plan  # whole-stage codegen span
    # column pruning reached the scan: only o_orderkey is read
    assert "ReadSchema: struct<o_orderkey:bigint>" in plan


def test_resample_near_broadcasts_dest_universe(spark):
    from rgr_pdal_topo_spark.grid import DEFAULT_GRID as G
    from rgr_pdal_topo_spark.operators.flow import FLOW_GRID as DG
    from rgr_pdal_topo_spark.operators.gridding import grid_points
    from rgr_pdal_topo_spark.operators.raster import resample
    from rgr_pdal_topo_spark.synth import points_df

    g = grid_points(points_df(spark, SF_DIR), G, output_type="mean")
    plan = _plan(resample(g, G, DG, mode="near"))
    # the generated dest-cell universe is tiny: broadcast, not SMJ
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_reproject_is_scan_plus_arrow_udf(spark):
    from rgr_pdal_topo_spark.operators.raster import reproject_4326_to_3857
    from rgr_pdal_topo_spark.synth import points_df

    pts = points_df(spark, SF_DIR).selectExpr(
        "pid", "x / 100.0 - 5.0 AS lon", "y / 100.0 + 40.0 AS lat"
    )
    plan = _plan(reproject_4326_to_3857(pts))
    assert "ArrowEvalPython" in plan  # vectorized, not BatchEvalPython
    assert "Exchange" not in plan  # no shuffle: pure map pipeline


def test_radial_histogram_broadcasts_mids(spark):
    from rgr_pdal_topo_spark.grid import DEFAULT_GRID as G
    from rgr_pdal_topo_spark.operators.gridding import grid_points
    from rgr_pdal_topo_spark.operators.raster import radial_histogram
    from rgr_pdal_topo_spark.synth import points_df

    g = grid_points(points_df(spark, SF_DIR), G, output_type="mean")
    plan = _plan(radial_histogram(g, G))
    assert "BroadcastNestedLoopJoin" in plan  # 8-row theta dim broadcast
    assert plan.count("HashAggregate") >= 2  # partial+final bin counts


def test_stateful_stream_uses_state_operator(spark):
    import tempfile

    from rgr_pdal_topo_spark.grid import GridSpec
    from rgr_pdal_topo_spark.streaming.stateful import incremental_grid_stream

    src = tempfile.mkdtemp()
    stream = spark.readStream.schema(
        "pid long, x double, y double, z double"
    ).parquet(src)
    out = incremental_grid_stream(stream, GridSpec())
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "FlatMapGroupsInPandasWithState" in plan


def test_minhash_plan_has_no_global_window(spark):
    """Round-1's token ids used dense_rank over the whole vocabulary — a
    single-partition WindowExec Spark itself warns about.  The md5+Horner
    spelling must keep the signature pipeline window-free and must not
    broadcast a vocabulary dimension."""
    from rgr_pdal_topo_spark.operators import dedup
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    sig = dedup.minhash_signatures(dedup.shingle_ids(docs))
    plan = _plan(sig)
    assert "Window" not in plan
    # the one-pass signature agg has NO broadcast at all (the old 16-row
    # permutation cross join is gone too)
    assert plan.count("BroadcastExchange") == 0


def test_cell_index_is_pure_codegen(spark):
    """The spatial-index encode must stay JVM-side: no Python eval node,
    no shuffle — one projected scan."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["cell_index"](spark, SF_DIR))
    assert "EvalPython" not in plan
    assert "Exchange" not in plan


def test_multimodal_features_single_python_stage(spark):
    """extract_features is ONE Arrow mapInPandas over the scan — the
    binary payload must not cross extra shuffles."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["multimodal_features"](spark, SF_DIR))
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan


def test_stencil_suite_two_arrow_stages(spark):
    """Eleven DEM kernels must share ONE grouped-map stage (plus one for
    the mask grid) — per-kernel stages would multiply the halo shuffle.
    The stencil engine defaults to applyInArrow (FlatMapGroupsInArrow);
    count both spellings so a transport change can't hide extra stages."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["stencil_suite"](spark, SF_DIR))
    n_grouped = plan.count("FlatMapGroupsInArrow") + plan.count(
        "FlatMapGroupsInPandas"
    )
    assert n_grouped == 2
    assert "CartesianProduct" not in plan


def test_pages_geocode_zero_shuffle_no_python(spark):
    """Geocoding pages into cell ids is a pure scan -> project: any
    Exchange or Python worker here would serialize 10^12 rows for
    nothing."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["pages_geocode"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_points_decimate_is_scan_side(spark):
    """Hash-rank decimation must stay a zero-shuffle, Python-free filter
    evaluated at the scan."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["points_decimate"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_simhash_pairs_banded_equi_join(spark):
    """The SimHash pair search must be the banded equi-join, never an
    all-pairs compare: no cartesian / nested-loop node anywhere, and the
    fingerprint build itself stays the one-pass window-free agg."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["simhash_pairs"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan


def test_minhash_rowwise_banding_zero_shuffle(spark):
    """The streaming-legal row-local banding must plan as a pure
    projection: zero Exchange, zero Python — the property that makes it
    admissible before applyInPandasWithState."""
    from rgr_pdal_topo_spark.operators import dedup
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(dedup.minhash_bands_rowwise(docs))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_manifest_scan_pushes_residual_filter(spark, tmp_path):
    """Manifest pruning composes with, not replaces, parquet pushdown:
    inside each KEPT file the residual interval predicate must still
    reach the scan (row-group skipping is the second pruning tier)."""
    import os

    from rgr_pdal_topo_spark.sources import manifest as M

    root = str(tmp_path / "tbl")
    os.makedirs(root)
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    M.commit(df, root, ["k"], n_files=4)
    pruned = M.scan(spark, root, {"k": (100, 200)})
    plan = _plan(pruned)
    assert "PushedFilters" in plan and "GreaterThanOrEqual(k,100)" in plan
    assert len(set(pruned.inputFiles())) == 1  # manifest tier pruned 3/4


def test_hex_pages_single_shuffle_no_python(spark):
    """Hex encoding is pure codegen (scan -> project); the only Exchange
    is the final partial+final aggregation on the cell id."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["hex_pages"](spark, SF_DIR))
    assert "EvalPython" not in plan
    assert plan.count("Exchange") <= 2  # partial->final agg only


def test_hex_ring_is_joinless_scatter_gather(spark):
    """The k-ring neighbourhood query is a JOINLESS scatter-gather: one
    page scan, two narrow aggs, no join of any kind, no Python.  (The
    earlier equi-join spelling scanned the geocode extraction twice —
    column pruning specialized the self-join's two agg subtrees and
    defeated ReusedExchange.)"""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["hex_ring_density"](spark, SF_DIR))
    assert "EvalPython" not in plan
    assert "Join" not in plan
    # one physical scan node ("FileScan parquet" matches both substrings)
    assert max(plan.count("Scan parquet"), plan.count("FileScan")) <= 1


def test_sq8_broadcasts_query_side(spark):
    """Compressed-vector top-k broadcasts the (tiny) query set; the
    corpus side never shuffles before the ranking window."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["cosine_topk_sq8"](spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "EvalPython" not in plan


def test_manifest_delete_scan_broadcasts_delete_keys(spark):
    """Merge-on-read applies bounded delete sets as a broadcast
    anti-join — a shuffled anti-join on every read would tax all scans
    for a KB of keys."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["manifest_delete_scan"](spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "LeftAnti" in plan


def test_ivf_sq8_broadcasts_probes_and_centroids(spark):
    """The composed ANN plan must broadcast BOTH small sides (centroids
    into the assignment, probes into the in-list scan) and never
    sort-merge the corpus."""
    from rgr_pdal_topo_spark.operators.similarity import cosine_topk_ivf_sq8
    from rgr_pdal_topo_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    plan = _plan(cosine_topk_ivf_sq8(emb, n_queries=10, k=5))
    assert plan.count("BroadcastNestedLoopJoin") + plan.count(
        "BroadcastHashJoin"
    ) >= 2
    assert "SortMergeJoin" not in plan


def test_pii_scrub_zero_shuffle_no_python(spark):
    """PII redaction is scan -> codegen project: no Exchange, no Python
    worker, no join."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["pii_scrub"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "Python" not in plan and "Arrow" not in plan
    assert "Join" not in plan


def test_lang_mix_sample_broadcasts_rates(spark):
    """The mixing sampler's corpus side must join the per-language rates
    by broadcast (never shuffle the documents) and aggregate
    partial+final."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["lang_mix_sample"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("HashAggregate") >= 2


def test_hll_fold_is_partial_final_no_distinct(spark):
    from rgr_pdal_topo_spark.operators import sketches
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(sketches.hll_fold(sketches.shingle_tid_stream(docs)))
    # register fold: partial + final hash agg, and NO Expand/distinct
    # anywhere — the fold runs on the raw stream
    assert plan.count("HashAggregate") >= 2
    assert "Expand" not in plan


def test_cms_lookup_broadcasts_counters(spark):
    from rgr_pdal_topo_spark.operators import sketches

    ids = spark.createDataFrame([(i % 7,) for i in range(100)], "tid long")
    keys = spark.createDataFrame([(3,), (42,)], "tid long")
    plan = _plan(sketches.cms_lookup(sketches.cms_fold(ids), keys))
    # the bounded counter table broadcasts; the key side never shuffles
    # into a SortMergeJoin
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_crawl_consolidation_single_partial_agg(spark):
    from rgr_pdal_topo_spark.operators import pages

    plan = _plan(
        pages.consolidate_crawl(pages.fetch_log_df(spark, SF_DIR))
    )
    # COUNT(DISTINCT digest) expands to the two-level aggregate —
    # partial on (url, digest) then final on url — which stays robust
    # when one url has 10^6 recrawls (a collect_set spelling would
    # bound-break there).  No window, no join, and every exchange is
    # preceded by a partial/merge aggregate.
    assert "partial_count" in plan and "merge_count" in plan
    assert "Window" not in plan
    assert "Join" not in plan
    assert plan.count("Exchange") == 2


def test_asof_join_single_shuffle_no_join(spark):
    from rgr_pdal_topo_spark.operators import pages, temporal

    views = pages.view_log_df(spark, SF_DIR)
    fetches = pages.fetch_log_df(spark, SF_DIR).select(
        "url", "warc_epoch", F.md5("text").alias("digest")
    )
    plan = _plan(
        temporal.asof_join(
            views, fetches, "url", "view_epoch", "warc_epoch", ["digest"]
        )
    )
    assert "Join" not in plan  # zero join nodes — union + carry only
    # exactly one exchange hashpartitions the union on the key
    import re

    hashparts = re.findall(r"Exchange hashpartitioning\(url", plan)
    assert len(hashparts) == 1


def test_bm25_broadcasts_every_dimension(spark):
    from rgr_pdal_topo_spark.operators import retrieval
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(retrieval.bm25_scores(docs))
    # query tokens, df, and the corpus scalars all broadcast; the only
    # sort-merge joins allowed are fact-side (postings x doc lengths)
    assert plan.count("BroadcastHashJoin") >= 2
    # the 1-row corpus-scalar cross join broadcasts; never a cartesian
    assert "CartesianProduct" not in plan
    # final score agg is partial+final
    assert "partial_count" in plan and "partial_sum" in plan


def test_quantile_sketch_windows_over_buckets_only(spark):
    from rgr_pdal_topo_spark.operators import sketches
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").select("n_chars")
    plan = _plan(
        sketches.quantile_sketch_summary(docs, "n_chars", [500, 990])
    )
    # every Window sits downstream of a HashAggregate (the bucket fold):
    # the cumulative sum never sees raw rows
    import re

    first_win = plan.find("Window")
    first_agg = plan.find("HashAggregate")
    assert first_win != -1 and first_agg != -1
    assert plan.count("HashAggregate") >= 4  # two folds, partial+final


def test_anchor_topk_uses_window_group_limit(spark):
    """The per-host top-k must push the k-cut below the shuffle (Spark's
    WindowGroupLimit: <= k rows per host per partition move), and the
    link-count agg must combine map-side."""
    from rgr_pdal_topo_spark.operators import linkgraph, pages

    lp = pages.linked_pages_df(spark, SF_DIR)
    plan = _plan(linkgraph.top_anchors(linkgraph.extract_anchor_pairs(lp)))
    assert plan.count("WindowGroupLimit") == 2      # Partial + Final
    assert "partial_count" in plan


def test_search_results_pushes_topk_below_shuffle(spark):
    from rgr_pdal_topo_spark.operators import retrieval
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(retrieval.search_results(docs))
    # top-k via WindowGroupLimit (Partial + Final): <= k score rows per
    # qid per partition reach the ranking shuffle
    assert plan.count("WindowGroupLimit") == 2
    # query tokens / df / corpus scalars broadcast, like solo bm25
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_dup_spans_windows_partition_by_doc(spark):
    """The island merge must never use a global (single-partition)
    window: every Window node partitions by doc_id."""
    from rgr_pdal_topo_spark.operators import dedup
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(dedup.duplicated_spans(docs))
    assert "Window" in plan
    # a global window would print "Window [...]" with no partition spec;
    # every window line here must carry the doc_id partitioning
    for line in plan.splitlines():
        if "Window [" in line:
            assert "doc_id" in line
    # per-doc span and final stats aggs combine map-side
    assert "partial_count" in plan


def test_dsir_weights_broadcasts_bucket_table(spark):
    """The DSIR_BUCKETS-row weight table must broadcast into the scoring
    join (the corpus never re-shuffles for it), the scalar totals must
    never become a cartesian product, and the score agg combines
    map-side."""
    from rgr_pdal_topo_spark.operators import textstats
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(textstats.dsir_weights(docs))
    assert plan.count("BroadcastHashJoin") >= 1
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan


def test_source_quality_rollup_is_partial_final(spark):
    """The per-source rollup and the shingle document-frequency agg both
    combine map-side; the doc-keyed joins never go cartesian."""
    from rgr_pdal_topo_spark.operators import textstats
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(textstats.source_quality(docs))
    assert "partial_count" in plan and "partial_sum" in plan
    assert "CartesianProduct" not in plan


def test_semdedup_broadcasts_centroids_partitions_by_cluster(spark):
    """Centroids broadcast into the assignment; the within-cluster
    self-join is an equi-join on cid (never a cartesian product); the
    per-cluster rollups combine map-side."""
    from rgr_pdal_topo_spark.operators import similarity
    from rgr_pdal_topo_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    plan = _plan(similarity.semdedup(emb))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or plan.count("BroadcastHashJoin") >= 2
    assert "partial_count" in plan
    # the centroid argmax is a max-struct AGGREGATE (partials combine
    # map-side), never a per-vector row_number window that would
    # sort-exchange all n_centroids candidate rows per vector
    assert "Window" not in plan
    assert "partial_max" in plan


def test_token_packing_windows_partition_by_shard(spark):
    """The packing cumsum must never be a global window: every Window
    node partitions by the shard column."""
    from rgr_pdal_topo_spark.operators import textstats
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(textstats.token_packing(docs))
    assert "Window" in plan
    for line in plan.splitlines():
        if "Window [" in line:
            assert "source" in line
    assert "partial_sum" in plan


def test_bigram_ppl_broadcasts_vocab_scalar(spark):
    """The vocab-size scalar broadcasts (no cartesian), the LM tables
    join back by key, and the count/score aggs combine map-side."""
    from rgr_pdal_topo_spark.operators import textstats
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(textstats.bigram_ppl(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "partial_count" in plan and "partial_sum" in plan


def test_bpe_pairs_topk_window_over_aggregated_pairs(spark):
    """The pair count combines map-side onto the alphabet^2-bounded key
    space; the ONE window (top-k rank) runs over that aggregated table,
    never the corpus; no Python anywhere."""
    from rgr_pdal_topo_spark.operators import textstats
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(textstats.bpe_pair_counts(docs))
    assert "partial_count" in plan
    assert plan.count("Window [") == 1
    assert "EvalPython" not in plan


def test_ccnet_buckets_no_per_lang_global_window(spark):
    """The scale contract: NO window partitions by lang alone over the
    document stream — the row_number runs per (lang, key) and the
    offset cumsum runs over the aggregated per-key table; the offset
    and per-language-total joins broadcast."""
    from rgr_pdal_topo_spark.operators import textstats
    from rgr_pdal_topo_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(textstats.ccnet_buckets(docs))
    for line in plan.splitlines():
        if "row_number" in line and "Window [" in line:
            # within-rank partitions by BOTH lang and the nll key
            assert "key" in line.split("windowspecdefinition")[1]
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan and "partial_sum" in plan


def test_contour_cases_single_scan_no_self_join(spark):
    """The quad assembly must be the replicate-to-blocks spelling, not
    self-joins: ONE scan of the source, NO join nodes, exactly two
    explodes (corner fan + level fan), map-side-combinable aggs."""
    from rgr_pdal_topo_spark.operators import raster
    from rgr_pdal_topo_spark import queries as Q

    g = Q.mean_dem(spark, SF_DIR)
    plan = _plan(raster.contour_cases(g, (95, 105, 115, 125)))
    assert plan.count("Scan parquet") == 1
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "CartesianProduct"):
        assert node not in plan
    assert plan.count("Generate explode") == 2
    assert "partial_count" in plan


def test_grid_mean_salted_two_phase_agg(spark):
    """The salted spelling must show the explicit two-phase shape: the
    first aggregation keys on (cell, _salt), the final fold on the cell
    alone, both combining map-side."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["grid_mean_salted"](spark, SF_DIR))
    assert "_salt" in plan
    assert "partial_sum" in plan
    # two distinct grouping levels: with and without the salt key
    agg_lines = [l for l in plan.splitlines() if "HashAggregate" in l]
    assert any("_salt" in l for l in agg_lines)
    assert any("_salt" not in l and "cell_row" in l for l in agg_lines)


def test_host_distance_scans_parquet_once_total(spark):
    """BFS pays the page scan ONCE: the edge list is checkpoint-pinned
    before iteration, so the 4-round plan contains zero parquet
    rescans (an unpinned edge list would re-extract the crawl every
    superstep) and no Python anywhere."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["host_distance"](spark, SF_DIR))
    assert "EvalPython" not in plan
    assert max(plan.count("Scan parquet"), plan.count("FileScan")) == 0


def test_cocitation_pair_join_is_equi_join(spark):
    """The co-citation self-join must be a hash/merge EQUI-join on src
    (the a.dst < b.dst triangle as a post-filter) — never a nested-loop
    or cartesian pairing, which would be quadratic in the edge count
    rather than in per-source fan-out."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["cocitation_hosts"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan
    assert "EvalPython" not in plan


def test_lpa_scans_parquet_once_total(spark):
    """LPA's symmetrized edge list is checkpoint-pinned before the
    rounds: zero parquet rescans across 3 supersteps, no Python."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["lpa_communities"](spark, SF_DIR))
    assert "EvalPython" not in plan
    assert max(plan.count("Scan parquet"), plan.count("FileScan")) == 0


def test_link_geo_bands_joins_centroids_not_crawl(spark):
    """The distance join pairs the EDGE list with the host-sized
    centroid table (equi-joins only, no cartesian/nested-loop, no
    Python) and the band fold ends in one partial+final agg."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["link_geo_bands"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan
    assert "EvalPython" not in plan
    assert "partial_count" in plan or "partial" in plan.lower()


def test_tile_pyramid_single_scan_all_zooms(spark):
    """The 3-level pyramid is ONE parquet scan + explode + one
    partial+final agg — the per-zoom re-scan spelling (the oracle's
    textbook UNION ALL) would read the crawl once per level."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["tile_pyramid"](spark, SF_DIR))
    assert "EvalPython" not in plan
    assert max(plan.count("Scan parquet"), plan.count("FileScan")) == 1
    assert "Generate" in plan  # the explode


def test_doc_keywords_topk_below_shuffle(spark):
    """The per-doc top-5 cut pushes below the shuffle
    (WindowGroupLimit) and the corpus scalar broadcasts — the
    anchor_text plan shape on the postings table."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["doc_keywords"](spark, SF_DIR))
    assert "WindowGroupLimit" in plan
    assert "BroadcastExchange" in plan
    assert "EvalPython" not in plan


def test_corpus_rollup_expand_single_scan(spark):
    """ROLLUP plans as ONE scan -> Expand(3 grouping levels) ->
    partial+final agg — not one job per level."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["corpus_rollup"](spark, SF_DIR))
    assert "Expand" in plan
    assert max(plan.count("Scan parquet"), plan.count("FileScan")) == 1
    assert "EvalPython" not in plan


def test_session_peaks_global_window_only_on_hour_rollup(spark):
    """sweep_concurrency's scale contract, pinned in the physical plan:
    (1) exactly one SinglePartition exchange, and it feeds the carry
    window FROM THE HOUR ROLLUP (its child is the bucket_ts
    HashAggregate — cardinality = hours, never raw boundaries); (2) the
    boundary-stream window partitions by bucket_ts; (3) the interval
    subtree runs ONCE (the +-1 boundaries leave one row via explode —
    a two-branch union would replay the sessionize shuffle twice)."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["session_peaks"](spark, SF_DIR))
    assert plan.count("Exchange SinglePartition") == 1
    lines = plan.splitlines()
    gi = next(i for i, l in enumerate(lines) if "Exchange SinglePartition" in l)
    assert "HashAggregate(keys=[bucket_ts" in lines[gi + 1]
    # every Window over the boundary stream (ordering on t) is
    # bucket-partitioned; the only unpartitioned window orders buckets
    for line in lines:
        if "Window [" in line and "windowspecdefinition(bucket_ts" not in line:
            assert "windowspecdefinition(user_id" in line or (
                "bucket_ts" in line
            ), line
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_pair_statistics_never_cartesian(spark):
    """semivariogram and ripley_k candidate pairs must be EQUI-joins on
    the lag-target / cell key — never a cartesian or broadcast-nested-
    loop product (the oracle spells the naive all-pairs join; the
    engine must not)."""
    from rgr_pdal_topo_spark.queries import QUERIES

    for name in ("semivariogram", "ripley_k"):
        plan = _plan(QUERIES[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, name
        # ripley's one BroadcastNestedLoopJoin is the 1x1 scalar cross
        # join of (pair counts) x (n) — never on the pair path; the
        # pair join itself must be hash/sort-merge on the key
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
            or "BroadcastHashJoin" in plan, name
        assert plan.count("Generate explode") == 1, name


def test_editdist_pairs_blocked_join_no_cartesian(spark):
    """editdist_pairs candidates come from the (lang, n_chars) block
    equi-join — never a cartesian/nested-loop product — and the banded
    DP stays JVM-side (no Python/Arrow eval node)."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["editdist_pairs"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_session_overlaps_bucketed_equi_join(spark):
    """The interval range join must plan as a hash/sort-merge EQUI-join
    on the bucket key — never the cartesian/nested-loop product the
    oracle's textbook range predicate would produce."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["session_overlaps"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan


def test_market_share_broadcast_chain(spark):
    """The Q8-shaped 8-table join must stream the fact ONCE through a
    chain of broadcast hash joins — no sort-merge/shuffled join, no
    cartesian — the only scalable plan when every dim is small."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["market_share"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") == 7
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan


def test_setsim_pairs_prefix_equi_join(spark):
    """The exact set-similarity join must stay the prefix-filtered
    equi-join on tid: no cartesian / nested-loop node anywhere, and no
    Python in the plan (ids are pure-Column md5/Horner arithmetic)."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["setsim_pairs"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_containment_pairs_prefix_equi_join(spark):
    """The containment join must stay the index-prefix-probe-full
    equi-join on tid: no cartesian / nested-loop node, no Python."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["containment_pairs"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_geomorphons_equi_join_no_python(spark):
    """The geomorphon census must be the explode -> equi-join on the
    exact target key -> two partial+final aggs: no cartesian /
    nested-loop node, no Python in the plan."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["geomorphons"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_zonal_overlay_broadcast_cell_join(spark):
    """The overlay must join the raster on the exact cell key against
    the BROADCAST polygon fan — no shuffle of the grid side for the
    join, no cartesian, no Python."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["zonal_overlay"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_late_suppliers_semi_anti_broadcast(spark):
    """Q21 shape: one physical LeftSemi AND one LeftAnti join (the
    non-equi residual keeps them joins, not filters), the supplier dim
    broadcast, and no cartesian product anywhere."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["late_suppliers"](spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "Broadcast" in plan
    assert "Cartesian" not in plan


def test_vrm_no_python_no_cartesian(spark):
    """VRM is pure whole-stage-codegen joins + aggregation: no Python
    evaluation nodes, no cartesian products (the 9-offset cross join
    is against a broadcast 9-row table)."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["vrm"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2  # partial+final window sums


def test_score_auc_partial_final_fold(spark):
    """The corpus folds map-side into score groups (partial+final
    HashAggregate) before the single-partition group window."""
    from rgr_pdal_topo_spark.queries import QUERIES

    plan = _plan(QUERIES["score_auc"](spark, SF_DIR))
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan
