"""Link graph + integer PageRank (operators/linkgraph.py).

The oracle row (pagerank_hosts in test_query_parity) pins Spark against
DuckDB; these tests pin both against a pure-Python replay of the integer
update rule and the extraction against hand-built pages.
"""

from __future__ import annotations

from rgr_pdal_topo_spark.operators import linkgraph as lg


def _py_pagerank(edges: list[tuple[int, int]], iters: int) -> dict[int, int]:
    """Literal integer replay of pagerank_int's update rule."""
    nodes = sorted({s for s, _ in edges})
    n = len(nodes)
    odeg: dict[int, int] = {}
    for s, _ in edges:
        odeg[s] = odeg.get(s, 0) + 1
    q = {v: lg.PR_SCALE // n for v in nodes}
    base = (lg.PR_D_DEN - lg.PR_D_NUM) * lg.PR_SCALE // (lg.PR_D_DEN * n)
    for _ in range(iters):
        nxt = {v: base for v in nodes}
        for s, d in edges:
            if d in nxt:
                nxt[d] += lg.PR_D_NUM * q[s] // (lg.PR_D_DEN * odeg[s])
        q = nxt
    return q


def test_extract_links_planted(spark):
    """src comes from the url, dst from every href; duplicates collapse."""
    pages = spark.createDataFrame(
        [
            (
                "https://site3.example/p/3",
                '<p>x</p><a href="https://site7.example/">a</a>'
                '<a href="https://site9.example/">b</a>'
                '<a href="https://site7.example/">dup</a>'.encode(),
            ),
            ("https://site7.example/p/7",
             '<a href="https://site3.example/">c</a>'.encode()),
        ],
        "url string, html binary",
    )
    got = {(r.src, r.dst) for r in lg.extract_links(pages).collect()}
    assert got == {(3, 7), (3, 9), (7, 3)}


def test_pagerank_matches_python_replay(spark):
    """A skewed 5-node graph (host 0 is a hub) matches the pure-Python
    integer replay bit-for-bit after every superstep count."""
    edges = [(0, 1), (1, 0), (2, 0), (3, 0), (4, 0), (0, 2), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for iters in (1, 4):
        got = {
            r.host: r.rank_q
            for r in lg.pagerank_int(df, iters=iters).collect()
        }
        assert got == _py_pagerank(edges, iters), iters
    # the hub outranks everyone; mass stays bounded by the scale
    assert got[0] == max(got.values())
    assert sum(got.values()) <= lg.PR_SCALE


def test_pagerank_sf0001_is_skewed(spark):
    """The driver fixture's quadratic dst makes in-degree (and ranks)
    genuinely non-uniform — the vacuity guard for the oracle row."""
    from rgr_pdal_topo_spark.operators import pages as pagesops

    pages = pagesops.linked_pages_df(spark, "/root/testdata/sf0.001")
    ranks = lg.pagerank_int(lg.extract_links(pages))
    vals = [r.rank_q for r in ranks.collect()]
    assert len(vals) == 500
    assert len(set(vals)) > 10
    assert max(vals) > 5 * min(vals)


def test_anchor_pairs_planted_html(spark):
    """Extraction pins: (host, anchor) per link, non-anchor hrefs and
    malformed anchors ignored."""
    html = (
        '<html><body><a href="https://site7.example/">w3</a>'
        '<a href="https://site42.example/">w0</a>'
        '<a href="https://other.example/">w9</a>'          # host regex miss
        '<a href="https://site9.example/">plain</a>'       # anchor not w[0-9]+
        "</body></html>"
    )
    df = spark.createDataFrame(
        [("https://site1.example/p/1", html.encode("utf-8"))],
        "url string, html binary",
    )
    got = sorted(
        (r["host"], r["anchor"])
        for r in lg.extract_anchor_pairs(df).collect()
    )
    assert got == [(7, "w3"), (42, "w0")]


def test_top_anchors_rank_and_tiebreak(spark):
    """rnk orders by count DESC then anchor ASC; the k-cut is exact."""
    pairs = spark.createDataFrame(
        [(1, "w2")] * 3 + [(1, "w0")] * 2 + [(1, "w1")] * 2 + [(1, "w9")]
        + [(2, "w5")],
        "host long, anchor string",
    )
    got = [
        (r["host"], r["anchor"], r["n"], r["rnk"])
        for r in lg.top_anchors(pairs, k=3)
        .orderBy("host", "rnk")
        .collect()
    ]
    # host 1: w2 (3), then the n=2 tie breaks w0 < w1; w9 falls off
    assert got == [
        (1, "w2", 3, 1),
        (1, "w0", 2, 2),
        (1, "w1", 2, 3),
        (2, "w5", 1, 1),
    ]


def _py_hits(edges: list[tuple[int, int]], iters: int
             ) -> dict[int, tuple[int, int]]:
    """Literal integer replay of hits_int's update rule."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    h = {v: lg.HITS_SCALE for v in nodes}
    a = {}
    for _ in range(iters):
        a = {v: 0 for v in nodes}
        for s, d in edges:
            a[d] += h[s]
        mx = max(a.values())
        a = {v: r * lg.HITS_SCALE // mx for v, r in a.items()}
        h = {v: 0 for v in nodes}
        for s, d in edges:
            h[s] += a[d]
        mx = max(h.values())
        h = {v: r * lg.HITS_SCALE // mx for v, r in h.items()}
    return {v: (a[v], h[v]) for v in nodes}


def test_hits_matches_python_replay(spark):
    """Bipartite-ish graph: 0 and 1 are hubs pointing at {5, 6, 7};
    7 also links back.  Engine output equals the integer replay
    bit-for-bit at 1 and 2 supersteps."""
    edges = [(0, 5), (0, 6), (0, 7), (1, 5), (1, 7), (7, 5), (2, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for iters in (1, 2):
        got = {
            r.host: (r.auth_q, r.hub_q)
            for r in lg.hits_int(df, iters=iters).collect()
        }
        assert got == _py_hits(edges, iters), iters
    # semantics: 5 is the strongest authority (3 in-links incl. both
    # hubs), 0 the strongest hub (links to all three authorities);
    # never-linked-to hubs have auth_q = 0, sinks have hub_q = 0
    final = _py_hits(edges, 2)
    assert final[5][0] == lg.HITS_SCALE
    assert final[0][1] == lg.HITS_SCALE
    assert final[0][0] == 0 and final[1][0] == 0
    assert final[6][1] == 0 and final[5][1] == 0


def test_bfs_hops_planted(spark):
    """A chain with a cycle and a cross-edge: dist is the true minimum
    hop count, cycles don't inflate it, hosts beyond the round bound
    are absent, and unreachable hosts never appear."""
    # seeds (mod 3): 0.  0 -> 1 -> 2 -> 4 -> 5 -> 7 (beyond 4 rounds),
    # 2 -> 0 closes a cycle, 0 -> 4 shortcuts 4 to dist 1;
    # 8 -> 9 is a disconnected component (8 is not a seed).
    edges = [(0, 1), (1, 2), (2, 4), (4, 5), (5, 7), (2, 0), (0, 4),
             (8, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.host: r.dist
        for r in lg.bfs_hops(df, seed_mod=3, iters=4).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 4: 1, 5: 2, 7: 3}


def test_bfs_hops_min_over_rounds(spark):
    """A host first reached at round 3 keeps dist 3 when a later round
    would also reach it at 4 (MIN fold, not last-write)."""
    edges = [(0, 1), (1, 2), (2, 3), (3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.host: r.dist
        for r in lg.bfs_hops(df, seed_mod=7, iters=4).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_cocitation_planted(spark):
    """Pair counts are exact, the triangle keeps each pair once, and a
    hub source above the fan-out cap contributes nothing."""
    edges = (
        # sources 1 and 2 both cite {10, 20}; source 3 cites {10, 20, 30}
        [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 20), (3, 30)]
        # hub source 99 cites 5 hosts > cap -> excluded entirely
        + [(99, d) for d in (10, 20, 30, 40, 50)]
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r.host_a, r.host_b): r.n_common
        for r in lg.cocitation(df, max_odeg=4, min_common=2).collect()
    }
    # (10, 20) cited together by sources 1, 2, 3; (10, 30)/(20, 30)
    # only by source 3 -> below min_common
    assert got == {(10, 20): 3}


def _py_lpa(edges: list[tuple[int, int]], iters: int) -> dict[int, int]:
    """Literal replay of the synchronous deterministic LPA rule."""
    und = {(s, d) for s, d in edges} | {(d, s) for s, d in edges}
    nodes = sorted({s for s, _ in und})
    lbl = {v: v for v in nodes}
    for _ in range(iters):
        nxt = {}
        for v in nodes:
            votes: dict[int, int] = {}
            for s, d in und:
                if s == v:
                    votes[lbl[d]] = votes.get(lbl[d], 0) + 1
            nxt[v] = min(votes, key=lambda c: (-votes[c], c))
        lbl = nxt
    return lbl


def test_lpa_two_cliques_with_bridge(spark):
    """Two triangles joined by one bridge edge: labels converge to one
    community per clique (the bridge can't outvote the clique), and
    every round matches the pure-Python synchronous replay."""
    tri1 = [(0, 1), (1, 2), (2, 0)]
    tri2 = [(10, 11), (11, 12), (12, 10)]
    edges = tri1 + tri2 + [(2, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for iters in (1, 3):
        got = {
            r.host: r.community
            for r in lg.lpa_communities(df, iters=iters).collect()
        }
        assert got == _py_lpa(edges, iters), iters
    final = _py_lpa(edges, 3)
    # the PARTITION is two clean communities, one per clique (the label
    # VALUE of the second clique is 2 — node 2's id leaks across the
    # bridge in round 1 and wins the 3-vote majority — which is why the
    # contract is deterministic replay, not label aesthetics)
    assert len({final[0], final[1], final[2]}) == 1
    assert len({final[10], final[11], final[12]}) == 1
    assert final[0] != final[10]


def test_triangle_counts_k4_and_square(spark):
    """K4 has 4 triangles, 3 per corner; a 4-cycle has none; direction
    and duplicate edges don't matter (undirected distinct semantics)."""
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    square = [(10, 11), (11, 12), (12, 13), (13, 10)]
    df = spark.createDataFrame(
        k4 + square + [(0, 1)], "src long, dst long"  # dup edge
    )
    got = {
        r.host: r.n_triangles
        for r in lg.triangle_counts(df).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_degree_histogram_buckets(spark):
    """bucket = bit length of the degree: deg 1 -> 1, 2-3 -> 2,
    4-7 -> 3; in and out sides counted independently."""
    # host 0: out-deg 4 (bucket 3); hosts 1-4: out-deg 1 (bucket 1)
    # host 9: in-deg 5 (bucket 3); hosts 5-8: in-deg 1 each
    edges = [(0, 5), (0, 6), (0, 7), (0, 8), (1, 9), (2, 9), (3, 9),
             (4, 9), (0, 9)]
    # recompute: host 0 out-deg 5 (bucket 3); 1-4 out-deg 1
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r.side, r.bucket): r.n_hosts
        for r in lg.degree_histogram(df).collect()
    }
    assert got == {
        ("out", 3): 1,   # host 0, deg 5
        ("out", 1): 4,   # hosts 1-4, deg 1
        ("in", 3): 1,    # host 9, deg 5
        ("in", 1): 4,    # hosts 5-8, deg 1
    }


def test_link_reciprocity_semantics(spark):
    """The reciprocity fold over a hand graph: a mutual pair counts on
    both sides, one-way edges count in n_out only, and zero-recip
    hosts drop.  (Tests the query's fold shape via the same DataFrame
    chain the query builds — plant-free, edges given directly.)"""
    from pyspark.sql import functions as F

    edges = [(1, 2), (2, 1), (1, 3), (3, 4), (4, 3), (5, 1)]
    lk2 = spark.createDataFrame(edges, "src long, dst long").distinct()
    rev = lk2.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"),
        F.lit(1).alias("has_rev"),
    )
    r = lk2.join(rev, ["src", "dst"], "left").select(
        "src", F.coalesce("has_rev", F.lit(0)).alias("recip")
    )
    got = {
        row.host: (row.n_out, row.n_recip)
        for row in r.groupBy(F.col("src").alias("host"))
        .agg(F.count(F.lit(1)).alias("n_out"),
             F.sum("recip").alias("n_recip"))
        .filter(F.col("n_recip") > 0)
        .collect()
    }
    # 1: out-edges {2, 3}, only (1, 2) reciprocated; 5 drops (one-way)
    assert got == {1: (2, 1), 2: (1, 1), 3: (1, 1), 4: (1, 1)}


def test_bowtie_planted(spark):
    """Hand digraph with a known bow-tie relative to pivot 0: a 2-cycle
    core {0, 1}, an IN node (5 -> 0), an OUT node (1 -> 7), and a
    disconnected pair {8, 9}."""
    edges = [(0, 1), (1, 0), (5, 0), (1, 7), (8, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.component: (r.n_hosts, r.example_host)
        for r in lg.bowtie(df, seed_mod=1_000_000, iters=6).collect()
    }
    assert got == {
        "CORE": (2, 0),
        "IN": (1, 5),
        "OUT": (1, 7),
        "DISCONNECTED": (2, 8),
    }


def test_clustering_coefficient_square_with_diagonal(spark):
    """A 4-cycle with one diagonal (1-3): corners on the diagonal see
    2 triangles over 3 wedges (2/3), the off-diagonal corners see
    their single wedge closed (1.0); an isolated pendant (deg 1) is
    dropped."""
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (9, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.host: (r.deg, r.n_tri, r.lcc)
        for r in lg.clustering_coefficient(df).collect()
    }
    assert got == {
        1: (4, 2, round(2 * 2 / (4 * 3), 6)),  # deg 4 incl. pendant 9
        2: (2, 1, 1.0),
        3: (3, 2, round(2 * 2 / (3 * 2), 6)),
        4: (2, 1, 1.0),
    }
    # host 9 (deg 1) closed no wedge and must be absent
    assert 9 not in got


def test_resolve_pointers_doubling_and_horizon(spark):
    """A depth-5 chain resolves in 3 doubling rounds (2^3 >= 5) with
    exact hop counts; with horizon 2 (reach 4) the too-deep node
    surfaces as a NON-root instead of silently wrong."""
    ptr = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 2), (4, 3), (5, 4), (9, 9)],
        "h long, p long",
    )
    got = {
        r.h: (r.root, r.hops)
        for r in lg.resolve_pointers(ptr, iters=3).collect()
    }
    assert got == {
        0: (0, 0), 1: (0, 1), 2: (0, 2), 3: (0, 3), 4: (0, 4),
        5: (0, 5), 9: (9, 0),
    }
    short = {
        r.h: (r.root, r.hops)
        for r in lg.resolve_pointers(ptr, iters=2).collect()
    }
    assert short[5] == (1, 4)   # stopped at the 4th ancestor, visible
    assert short[4] == (0, 4)


def test_k_core_clique_survives_pendant_chain_peels(spark):
    """K5 clique {0..4} with a pendant chain 4 -> 10 -> 11 -> 12: the
    chain unravels one layer per round (degree 1 < k), the clique is a
    4-core and survives with core_deg exactly 4 everywhere."""
    clique = [(a, b) for a in range(5) for b in range(5) if a < b]
    chain = [(4, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(clique + chain, "src long, dst long")
    got = {r.host: r.core_deg for r in lg.k_core(df, k=4, rounds=5).collect()}
    assert got == {h: 4 for h in range(5)}


def test_k_core_cascade_needs_recompute(spark):
    """The case a single-pass degree filter gets wrong: a 6-cycle where
    every node has degree 2 — at k=2 it survives intact, but adding one
    pendant makes ONLY the pendant peel (first round), after which the
    cycle still stands; at k=3 the whole graph unravels to empty."""
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    df = spark.createDataFrame(cyc + [(0, 99)], "src long, dst long")
    two = {r.host: r.core_deg for r in lg.k_core(df, k=2, rounds=5).collect()}
    assert two == {h: 2 for h in range(6)}
    assert lg.k_core(df, k=3, rounds=5).count() == 0


def test_k_core_truncated_horizon_is_exact_prefix(spark):
    """rounds is a stated horizon: a long pendant chain off a clique
    peels exactly one node per round, so rounds=2 retains precisely the
    suffix a converged peel would still be working through."""
    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 20), (20, 21), (21, 22), (22, 23), (23, 24)]
    df = spark.createDataFrame(clique + chain, "src long, dst long")
    # k=2: round 1 peels 24, round 2 peels 23 -> survivors = clique + 20..22
    got = {r.host for r in lg.k_core(df, k=2, rounds=2).collect()}
    assert got == {0, 1, 2, 3, 20, 21, 22}
    conv = {r.host for r in lg.k_core(df, k=2, rounds=8).collect()}
    assert conv == {0, 1, 2, 3}


def test_neighborhood_reach_path_and_star(spark):
    """Hand graphs: on the path 1-2-3-4-5 the middle reaches all 5,
    the ends reach 3; on a 4-leaf star EVERY node reaches all 5 within
    two hops; a disconnected edge contributes reach 2."""
    path = [(i, i + 1) for i in range(1, 5)]
    got = {
        r.bucket: r.n_hosts
        for r in lg.neighborhood_reach(
            spark.createDataFrame(path, "src long, dst long")
        ).collect()
    }
    # reaches: 1->3, 2->4, 3->5, 4->4, 5->3  => bits: 2,3,3,3,2
    assert got == {2: 2, 3: 3}
    star = [(0, i) for i in range(1, 5)] + [(100, 101)]
    got2 = {
        r.bucket: r.n_hosts
        for r in lg.neighborhood_reach(
            spark.createDataFrame(star, "src long, dst long")
        ).collect()
    }
    # star nodes all reach 5 (bits 3); 100/101 reach 2 (bits 2)
    assert got2 == {3: 5, 2: 2}


def test_modularity_planted_partitions(spark):
    """Textbook values: two disjoint triangles under the TRUE partition
    give Q = 1/2 (q_num = 2m^2); the same graph under the everything-
    in-one-community partition gives Q = 0; splitting one triangle's
    vertex off makes Q NEGATIVE-leaning (worse than truth)."""
    tri2 = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame(tri2, "src long, dst long")

    def lab(mapping):
        return spark.createDataFrame(
            [(h, c) for h, c in mapping.items()], "host long, community long"
        )

    truth = lab({0: 1, 1: 1, 2: 1, 10: 2, 11: 2, 12: 2})
    r = lg.modularity(df, truth).first()
    assert (r.n_communities, r.m) == (2, 6)
    # e_c = 3 each, D_c = 6 each: q_num = 2*(4*6*3 - 36) = 72 = 2*m*m/... 
    assert r.q_num == 72 and r.modularity == 0.5

    one = lab({h: 7 for h in (0, 1, 2, 10, 11, 12)})
    r1 = lg.modularity(df, one).first()
    assert (r1.q_num, r1.modularity) == (0, 0.0)

    worse = lab({0: 1, 1: 1, 2: 9, 10: 2, 11: 2, 12: 2})
    r2 = lg.modularity(df, worse).first()
    assert r2.q_num < 72 and r2.n_communities == 3


def test_modularity_drops_self_loops_and_counts_edges_once(spark):
    """Self-loops vanish; a duplicated/reversed edge still counts once;
    an isolated-community (no surviving edges) contributes exactly 0
    but is still counted in n_communities."""
    df = spark.createDataFrame(
        [(0, 1), (1, 0), (2, 2), (0, 1)], "src long, dst long"
    )
    labels = spark.createDataFrame(
        [(0, 5), (1, 5), (2, 6)], "host long, community long"
    )
    r = lg.modularity(df, labels).first()
    # one real edge (0,1); community 5: e=1, D=2 -> 4*1*1 - 4 = 0
    assert (r.m, r.n_communities, r.q_num, r.modularity) == (1, 2, 0, 0.0)


def test_trustrank_demotes_unreachable_link_farm(spark):
    """The property TrustRank exists for: a link-farm target with big
    in-link mass but NO path from the trusted seed scores EXACTLY 0
    (integer arithmetic, not epsilon), while uniform-teleport PageRank
    rewards it.  Graph: a legit hub (in-degree 20, so it is the single
    top-in-degree seed) in a 2-cycle with L1; a farm of 10 hosts all
    linking to spam target S (in-degree 10) with S cycling back.
    Every node links out (the no-dangling contract)."""
    hub, l1 = 1000, 1001
    spam = 2000
    edges = [(hub, l1), (l1, hub)]
    edges += [(1001 + i, hub) for i in range(1, 20)]  # in-links to hub
    edges += [(1001 + i, l1) for i in range(1, 20)]   # keep them sourced
    edges += [(3000 + i, spam) for i in range(10)]
    edges += [(spam, 3000)]
    df = spark.createDataFrame(edges, "src long, dst long")
    tr = {
        r["host"]: (r["trust_q"], r["is_seed"])
        for r in lg.trustrank_int(df, n_seeds=1, iters=4).collect()
    }
    assert tr[hub][1] is True and tr[hub][0] > 0
    assert tr[l1][0] > 0 and tr[l1][1] is False  # reachable from seed
    assert tr[spam] == (0, False)
    assert all(tr[3000 + i] == (0, False) for i in range(10))
    pr = {
        r["host"]: r["rank_q"]
        for r in lg.pagerank_int(df, iters=4).collect()
    }
    assert pr[spam] > 0  # uniform teleport rewards the farm target


def test_adamic_adar_hand_computed_and_capped(spark):
    """Path graph 1—3—2: the single common neighbour has degree 2, so
    AA(1,2) = 1/ln 2 on the 2^-13 grid: wq = floor(ln2*8192+.5) = 5678,
    aa_q = floor(8192^2/5678) = 11819, aa = 11819/8192.  The adjacent
    pair (1,3) is excluded.  A degree-72 hub (over the 64 cap) linked
    to both 1 and 2 contributes NO wedge: (1,2) keeps aa_q = 11819 and
    no hub-leaf pair appears."""
    edges = [(1, 3), (2, 3), (100, 1), (100, 2)]
    edges += [(100, 200 + i) for i in range(70)]
    # every node must source at least one edge is NOT required here:
    # adamic_adar symmetrizes internally
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {
        (r["host_a"], r["host_b"]): r
        for r in lg.adamic_adar(df).collect()
    }
    r12 = out[(1, 2)]
    assert (r12["n_common"], r12["aa_q"]) == (1, 11819)
    assert r12["aa"] == 11819 / 8192
    assert (1, 3) not in out and (3, 1) not in out
    assert not any(a >= 200 and b >= 200 for a, b in out)


def test_lang_homophily_pandas_replay(spark):
    """Recompute directed categorical assortativity in pandas from the
    engine's own edge list + host-lang map (independent of the SQL
    oracle path): same MIN-lang labels, same Q = sum(same*E - out*in)
    / E^2 identity, bit-equal accumulators."""
    from pyspark.sql import functions as F

    from rgr_pdal_topo_spark.operators import linkgraph
    from rgr_pdal_topo_spark.operators import pages as pagesops
    from rgr_pdal_topo_spark.queries import QUERIES
    from rgr_pdal_topo_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    lk = linkgraph.extract_links(
        pagesops.linked_pages_df(spark, sf)
    ).toPandas()
    hl = (
        load_table(spark, sf, "documents")
        .selectExpr(f"{pagesops.URL_SQL} AS url", "lang")
        .select(
            F.regexp_extract(F.col("url"), pagesops.HOST_RE, 1)
            .cast("long").alias("host"),
            "lang",
        )
        .groupBy("host")
        .agg(F.min("lang").alias("lang"))
        .toPandas()
    )
    lang = dict(zip(hl.host, hl.lang))
    ed = [
        (lang[s], lang[d])
        for s, d in zip(lk.src, lk.dst)
        if s in lang and d in lang
    ]
    E = len(ed)
    out, ind, same = {}, {}, {}
    for s, d in ed:
        out[s] = out.get(s, 0) + 1
        ind[d] = ind.get(d, 0) + 1
        if s == d:
            same[s] = same.get(s, 0) + 1
    qnum = sum(
        same.get(l, 0) * E - o * ind.get(l, 0) for l, o in out.items()
    )
    n_same = sum(same.values())

    [r] = QUERIES["lang_homophily"](spark, sf).collect()
    assert (r["n_edges"], r["n_same"], r["qnum"]) == (E, n_same, qnum)
    assert r["homophily_q"] == round(qnum / (E * E), 6)
    assert E > 100  # non-degenerate graph


def test_hill_tail_pandas_replay(spark):
    """Recompute the Hill estimator in pandas from the engine's own
    in-degree table (independent of the SQL oracle path): same
    deterministic rank, same pinned-ln accumulator, bit-equal."""
    import math

    from pyspark.sql import functions as F

    from rgr_pdal_topo_spark.operators import linkgraph
    from rgr_pdal_topo_spark.operators import pages as pagesops
    from rgr_pdal_topo_spark.queries import _HILL_K, QUERIES

    sf = "/root/testdata/sf0.001"
    lk = linkgraph.extract_links(pagesops.linked_pages_df(spark, sf))
    degs = (
        lk.groupBy(F.col("dst").alias("host"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .toPandas()
        .sort_values(["deg", "host"], ascending=[False, True])
        .deg.tolist()
    )
    k = min(_HILL_K, len(degs) - 1)
    lq = lambda v: math.floor(math.log(v) * 8192 + 0.5)
    degk = degs[k]  # rank k+1, 0-indexed
    acc = sum(lq(x) - lq(degk) for x in degs[:k])

    [r] = QUERIES["hill_tail"](spark, sf).collect()
    assert (r["k"], r["degk"], r["acc"]) == (k, degk, acc)
    assert r["hill_h"] == round(acc / (k * 8192.0), 6)
    if acc > 0:
        assert r["tail_alpha"] == round(k * 8192.0 / acc, 6)
