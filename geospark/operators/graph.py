"""Link-graph operators for web-corpus curation.

PageRank-family link scoring is a first-class curation signal for web
training data (spam demotion, crawl prioritization, quality-weighted
sampling).  The recurrence here is INTEGER-EXACT: ranks are BIGINT
micro-units and every step is floor division / integer sums —
commutative and engine-identical, so a DuckDB twin hash-matches where
a floating-point PageRank would drift with partial-sum order.

Scale notes (10^10 nodes): one iteration = one src-keyed equi-join
(rank × out-degree, both narrow) + one dst-keyed groupBy SUM with
map-side combine — the classic Pregel-as-relational layout.  Hub skew
(a node with 10^6 in-links) is an AQE skew-join case, not a custom
path.  Lineage is truncated per iteration through materialize() (the
CC convention; reliable tier via spark.geospark.reliableCheckpoint).
"""

from __future__ import annotations

from ..materialize import materialize

# 10^12 micro-units of total rank mass; BIGINT headroom: the total mass
# is conserved (sums of floors only shrink), so no intermediate can
# exceed SCALE < 2^63 even on a single-node star graph.
SCALE = 10**12


def pagerank(edges, n_nodes: int, *, iters: int = 5,
             damping_pct: int = 85, src_col: str = "src",
             dst_col: str = "dst", id_col: str = "doc_id",
             rank_col: str = "rank_micro"):
    """Integer PageRank over ``edges`` (src, dst); every node 0..n-1
    is ranked even with no in-links.  r_0 = SCALE // n; one step:

        r'(v) = (100 - d) * (SCALE // n) // 100
                + d * SUM over in-edges u->v of (r(u) // outdeg(u)) // 100

    All floor arithmetic on BIGINT micro-units -> bit-identical on any
    engine and any partitioning.  Dangling nodes (outdeg 0) simply
    leak their mass — the convention DuckDB's twin mirrors; redistribute
    upstream by adding sink edges if conservation matters.
    -> (id, rank_micro) for all n nodes."""
    from pyspark.sql import functions as F
    spark = edges.sparkSession
    base_all = SCALE // n_nodes
    base = (100 - damping_pct) * base_all // 100
    nodes = spark.range(n_nodes).select(F.col("id").alias(id_col))
    deg = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("_deg"))
    ed = materialize(edges.join(deg, src_col))
    r = nodes.select(id_col, F.lit(base_all).cast("long").alias("_r"))
    for _ in range(iters):
        contrib = (ed.join(r, ed[src_col] == r[id_col])
                   .select(F.col(dst_col).alias("_v"),
                           F.expr("_r div _deg").alias("_c")))
        s = contrib.groupBy("_v").agg(F.sum("_c").alias("_s"))
        r = (nodes.join(s, nodes[id_col] == s["_v"], "left")
             .select(id_col,
                     (F.lit(base) + F.expr(
                         f"({damping_pct} * coalesce(_s, 0)) div 100"))
                     .cast("long").alias("_r")))
        r = materialize(r)
    return r.select(id_col, F.col("_r").alias(rank_col))


def pagerank_sql(edges_sql: str, nodes_sql: str, n_nodes_sql: str, *,
                 iters: int = 5, damping_pct: int = 85,
                 rank_col: str = "rank_micro") -> str:
    """DuckDB twin: the same integer recurrence unrolled as one CTE
    per iteration (generated here, so the arithmetic exists once).
    ``nodes_sql`` is a SELECT producing the node ids as ``id`` (DuckDB's
    range() table function rejects subquery bounds, so the node set is
    passed explicitly); ``n_nodes_sql`` a scalar subquery/literal for n."""
    base_all = f"(({SCALE}) // ({n_nodes_sql}))"
    base = f"((100 - {damping_pct}) * {base_all} // 100)"
    ctes = [
        f"edges AS ({edges_sql})",
        ("deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)"),
        ("ed AS (SELECT e.src, e.dst, d.deg FROM edges e "
         "JOIN deg d USING (src))"),
        f"nodes AS ({nodes_sql})",
        f"r0 AS (SELECT id, CAST({base_all} AS BIGINT) AS r FROM nodes)",
    ]
    for i in range(iters):
        ctes.append(
            f"r{i + 1} AS (SELECT n.id, CAST({base} + "
            f"({damping_pct} * COALESCE(s.s, 0)) // 100 AS BIGINT) AS r "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT ed.dst AS v, SUM(p.r // ed.deg) AS s "
            f"FROM ed JOIN r{i} p ON ed.src = p.id GROUP BY ed.dst"
            f") s ON n.id = s.v)")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT id AS doc_id, r AS {rank_col} FROM r{iters}")


def bounded_paths(edges, seeds, k: int, *, a_col: str = "id_a",
                  b_col: str = "id_b", w_col: str = "w",
                  seed_col: str = "id"):
    """Bounded min-plus shortest paths (k Bellman-Ford rounds) from a
    seed set over an undirected nonnegative-weight graph: for every
    node reachable within <= k hops, the EXACT cheapest path cost
    using at most k edges — the weighted isochrone / nearest-depot
    primitive grid_reach's unit-hop BFS can't express (a short
    two-hop detour beats a long direct edge here). Fixing k makes the
    semantics exact and terminating on ANY graph (cycles included):
    "cheapest within k hops" is itself the product spec on road-ish
    graphs, and both engines run the identical k relaxations — no
    convergence race, so the SQL twin needs no recursion.

    Integer-exact: BIGINT weights, cost sums bounded by k·max_w
    (caller-owned; µdeg² edge weights at k<=8 stay far under BIGINT).
    Seeds start at cost 0; a seed absent from the graph still reports
    itself at 0 (distance to the set is defined on the set).

    Scale: each round relaxes only the FRONTIER — the nodes whose
    cost changed last round (classic frontier Bellman-Ford / SPFA:
    a node whose cost didn't change cannot improve any neighbor it
    didn't already improve, so re-relaxing the settled set produces
    only join rows the MIN discards) — via ONE edge-keyed equi-join
    + ONE node-keyed MIN groupBy (map-side combinable) + ONE
    (node, cost) anti-join to extract the next frontier; per-round
    materialize() is the CC/grid_reach lineage-truncation lesson.
    Rounds are k regardless of graph size, and on isochrone-shaped
    workloads the frontier collapses to the expansion rim.
    -> (node, cost)."""
    from pyspark.sql import functions as F

    from ..materialize import materialize
    e = edges.select(F.col(a_col).alias("_a"),
                     F.col(b_col).alias("_b"),
                     F.col(w_col).alias("_w"))
    sym = e.unionByName(
        e.select(F.col("_b").alias("_a"), F.col("_a").alias("_b"),
                 "_w"))
    sym = materialize(sym)
    dist = materialize(
        seeds.select(F.col(seed_col).alias("_v"),
                     F.lit(0).cast("long").alias("_c")).distinct())
    frontier = dist
    for _ in range(int(k)):
        relax = (frontier.join(sym, frontier["_v"] == sym["_a"])
                 .select(F.col("_b").alias("_v"),
                         (F.col("_c") + F.col("_w")).alias("_c")))
        new = materialize(
            dist.unionByName(relax)
                .groupBy("_v").agg(F.min("_c").alias("_c")))
        # improved-or-new rows: their (node, cost) pair is absent
        # from the previous dist
        frontier = materialize(new.join(dist, ["_v", "_c"],
                                        "left_anti"))
        dist = new
    return dist.select(F.col("_v").alias("node"),
                       F.col("_c").alias("cost"))


def bounded_paths_sql(edges_sql: str, seeds_sql: str, k: int) -> str:
    """DuckDB twin of bounded_paths over subqueries producing
    (id_a, id_b, w) and (id) — k chained relax/min CTE stages,
    no recursion (identical round count to the Spark loop)."""
    stages = []
    for i in range(1, int(k) + 1):
        stages.append(
            f"d{i} AS (SELECT v, MIN(c) AS c FROM ("
            f"SELECT v, c FROM d{i - 1} "
            f"UNION ALL "
            f"SELECT e.id_b AS v, p.c + e.w AS c "
            f"FROM d{i - 1} p JOIN bp_e e ON e.id_a = p.v"
            f") GROUP BY v)")
    chain = ",\n".join(stages)
    chain = (chain + "\n") if chain else ""  # k=0: no stages
    comma = "," if stages else ""
    return f"""
WITH bp_raw AS (SELECT id_a, id_b, w FROM ({edges_sql})),
bp_e AS (SELECT id_a, id_b, w FROM bp_raw
         UNION ALL SELECT id_b, id_a, w FROM bp_raw),
d0 AS (SELECT DISTINCT id AS v, CAST(0 AS BIGINT) AS c
       FROM ({seeds_sql})){comma}
{chain}SELECT v AS node, CAST(c AS BIGINT) AS cost FROM d{int(k)}
"""


def kcore_peel(edges, k: int, rounds: int, *, a_col: str = "id_a",
               b_col: str = "id_b"):
    """Bounded k-core peeling — ``rounds`` synchronous rounds of
    "drop every node with degree < k, then drop edges touching a
    dropped node" over an undirected simple graph: the standard
    dense-subgraph / spam-farm / core-community primitive. Fixing
    the round count (like bounded_paths fixes the hop count) makes
    the semantics exact and engine-identical with NO recursion: the
    SQL twin chains the same ``rounds`` degree-filter stages, so
    there is no convergence race to ulp- or order-flip. Peeling is
    monotone (node sets only shrink), so once a round is a no-op
    every later round is too — callers wanting the true k-core pick
    rounds >= the peel depth (small in practice: each round strictly
    shrinks the graph or finishes) and can verify convergence by
    comparing rounds and rounds+1 outputs.

    Degree = number of distinct neighbors: input edges are dedup'd
    and self-loops dropped before round 1, mirrored to a symmetric
    representation so one groupBy(src) IS the degree.

    Scale: per round ONE map-side-combinable degree agg + ONE
    node-filter join per endpoint (the survivor set is node-sized,
    broadcast when small, shuffle otherwise — Spark's planner picks);
    per-round materialize() truncates lineage exactly like
    bounded_paths / connected components. -> (node, deg) of the
    surviving subgraph (nodes isolated by the final edge filter
    simply emit no row)."""
    from pyspark.sql import functions as F

    from ..materialize import materialize
    e = edges.select(F.col(a_col).alias("_a"),
                     F.col(b_col).alias("_b"))
    e = e.filter(F.col("_a") != F.col("_b"))
    sym = (e.unionByName(e.select(F.col("_b").alias("_a"),
                                  F.col("_a").alias("_b")))
           .distinct())
    cur = materialize(sym)
    for _ in range(int(rounds)):
        keep = (cur.groupBy("_a").agg(F.count(F.lit(1)).alias("_d"))
                .filter(F.col("_d") >= int(k))
                .select(F.col("_a").alias("_v")))
        cur = materialize(
            cur.join(keep.withColumnRenamed("_v", "_a"), "_a")
               .join(keep.withColumnRenamed("_v", "_b"), "_b")
               .select("_a", "_b"))
    return (cur.groupBy("_a").agg(F.count(F.lit(1)).alias("deg"))
            .select(F.col("_a").alias("node"), "deg"))


def kcore_peel_sql(edges_sql: str, k: int, rounds: int) -> str:
    """DuckDB twin of kcore_peel over a subquery producing
    (id_a, id_b) — the same fixed chain of degree-filter stages,
    no recursion."""
    stages = []
    for i in range(1, int(rounds) + 1):
        stages.append(
            f"n{i} AS (SELECT a AS v FROM e{i - 1} "
            f"GROUP BY a HAVING COUNT(*) >= {int(k)}),\n"
            f"e{i} AS (SELECT e.a, e.b FROM e{i - 1} e "
            f"JOIN n{i} x ON e.a = x.v "
            f"JOIN n{i} y ON e.b = y.v)")
    chain = ",\n".join(stages)
    chain = (chain + "\n") if chain else ""  # rounds=0: no stages
    comma = "," if stages else ""
    return f"""
WITH kc_raw AS (SELECT id_a, id_b FROM ({edges_sql})
                WHERE id_a <> id_b),
e0 AS (SELECT DISTINCT a, b FROM (
       SELECT id_a AS a, id_b AS b FROM kc_raw
       UNION ALL SELECT id_b, id_a FROM kc_raw)){comma}
{chain}SELECT a AS node, COUNT(*) AS deg
FROM e{int(rounds)} GROUP BY a
"""


def link_pred(edges, k: int, *, a_col: str = "id_a",
              b_col: str = "id_b"):
    """Common-neighbor link prediction with exact Jaccard scoring —
    the classic 'which edges are MISSING' primitive (friend/near-dup
    suggestion, crawl-frontier prioritization over the host graph):
    for every NON-adjacent unordered pair (u, v) sharing at least
    one neighbor, cn = |N(u) & N(v)|, jac_ppm = floor-ppm of
    cn / (deg_u + deg_v - cn)  (u is not its own neighbor, so the
    union needs no -2 correction), global top-``k`` by
    (jac_ppm DESC, cn DESC, id_a, id_b) — a total order over unique
    pairs, so the cut is deterministic in both engines.

    Scale: candidates come from a wedge self-join of the DIRECTED
    adjacency on the shared-neighbor key — |wedges| = sum deg(w)^2
    over hub nodes, the standard triangle-counting cost envelope,
    never |V|^2; the adjacency is repartitioned one-partition-per-
    core on the wedge key first (the join is CPU-bound and
    byte-tiny — AQE's byte-based coalescing would collapse it to
    1-2 tasks otherwise), the existing-edge check is one anti-join
    on the candidate aggregate, and the top-k is
    TakeOrderedAndProject (never a global sort). Production contract
    at web scale: cap hub degree upstream (drop w with deg(w) >
    ~10^4) — the standard LSH-style frequency guard, same as
    ngram_pairs' max_df. -> (id_a, id_b, cn, deg_a, deg_b,
    jac_ppm)."""
    from pyspark.sql import functions as F
    p = edges.sparkSession.sparkContext.defaultParallelism
    e = edges.select(F.col(a_col).alias("_a"),
                     F.col(b_col).alias("_b")).distinct()
    adj = (e.unionByName(e.select(F.col("_b").alias("_a"),
                                  F.col("_a").alias("_b")))
           .repartition(p, "_b"))
    deg = adj.groupBy("_a").agg(F.count(F.lit(1)).alias("_deg"))
    l, r = adj.alias("l"), adj.alias("r")
    cand = (l.join(r, (F.col("l._b") == F.col("r._b"))
                   & (F.col("l._a") < F.col("r._a")))
            .groupBy(F.col("l._a").alias("_u"),
                     F.col("r._a").alias("_v"))
            .agg(F.count(F.lit(1)).alias("cn")))
    miss = cand.join(
        e.select(F.col("_a").alias("_u"), F.col("_b").alias("_v")),
        ["_u", "_v"], "left_anti")
    scored = (miss
              .join(deg.select(F.col("_a").alias("_u"),
                               F.col("_deg").alias("deg_a")), "_u")
              .join(deg.select(F.col("_a").alias("_v"),
                               F.col("_deg").alias("deg_b")), "_v")
              .select(F.col("_u").alias("id_a"),
                      F.col("_v").alias("id_b"),
                      "cn", "deg_a", "deg_b",
                      F.expr("(1000000 * cn) div "
                             "(deg_a + deg_b - cn)")
                      .alias("jac_ppm")))
    return (scored.orderBy(F.desc("jac_ppm"), F.desc("cn"),
                           "id_a", "id_b")
            .limit(int(k)))


def link_pred_sql(edges_sql: str, k: int) -> str:
    """DuckDB twin of link_pred over a subquery producing
    (id_a, id_b) — same wedge join over the symmetrized adjacency,
    same floor-ppm Jaccard (both operands non-negative, so // and
    div agree), same total order."""
    return f"""
WITH lp_raw AS (SELECT DISTINCT id_a, id_b FROM ({edges_sql})),
adj AS (SELECT id_a AS a, id_b AS b FROM lp_raw
        UNION ALL SELECT id_b, id_a FROM lp_raw),
deg AS (SELECT a, COUNT(*) AS d FROM adj GROUP BY 1),
cand AS (SELECT l.a AS u, r.a AS v, COUNT(*) AS cn
         FROM adj l JOIN adj r ON l.b = r.b AND l.a < r.a
         GROUP BY 1, 2),
miss AS (SELECT u, v, cn FROM cand
         WHERE NOT EXISTS (SELECT 1 FROM lp_raw
                           WHERE id_a = u AND id_b = v))
SELECT u AS id_a, v AS id_b, CAST(cn AS BIGINT) AS cn,
       CAST(du.d AS BIGINT) AS deg_a, CAST(dv.d AS BIGINT) AS deg_b,
       (1000000 * CAST(cn AS BIGINT)) // (du.d + dv.d - cn)
           AS jac_ppm
FROM miss JOIN deg du ON miss.u = du.a
          JOIN deg dv ON miss.v = dv.a
ORDER BY jac_ppm DESC, cn DESC, id_a, id_b
LIMIT {int(k)}
"""


def degree_assort(edges, *, a_col: str = "id_a",
                  b_col: str = "id_b"):
    """Global degree assortativity — 'do hubs attach to hubs'
    (Newman 2002), as the Pearson correlation of endpoint degrees
    over the DIRECTED adjacency (each undirected edge contributes
    both orientations, the standard symmetrization). Positive on
    social/contact graphs, negative on web/hub-and-spoke graphs —
    the one-number structural fingerprint under graph-based
    curation. Square roots would break integer exactness, so the
    output is SIGNED r-squared in ppm (the spearman_rho trick):

        num = n*S_xy - S_x*S_y,  d_x = n*S_xx - S_x^2,
        d_y = n*S_yy - S_y^2  (x, y = endpoint degrees),
        assort_ppm = sign(num) * (1e6 * num^2) div (d_x * d_y)

    with DECIMAL(38,0)/HUGEINT products; d = 0 (regular graph) or
    n < 2 -> NULL. By symmetry S_x = S_y and d_x = d_y — computed
    separately anyway so the twin stays mechanical.

    Scale: one degree agg, two broadcast-sized degree joins back
    onto the edge stream, one combinable global agg — no window, no
    self-join; exact to |num| ~ 3e15 (the spearman_rho envelope),
    past which degrees should be log-bucketed upstream.
    -> one row (n_dir_edges, assort_ppm)."""
    from pyspark.sql import functions as F
    e = edges.select(F.col(a_col).alias("_a"),
                     F.col(b_col).alias("_b")).distinct()
    adj = e.unionByName(e.select(F.col("_b").alias("_a"),
                                 F.col("_a").alias("_b")))
    deg = adj.groupBy("_a").agg(F.count(F.lit(1)).alias("_d"))
    dec = "CAST(_dx AS DECIMAL(38,0))"
    j = (adj
         .join(deg.select(F.col("_a"), F.col("_d").alias("_dx")),
               "_a")
         .join(deg.select(F.col("_a").alias("_b"),
                          F.col("_d").alias("_dy")), "_b"))
    agg = j.agg(F.count(F.lit(1)).alias("_n"),
                F.sum(F.expr(f"{dec}")).alias("_sx"),
                F.sum(F.expr("CAST(_dy AS DECIMAL(38,0))"))
                .alias("_sy"),
                F.sum(F.expr(f"{dec} * _dy")).alias("_sxy"),
                F.sum(F.expr(f"{dec} * _dx")).alias("_sxx"),
                F.sum(F.expr("CAST(_dy AS DECIMAL(38,0)) * _dy"))
                .alias("_syy"))
    return (agg
            .withColumn("_num", F.expr("_n * _sxy - _sx * _sy"))
            .withColumn("_ddx", F.expr("_n * _sxx - _sx * _sx"))
            .withColumn("_ddy", F.expr("_n * _syy - _sy * _sy"))
            .select(F.col("_n").cast("long").alias("n_dir_edges"),
                    F.expr("CASE WHEN _n < 2 OR _ddx = 0 OR _ddy = 0 "
                           "THEN CAST(NULL AS BIGINT) ELSE CAST("
                           "CASE WHEN _num >= 0 THEN 1 ELSE -1 END "
                           "* ((1000000 * _num * _num) "
                           "div (_ddx * _ddy)) AS BIGINT) END")
                    .alias("assort_ppm")))


def degree_assort_sql(edges_sql: str) -> str:
    """DuckDB twin of degree_assort over a subquery producing
    (id_a, id_b) — same symmetrization, same HUGEINT Pearson
    identity, sign-decomposed truncating division."""
    return f"""
WITH da_raw AS (SELECT DISTINCT id_a, id_b FROM ({edges_sql})),
adj AS (SELECT id_a AS a, id_b AS b FROM da_raw
        UNION ALL SELECT id_b, id_a FROM da_raw),
deg AS (SELECT a, COUNT(*) AS d FROM adj GROUP BY 1),
j AS (SELECT CAST(du.d AS HUGEINT) AS dx,
             CAST(dv.d AS HUGEINT) AS dy
      FROM adj JOIN deg du ON adj.a = du.a
               JOIN deg dv ON adj.b = dv.a),
agg AS (SELECT COUNT(*) AS n, SUM(dx) AS sx, SUM(dy) AS sy,
        SUM(dx * dy) AS sxy, SUM(dx * dx) AS sxx,
        SUM(dy * dy) AS syy FROM j),
fin AS (SELECT n, n * sxy - sx * sy AS num,
        n * sxx - sx * sx AS ddx, n * syy - sy * sy AS ddy
        FROM agg)
SELECT CAST(n AS BIGINT) AS n_dir_edges,
       CAST(CASE WHEN n < 2 OR ddx = 0 OR ddy = 0 THEN NULL
            ELSE (CASE WHEN num >= 0 THEN 1 ELSE -1 END)
                 * ((1000000 * num * num) // (ddx * ddy))
            END AS BIGINT) AS assort_ppm
FROM fin
"""


# ---------------------------------------------------------------------------
# HITS hubs & authorities (r5.44)
# ---------------------------------------------------------------------------

def hits(edges, nodes, *, iters: int = 4, src_col: str = "src",
         dst_col: str = "dst", id_col: str = "doc_id"):
    """Integer-exact HITS (Kleinberg 1999) over a directed link
    graph: hub and authority scores as ppm of the per-iteration
    maximum — the query-independent link signal that separates
    DIRECTORY pages (hubs: point at many good authorities) from
    CONTENT pages (authorities: pointed at by many good hubs), the
    complement to pagerank's single random-surfer score.

    The float algorithm L2-normalizes each half-step; sqrt is not
    integer-exact, so this normalizes by the MAXIMUM instead (scores
    in [0, 1e6], the top node pinned at exactly 1_000_000) — rank
    order and ratio structure are what downstream curation consumes,
    and max-normalization preserves both while keeping every value a
    BIGINT floor ratio, bit-identical on any engine / partitioning:

        a_raw(v) = SUM over u->v of h(u);  a = a_raw * 1e6 div max(a_raw)
        h_raw(u) = SUM over u->v of a(v);  h = h_raw * 1e6 div max(h_raw)

    from h_0 = 1e6 at every node, ``iters`` full (authority, hub)
    rounds. Raw sums ride DECIMAL(38,0) (in-degree * 1e12 overflows
    BIGINT on web-scale hub pages). A graph with no edges yields all
    zeros (max = 0 guard), isolated nodes stay 0 from round 1.

    Scale: per round, TWO edge-keyed equi-joins + TWO map-side-
    combinable groupBy sums + a broadcast 1-row max join; per-round
    materialize() truncates the lineage (the pagerank/CC lesson).
    ``nodes`` is the full node universe (id), kept so unreferenced
    pages report 0 rather than vanishing. -> (id, auth_ppm, hub_ppm).
    """
    from pyspark.sql import functions as F

    e = materialize(edges.select(F.col(src_col).alias("_u"),
                                 F.col(dst_col).alias("_v")).distinct())
    n = nodes.select(F.col(id_col).alias("_id"))
    h = n.select("_id", F.lit(10**6).cast("decimal(38,0)").alias("_h"))

    def _half(scores, score_col, join_key, group_key):
        raw = (e.join(scores, e[join_key] == scores["_id"])
               .groupBy(group_key)
               .agg(F.sum(score_col).alias("_raw")))
        full = (n.join(raw, n["_id"] == raw[group_key], "left")
                .select("_id", F.coalesce("_raw", F.lit(0))
                        .cast("decimal(38,0)").alias("_raw")))
        mx = full.agg(F.max("_raw").alias("_mx"))
        out = (full.crossJoin(F.broadcast(mx))
               .select("_id", F.expr(
                   "CASE WHEN _mx = 0 THEN CAST(0 AS DECIMAL(38,0)) "
                   "ELSE (_raw * 1000000) div _mx END").alias("_s")))
        return materialize(out)

    a = None
    for _ in range(iters):
        a = _half(h.select("_id", F.col("_h").alias("_s")), "_s",
                  "_u", "_v").select("_id", F.col("_s").alias("_a"))
        h = _half(a.select("_id", F.col("_a").alias("_s")), "_s",
                  "_v", "_u").select("_id", F.col("_s").alias("_h"))
    return (a.join(h, "_id")
            .select(F.col("_id").alias(id_col),
                    F.col("_a").cast("long").alias("auth_ppm"),
                    F.col("_h").cast("long").alias("hub_ppm")))


def hits_sql(edges_sql: str, nodes_sql: str, *, iters: int = 4,
             id_col: str = "doc_id") -> str:
    """DuckDB twin of hits: the same max-normalized recurrence
    unrolled one CTE pair per iteration (generated here, so the
    arithmetic exists once). HUGEINT sums; every value nonnegative,
    so floor division needs no sign decomposition."""
    ctes = [f"ht_e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
            f"ht_n AS ({nodes_sql})",
            "h0 AS (SELECT id, CAST(1000000 AS HUGEINT) AS s FROM ht_n)"]

    def half(out, prev, join_key, group_key):
        ctes.append(
            f"{out}_r AS (SELECT n.id, "
            f"CAST(COALESCE(x.s, 0) AS HUGEINT) AS raw FROM ht_n n "
            f"LEFT JOIN (SELECT e.{group_key} AS v, SUM(p.s) AS s "
            f"FROM ht_e e JOIN {prev} p ON e.{join_key} = p.id "
            f"GROUP BY 1) x ON n.id = x.v)")
        ctes.append(
            f"{out} AS (SELECT id, CASE WHEN m.mx = 0 THEN 0 "
            f"ELSE raw * 1000000 // m.mx END AS s FROM {out}_r, "
            f"(SELECT MAX(raw) AS mx FROM {out}_r) m)")

    prev = "h0"
    for i in range(iters):
        half(f"a{i + 1}", prev, "src", "dst")
        half(f"h{i + 1}", f"a{i + 1}", "dst", "src")
        prev = f"h{i + 1}"
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT a.id AS {id_col}, "
            f"CAST(a.s AS BIGINT) AS auth_ppm, "
            f"CAST(h.s AS BIGINT) AS hub_ppm "
            f"FROM a{iters} a JOIN h{iters} h USING (id)")


def harmonic2(edges, *, a_col: str = "id_a", b_col: str = "id_b"):
    """Bounded-hop harmonic centrality — the node-importance reach
    score over an undirected graph, truncated at radius 2 where the
    all-pairs sum is still tractable distributedly:

        harm_x2 = 2 * n1 + n2     (sum of 2/d, d in {1, 2} — the
                                   lcm-2 scaling keeps it BIGINT,
                                   no fractions)

    with n1 the degree and n2 the count of distinct nodes exactly
    two hops away (reachable via a neighbor, not a neighbor, not
    self). Unlike degree alone, harm_x2 separates a hub inside a
    clique (n2 ~ 0) from a broker bridging neighborhoods (n2 large)
    — the same distinction betweenness draws, at equi-join cost
    instead of all-pairs paths. Truncation is the 100 TB design
    point: radius-2 is one self-join of the edge frame; each extra
    hop multiplies by the average degree, so deeper reach belongs to
    the iterative grid_reach/bounded_paths tier.

    Scale: symmetrize (one union), ONE (mid)-keyed self-join for the
    wedge frame, a distinct on (src, dst2), an anti-join against the
    edge set, and two combinable counts — all node-/edge-keyed, no
    global funnel. -> (id, n1, n2, harm_x2)."""
    from pyspark.sql import functions as F

    sym = (edges.select(F.col(a_col).alias("s"),
                        F.col(b_col).alias("d"))
           .unionByName(edges.select(F.col(b_col).alias("s"),
                                     F.col(a_col).alias("d")))
           .distinct())
    deg = sym.groupBy("s").agg(F.count(F.lit(1)).alias("n1"))
    wedge = (sym.alias("x").join(
        sym.alias("y"), F.col("x.d") == F.col("y.s"))
        .filter(F.col("x.s") != F.col("y.d"))
        .select(F.col("x.s").alias("s"), F.col("y.d").alias("d2"))
        .distinct())
    two = (wedge.join(sym.withColumnRenamed("d", "d2"),
                      ["s", "d2"], "left_anti")
           .groupBy("s").agg(F.count(F.lit(1)).alias("n2")))
    return (deg.join(two, "s", "left").fillna(0, subset=["n2"])
            .select(F.col("s").alias("id"),
                    F.col("n1").cast("long"),
                    F.col("n2").cast("long"),
                    F.expr("2 * n1 + n2").cast("long")
                    .alias("harm_x2")))


def harmonic2_sql(edges_sql: str) -> str:
    """DuckDB twin of harmonic2 over a subquery producing
    (id_a, id_b) — same symmetrize/wedge/anti-join text."""
    return f"""
WITH h2_e AS (SELECT id_a AS s, id_b AS d FROM ({edges_sql})
              UNION SELECT id_b, id_a FROM ({edges_sql})),
h2_d AS (SELECT s, COUNT(*) AS n1 FROM h2_e GROUP BY 1),
h2_w AS (SELECT DISTINCT x.s, y.d AS d2
         FROM h2_e x JOIN h2_e y ON x.d = y.s
         WHERE x.s <> y.d),
h2_t AS (SELECT w.s, COUNT(*) AS n2 FROM h2_w w
         LEFT JOIN h2_e e ON w.s = e.s AND w.d2 = e.d
         WHERE e.s IS NULL GROUP BY 1)
SELECT d.s AS id, CAST(d.n1 AS BIGINT) AS n1,
       CAST(COALESCE(t.n2, 0) AS BIGINT) AS n2,
       CAST(2 * d.n1 + COALESCE(t.n2, 0) AS BIGINT) AS harm_x2
FROM h2_d d LEFT JOIN h2_t t ON d.s = t.s
"""
