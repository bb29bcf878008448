"""Cross-engine-EXACT probabilistic sketches: HyperLogLog,
count-min, Bloom.

Sketches are THE 10^12-row operator family: a distinct count, a
heavy-hitter table or a membership filter whose state is O(1) per
group instead of O(cardinality), mergeable under partial aggregation
so the shuffle carries fixed-size summaries no matter how hot a key
gets. Spark ships engine-private versions (approx_count_distinct's
HLL++, runtime Bloom row-filters) that can never be oracle-gated —
their register layout is an implementation detail. The sketches here
are the opposite: every hash is the repo's shared 60-bit md5 prefix
(operators/dedup._hash64_col convention), every register update is
integer MAX/SUM/BIT_OR, and every estimator is floor arithmetic over
literal constant tables — so a DuckDB twin reproduces the sketch
BIT-FOR-BIT and the driver's value-hash gate certifies not just "an
estimate" but the exact estimate. Each operator returns the sketch
estimate NEXT TO the exact answer with a signed error in ppm: the
audit shape a pipeline runs at small SF to size a sketch before
trusting it at 10^12 rows (where the exact column is dropped and
only the O(1)-state side remains).

Estimator constants (ALPHA_PPM, the ln(m/V) linear-counting table)
follow Flajolet/Fusy/Gandouet/Meunier 2007 and Heule/Nunkesser/Hall
2013 (HLL++ small-range switch at 5m/2); count-min follows
Cormode/Muthukrishnan 2005; the Bloom layout is the classic k-hash
bit array in 32-bit words (31-bit masks so BIGINT stays positive on
both engines).

Relation to the reference: geoarrow-c-geos is a buffer-level
encode/decode kernel with no aggregate tier (geoarrow_geos.h:1-176
has no aggregate entry points); this module is part of the mandated
large-scale-pipeline surface built on top of the same columns.
"""

from __future__ import annotations

import math

# --------------------------------------------------------------------------
# HyperLogLog (p=6: 64 registers, ~13% rsd — the audit query reports
# the realized error, which is the point)
# --------------------------------------------------------------------------

P_HLL = 6
M_HLL = 1 << P_HLL            # 64 registers
SUFFIX_BITS = 60 - P_HLL      # rho source bits (60-bit md5-prefix hash)
RHO_CAP = SUFFIX_BITS + 1     # all-zero suffix -> rho = 55
K_HLL = 56                    # fixed-point exponent: 2^(K-rho) stays >= 2
ALPHA_PPM = 709_000           # alpha_64 (Flajolet et al. 2007, fig. 3)
LC_THRESHOLD = 5 * M_HLL // 2  # HLL++ small-range switch (= 160)
_POW2K = 1 << K_HLL


def _hash64_spark(expr: str) -> str:
    """Spark-SQL text of the shared 60-bit md5-prefix hash (the
    dedup._hash64_col convention as a string, for generated exprs)."""
    return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def _hash64_duck(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def _rho_case(w_expr: str) -> str:
    """Engine-agnostic CASE computing rho = 1 + trailing zeros of the
    54-bit register suffix (the first set bit's 1-based position;
    zero suffix -> RHO_CAP). Flat generated chain — both engines
    evaluate CASE arms in order, and 54 integer AND-tests stay inside
    whole-stage codegen."""
    arms = " ".join(
        f"WHEN (({w_expr}) & {1 << b}) <> 0 THEN {b + 1}"
        for b in range(SUFFIX_BITS))
    return f"(CASE WHEN ({w_expr}) = 0 THEN {RHO_CAP} {arms} END)"


def _ln_ppm_case(v_expr: str) -> str:
    """Linear-counting table: round(ln(m/V) * 1e6) for V = 1..m as a
    generated literal CASE — the SAME literals on both engines, so
    the small-range estimate is integer-exact cross-engine (a live
    ln() would be libm-dependent)."""
    arms = " ".join(
        f"WHEN ({v_expr}) = {v} THEN {round(math.log(M_HLL / v) * 1e6)}"
        for v in range(1, M_HLL + 1))
    return f"(CASE {arms} END)"


def _hll_est_exprs(idiv: str, dec: str):
    """The estimator as engine-parameterized SQL text over columns
    (occ, s_occ): ``idiv`` is the floor-division token ('div'/'//'),
    ``dec`` the wide-integer cast template. Returns (v, s, est)."""
    v = f"({M_HLL} - occ)"
    s = f"(s_occ + ({M_HLL} - occ) * {_POW2K})"
    raw = (f"CAST(({dec.format(ALPHA_PPM)} * {M_HLL * M_HLL} "
           f"* {_POW2K}) {idiv} ({dec.format(1_000_000)} * {s}) "
           f"AS BIGINT)")
    est = (f"(CASE WHEN {v} > 0 AND {raw} <= {LC_THRESHOLD} "
           f"THEN ({M_HLL} * {_ln_ppm_case(v)}) {idiv} 1000000 "
           f"ELSE {raw} END)")
    return v, s, est


def _err_ppm(idiv: str, dec: str, est: str, exact: str) -> str:
    """Signed relative error in ppm, sign-decomposed so Spark's
    truncating ``div`` and DuckDB's flooring ``//`` agree on
    negatives; wide-integer numerator for headroom."""
    d = f"(({est}) - ({exact}))"
    mag = f"(CASE WHEN {d} >= 0 THEN {d} ELSE -{d} END)"
    return (f"(CASE WHEN {d} >= 0 THEN 1 ELSE -1 END) * "
            f"CAST({dec.format(mag)} * 1000000 "
            f"{idiv} ({exact}) AS BIGINT)")


def hll_distinct(df, key_col: str, group_col: str = "cell"):
    """Per-group HyperLogLog distinct-count audit: the from-scratch
    engine-exact HLL estimate next to the exact distinct count.

    Pipeline (all JVM exprs, no Python): one distinct on
    (group, key) — reused by BOTH the exact count and the register
    build, duplicates cannot change a register MAX — then
    groupBy(group, bucket) MAX(rho), then one group-keyed agg folding
    the 64 registers into the harmonic fixed-point sum
    S = sum_j 2^(K - M_j) (absent registers contribute 2^K via the
    occupancy count). Estimate = alpha*m^2*2^K // (1e6*S), switched
    to table-lookup linear counting below 5m/2 (HLL++).

    Scale: every stage is a combinable agg; at 10^12 rows the
    production form drops the exact column and the shuffle carries
    <= 64 (group, bucket, rho) rows per group per map task — the
    whole point of the sketch. Exactness: md5-prefix hash, integer
    MAX/SUM, literal constant tables -> the DuckDB twin hash-matches
    every output row. -> (group, n_exact, n_hll, err_ppm)."""
    from pyspark.sql import functions as F
    dec = "CAST({} AS DECIMAL(38,0))"
    d = df.select(F.col(group_col).alias("_g"),
                  F.col(key_col).cast("string").alias("_k")).distinct()
    h = d.select("_g", F.expr(_hash64_spark("_k")).alias("_h"))
    b = h.select("_g", F.expr(f"_h % {M_HLL}").alias("_bucket"),
                 F.expr(_rho_case(f"(_h div {M_HLL})")).alias("_rho"))
    regs = b.groupBy("_g", "_bucket").agg(F.max("_rho").alias("_m"))
    agg = regs.groupBy("_g").agg(
        F.count(F.lit(1)).alias("occ"),
        F.sum(F.expr(f"CAST(1 AS BIGINT) << ({K_HLL} - _m)"))
        .alias("s_occ"))
    ex = d.groupBy("_g").agg(F.count(F.lit(1)).alias("n_exact"))
    _, _, est = _hll_est_exprs("div", dec)
    out = (agg.join(ex, "_g")
           .withColumn("n_hll", F.expr(est))
           .withColumn("err_ppm", F.expr(
               _err_ppm("div", dec, "n_hll", "n_exact"))))
    return out.select(F.col("_g").alias(group_col), "n_exact",
                      "n_hll", F.col("err_ppm").cast("long")
                      .alias("err_ppm"))


def hll_distinct_sql(points_sql: str, key: str = "k",
                     group: str = "g",
                     group_out: str = "cell") -> str:
    """DuckDB twin over a subquery producing ({group}, {key}) — the
    identical hash, register fold and estimator in HUGEINT."""
    dec = "CAST({} AS HUGEINT)"
    _, _, est = _hll_est_exprs("//", dec)
    return f"""
WITH hd_base AS ({points_sql}),
hd_d AS (SELECT DISTINCT {group} AS g,
                CAST({key} AS VARCHAR) AS k FROM hd_base),
hd_h AS (SELECT g, {_hash64_duck('k')} AS h FROM hd_d),
hd_b AS (SELECT g, h % {M_HLL} AS bucket,
                {_rho_case(f'(h // {M_HLL})')} AS rho FROM hd_h),
hd_regs AS (SELECT g, bucket, MAX(rho) AS m FROM hd_b GROUP BY 1, 2),
hd_agg AS (SELECT g, COUNT(*) AS occ,
                  SUM(CAST(1 AS BIGINT) << ({K_HLL} - m)) AS s_occ
           FROM hd_regs GROUP BY 1),
hd_ex AS (SELECT g, COUNT(*) AS n_exact FROM hd_d GROUP BY 1),
hd_est AS (SELECT hd_agg.g, n_exact, {est} AS n_hll
           FROM hd_agg JOIN hd_ex USING (g))
SELECT g AS {group_out}, CAST(n_exact AS BIGINT) AS n_exact,
       CAST(n_hll AS BIGINT) AS n_hll,
       CAST({_err_ppm("//", dec, "n_hll", "n_exact")} AS BIGINT)
       AS err_ppm
FROM hd_est
"""


# --------------------------------------------------------------------------
# Count-min heavy hitters
# --------------------------------------------------------------------------

CM_D = 4        # hash rows
CM_W = 512      # counters per row; sketch = 2048 BIGINTs total


def _squote(i: int, term_expr: str) -> str:  # shared salt layout
    return f"'cm{i}|' || {term_expr}"


def cms_topk(df, k: int = 20, *, text_col: str = "text"):
    """Count-min heavy-hitter audit over the corpus token stream:
    CM_D x CM_W integer counter table (point updates = groupBy SUM,
    so the whole sketch build is one combinable agg over the exploded
    token stream), probed for the top-``k`` tokens by exact count.
    est = MIN over the D rows (Cormode/Muthukrishnan 2005) — an upper
    bound on the true count, so over_ppm >= 0 always.

    Scale: the sketch is 2048 counters regardless of vocabulary —
    the shuffle after partial aggregation is D*W rows per map task,
    vs a full vocab-keyed exchange for the exact path. The probe
    joins the (tiny, broadcast) counter table D times via one
    explode. -> (term, n_exact, n_cms, over_ppm) — top k by exact
    count desc, term asc."""
    from pyspark.sql import functions as F

    from .textstats import TOKEN_RX
    toks = df.select(F.explode(F.expr(
        f"regexp_extract_all(lower({text_col}), '{TOKEN_RX}', 0)"))
        .alias("term"))
    rows = toks.select(F.explode(F.array(*[
        F.struct(F.lit(i).alias("i"),
                 F.expr(f"({_hash64_spark(_squote(i, 'term'))})"
                        f" % {CM_W}").alias("bucket"))
        for i in range(CM_D)])).alias("_r")).select("_r.i", "_r.bucket")
    sketch = rows.groupBy("i", "bucket").agg(
        F.count(F.lit(1)).alias("c"))
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n_exact"))
    probe = exact.select("term", "n_exact", F.explode(F.array(*[
        F.struct(F.lit(i).alias("i"),
                 F.expr(f"({_hash64_spark(_squote(i, 'term'))})"
                        f" % {CM_W}").alias("bucket"))
        for i in range(CM_D)])).alias("_p")).select(
        "term", "n_exact", "_p.i", "_p.bucket")
    est = (probe.join(F.broadcast(sketch), ["i", "bucket"])
           .groupBy("term", "n_exact")
           .agg(F.min("c").alias("n_cms")))
    over = F.expr("CAST((n_cms - n_exact) * 1000000 div n_exact "
                  "AS BIGINT)")
    return (est.withColumn("over_ppm", over)
            .orderBy(F.col("n_exact").desc(), F.col("term").asc())
            .limit(k))


def cms_topk_sql(k: int = 20, table: str = "documents") -> str:
    """DuckDB twin: same salts, same counter fold, same MIN probe."""
    from .textstats import TOKEN_RX
    buckets = ", ".join(
        f"({_hash64_duck(_squote(i, 'term'))}) % {CM_W} AS b{i}"
        for i in range(CM_D))
    probe_rows = " UNION ALL ".join(
        f"SELECT term, n_exact, {i} AS i, b{i} AS bucket FROM keyed"
        for i in range(CM_D))
    sketch_rows = " UNION ALL ".join(
        f"SELECT {i} AS i, ({_hash64_duck(_squote(i, 'term'))})"
        f" % {CM_W} AS bucket FROM toks"
        for i in range(CM_D))
    return f"""
WITH toks AS (SELECT unnest(regexp_extract_all(lower(text),
                   '{TOKEN_RX}')) AS term FROM {table}),
sketch AS (SELECT i, bucket, COUNT(*) AS c
           FROM ({sketch_rows}) GROUP BY 1, 2),
exact AS (SELECT term, COUNT(*) AS n_exact FROM toks GROUP BY 1),
keyed AS (SELECT term, n_exact, {buckets} FROM exact),
est AS (SELECT term, n_exact, MIN(c) AS n_cms
        FROM ({probe_rows}) p JOIN sketch USING (i, bucket)
        GROUP BY 1, 2)
SELECT term, CAST(n_exact AS BIGINT) AS n_exact,
       CAST(n_cms AS BIGINT) AS n_cms,
       CAST((n_cms - n_exact) * 1000000 // n_exact AS BIGINT)
       AS over_ppm
FROM est
ORDER BY n_exact DESC, term ASC
LIMIT {int(k)}
"""


# --------------------------------------------------------------------------
# Bloom-filter membership audit
# --------------------------------------------------------------------------

BLOOM_K = 3            # hash probes per key
BLOOM_BITS = 1 << 17   # 131072 bits
BLOOM_WORD = 31        # bits per word: masks stay positive BIGINTs
BLOOM_WORDS = -(-BLOOM_BITS // BLOOM_WORD)


def bloom_probe(build, probe, *, build_col: str, probe_col: str):
    """Bloom-filter semi-join audit: build a k-hash bit array over
    the (distinct) build keys, probe a second key stream through it,
    and report the realized false-positive rate against exact
    membership — the sizing run behind Spark's own runtime-filter
    pattern, but engine-exact and oracle-gateable.

    Layout: bit position pos_j(x) = hash64('bl{{j}}|' || x) %
    BLOOM_BITS, stored as BIGINT words of 31 bits (masks stay
    positive, so no engine-specific sign-extension semantics can
    leak in). Build = explode keys x K -> groupBy(word) BIT_OR(mask):
    one combinable agg producing <= {BLOOM_WORDS} rows, broadcast to
    the probe side. A probe key passes iff all K probed bits are set
    (SUM(hit) = K over a left join — a missing word row is a miss).

    Scale: the filter is ~{BLOOM_WORDS} rows no matter how large the
    build side — THE distributed-join prefilter: ship the bit array,
    not the key set, and let non-members die before the shuffle.
    -> one audit row (n_build, n_probe, n_pass, n_true_pos,
    n_false_pos, fp_ppm) where fp_ppm is false positives per million
    NON-members probed (NULL if every probe key is a member)."""
    from pyspark.sql import functions as F
    bk = build.select(F.col(build_col).cast("string")
                      .alias("_k")).distinct()
    pk = probe.select(F.col(probe_col).cast("string")
                      .alias("_k")).distinct()

    def pos(j, expr):
        return (f"({_hash64_spark(_bsalt(j, expr))})"
                f" % {BLOOM_BITS}")

    bits = bk.select(F.explode(F.array(*[
        F.expr(pos(j, "_k")) for j in range(BLOOM_K)])).alias("_pos"))
    filt = (bits.select(
        F.expr(f"_pos div {BLOOM_WORD}").alias("_word"),
        F.expr(f"CAST(1 AS BIGINT) << (_pos % {BLOOM_WORD})")
        .alias("_m"))
        .groupBy("_word").agg(F.bit_or("_m").alias("_bits")))
    pr = pk.select("_k", F.explode(F.array(*[
        F.expr(pos(j, "_k")) for j in range(BLOOM_K)])).alias("_pos"))
    pr = pr.select("_k", F.expr(f"_pos div {BLOOM_WORD}").alias("_word"),
                   F.expr(f"CAST(1 AS BIGINT) << "
                          f"(_pos % {BLOOM_WORD})").alias("_m"))
    hit = (pr.join(F.broadcast(filt), "_word", "left")
           .select("_k", F.expr(
               "CASE WHEN _bits IS NOT NULL AND (_bits & _m) <> 0 "
               "THEN 1 ELSE 0 END").alias("_hit")))
    passed = (hit.groupBy("_k")
              .agg(F.sum("_hit").alias("_nh"))
              .select("_k", (F.col("_nh") == BLOOM_K).cast("int")
                      .alias("_pass")))
    truth = passed.join(
        bk.withColumn("_true", F.lit(1)), "_k", "left").select(
        "_pass", F.coalesce("_true", F.lit(0)).alias("_true"))
    nb = bk.agg(F.count(F.lit(1)).alias("n_build"))
    agg = truth.agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum("_pass").alias("n_pass"),
        F.sum(F.expr("_pass * _true")).alias("n_true_pos"),
        F.sum(F.expr("_pass * (1 - _true)")).alias("n_false_pos"),
        F.sum(F.expr("1 - _true")).alias("_n_non"))
    return (agg.crossJoin(F.broadcast(nb))
            .select("n_build", "n_probe", "n_pass", "n_true_pos",
                    "n_false_pos",
                    F.expr("CASE WHEN _n_non = 0 THEN NULL ELSE "
                           "CAST(n_false_pos * 1000000 div _n_non "
                           "AS BIGINT) END").alias("fp_ppm")))


def _bsalt(j: int, expr: str) -> str:
    return f"'bl{j}|' || {expr}"


def bloom_probe_sql(build_sql: str, probe_sql: str) -> str:
    """DuckDB twin over subqueries each producing one column ``k``."""
    def pos(j):
        return f"({_hash64_duck(_bsalt(j, 'k'))}) % {BLOOM_BITS}"

    b_pos = " UNION ALL ".join(
        f"SELECT {pos(j)} AS pos FROM bk" for j in range(BLOOM_K))
    p_pos = " UNION ALL ".join(
        f"SELECT k, {pos(j)} AS pos FROM pk" for j in range(BLOOM_K))
    return f"""
WITH bk AS (SELECT DISTINCT CAST(k AS VARCHAR) AS k
            FROM ({build_sql})),
pk AS (SELECT DISTINCT CAST(k AS VARCHAR) AS k FROM ({probe_sql})),
filt AS (SELECT pos // {BLOOM_WORD} AS word,
                BIT_OR(CAST(1 AS BIGINT) << (pos % {BLOOM_WORD}))
                AS bits
         FROM ({b_pos}) GROUP BY 1),
pr AS (SELECT k, pos // {BLOOM_WORD} AS word,
              CAST(1 AS BIGINT) << (pos % {BLOOM_WORD}) AS m
       FROM ({p_pos})),
hit AS (SELECT pr.k, CASE WHEN filt.bits IS NOT NULL
               AND (filt.bits & pr.m) <> 0 THEN 1 ELSE 0 END AS h
        FROM pr LEFT JOIN filt USING (word)),
passed AS (SELECT k,
           CASE WHEN SUM(h) = {BLOOM_K} THEN 1 ELSE 0 END AS pass
           FROM hit GROUP BY 1),
truth AS (SELECT pass, CASE WHEN bk.k IS NOT NULL THEN 1 ELSE 0 END
          AS istrue FROM passed LEFT JOIN bk ON passed.k = bk.k),
agg AS (SELECT COUNT(*) AS n_probe, SUM(pass) AS n_pass,
        SUM(pass * istrue) AS n_true_pos,
        SUM(pass * (1 - istrue)) AS n_false_pos,
        SUM(1 - istrue) AS n_non FROM truth)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM bk) AS n_build,
       CAST(n_probe AS BIGINT) AS n_probe,
       CAST(n_pass AS BIGINT) AS n_pass,
       CAST(n_true_pos AS BIGINT) AS n_true_pos,
       CAST(n_false_pos AS BIGINT) AS n_false_pos,
       CASE WHEN n_non = 0 THEN NULL ELSE
            CAST(n_false_pos * 1000000 // n_non AS BIGINT) END
       AS fp_ppm
FROM agg
"""


# --------------------------------------------------------------------------
# KMV (bottom-k / theta) distinct sketch
# --------------------------------------------------------------------------

KMV_K = 64                    # sketch size: k minimum hash values
KMV_DOMAIN = 1 << 60          # md5-prefix hash domain [0, 2^60)


def kmv_distinct(df, key_col: str, group_col: str, *, k: int = KMV_K):
    """Per-group KMV (bottom-k / theta-sketch) distinct-count audit —
    the third distinct-count shape next to hll_distinct: where HLL
    folds into 64 fixed registers, KMV keeps the ``k`` SMALLEST
    distinct hash values and estimates

        n_kmv = (k - 1) * D  div  theta          (Bar-Yossef et al.
                                                  2002; theta-sketch
                                                  bottom-k form)

    where theta is the k-th smallest hash and D = 2^60 the domain of
    the repo's shared md5-prefix hash. Groups with fewer than ``k``
    distinct keys report exactly (the sketch IS the distinct set).
    The extra '_ALL_' row is the UNION sketch over every group —
    bottom-k of a union equals bottom-k of the merged bottom-k's, the
    mergeability that makes KMV a partial-aggregate at cluster scale
    (and, unlike HLL, KMV supports intersection estimates downstream).
    (k-1) * 2^60 overflows BIGINT, so the product and the floor
    division run in DECIMAL(38,0) / HUGEINT; theta > 0 always (it is
    an md5 value of a kept row). err_ppm is the signed realized error
    vs the exact distinct count — the audit column a pipeline uses at
    small SF to size k, then drops at 10^12 rows.

    Scale: ONE distinct shuffle on (group, hash) feeds both sides;
    the rank window runs on that already-deduped frame and is
    group-keyed (no single funnel); at full scale the window is
    replaced by the two-level min-k partial agg the mergeability
    property licenses — the shuffle then carries k values per group
    per map task, O(1) in row count. -> (group, n_exact, theta,
    n_kmv, err_ppm)."""
    from pyspark.sql import functions as F

    h = F.expr(_hash64_spark(key_col))
    base = (df.select(F.col(group_col).alias("_g"), h.alias("_h"))
            .filter(F.col("_h").isNotNull()).distinct())
    u = base.unionByName(
        base.select(F.lit("_ALL_").alias("_g"), "_h").distinct())
    r = u.withColumn("_rn", F.expr(
        "row_number() OVER (PARTITION BY _g ORDER BY _h ASC)"))
    agg = r.groupBy("_g").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.max(F.when(F.col("_rn") <= k, F.col("_h"))).alias("theta"))
    est = (f"CASE WHEN n_exact <= {int(k)} THEN n_exact ELSE "
           f"CAST((CAST({int(k) - 1} AS DECIMAL(38,0)) * "
           f"{KMV_DOMAIN}) div theta AS BIGINT) END")
    out = agg.select(
        F.col("_g").alias(group_col),
        F.col("n_exact").cast("long"),
        F.col("theta").cast("long"),
        F.expr(est).cast("long").alias("n_kmv"))
    return out.withColumn("err_ppm", F.expr(_err_ppm(
        "div", "CAST({} AS DECIMAL(38,0))", "n_kmv", "n_exact"))
        .cast("long"))


def kmv_distinct_sql(rows_sql: str, *, key: str = "k",
                     group: str = "g", k: int = KMV_K) -> str:
    """DuckDB twin of kmv_distinct over a subquery producing
    (group, key) — same hash, same rank, same HUGEINT floor."""
    est = (f"CASE WHEN n_exact <= {int(k)} THEN n_exact ELSE "
           f"CAST((CAST({int(k) - 1} AS HUGEINT) * {KMV_DOMAIN}) "
           f"// theta AS BIGINT) END")
    d = "(n_kmv - n_exact)"
    mag = f"(CASE WHEN {d} >= 0 THEN {d} ELSE -{d} END)"
    err = (f"(CASE WHEN {d} >= 0 THEN 1 ELSE -1 END) * "
           f"CAST(CAST({mag} AS HUGEINT) * 1000000 "
           f"// n_exact AS BIGINT)")
    return f"""
WITH kmv_b AS (SELECT DISTINCT {group} AS g,
                      ({_hash64_duck(key)}) AS h
               FROM ({rows_sql})
               WHERE ({_hash64_duck(key)}) IS NOT NULL),
kmv_u AS (SELECT g, h FROM kmv_b
          UNION ALL SELECT DISTINCT '_ALL_' AS g, h FROM kmv_b),
kmv_r AS (SELECT g, h,
          ROW_NUMBER() OVER (PARTITION BY g ORDER BY h ASC) AS rn
          FROM kmv_u),
kmv_a AS (SELECT g, COUNT(*) AS n_exact,
          MAX(CASE WHEN rn <= {int(k)} THEN h END) AS theta
          FROM kmv_r GROUP BY 1),
kmv_e AS (SELECT g, n_exact, theta, {est} AS n_kmv FROM kmv_a)
SELECT g AS {group}, CAST(n_exact AS BIGINT) AS n_exact,
       CAST(theta AS BIGINT) AS theta,
       CAST(n_kmv AS BIGINT) AS n_kmv,
       {err} AS err_ppm
FROM kmv_e
"""


def kmv_overlap(df, key_col: str, group_col: str, *, k: int = KMV_K):
    """Pairwise audience-overlap audit from merged KMV sketches —
    the capability that justified bottom-k over HLL registers in
    kmv_distinct: for every unordered group pair, the union sketch
    is the bottom-k of the two kept sets (exact mergeability, no
    rescan), the intersection estimate is inclusion-exclusion
    clamped at 0,

        inter_kmv = greatest(0, est_a + est_b - est_union),

    and both the estimated and the EXACT Jaccard land side by side
    in ppm — the audit that sizes k before pairwise-overlap queries
    run at 10^12 rows where the exact columns are unaffordable
    (cross-source contamination checks, audience-dedup planning).
    Estimators and floors are kmv_distinct's to the letter
    (DECIMAL(38,0)/HUGEINT, (k-1)*2^60 div theta, exhaustive-sketch
    groups report exactly).

    Scale: ONE (group, hash) distinct shuffle; the exact
    intersection is a hash-keyed self-join of that frame (the only
    pair-order-data-sized step — dropped at production with the
    other exact columns); every sketch-side step runs on kept rows,
    <= k per group. -> (g_a, g_b, n_a, n_b, inter_exact, inter_kmv,
    jacc_ppm, jacc_kmv_ppm)."""
    from pyspark.sql import functions as F

    h = F.expr(_hash64_spark(key_col))
    base = (df.select(F.col(group_col).alias("_g"), h.alias("_h"))
            .filter(F.col("_h").isNotNull()).distinct())
    kept = (base.withColumn("_rn", F.expr(
        "row_number() OVER (PARTITION BY _g ORDER BY _h ASC)"))
        .filter(F.col("_rn") <= k).select("_g", "_h"))
    est = (f"CASE WHEN n <= {int(k)} THEN n ELSE "
           f"CAST((CAST({int(k) - 1} AS DECIMAL(38,0)) * "
           f"{KMV_DOMAIN}) div theta AS BIGINT) END")
    # the merged frame keeps AT MOST k rows, so its count saturates
    # at k and only a STRICTLY smaller count proves exhaustion
    est_u = est.replace(f"n <= {int(k)}", f"n < {int(k)}")
    per = (base.groupBy("_g")
           .agg(F.count(F.lit(1)).alias("n"))
           .join(kept.groupBy("_g").agg(F.max("_h").alias("theta")),
                 "_g")
           .withColumn("_e", F.expr(est)))
    # exact intersection: hash-keyed self-join of the distinct frame
    ix = (base.alias("a").join(
        base.alias("b"),
        (F.col("a._h") == F.col("b._h"))
        & (F.col("a._g") < F.col("b._g")))
        .groupBy(F.col("a._g").alias("g_a"),
                 F.col("b._g").alias("g_b"))
        .agg(F.count(F.lit(1)).alias("inter_exact")))
    # union sketch per pair: bottom-k of the two kept sets
    pairs = (per.alias("pa").join(
        per.alias("pb"), F.col("pa._g") < F.col("pb._g"))
        .select(F.col("pa._g").alias("g_a"),
                F.col("pb._g").alias("g_b"),
                F.col("pa.n").alias("n_a"), F.col("pb.n").alias("n_b"),
                F.col("pa._e").alias("e_a"),
                F.col("pb._e").alias("e_b")))
    merged = (pairs.select("g_a", "g_b")
              .join(kept.alias("ka"), F.col("g_a") == F.col("ka._g"))
              .select("g_a", "g_b", "_h")
              .unionByName(
                  pairs.select("g_a", "g_b")
                  .join(kept.alias("kb"),
                        F.col("g_b") == F.col("kb._g"))
                  .select("g_a", "g_b", "_h"))
              .distinct()
              .withColumn("_rn", F.expr(
                  "row_number() OVER (PARTITION BY g_a, g_b "
                  "ORDER BY _h ASC)"))
              .filter(F.col("_rn") <= k)
              .groupBy("g_a", "g_b")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.max("_h").alias("theta"))
              .withColumn("e_u", F.expr(est_u))
              .select("g_a", "g_b", "e_u"))
    out = (pairs.join(merged, ["g_a", "g_b"])
           .join(ix, ["g_a", "g_b"], "left")
           .fillna(0, subset=["inter_exact"])
           .withColumn("inter_kmv", F.expr(
               "greatest(CAST(0 AS BIGINT), e_a + e_b - e_u)")))
    return out.select(
        "g_a", "g_b", F.col("n_a").cast("long"),
        F.col("n_b").cast("long"),
        F.col("inter_exact").cast("long"),
        F.col("inter_kmv").cast("long"),
        F.expr("(inter_exact * 1000000) div "
               "(n_a + n_b - inter_exact)").cast("long")
        .alias("jacc_ppm"),
        F.expr("CASE WHEN e_a + e_b - inter_kmv = 0 THEN 0 ELSE "
               "(inter_kmv * 1000000) div (e_a + e_b - inter_kmv) "
               "END").cast("long").alias("jacc_kmv_ppm"))


def kmv_overlap_sql(rows_sql: str, *, key: str = "k",
                    group: str = "g", k: int = KMV_K) -> str:
    """DuckDB twin of kmv_overlap — same hash, same kept sets, same
    inclusion-exclusion clamp and floors."""
    est = (f"CASE WHEN n <= {int(k)} THEN n ELSE "
           f"CAST((CAST({int(k) - 1} AS HUGEINT) * {KMV_DOMAIN}) "
           f"// theta AS BIGINT) END")
    est_u = est.replace(f"n <= {int(k)}", f"n < {int(k)}")
    return f"""
WITH ko_b AS (SELECT DISTINCT {group} AS g,
                     ({_hash64_duck(key)}) AS h
              FROM ({rows_sql})
              WHERE ({_hash64_duck(key)}) IS NOT NULL),
ko_k AS (SELECT g, h FROM (
           SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g
                        ORDER BY h ASC) AS rn FROM ko_b)
         WHERE rn <= {int(k)}),
ko_p AS (SELECT b.g, COUNT(*) AS n, MAX(kk.theta) AS theta
         FROM ko_b b JOIN (SELECT g, MAX(h) AS theta FROM ko_k
                           GROUP BY 1) kk ON b.g = kk.g
         GROUP BY 1),
ko_e AS (SELECT g, n, {est} AS e FROM ko_p),
ko_x AS (SELECT a.g AS g_a, b.g AS g_b, COUNT(*) AS inter_exact
         FROM ko_b a JOIN ko_b b
         ON a.h = b.h AND a.g < b.g GROUP BY 1, 2),
ko_pr AS (SELECT pa.g AS g_a, pb.g AS g_b, pa.n AS n_a,
          pb.n AS n_b, pa.e AS e_a, pb.e AS e_b
          FROM ko_e pa JOIN ko_e pb ON pa.g < pb.g),
ko_mh AS (SELECT DISTINCT p.g_a, p.g_b, kk.h
          FROM ko_pr p JOIN ko_k kk
          ON kk.g = p.g_a OR kk.g = p.g_b),
ko_mr AS (SELECT g_a, g_b, h,
          ROW_NUMBER() OVER (PARTITION BY g_a, g_b
                             ORDER BY h ASC) AS rn
          FROM ko_mh),
ko_mu AS (SELECT g_a, g_b, COUNT(*) AS n, MAX(h) AS theta
          FROM ko_mr WHERE rn <= {int(k)} GROUP BY 1, 2),
ko_eu AS (SELECT g_a, g_b, {est_u} AS e_u FROM ko_mu),
ko_f AS (SELECT pr.g_a, pr.g_b, pr.n_a, pr.n_b,
         COALESCE(x.inter_exact, 0) AS inter_exact,
         greatest(CAST(0 AS BIGINT), pr.e_a + pr.e_b - eu.e_u)
           AS inter_kmv,
         pr.e_a, pr.e_b
         FROM ko_pr pr
         JOIN ko_eu eu ON pr.g_a = eu.g_a AND pr.g_b = eu.g_b
         LEFT JOIN ko_x x ON pr.g_a = x.g_a AND pr.g_b = x.g_b)
SELECT g_a, g_b, CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       CAST(inter_exact AS BIGINT) AS inter_exact,
       CAST(inter_kmv AS BIGINT) AS inter_kmv,
       CAST((inter_exact * 1000000)
            // (n_a + n_b - inter_exact) AS BIGINT) AS jacc_ppm,
       CAST(CASE WHEN e_a + e_b - inter_kmv = 0 THEN 0 ELSE
            (inter_kmv * 1000000) // (e_a + e_b - inter_kmv)
            END AS BIGINT) AS jacc_kmv_ppm
FROM ko_f
"""


# --------------------------------------------------------------------------
# Exponential-histogram quantile sketch
# --------------------------------------------------------------------------

QHIST_QS = (50, 90, 99)


def qhist_quantiles(df, val_col: str, group_col: str,
                    *, qs=QHIST_QS):
    """Per-group quantile-sketch audit — the quantile member of the
    engine-exact sketch family (HLL/KMV/CMS/Bloom count things; this
    bounds ORDER statistics in O(64) state): positive values fold
    into power-of-two buckets by bit length, the sketch answers
    quantile q with the CEILING of the owning bucket (2^b - 1, a
    guaranteed upper bound at <= 2x relative error), and the exact
    type-1 quantile sits beside it with the realized signed error —
    the audit that decides whether 64 counters suffice before a
    10^12-row percentile dashboard drops the exact path. Everything
    is integer: bucket = bit_length (a CASE chain, no log), rank
    cutoff k = ceil(q*n/100) via (q*n + 99) div 100, est = the
    smallest bucket whose cumulative count reaches k.

    Scale: the sketch build is ONE (group, bucket) combinable
    groupBy — 64 counters per group regardless of distribution; the
    exact side is a group-keyed rank window (dropped at production).
    -> (group, q, n, exact_q, est_q, err_ppm)."""
    from pyspark.sql import functions as F

    from ..functions.cells import _blen_case
    qs = tuple(int(q) for q in qs)
    d = (df.select(F.col(group_col).alias("_g"),
                   F.col(val_col).cast("long").alias("_v"))
         .filter(F.col("_v") > 0))
    qrows = ", ".join(str(q) for q in qs)
    # exact side: rank window, value at position k (ties share a
    # value, so the picked VALUE is deterministic)
    r = (d.withColumn("_rn", F.expr(
            "row_number() OVER (PARTITION BY _g ORDER BY _v)"))
         .withColumn("_n", F.expr(
            "count(*) OVER (PARTITION BY _g)")))
    ex = (r.select("_g", "_v", "_rn", "_n",
                   F.explode(F.expr(f"array({qrows})")).alias("q"))
          .filter(F.expr("_rn = (q * _n + 99) div 100"))
          .select(F.col("_g"), F.col("q").cast("long"),
                  F.col("_n").cast("long").alias("n"),
                  F.col("_v").alias("exact_q")))
    hist = (d.withColumn("_b", F.expr(_blen_case("_v", 63)))
            .groupBy("_g", "_b").agg(F.count(F.lit(1)).alias("_c"))
            .withColumn("_cum", F.expr(
                "sum(_c) OVER (PARTITION BY _g ORDER BY _b)"))
            .withColumn("_n", F.expr(
                "sum(_c) OVER (PARTITION BY _g)")))
    est = (hist.select("_g", "_b", "_cum", "_n",
                       F.explode(F.expr(f"array({qrows})"))
                       .alias("q"))
           .filter(F.expr("_cum >= (q * _n + 99) div 100"))
           .groupBy("_g", "q").agg(F.min("_b").alias("_eb"))
           .select("_g", F.col("q").cast("long"),
                   F.expr("shiftleft(CAST(1 AS BIGINT), "
                          "CAST(_eb AS INT)) - 1").alias("est_q")))
    out = ex.join(est, ["_g", "q"])
    return (out.withColumn("err_ppm", F.expr(_err_ppm(
        "div", "CAST({} AS DECIMAL(38,0))", "est_q", "exact_q"))
        .cast("long"))
        .select(F.col("_g").alias(group_col), "q", "n",
                "exact_q", "est_q", "err_ppm"))


def qhist_quantiles_sql(rows_sql: str, *, val: str = "v",
                        group: str = "g", qs=QHIST_QS) -> str:
    """DuckDB twin of qhist_quantiles — same CASE-chain bit length,
    same ceiling cutoffs, same floors."""
    from ..functions.cells import _blen_case
    qs = tuple(int(q) for q in qs)
    qrows = ", ".join(str(q) for q in qs)
    d = "(est_q - exact_q)"
    mag = f"(CASE WHEN {d} >= 0 THEN {d} ELSE -{d} END)"
    err = (f"(CASE WHEN {d} >= 0 THEN 1 ELSE -1 END) * "
           f"CAST(CAST({mag} AS HUGEINT) * 1000000 "
           f"// exact_q AS BIGINT)")
    return f"""
WITH qh_d AS (SELECT {group} AS g, CAST({val} AS BIGINT) AS v
              FROM ({rows_sql}) WHERE {val} > 0),
qh_r AS (SELECT g, v,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY g) AS n FROM qh_d),
qh_q AS (SELECT unnest([{qrows}]) AS q),
qh_e AS (SELECT g, CAST(q AS BIGINT) AS q, CAST(n AS BIGINT) AS n,
         v AS exact_q
         FROM qh_r, qh_q WHERE rn = (q * n + 99) // 100),
qh_h AS (SELECT g, {_blen_case('v', 63)} AS b, COUNT(*) AS c
         FROM qh_d GROUP BY 1, 2),
qh_c AS (SELECT g, b,
         SUM(c) OVER (PARTITION BY g ORDER BY b) AS cum,
         SUM(c) OVER (PARTITION BY g) AS n FROM qh_h),
qh_s AS (SELECT g, CAST(q AS BIGINT) AS q,
         (CAST(1 AS BIGINT) << CAST(MIN(b) AS INTEGER)) - 1
           AS est_q
         FROM qh_c, qh_q WHERE cum >= (q * n + 99) // 100
         GROUP BY 1, 2)
SELECT e.g AS {group}, e.q, e.n, e.exact_q, s.est_q, {err} AS err_ppm
FROM qh_e e JOIN qh_s s ON e.g = s.g AND e.q = s.q
"""
