"""Similarity search over embedding columns (array<float>).

Two tiers per the mandate:
  * brute-force cosine top-k — the exact baseline (queries.q_ann_topk);
  * LSH-bucketed variants — the scale path: sign-bit bucketing turns the
    O(n^2) similarity join into an equi-join on bucket id, the same
    rewrite shape as the spatial cell join (bucket == cell).

All expressions are Spark built-ins (zip_with/aggregate fold — the fold
order is sequential, matching the DuckDB twin's list_dot_product, so
rounded similarities agree cross-engine).
"""

from __future__ import annotations


def _emb_double(col):
    from pyspark.sql import functions as F
    return F.transform(col, lambda x: x.cast("double"))


def cosine_col(a, b):
    """Column expr: cosine similarity of two array<double> columns."""
    from pyspark.sql import functions as F
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                      lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0),
                            lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0),
                            lambda acc, x: acc + x))
    return dot / (na * nb)


def sign_bucket_col(emb, n_bits: int):
    """Axis-aligned sign-LSH bucket: bit i = (emb[i] > 0). The simplest
    member of the hyperplane family — deterministic, SQL-reproducible,
    and adequate for bucketing roughly isotropic embeddings."""
    from pyspark.sql import functions as F
    out = F.lit(0).cast("long")
    for i in range(n_bits):
        out = out + F.when(F.element_at(emb, i + 1) > 0,
                           F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return out


def sign_bucket_sql(emb_expr: str, n_bits: int) -> str:
    terms = [f"CASE WHEN {emb_expr}[{i + 1}] > 0 THEN "
             f"CAST({1 << i} AS BIGINT) ELSE 0 END"
             for i in range(n_bits)]
    return "(" + " + ".join(terms) + ")"


def lsh_near_dup(emb_df, *, id_col: str = "vec_id",
                 emb_col: str = "embedding", n_bits: int = 8,
                 threshold: float = 0.9):
    """Embedding near-dup pairs: same sign bucket + cosine >= threshold.
    -> (vec_a, vec_b, sim rounded 6)."""
    from pyspark.sql import functions as F
    e = emb_df.select(F.col(id_col),
                      _emb_double(F.col(emb_col)).alias("v"))
    e = e.withColumn("bkt", sign_bucket_col(F.col("v"), n_bits))
    a = e.select(F.col(id_col).alias("vec_a"), F.col("v").alias("va"),
                 "bkt")
    b = e.select(F.col(id_col).alias("vec_b"), F.col("v").alias("vb"),
                 "bkt")
    sim = F.round(cosine_col(F.col("va"), F.col("vb")), 6)
    return (a.join(b, "bkt").filter(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b", sim.alias("sim"))
            .filter(F.col("sim") >= threshold))


def lsh_near_dup_sql(n_bits: int = 8, threshold: float = 0.9,
                     table: str = "embeddings") -> str:
    bkt = sign_bucket_sql("CAST(embedding AS DOUBLE[])", n_bits)
    cos = ("list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v))"
           " * sqrt(list_dot_product(b.v, b.v)))")
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, {bkt} AS bkt
  FROM {table}
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, ROUND({cos}, 6) AS sim
FROM e a JOIN e b ON a.bkt = b.bkt
WHERE a.vec_id < b.vec_id AND ROUND({cos}, 6) >= {threshold}
"""


def sign_bucket_col_offset(emb, n_bits: int, offset: int):
    """Sign bucket over dims [offset, offset + n_bits)."""
    from pyspark.sql import functions as F
    out = F.lit(0).cast("long")
    for i in range(n_bits):
        out = out + F.when(F.element_at(emb, offset + i + 1) > 0,
                           F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return out


def sign_bucket_sql_offset(emb_expr: str, n_bits: int, offset: int) -> str:
    terms = [f"CASE WHEN {emb_expr}[{offset + i + 1}] > 0 THEN "
             f"CAST({1 << i} AS BIGINT) ELSE 0 END"
             for i in range(n_bits)]
    return "(" + " + ".join(terms) + ")"


def lsh_ann_topk(emb_df, query_vec, k: int = 10, *,
                 id_col: str = "vec_id", emb_col: str = "embedding",
                 n_bits: int = 6, n_tables: int = 4):
    """Approximate top-k: standard multi-table LSH — candidates are the
    union over ``n_tables`` independent sign-bucket tables (table t uses
    dims [t*n_bits, (t+1)*n_bits)), ranked by exact cosine. Recall vs
    the brute-force baseline is measured in tests: high on genuinely
    correlated (near-dup) data, necessarily modest on isotropic noise —
    the candidate fraction is ~1-(1-2^-b)^L by construction."""
    import numpy as np
    from pyspark.sql import functions as F
    qv = [float(x) for x in query_vec]
    qlit = F.array(*[F.lit(v) for v in qv])
    qn = float(np.sqrt(sum(v * v for v in qv)))
    e = emb_df.select(F.col(id_col),
                      _emb_double(F.col(emb_col)).alias("v"))
    cond = None
    for t in range(n_tables):
        off = t * n_bits
        qb = 0
        for i in range(n_bits):
            if qv[off + i] > 0:
                qb |= 1 << i
        c = (sign_bucket_col_offset(F.col("v"), n_bits, off)
             == F.lit(qb))
        cond = c if cond is None else (cond | c)
    e = e.filter(cond)
    dot = F.aggregate(F.zip_with(F.col("v"), qlit, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    nv = F.sqrt(F.aggregate(F.transform(F.col("v"), lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    sim = F.round(dot / (nv * F.lit(qn)), 6)
    return (e.select(id_col, sim.alias("sim"))
            .orderBy(F.col("sim").desc(), F.col(id_col).asc())
            .limit(k))


def lsh_ann_topk_sql(k: int = 10, n_bits: int = 6, n_tables: int = 4,
                     table: str = "embeddings") -> str:
    qv = ("(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings "
          "WHERE vec_id = 0)")
    conds = []
    for t in range(n_tables):
        off = t * n_bits
        conds.append(
            f"({sign_bucket_sql_offset('CAST(embedding AS DOUBLE[])', n_bits, off)}"
            f" = {sign_bucket_sql_offset(qv, n_bits, off)})")
    where = " OR ".join(conds)
    cos = ("list_dot_product(CAST(embedding AS DOUBLE[]), "
           "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings "
           "WHERE vec_id = 0)) / "
           "(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), "
           "CAST(embedding AS DOUBLE[]))) * "
           "sqrt(list_dot_product((SELECT CAST(embedding AS DOUBLE[]) "
           "FROM embeddings WHERE vec_id = 0), "
           "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings "
           "WHERE vec_id = 0))))")
    return (f"SELECT vec_id, ROUND({cos}, 6) AS sim FROM {table} "
            f"WHERE {where} "
            f"ORDER BY sim DESC, vec_id ASC LIMIT {k}")
