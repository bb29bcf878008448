"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All pure built-in column expressions (regexp/md5/array lambdas) with
exact DuckDB twins — zero UDFs, so the whole layer rides whole-stage
codegen and pushes through Catalyst untouched.
"""

from __future__ import annotations

TOKEN_RX = "[a-z0-9]+"

# tiny per-language stopword profiles (n-gram heuristic tier; at real
# scale these would be the top-100 lists — the operator shape is the same)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "is", "in"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht"],
    "es": ["el", "la", "de", "y", "es", "que", "los"],
    "fr": ["le", "la", "et", "les", "des", "un", "est"],
}
LANG_ORDER = ["en", "de", "es", "fr"]  # deterministic tiebreak order


def words_col(text_col: str):
    from pyspark.sql import functions as F
    return F.regexp_extract_all(F.lower(F.col(text_col)),
                                F.lit(TOKEN_RX), 0)


def lang_scores(text_col: str):
    """dict lang -> Column of stopword hit counts."""
    from pyspark.sql import functions as F
    w = words_col(text_col)
    out = {}
    for lang in LANG_ORDER:
        sw = STOPWORDS[lang]
        out[lang] = F.size(F.filter(w, lambda x: x.isin(*sw)))
    return out


def lang_guess(df, text_col: str = "text", id_col: str = "doc_id"):
    """-> (id, lang_guess). argmax of stopword hits, 'und' (undetermined)
    when no profile hits; ties resolved by LANG_ORDER."""
    from pyspark.sql import functions as F
    sc = lang_scores(text_col)
    # build the CASE chain reversed so earlier langs win ties
    expr = F.lit("und")
    mx = F.greatest(*[sc[lg] for lg in LANG_ORDER], F.lit(1))
    for lang in reversed(LANG_ORDER):
        expr = F.when(sc[lang] >= mx, F.lit(lang)).otherwise(expr)
    return df.select(F.col(id_col), expr.alias("lang_guess"))


def lang_guess_sql(table: str = "documents") -> str:
    score = {}
    for lang in LANG_ORDER:
        lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        score[lang] = (f"len(list_filter(regexp_extract_all(lower(text), "
                       f"'{TOKEN_RX}'), x -> x IN ({lst})))")
    mx = f"greatest({', '.join(score[lg] for lg in LANG_ORDER)}, 1)"
    expr = "'und'"
    for lang in reversed(LANG_ORDER):
        expr = (f"CASE WHEN {score[lang]} >= {mx} THEN '{lang}' "
                f"ELSE {expr} END")
    return f"SELECT doc_id, {expr} AS lang_guess FROM {table}"


def quality_features(df, text_col: str = "text", id_col: str = "doc_id"):
    """-> (id, n_chars, n_tokens, mean_token_len, punct_ratio,
    stop_ratio, quality) — length/punct/stopword-ratio scoring, all
    rational arithmetic (cross-engine exact) rounded at the boundary."""
    from pyspark.sql import functions as F
    w = words_col(text_col)
    n_chars = F.length(text_col).cast("double")
    n_tokens = F.size(w).cast("double")
    alpha_chars = F.length(F.regexp_replace(
        F.lower(F.col(text_col)), "[^a-z0-9]", "")).cast("double")
    sw = STOPWORDS["en"]
    n_stop = F.size(F.filter(w, lambda x: x.isin(*sw))).cast("double")
    mean_tok = F.round(alpha_chars / F.greatest(n_tokens, F.lit(1.0)), 6)
    punct = F.round((n_chars - alpha_chars)
                    / F.greatest(n_chars, F.lit(1.0)), 6)
    stopr = F.round(n_stop / F.greatest(n_tokens, F.lit(1.0)), 6)
    quality = F.round(
        (n_tokens / (n_chars + 1.0))
        * (F.lit(1.0) - (n_chars - alpha_chars)
           / F.greatest(n_chars, F.lit(1.0))), 8)
    return df.select(
        F.col(id_col), n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        mean_tok.alias("mean_token_len"), punct.alias("punct_ratio"),
        stopr.alias("stop_ratio"), quality.alias("quality"))


def quality_features_sql(table: str = "documents") -> str:
    w = f"regexp_extract_all(lower(text), '{TOKEN_RX}')"
    sw = ", ".join(f"'{x}'" for x in STOPWORDS["en"])
    return f"""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len({w}) AS BIGINT) AS n_tokens,
  ROUND(CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
        AS DOUBLE) / greatest(CAST(len({w}) AS DOUBLE), 1.0), 6)
    AS mean_token_len,
  ROUND((CAST(length(text) AS DOUBLE)
         - CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
                AS DOUBLE))
        / greatest(CAST(length(text) AS DOUBLE), 1.0), 6) AS punct_ratio,
  ROUND(CAST(len(list_filter({w}, x -> x IN ({sw}))) AS DOUBLE)
        / greatest(CAST(len({w}) AS DOUBLE), 1.0), 6) AS stop_ratio,
  ROUND((CAST(len({w}) AS DOUBLE) / (CAST(length(text) AS DOUBLE) + 1.0))
        * (1.0 - (CAST(length(text) AS DOUBLE)
                  - CAST(length(regexp_replace(lower(text), '[^a-z0-9]',
                         '', 'g')) AS DOUBLE))
                 / greatest(CAST(length(text) AS DOUBLE), 1.0)), 8)
    AS quality
FROM {table}
"""


def rolling_fingerprint(df, text_col: str = "text",
                        id_col: str = "doc_id", window: int = 16):
    """Winnowing-style document fingerprint: min hash64 over the
    rolling set of ``window``-char substrings of the normalized text —
    robust to small edits (unlike whole-text md5), cheap, built-in only.
    -> (id, fp long)."""
    from pyspark.sql import functions as F
    norm = f"regexp_replace(lower({text_col}), '[^a-z0-9]+', ' ')"
    grams = (f"transform(sequence(1, greatest(length({norm}) "
             f"- {window - 1}, 1)), i -> substring({norm}, i, {window}))")
    h = (f"array_min(transform({grams}, s -> "
         f"CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)))")
    return df.select(F.col(id_col), F.expr(h).alias("fp"))


def rolling_fingerprint_sql(window: int = 16,
                            table: str = "documents") -> str:
    norm = "regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')"
    return f"""
SELECT doc_id,
  list_min(list_transform(generate_series(1,
      greatest(length({norm}) - {window - 1}, 1)),
      i -> CAST(('0x' || substr(md5(substring({norm}, i, {window})),
                 1, 15)) AS BIGINT))) AS fp
FROM {table}
"""


def top_terms(df, k: int = 3, *, text_col: str = "text",
              id_col: str = "doc_id"):
    """Per-document top-``k`` distinguishing terms: rank by term
    frequency in the doc (desc), then corpus document frequency (asc —
    rarer wins), then the term itself — an INTEGER-EXACT tf-idf
    surrogate (classic tf*ln(N/df) ranks identically for fixed tf
    ties broken by df, but ln() is engine-libm-dependent and would
    risk last-ulp rank flips under the cross-engine hash gate).
    -> (doc_id, term, rank).

    Scale: tf agg shuffles (doc, term) once; df is a term-keyed agg of
    the DISTINCT (doc, term) pairs riding the same exploded data
    (map-side combine on both); the df side joins back term-keyed.
    At web scale cap the explode with a length guard upstream."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    w = words_col(text_col)
    tok = df.select(F.col(id_col), F.explode(w).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"))
    win = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc())
    return (tf.join(dfreq, "term")
            .withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k)
            .select(id_col, "term", F.col("rank").cast("int")
                    .alias("rank")))


def top_terms_sql(k: int = 3, table: str = "documents") -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text),
         '{TOKEN_RX}')) AS term FROM {table}),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1)
SELECT doc_id, term, CAST(rank AS INTEGER) AS rank FROM (
  SELECT tf.doc_id, tf.term,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
             ORDER BY tf.tf DESC, dfreq.df ASC, tf.term ASC) AS rank
  FROM tf JOIN dfreq USING (term))
WHERE rank <= {k}
"""


def repetition_stats(df, *, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Gopher-style intra-document repetition features (Rae et al.
    2021 §A1.1 shape): LLM corpora drop documents whose content is
    dominated by repeated lines/n-grams. Per doc, over the same
    lowercase token stream as top_terms:

      n_words / n_distinct_words / dup_word_frac — token repetition;
      top_word_frac — most-frequent-token mass (boilerplate tell);
      n_trigrams / n_distinct_trigrams / dup_trigram_frac — repeated
      3-gram mass (the "duplicate n-gram fraction" filter).

    All counts integer-exact; the fractions are single double
    divisions of exact integers (bit-identical cross-engine — no libm
    in any column). -> one row per doc.

    Scale: one (doc, token) agg and one (doc, trigram) agg, both with
    map-side combine; the trigram stream rides a lead() window over
    the exploded tokens (one doc-keyed shuffle). Never collects; at
    web scale cap the explode with an upstream length guard like
    top_terms."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    words = df.select(
        F.col(id_col),
        F.posexplode(words_col(text_col)).alias("_pos", "_w"))
    wstats = (words.groupBy(id_col, "_w")
              .agg(F.count(F.lit(1)).alias("_c"))
              .groupBy(id_col)
              .agg(F.sum("_c").alias("n_words"),
                   F.count(F.lit(1)).alias("n_distinct_words"),
                   F.max("_c").alias("_top_n")))
    win = Window.partitionBy(id_col).orderBy("_pos")
    tri = (words
           .withColumn("_w2", F.lead("_w", 1).over(win))
           .withColumn("_w3", F.lead("_w", 2).over(win))
           .filter(F.col("_w3").isNotNull())
           .select(F.col(id_col),
                   F.concat_ws(" ", "_w", "_w2", "_w3").alias("_tri")))
    tstats = (tri.groupBy(id_col, "_tri")
              .agg(F.count(F.lit(1)).alias("_c"))
              .groupBy(id_col)
              .agg(F.sum("_c").alias("n_trigrams"),
                   F.count(F.lit(1)).alias("n_distinct_trigrams")))
    nw = F.col("n_words")
    nt = F.col("n_trigrams")
    return (wstats.join(tstats, id_col, "left")
            .select(F.col(id_col),
                    nw, F.col("n_distinct_words"),
                    ((nw - F.col("n_distinct_words")).cast("double")
                     / nw).alias("dup_word_frac"),
                    (F.col("_top_n").cast("double") / nw)
                    .alias("top_word_frac"),
                    F.coalesce(nt, F.lit(0)).alias("n_trigrams"),
                    F.coalesce(F.col("n_distinct_trigrams"), F.lit(0))
                    .alias("n_distinct_trigrams"),
                    F.when(nt > 0,
                           (nt - F.col("n_distinct_trigrams"))
                           .cast("double") / nt)
                    .otherwise(F.lit(0.0)).alias("dup_trigram_frac")))


def repetition_stats_sql(table: str = "documents") -> str:
    """DuckDB twin of repetition_stats: same tokenizer, same trigram
    stream (zipped-unnest positions + lead window), same exact-integer
    counts and double divisions."""
    return f"""
WITH words AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RX}'))
             AS w,
         unnest(range(1, len(regexp_extract_all(lower(text),
             '{TOKEN_RX}')) + 1)) AS pos
  FROM {table}),
wstats AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
         COUNT(*) AS n_distinct_words, MAX(c) AS top_n
  FROM (SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY 1, 2)
  GROUP BY 1),
tri AS (
  SELECT doc_id, w || ' ' || w2 || ' ' || w3 AS tri FROM (
    SELECT doc_id, w,
           LEAD(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
           LEAD(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
    FROM words)
  WHERE w3 IS NOT NULL),
tstats AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_trigrams,
         COUNT(*) AS n_distinct_trigrams
  FROM (SELECT doc_id, tri, COUNT(*) AS c FROM tri GROUP BY 1, 2)
  GROUP BY 1)
SELECT w.doc_id, w.n_words, w.n_distinct_words,
       CAST(w.n_words - w.n_distinct_words AS DOUBLE) / w.n_words
           AS dup_word_frac,
       CAST(w.top_n AS DOUBLE) / w.n_words AS top_word_frac,
       COALESCE(t.n_trigrams, 0) AS n_trigrams,
       COALESCE(t.n_distinct_trigrams, 0) AS n_distinct_trigrams,
       CASE WHEN t.n_trigrams > 0
            THEN CAST(t.n_trigrams - t.n_distinct_trigrams AS DOUBLE)
                 / t.n_trigrams
            ELSE 0.0 END AS dup_trigram_frac
FROM wstats w LEFT JOIN tstats t USING (doc_id)
"""


# PII scrubbing patterns — deliberately restricted to the regex subset
# with IDENTICAL semantics in Java regex (Spark) and RE2 (DuckDB):
# char classes, bounded repeats, \d, \b word boundaries; no lookaround,
# no backrefs. Order matters (email first: its local part can contain
# digits a later pattern might nibble) and is applied identically in
# both engines.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{8,15}", "<PHONE>"),
]


def redact_pii(df, *, text_col: str = "text", id_col: str = "doc_id"):
    """Training-corpus PII scrubbing: replace emails / IPv4s / intl
    phone numbers with typed placeholders and count what was removed
    (the audit trail a curation pipeline keeps). Pure regexp_replace /
    regexp_count column expressions — map-only, no shuffle, no UDF.
    -> (id, clean_text, n_emails, n_ips, n_phones)."""
    from pyspark.sql import functions as F
    txt = F.col(text_col)
    counts = [F.regexp_count(txt, F.lit(rx)).alias(f"n_{name}s")
              for name, rx, _ in PII_PATTERNS]
    clean = txt
    for _name, rx, repl in PII_PATTERNS:
        clean = F.regexp_replace(clean, rx, repl)
    return df.select(F.col(id_col), clean.alias("clean_text"), *counts)


def redact_pii_sql(text_expr: str = "text",
                   table: str = "documents") -> str:
    """DuckDB twin of redact_pii — same patterns from the same step
    table, same replacement order, global-replace flag."""
    counts = ", ".join(
        f"len(regexp_extract_all({text_expr}, '{rx}')) AS n_{name}s"
        for name, rx, _ in PII_PATTERNS)
    clean = text_expr
    for _name, rx, repl in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{rx}', '{repl}', 'g')"
    return (f"SELECT doc_id, {clean} AS clean_text, {counts} "
            f"FROM {table}")


def top_pairs(df, n: int = 20, *, text_col: str = "text"):
    """Corpus-wide top-``n`` adjacent token pairs — the BPE
    first-merge candidate table (vocabulary induction's inner loop is
    exactly "count adjacent pairs, take the most frequent").  Pairs
    are built ARRAY-SIDE with an indexed transform over the same
    lowercase token stream as top_terms — no posexplode+lead window,
    so nothing shuffles by doc at all: the only exchange is the
    (pair, count) aggregate with map-side combine, and the global
    top-n is a TakeOrderedAndProject (no SinglePartition sort).
    Ordering (count desc, pair asc) is a total order -> deterministic
    cut. -> (pair, cnt)."""
    from pyspark.sql import functions as F
    toks = df.select(words_col(text_col).alias("_w"))
    # slice length is clamped at 0: size=0 docs would make slice(..,
    # 1, -1) raise; the i+2 element_at is 1-based (i is 0-based)
    pairs = F.expr(
        "transform(slice(_w, 1, greatest(size(_w) - 1, 0)), "
        "(x, i) -> concat(x, ' ', element_at(_w, i + 2)))")
    return (toks.select(F.explode(pairs).alias("pair"))
            .groupBy("pair").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(n))


def top_pairs_sql(n: int = 20, table: str = "documents") -> str:
    """DuckDB twin: generate_series pair construction (empty when the
    doc has <2 tokens — no guard needed; DuckDB's series is empty
    where Spark's sequence(1,0) would DESCEND, hence the Spark-side
    clamped slice instead)."""
    return f"""
WITH ws AS (SELECT regexp_extract_all(lower(text), '{TOKEN_RX}') AS w
            FROM {table}),
p AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
             i -> w[i] || ' ' || w[i + 1])) AS pair FROM ws)
SELECT pair, COUNT(*) AS cnt FROM p GROUP BY pair
ORDER BY cnt DESC, pair ASC LIMIT {n}
"""


def inverted_index(df, *, text_col: str = "text",
                   id_col: str = "doc_id", min_df: int = 2,
                   max_postings: int = 20):
    """Search-index export: one row per term with its document
    frequency and a capped, ascending posting list — the classic
    inverted index a retrieval layer consumes. Postings are emitted
    as a comma-joined STRING (deterministic, engine-hashable; an
    array column would ride each engine's own list canonicalization).

    Scale: explode -> DISTINCT (term, doc) -> term-keyed agg, all
    map-side-combinable; the posting cap bounds row width so a
    stopword's row cannot balloon (the full list for hot terms is
    exactly what the df count summarizes). -> (term, df, postings)."""
    from pyspark.sql import functions as F
    tok = (df.select(F.col(id_col).alias("_d"),
                     F.explode(words_col(text_col)).alias("term"))
           .distinct())
    return (tok.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"),
                 F.array_join(
                     F.slice(F.array_sort(F.collect_list("_d")),
                             1, max_postings), ",").alias("postings"))
            .filter(F.col("df") >= min_df))


def inverted_index_sql(min_df: int = 2, max_postings: int = 20,
                       table: str = "documents") -> str:
    """DuckDB twin of inverted_index (same distinct/sort/cap/join)."""
    return f"""
WITH tok AS (SELECT DISTINCT doc_id,
       unnest(regexp_extract_all(lower(text), '{TOKEN_RX}')) AS term
       FROM {table})
SELECT term, COUNT(*) AS df,
       array_to_string(list_sort(list(doc_id))[1:{max_postings}], ',')
       AS postings
FROM tok GROUP BY term HAVING COUNT(*) >= {min_df}
"""


def group_quantiles(df, value_col: str, group_col: str, *,
                    ps: tuple[int, ...] = (50, 90, 99),
                    tie_col: str | None = None, exact: bool = True,
                    accuracy: int = 10000):
    """Discrete (type-1) quantiles of ``value_col`` per group — the
    distribution snapshot a curation dashboard wants (p50/p90/p99 doc
    length per language). DISCRETE on purpose: interpolated quantiles
    ((1-f)*a + f*b) hinge on float rounding; the rank-select value is
    a row's actual value, and the target rank ceil(p*n/100) is
    computed in pure integers ((p*n + 99) div 100) — engine-exact.

    ``exact=True`` (the oracle-gated tier): one group-keyed exchange
    carries both the rank window and the conditional aggregate — the
    window sorts every group's rows, the right trade below ~10^8 rows
    per group.  ``exact=False``: percentile_approx (Greenwald-Khanna
    sketch, rank error <= n/accuracy) as a plain aggregate — partial
    sketches merge map-side, nothing sorts, the distinct_per_cell
    exact/HLL convention for the 10^12-row tier.  Same output schema
    either way. -> (group, n, q<p>...)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    if not exact:
        aggs = [F.count(F.lit(1)).alias("n")]
        for p in ps:
            aggs.append(F.percentile_approx(
                value_col, p / 100.0, accuracy).alias(f"q{p}"))
        return df.groupBy(group_col).agg(*aggs)
    order = [F.col(value_col).asc()]
    if tie_col:
        order.append(F.col(tie_col).asc())
    w = Window.partitionBy(group_col).orderBy(*order)
    wall = (Window.partitionBy(group_col)
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    t = (df.withColumn("_rn", F.row_number().over(w))
         .withColumn("_n", F.count(F.lit(1)).over(wall)))
    aggs = [F.max("_n").alias("n")]
    for p in ps:
        target = F.expr(f"({p} * _n + 99) div 100")
        aggs.append(F.max(F.when(F.col("_rn") == target,
                                 F.col(value_col))).alias(f"q{p}"))
    return t.groupBy(group_col).agg(*aggs)


def group_quantiles_sql(value_sql: str, group_col: str,
                        ps: tuple[int, ...] = (50, 90, 99),
                        tie_col: str = "doc_id",
                        table: str = "documents") -> str:
    """DuckDB twin of group_quantiles (same integer rank select)."""
    qs = ", ".join(
        f"MAX(CASE WHEN rn = ({p} * n + 99) // 100 THEN v END) AS q{p}"
        for p in ps)
    return f"""
WITH t AS (SELECT {group_col}, {value_sql} AS v, {tie_col} AS tb
           FROM {table}),
r AS (SELECT {group_col}, v,
      ROW_NUMBER() OVER (PARTITION BY {group_col}
                         ORDER BY v ASC, tb ASC) AS rn,
      COUNT(*) OVER (PARTITION BY {group_col}) AS n FROM t)
SELECT {group_col}, CAST(MAX(n) AS BIGINT) AS n, {qs}
FROM r GROUP BY {group_col}
"""


def group_histogram(df, value_col: str, group_col: str, *,
                    width: int = 64):
    """Fixed-width histogram of a nonnegative integer metric per group
    — the distribution plot behind every curation dashboard (doc
    lengths per language). Bin floor is integer arithmetic
    ((v div w) * w): no float binning, so a value exactly on a bin
    edge lands identically in both engines.

    Scale: map-only bin expression + one (group, bin)-keyed
    map-side-combinable count. -> (group, bin_lo, n)."""
    from pyspark.sql import functions as F
    bin_lo = F.expr(f"({value_col} div {width}) * {width}")
    return (df.groupBy(F.col(group_col), bin_lo.alias("bin_lo"))
            .agg(F.count(F.lit(1)).alias("n")))


def group_histogram_sql(value_sql: str, group_col: str,
                        width: int = 64,
                        table: str = "documents") -> str:
    """DuckDB twin of group_histogram (same integer bin floor)."""
    return (
        f"SELECT {group_col}, (({value_sql}) // {width}) * {width} "
        f"AS bin_lo, COUNT(*) AS n FROM {table} GROUP BY 1, 2")


def chunk_docs(df, *, text_col: str = "text", id_col: str = "doc_id",
               chunk_words: int = 64, overlap: int = 16):
    """RAG-style chunking: split each document into overlapping
    token windows of ``chunk_words`` words with ``overlap`` words of
    context carried between consecutive chunks (stride = chunk_words
    - overlap). Chunk text is the space-joined canonical token form
    (words_col's tokenizer) — engine-identical by construction, unlike
    raw-whitespace splitting whose edge behavior differs. Documents
    with zero tokens emit nothing; the final partial chunk is kept.

    Scale: tokenize + sequence + explode + slice — map-only, NO
    shuffle; a pure scan that fans each doc into ~n/stride rows.
    -> (id_col, chunk_idx, n_words, chunk_text)."""
    from pyspark.sql import functions as F
    stride = chunk_words - overlap
    if stride <= 0:
        raise ValueError("overlap must be < chunk_words")
    toks = (df.select(F.col(id_col), words_col(text_col).alias("_w"))
            .withColumn("_n", F.size("_w"))
            .filter(F.col("_n") > 0))
    return (toks
            .withColumn("_s", F.explode(F.expr(
                f"sequence(0, _n - 1, {stride})")))
            .select(
                F.col(id_col),
                F.expr(f"_s div {stride}").alias("chunk_idx"),
                F.least(F.lit(chunk_words),
                        F.col("_n") - F.col("_s"))
                .cast("long").alias("n_words"),
                F.array_join(F.expr(
                    f"slice(_w, _s + 1, {chunk_words})"), " ")
                .alias("chunk_text")))


def chunk_docs_sql(chunk_words: int = 64, overlap: int = 16,
                   table: str = "documents") -> str:
    """DuckDB twin of chunk_docs (same tokenizer/stride/slice; range()
    end-exclusive == Spark sequence(0, n-1) end-inclusive for n>0)."""
    stride = chunk_words - overlap
    return f"""
WITH t AS (SELECT doc_id,
       regexp_extract_all(lower(text), '{TOKEN_RX}') AS w
       FROM {table}),
s AS (SELECT doc_id, w, len(w) AS n,
      unnest(range(0, len(w), {stride})) AS st
      FROM t WHERE len(w) > 0)
SELECT doc_id, st // {stride} AS chunk_idx,
       least({chunk_words}, n - st) AS n_words,
       array_to_string(w[st + 1 : st + {chunk_words}], ' ')
       AS chunk_text
FROM s
"""


def vocab_index(df, *, text_col: str = "text", id_col: str = "doc_id",
                min_df: int = 1):
    """Vocabulary export with dense integer ids — the string-indexer
    step in front of any token-id training pipeline. term_id is the
    EXCLUSIVE prefix count of terms in (df desc, term asc) order,
    computed with pack.prefix_sum's two-phase scan: the naive
    row_number() over a global ORDER BY collapses the whole vocabulary
    into one SinglePartition window; the two-phase scan range-
    partitions on (-df, term) and ships only P offset rows through the
    driver. -> (term, df, term_id)."""
    from pyspark.sql import functions as F

    from .pack import prefix_sum
    tok = (df.select(F.col(id_col).alias("_d"),
                     F.explode(words_col(text_col)).alias("term"))
           .distinct())
    tdf = (tok.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
           .filter(F.col("df") >= min_df)
           .withColumn("_negdf", -F.col("df"))
           .withColumn("_one", F.lit(1).cast("long")))
    out = prefix_sum(tdf, "_one", ["_negdf", "term"])
    return out.select("term", "df", F.col("prefix").alias("term_id"))


def vocab_index_sql(min_df: int = 1, table: str = "documents") -> str:
    """DuckDB twin of vocab_index (row_number - 1 == the exclusive
    prefix count of ones in the same unique total order)."""
    return f"""
WITH tok AS (SELECT DISTINCT doc_id,
       unnest(regexp_extract_all(lower(text), '{TOKEN_RX}')) AS term
       FROM {table}),
t AS (SELECT term, COUNT(*) AS df FROM tok GROUP BY term
      HAVING COUNT(*) >= {min_df})
SELECT term, df,
       ROW_NUMBER() OVER (ORDER BY df DESC, term ASC) - 1 AS term_id
FROM t
"""


def score_pr_curve(df, score_col: str, label_col: str, *,
                   id_col: str = "doc_id", deciles: int = 10,
                   num_partitions: int | None = None):
    """Precision/recall table for a ranking score against binary
    labels — the eval sheet a curation filter ships with: rank docs by
    ``score_col`` ASC (lowest quality first), and at each decile
    cutoff k report how many flagged docs are truly bad (precision)
    and what fraction of all bad docs were caught (recall).

    Distributed: BOTH running counters (rank and cumulative true
    positives) ride ONE two-phase prefix sum by packing them into a
    single BIGINT (label + 2^40 per row: high 23 bits = row count, low
    40 = positive count; exact below 2^40 rows — beyond that, run two
    prefix passes).  No SinglePartition window, no collect of data —
    two scalar actions for n and total positives.  Ratios are exact
    integer quotients rounded at the boundary (the engine convention).
    -> (pct, k, tp, precision, recall) x deciles."""
    from pyspark.sql import functions as F

    from .pack import prefix_sum
    packed = df.select(
        F.col(id_col), F.col(score_col).alias("_s"),
        F.col(label_col).cast("long").alias("_y")).withColumn(
        "_packed", F.col("_y") + F.lit(1 << 40))
    totals = packed.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_y").alias("npos")).collect()[0]
    n, npos = totals["n"], totals["npos"]
    pre = prefix_sum(packed, "_packed", ["_s", id_col],
                     num_partitions=num_partitions)
    # inclusive counters for THIS row's rank
    rank = (F.col("prefix") / F.lit(1 << 40)).cast("long") + 1
    tp = F.col("prefix") % F.lit(1 << 40) + F.col("_y")
    cutoffs = sorted({(i * n + deciles - 1) // deciles
                      for i in range(1, deciles + 1)})
    t = pre.select(rank.alias("_k"), tp.alias("_tp"))
    return (t.filter(F.col("_k").isin(cutoffs))
            .select(
                F.expr(f"CAST(round(_k * 100.0 / {n}, 0) AS INT)")
                .alias("pct"),
                F.col("_k").alias("k"),
                F.col("_tp").alias("tp"),
                F.round(F.col("_tp").cast("double") / F.col("_k"), 6)
                .alias("precision"),
                F.round(F.col("_tp").cast("double") / F.lit(npos), 6)
                .alias("recall")))


def score_pr_curve_sql(scored_sql: str, *, deciles: int = 10) -> str:
    """DuckDB twin of score_pr_curve over a subquery producing
    (doc_id, score, label) — single-node windows in place of the
    packed prefix sum, same cutoffs, same rounding."""
    return f"""
WITH s AS (SELECT doc_id, score, CAST(label AS BIGINT) AS y
           FROM ({scored_sql})),
t AS (SELECT COUNT(*) AS n, SUM(y) AS npos FROM s),
r AS (SELECT y,
      ROW_NUMBER() OVER (ORDER BY score ASC, doc_id ASC) AS k,
      SUM(y) OVER (ORDER BY score ASC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        AS tp
      FROM s),
c AS (SELECT DISTINCT (i * n + {deciles} - 1) // {deciles} AS k
      FROM t, unnest(generate_series(1, {deciles})) AS u(i))
SELECT CAST(round(r.k * 100.0 / t.n, 0) AS INT) AS pct,
       r.k AS k, CAST(r.tp AS BIGINT) AS tp,
       ROUND(CAST(r.tp AS DOUBLE) / r.k, 6) AS precision,
       ROUND(CAST(r.tp AS DOUBLE) / t.npos, 6) AS recall
FROM r JOIN c USING (k), t
"""


# ---------------------------------------------------------------------------
# dense-calendar per-source freshness decay — crawl-scheduling signal
# ---------------------------------------------------------------------------

def freshness_decay(df, *, source_col: str = "source",
                    day_col: str = "day", n_days: int = 64,
                    horizon: int = 8):
    """Per-source exponentially-decayed arrival freshness over a DENSE
    day calendar: score(d) = sum_{j=0..horizon-1} n(d-j) * 2^-j — the
    crawl-scheduler signal that ranks sources by how recently and how
    heavily they've been producing documents. Input: one row per doc
    with (source, day); output one row per (source, day) for EVERY day
    in [0, n_days), including days with zero arrivals (the dense
    calendar is the point — a gap must decay the score, which a
    sparse groupBy alone can't express).

    Cross-engine exactness: the decay base is 1/2 and the horizon is
    short, so every term n(d-j)*2^-j is a dyadic rational far inside
    double precision — the sum is IEEE-exact in any order, and the
    DuckDB twin hash-matches without rounding.

    Scale shape: one (source, day)-keyed count agg (map-side partial),
    a broadcast-able dense grid (distinct sources x ``n_days`` —
    sources number ~10^6 at web scale, days ~10^3; explode the
    smaller range() side), one left join back, and one source-keyed
    window with ``horizon`` lag taps. No iteration, no self-join; the
    window state is O(horizon) per source."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    counts = (df.groupBy(F.col(source_col).alias("source"),
                         F.col(day_col).cast("long").alias("day"))
              .agg(F.count(F.lit(1)).alias("n_docs")))
    sources = df.select(F.col(source_col).alias("source")).distinct()
    cal = sources.crossJoin(
        df.sparkSession.range(n_days).select(F.col("id").alias("day")))
    g = (cal.join(counts, ["source", "day"], "left")
         .withColumn("n_docs", F.coalesce(F.col("n_docs"), F.lit(0))))
    w = Window.partitionBy("source").orderBy("day")
    score = F.col("n_docs").cast("double")
    for j in range(1, horizon):
        score = score + F.lag("n_docs", j, 0).over(w) / float(1 << j)
    return g.select("source", "day", "n_docs",
                    score.alias("freshness"))


def freshness_decay_sql(src_sql: str, *, n_days: int = 64,
                        horizon: int = 8) -> str:
    """DuckDB twin of freshness_decay: same dense source x day grid,
    same lag taps, same dyadic 2^-j weights (exact in both engines).
    ``src_sql`` yields one (source, day) row per document."""
    taps = ["CAST(n_docs AS DOUBLE)"]
    for j in range(1, horizon):
        taps.append(f"lag(n_docs, {j}, 0) OVER w / {float(1 << j)!r}")
    score = " + ".join(taps)
    return f"""
WITH src AS ({src_sql}),
c AS (SELECT source, CAST(day AS BIGINT) AS day, COUNT(*) AS n_docs
      FROM src GROUP BY 1, 2),
s AS (SELECT DISTINCT source FROM src),
cal AS (SELECT s.source, t.day FROM s
        CROSS JOIN range(0, {n_days}) t(day)),
g AS (SELECT cal.source, cal.day,
             COALESCE(c.n_docs, 0) AS n_docs
      FROM cal LEFT JOIN c USING (source, day))
SELECT source, day, n_docs, ({score}) AS freshness
FROM g WINDOW w AS (PARTITION BY source ORDER BY day)
"""


def _bigram_counts(df, text_col: str):
    """Shared bigram-count aggregate for bigram_lm / collocations —
    ONE extraction (words_col tokens, index-transform pairing, one
    map-side-combinable groupBy) so the two consumers and their SQL
    twins can't drift. -> (w1, w2, n)."""
    from pyspark.sql import functions as F
    toks = (df.select(words_col(text_col).alias("_w"))
            .filter(F.size("_w") >= 2))
    pairs = toks.select(F.explode(F.expr(
        "transform(sequence(1, size(_w) - 1), "
        "i -> struct(_w[i-1] AS w1, _w[i] AS w2))")).alias("_p"))
    return (pairs.select("_p.w1", "_p.w2")
            .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n")))


def _bigram_counts_sql(table: str) -> str:
    """DuckDB twin of _bigram_counts as a WITH-body fragment ending
    in the aggregate `g(w1, w2, n)` — composed by bigram_lm_sql and
    collocations_sql."""
    return f"""toks AS (SELECT regexp_extract_all(lower(text), '{TOKEN_RX}')
              AS w FROM {table}),
pairs AS (SELECT w[i] AS w1, w[i + 1] AS w2
          FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
          WHERE len(w) >= 2),
g AS (SELECT w1, w2, COUNT(*) AS n FROM pairs GROUP BY 1, 2)"""


def bigram_lm(df, *, text_col: str = "text", min_count: int = 1):
    """Corpus bigram language model — global bigram counts with the
    exact conditional probability P(w2 | w1) in floor ppm, the
    count-based LM every data-quality heuristic sits on (perplexity
    proxies, boilerplate phrase detection, MT-artifact spotting).
    Bigrams come from the shared words_col tokenization via an
    index-transform over each doc's token array (struct(w[i-1], w[i])
    — no posexplode, no ordinality, no UDF); the conditioning
    denominator is the bigram-start count sum_v n(w1, v), so each
    w1's cond_ppm column sums to ~1e6 by construction (floor loss
    only). ``min_count`` prunes the long tail AFTER the denominator
    is fixed, so surviving probabilities are unchanged by the prune.

    Scale: the explode is per-token (the corpus token count — the
    same volume any tokenizing pass touches), then ONE (w1, w2)
    groupBy with map-side combine; the denominator rides a w1-keyed
    window over AGGREGATE rows (distinct bigrams), not tokens.
    -> (w1, w2, n, cond_ppm)."""
    from pyspark.sql import functions as F
    g = _bigram_counts(df, text_col)
    return (g.withColumn("cond_ppm",
                         F.expr("(1000000 * n) div "
                                "sum(n) OVER (PARTITION BY w1)"))
            .filter(F.col("n") >= min_count)
            .select("w1", "w2", "n", "cond_ppm"))


def bigram_lm_sql(min_count: int = 1, table: str = "documents") -> str:
    """DuckDB twin of bigram_lm (1-based list indexing; the window
    SUM widens to HUGEINT, floor // == Spark's div on these
    nonnegative operands)."""
    return f"""
WITH {_bigram_counts_sql(table)}
SELECT w1, w2, CAST(n AS BIGINT) AS n,
       CAST((1000000 * n) // SUM(n) OVER (PARTITION BY w1)
            AS BIGINT) AS cond_ppm
FROM g QUALIFY n >= {min_count}
"""


def lm_novelty(df, *, text_col: str = "text", id_col: str = "doc_id",
               min_count: int = 2):
    """Per-doc bigram novelty under the corpus bigram LM — the
    count-LM stand-in for a perplexity quality filter: for each doc
    with at least one bigram, how many of its bigrams fall inside
    the pruned corpus model (bigram_lm at the same ``min_count``)
    and the exact floor-ppm share that do NOT. Boilerplate and
    template farms sit near novelty 0 (every bigram is corpus-
    frequent); OCR junk and lorem-noise sit near 1e6 — the standard
    cheap proxy where a real neural-LM perplexity gate would slot in.

    Integer-exact: counts in BIGINT, novelty_ppm =
    (1e6 * (n_bigrams - n_known)) div n_bigrams — no float division,
    no log (a true perplexity needs float logs that ulp-drift across
    engines; the OOV RATE carries the same ranking signal exactly).

    Scale: the pruned LM is vocabulary-sized (Zipf: min_count >= 2
    drops the singleton tail, the surviving set is orders of
    magnitude below corpus token volume) and BROADCAST, so the doc
    bigram stream — the same volume any tokenizing pass touches —
    map-side joins with no shuffle; one doc-keyed groupBy with
    map-side combine ends it. -> (doc_id, n_bigrams, n_known,
    novelty_ppm)."""
    from pyspark.sql import functions as F
    lm = (bigram_lm(df, text_col=text_col, min_count=min_count)
          .select("w1", "w2", F.lit(1).alias("_k")))
    toks = (df.select(F.col(id_col), words_col(text_col).alias("_w"))
            .filter(F.size("_w") >= 2))
    bg = (toks.select(id_col, F.explode(F.expr(
        "transform(sequence(1, size(_w) - 1), "
        "i -> struct(_w[i-1] AS w1, _w[i] AS w2))")).alias("_p"))
        .select(id_col, "_p.w1", "_p.w2"))
    per = (bg.join(F.broadcast(lm), ["w1", "w2"], "left")
           .groupBy(id_col)
           .agg(F.count(F.lit(1)).alias("n_bigrams"),
                F.coalesce(F.sum("_k"), F.lit(0)).cast("long")
                .alias("n_known")))
    return per.withColumn("novelty_ppm", F.expr(
        "(1000000 * (n_bigrams - n_known)) div n_bigrams"))


def lm_novelty_sql(min_count: int = 2,
                   table: str = "documents") -> str:
    """DuckDB twin of lm_novelty — same tokenization, same pruned
    key set, same floor-ppm arithmetic (// == Spark div on these
    nonnegative operands)."""
    return f"""
WITH toks AS (SELECT doc_id,
              regexp_extract_all(lower(text), '{TOKEN_RX}') AS w
              FROM {table}),
pairs AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
          FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
          WHERE len(w) >= 2),
lm AS (SELECT w1, w2 FROM pairs GROUP BY w1, w2
       HAVING COUNT(*) >= {min_count}),
j AS (SELECT p.doc_id,
      CASE WHEN lm.w1 IS NOT NULL THEN 1 END AS k
      FROM pairs p LEFT JOIN lm
      ON p.w1 = lm.w1 AND p.w2 = lm.w2),
per AS (SELECT doc_id, COUNT(*) AS n_bigrams,
        COALESCE(SUM(k), 0) AS n_known FROM j GROUP BY 1)
SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       CAST(n_known AS BIGINT) AS n_known,
       CAST((1000000 * (n_bigrams - n_known)) // n_bigrams
            AS BIGINT) AS novelty_ppm
FROM per
"""


def vocab_growth(df, checkpoints, *, text_col: str = "text",
                 id_col: str = "doc_id"):
    """Heaps-law vocabulary-growth curve — corpus health telemetry:
    at each doc-id checkpoint, how many docs / tokens the prefix
    holds and how many DISTINCT terms have appeared by then. A clean
    crawl grows vocab ~ tokens^beta (beta ~ 0.5); a template farm
    flattens early, an OCR-junk batch bends it upward — the curve is
    the cheapest corpus-drift alarm. The prefix order is canonical
    (ascending doc id), so the curve is deterministic, not
    ingest-order trivia.

    Exact with no ordering pass: a term's contribution is fully
    described by its FIRST doc id — vocab(c) = |{terms: first_doc <=
    c}| — so one explode + term-keyed MIN agg replaces any running-
    distinct scan; tokens/docs ride a second doc-level agg; each
    frame collapses to ONE row of k counters and the ladder unpivots
    via stack() (the pair_counts shape). Scale: the explode is the
    corpus token volume (what any tokenizer touches once), the
    groupBy is vocabulary-sized with map-side combine.
    -> (checkpoint_doc, n_docs, n_tokens, vocab)."""
    from pyspark.sql import functions as F
    cps = sorted(int(c) for c in checkpoints)
    toks = df.select(F.col(id_col).alias("_id"),
                     words_col(text_col).alias("_w"))
    first = (toks.select("_id", F.explode("_w").alias("_t"))
             .groupBy("_t").agg(F.min("_id").alias("_fd")))
    v = first.agg(*[
        F.coalesce(F.sum(F.expr(
            f"CASE WHEN _fd <= {c} THEN 1 ELSE 0 END")), F.lit(0))
        .cast("long").alias(f"_v{i}") for i, c in enumerate(cps)])
    t = toks.agg(*([
        F.coalesce(F.sum(F.expr(
            f"CASE WHEN _id <= {c} THEN 1 ELSE 0 END")), F.lit(0))
        .cast("long").alias(f"_d{i}") for i, c in enumerate(cps)]
        + [F.coalesce(F.sum(F.expr(
            f"CASE WHEN _id <= {c} THEN size(_w) ELSE 0 END")),
            F.lit(0)).cast("long").alias(f"_t{i}")
           for i, c in enumerate(cps)]))
    one = t.join(v)
    stack = ", ".join(
        f"CAST({c} AS BIGINT), _d{i}, _t{i}, _v{i}"
        for i, c in enumerate(cps))
    return one.selectExpr(
        f"stack({len(cps)}, {stack}) "
        "AS (checkpoint_doc, n_docs, n_tokens, vocab)")


def vocab_growth_sql(checkpoints, table: str = "documents") -> str:
    """DuckDB twin of vocab_growth — same tokenization, same
    first-doc identity, UNION ALL ladder."""
    cps = sorted(int(c) for c in checkpoints)
    vsums = ", ".join(
        f"COALESCE(SUM(CASE WHEN fd <= {c} THEN 1 ELSE 0 END), 0)"
        f" AS v{i}" for i, c in enumerate(cps))
    tsums = ", ".join(
        f"COALESCE(SUM(CASE WHEN doc_id <= {c} THEN 1 ELSE 0 END), 0)"
        f" AS d{i}, "
        f"COALESCE(SUM(CASE WHEN doc_id <= {c} THEN len(w) "
        f"ELSE 0 END), 0) AS t{i}" for i, c in enumerate(cps))
    rungs = " UNION ALL ".join(
        f"SELECT CAST({c} AS BIGINT) AS checkpoint_doc, "
        f"CAST(d{i} AS BIGINT) AS n_docs, "
        f"CAST(t{i} AS BIGINT) AS n_tokens, "
        f"CAST(v{i} AS BIGINT) AS vocab FROM t, v"
        for i, c in enumerate(cps))
    return f"""
WITH toks AS (SELECT doc_id,
              regexp_extract_all(lower(text), '{TOKEN_RX}') AS w
              FROM {table}),
first AS (SELECT t.t, MIN(doc_id) AS fd
          FROM (SELECT doc_id, UNNEST(w) AS t FROM toks) t
          GROUP BY t.t),
v AS (SELECT {vsums} FROM first),
t AS (SELECT {tsums} FROM toks)
{rungs}
"""


def collocations(df, *, text_col: str = "text", min_count: int = 2):
    """Collocation detection via exact integer LIFT — the PMI signal
    without the log: for each corpus bigram,
    lift = P(w1, w2) / (P(w1, ·) · P(·, w2))
         = (n12 · N) / (n1s · n2e)
    in floor ppm, where N is the total bigram count, n1s the count
    of bigrams STARTING with w1 and n2e the count ENDING with w2.
    Lift > 1e6 means the pair co-occurs more than its marginals
    predict — "los angeles", "http www" — the classic phrase-mining
    / stopword-boilerplate discriminator (PMI = log(lift), monotone,
    so ranking by exact integer lift IS ranking by PMI with no float
    log to ulp-drift across engines). ``min_count`` prunes the noisy
    singleton tail AFTER the marginals are fixed, so surviving lifts
    are unchanged by the prune.

    Integer-exact at any scale: n12 · N reaches N² — past BIGINT
    once the corpus passes ~3e9 bigrams — so the product and the
    floor division run in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB),
    both exact, with only the final ppm (bounded by 1e6 · N / n1s /
    n2e… far under 2^63 for any min_count >= 2) narrowed to BIGINT.

    Scale: rides _bigram_counts' ONE token-volume explode + ONE
    map-side-combinable (w1, w2) groupBy; every marginal is a window
    over AGGREGATE rows (distinct bigrams — Zipf-small next to token
    volume), the w1/w2 windows are vocabulary-keyed (no hot single
    reducer), and only the global-N window funnels to one task — on
    a dictionary-sized frame. -> (w1, w2, n, lift_ppm)."""
    from pyspark.sql import functions as F
    g = _bigram_counts(df, text_col)
    m = (g.withColumn("_n1s", F.expr(
            "sum(n) OVER (PARTITION BY w1)"))
         .withColumn("_n2e", F.expr(
            "sum(n) OVER (PARTITION BY w2)"))
         .withColumn("_tot", F.expr("sum(n) OVER ()")))
    return (m.filter(F.col("n") >= int(min_count))
            .select("w1", "w2", "n",
                    F.expr("(CAST(1000000 AS DECIMAL(38,0)) * n "
                           "* _tot) div "
                           "(CAST(_n1s AS DECIMAL(38,0)) * _n2e)")
                    .alias("lift_ppm")))


def collocations_sql(min_count: int = 2,
                     table: str = "documents") -> str:
    """DuckDB twin of collocations — same _bigram_counts_sql
    fragment, HUGEINT product, floor //."""
    return f"""
WITH {_bigram_counts_sql(table)},
m AS (SELECT w1, w2, n,
      SUM(n) OVER (PARTITION BY w1) AS n1s,
      SUM(n) OVER (PARTITION BY w2) AS n2e,
      SUM(n) OVER () AS tot FROM g)
SELECT w1, w2, CAST(n AS BIGINT) AS n,
       CAST((CAST(1000000 AS HUGEINT) * n * tot)
            // (CAST(n1s AS HUGEINT) * n2e) AS BIGINT) AS lift_ppm
FROM m WHERE n >= {min_count}
"""


def doc_skyline(df, text_col: str = "text", id_col: str = "doc_id"):
    """Pareto-skyline curation query — the documents no other
    document beats on BOTH axes: token volume (content) and alpha
    density in ppm (cleanliness). Dominance is the standard skyline
    relation (>= on both, > on at least one); duplicate (v1, v2)
    points are mutually non-dominating, so both survive. The
    frontier is what a curator inspects before fixing a quality/
    length threshold — every non-skyline doc has a strictly better
    witness.

    Distributed 2D skyline WITHOUT the O(n^2) dominance join: per-v1
    group max of v2, then one running max over STRICTLY GREATER v1
    groups (rowsBetween(-inf, -1) on the v1-desc DISTINCT-v1 table).
    keep iff v2 equals its own group max (no same-v1 dominator) and
    strictly exceeds the running max (no greater-v1 dominator).

    Scale: one doc-keyed map + one combinable v1-groupBy; the ONLY
    single-partition window runs over DISTINCT v1 values (token
    counts — thousands of rows at any corpus size, not docs), then a
    broadcastable join back. The oracle twin is the NOT EXISTS
    dominance anti-join — a genuinely different formulation, so a
    window off-by-one can't self-confirm.
    -> (doc_id, n_tokens, alpha_ppm)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    w = words_col(text_col)
    feats = df.select(
        F.col(id_col),
        F.size(w).cast("long").alias("n_tokens"),
        F.expr(f"CAST(length(regexp_replace(lower({text_col}), "
               f"'[^a-z0-9]', '')) AS BIGINT) * 1000000 div "
               f"greatest(length({text_col}), 1)")
        .alias("alpha_ppm"))
    g = feats.groupBy("n_tokens").agg(F.max("alpha_ppm").alias("_g2"))
    win = (Window.orderBy(F.col("n_tokens").desc())
           .rowsBetween(Window.unboundedPreceding, -1))
    g = g.withColumn("_mgt", F.max("_g2").over(win))
    return (feats.join(F.broadcast(g), "n_tokens")
            .filter((F.col("alpha_ppm") == F.col("_g2"))
                    & (F.col("_mgt").isNull()
                       | (F.col("alpha_ppm") > F.col("_mgt"))))
            .select(id_col, "n_tokens", "alpha_ppm"))


def doc_skyline_sql(table: str = "documents") -> str:
    """DuckDB twin of doc_skyline: the NOT EXISTS dominance
    anti-join over the same integer features."""
    feats = (f"SELECT doc_id, CAST(len(regexp_extract_all("
             f"lower(text), '{TOKEN_RX}')) AS BIGINT) AS n_tokens, "
             f"CAST(length(regexp_replace(lower(text), "
             f"'[^a-z0-9]', '', 'g')) AS BIGINT) * 1000000 "
             f"// greatest(length(text), 1) AS alpha_ppm "
             f"FROM {table}")
    return f"""
WITH sky_f AS ({feats})
SELECT d.doc_id, d.n_tokens, d.alpha_ppm FROM sky_f d
WHERE NOT EXISTS (SELECT 1 FROM sky_f u
    WHERE u.n_tokens >= d.n_tokens AND u.alpha_ppm >= d.alpha_ppm
    AND (u.n_tokens > d.n_tokens OR u.alpha_ppm > d.alpha_ppm))
"""


def bm25_topk(df, terms, k: int, *, text_col: str = "text",
              id_col: str = "doc_id"):
    """BM25-R ranked retrieval — the relevance-scored top-k behind
    corpus search and query-based curation, in a RATIONAL-ARITHMETIC
    variant so both engines agree to the last bit (documented
    deviation: the log idf is replaced by the odds ratio it wraps,
    (N - df + 0.5)/(df + 0.5), in floor-milli — per-term monotone in
    the same df, so sparse terms still dominate; textbook BM25 needs
    ln(), which differs across libm builds in the last ulp and would
    flip near-tie ranks).

    Per (doc, query term): the exact BM25 tf saturation with
    k1 = 6/5, b = 3/4, cleared of fractions by 20 T:

        s_upm = 44 T tf * 1e6  div  (20 T tf + 6 T + 18 dl N)

    (T = total corpus tokens, N = docs, dl = doc length); the doc
    score is sum over terms of w_milli * s_upm in nano-points. All
    products run in DECIMAL(38,0) (T tf * 1e6 overflows BIGINT at
    planetary corpus size; both engines' floor division agrees on
    nonnegative operands), only the BIGINT-safe score reaches the
    output.

    Scale: candidate docs are the ones CONTAINING a query term (the
    inverted-index semi-join — explode + isin filter, no full-corpus
    scoring); corpus stats (N, T) are one aggregate row crossJoined
    back (broadcast scalar); df/w_milli is a |terms|-row broadcast;
    the final top-k is orderBy+limit = TakeOrdered (per-partition
    heaps + one k-row merge, no global sort shuffle).
    -> (doc_id, score_np), the k highest, ties broken by doc_id."""
    from pyspark.sql import functions as F
    w = words_col(text_col)
    docs = df.select(F.col(id_col), F.size(w).cast("long")
                     .alias("_dl"), w.alias("_w"))
    stats = docs.agg(F.count(F.lit(1)).cast("long").alias("_nd"),
                     F.sum("_dl").cast("long").alias("_tt"))
    tf = (docs.select(
            id_col, "_dl",
            F.explode(F.filter("_w", lambda x: x.isin(*terms)))
            .alias("_t"))
          .groupBy(id_col, "_dl", "_t")
          .agg(F.count(F.lit(1)).cast("long").alias("_tf")))
    dfreq = tf.groupBy("_t").agg(F.count(F.lit(1)).cast("long")
                                 .alias("_df"))
    scored = (tf.join(F.broadcast(dfreq), "_t")
              .crossJoin(F.broadcast(stats))
              .withColumn("_wm", F.expr(
                  "(1000 * (2 * (_nd - _df) + 1)) div (2 * _df + 1)"))
              .withColumn("_supm", F.expr(
                  "CAST(CAST(44 AS DECIMAL(38,0)) * _tt * _tf "
                  "* 1000000 div (CAST(20 AS DECIMAL(38,0)) * _tt "
                  "* _tf + CAST(6 AS DECIMAL(38,0)) * _tt "
                  "+ CAST(18 AS DECIMAL(38,0)) * _dl * _nd) "
                  "AS BIGINT)")))
    return (scored.groupBy(id_col)
            .agg(F.sum(F.col("_wm") * F.col("_supm"))
                 .cast("long").alias("score_np"))
            .orderBy(F.col("score_np").desc(), F.col(id_col))
            .limit(int(k)))


def bm25_topk_sql(terms, k: int, *, table: str = "documents") -> str:
    """DuckDB twin of bm25_topk — same cleared-fraction integer
    formula in HUGEINT, same odds-ratio milli weight, same
    (score DESC, doc_id) top-k."""
    lst = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH bm_docs AS (SELECT doc_id,
    CAST(len(regexp_extract_all(lower(text), '{TOKEN_RX}'))
         AS BIGINT) AS dl,
    regexp_extract_all(lower(text), '{TOKEN_RX}') AS w
    FROM {table}),
bm_stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS t_tok
             FROM bm_docs),
bm_tf AS (SELECT doc_id, dl, t, COUNT(*) AS tf FROM (
    SELECT doc_id, dl, unnest(list_filter(w, x -> x IN ({lst})))
      AS t FROM bm_docs) GROUP BY 1, 2, 3),
bm_df AS (SELECT t, COUNT(*) AS df FROM bm_tf GROUP BY 1),
bm_s AS (SELECT f.doc_id,
    (1000 * (2 * (s.n_docs - d.df) + 1)) // (2 * d.df + 1) AS wm,
    CAST(CAST(44 AS HUGEINT) * s.t_tok * f.tf * 1000000
         // (CAST(20 AS HUGEINT) * s.t_tok * f.tf
             + CAST(6 AS HUGEINT) * s.t_tok
             + CAST(18 AS HUGEINT) * f.dl * s.n_docs)
         AS BIGINT) AS supm
    FROM bm_tf f JOIN bm_df d ON d.t = f.t, bm_stats s)
SELECT doc_id, CAST(SUM(wm * supm) AS BIGINT) AS score_np
FROM bm_s GROUP BY 1
ORDER BY score_np DESC, doc_id LIMIT {int(k)}
"""


def token_drift(df, *, group_col: str = "host",
                text_col: str = "text"):
    """Per-group token-distribution drift — "which hosts speak a
    different language than the corpus": Pearson chi-square of each
    group's term counts against the pooled corpus distribution, the
    domain-shift / SEO-spam / template-farm detector a pretraining
    curation pipeline runs per host before sampling. Uses the
    zero-cell-free identity

        chi2 = sum_t (c_th - e_th)^2 / e_th  =  sum_{t: c>0}
               c_th^2 * T / (n_h * c_t)  -  n_h

    (e_th = n_h * c_t / T; the -2*sum c + sum e terms collapse to
    -n_h, and every UNOBSERVED (host, term) cell's contribution
    vanishes inside the closed form — so the sum runs only over the
    observed cells, never the host x vocab cross product). Under the
    null (host sampled from the corpus) chi2 ~ df ~ n_terms; a
    boilerplate farm scores orders of magnitude higher.

    Cross-engine exactness: each term's contribution is floored ppm —
    q_t = (1e6 * c^2 * T) div (n_h * c_t) in DECIMAL(38,0)/HUGEINT —
    and chi2_ppm = sum q_t - 1e6 * n_h; per-term flooring (< 1 ppm
    loss each) is the deterministic convention both engines replay
    bit-identically (a single-fraction form does not exist: the c_t
    denominators differ per term). Products stay under 38 digits to
    ~1e9 tokens per (host, term) cell at a 1e14-token corpus.

    Scale: one (group, term) map-side-combinable agg off the exploded
    scan, then everything runs on AGGREGATE rows — a term-keyed
    marginal agg joined back term-keyed, a group-keyed marginal, one
    broadcast 1-row total. -> (group, n_tokens, n_terms, chi2_ppm)."""
    from pyspark.sql import functions as F
    tok = df.select(F.col(group_col).alias("_g"),
                    F.explode(words_col(text_col)).alias("_t"))
    ht = (tok.groupBy("_g", "_t")
          .agg(F.count(F.lit(1)).alias("_c")))
    tm = ht.groupBy("_t").agg(F.sum("_c").alias("_ct"))
    tot = ht.agg(F.sum("_c").alias("_tt"))
    hm = ht.groupBy("_g").agg(F.sum("_c").alias("_nh"),
                              F.count(F.lit(1)).alias("n_terms"))
    q = (ht.join(tm, "_t")
         .join(F.broadcast(hm), "_g")
         .crossJoin(F.broadcast(tot))
         .select("_g", "_nh", "n_terms", F.expr(
             "(1000000 * CAST(_c AS DECIMAL(38,0)) * _c * _tt) "
             "div (CAST(_nh AS DECIMAL(38,0)) * _ct)").alias("_q")))
    return (q.groupBy("_g")
            .agg(F.max("_nh").alias("_nh"),
                 F.max("n_terms").cast("long").alias("n_terms"),
                 F.sum("_q").alias("_sq"))
            .select(F.col("_g").alias(group_col),
                    F.col("_nh").cast("long").alias("n_tokens"),
                    "n_terms",
                    F.expr("CAST(_sq - 1000000 * CAST(_nh AS "
                           "DECIMAL(38,0)) AS BIGINT)")
                    .alias("chi2_ppm")))


def token_drift_sql(docs_sql: str, group_col: str = "host") -> str:
    """DuckDB twin of token_drift over a subquery producing
    (``group_col``, text) — window-sum marginals over the observed
    (group, term) cells, HUGEINT products, identical per-term
    flooring."""
    return f"""
WITH td_tok AS (SELECT {group_col} AS g,
    unnest(regexp_extract_all(lower(text), '{TOKEN_RX}')) AS t
    FROM ({docs_sql})),
td_c AS (SELECT g, t, COUNT(*) AS c FROM td_tok GROUP BY 1, 2),
td_m AS (SELECT g, c,
    SUM(c) OVER (PARTITION BY t) AS ct,
    SUM(c) OVER (PARTITION BY g) AS nh,
    COUNT(*) OVER (PARTITION BY g) AS n_terms,
    SUM(c) OVER () AS tt FROM td_c),
td_q AS (SELECT g, nh, n_terms,
    (1000000 * CAST(c AS HUGEINT) * c * tt)
        // (CAST(nh AS HUGEINT) * ct) AS q FROM td_m)
SELECT g AS {group_col}, CAST(MAX(nh) AS BIGINT) AS n_tokens,
       CAST(MAX(n_terms) AS BIGINT) AS n_terms,
       CAST(SUM(q) - 1000000 * CAST(MAX(nh) AS HUGEINT) AS BIGINT)
       AS chi2_ppm
FROM td_q GROUP BY 1
"""


def rrf_fuse(df, rank_exprs, k: int, *, id_col: str = "doc_id",
             kconst: int = 60, m: int = 256):
    """Reciprocal-rank fusion of R deterministic rankers — the
    curation step that mixes incomparable signals (length quality,
    freshness, BM25 relevance) without calibrating them: per doc,

        score_ppm = sum_r  1e6 div (kconst + rank_r)

    (Cormack et al. SIGIR'09 with the classic kconst=60), top-k by
    score desc then id asc. Each ranker is an integer SQL expression
    whose ASCENDING order (ties -> id asc) defines rank 1, 2, ... —
    callers encode direction in the expression ("-n_chars" ranks
    longest first). Per-term floored ppm is the cross-engine
    convention (bit-identical in both engines; fractions with
    different denominators have no single-fraction form).

    Scale: NO global sort. Phase 1 takes each ranker's top-``m`` ids
    via orderBy+limit (Spark's distributed TakeOrdered — never a
    single-partition window). Phase 2 computes EXACT global ranks
    for the <= R*m candidates only: one full scan against the
    broadcast candidate keys, rank = 1 + count of rows ordering
    strictly before. Completeness is provable, not hoped: a doc
    outside every ranker's top-m scores < R * 1e6/(kconst+m+1),
    while the k-th candidate scores >= 1e6 div (kconst+k) (it beats
    a doc holding rank k in some single ranker) — with the default
    kconst=60, m=256, R<=2, k<=10: 6309 < 14285, so no non-candidate
    can reach the top k. Raise ``m`` for more rankers or deeper k
    (need R*1e6/(kconst+m+1) < 1e6 div (kconst+k)).
    -> (id, rank_1..rank_R, score_ppm), k rows."""
    from functools import reduce

    from pyspark.sql import functions as F
    exprs = list(rank_exprs)
    r = len(exprs)
    assert r * (kconst + k) < kconst + m + 1, \
        "m too small for provable top-k completeness"
    cands = reduce(lambda a, b: a.unionByName(b),
                   [df.select(F.col(id_col).alias("_cid"))
                    .orderBy(F.expr(e).asc(), F.col(id_col).asc())
                    .limit(m) for e in exprs]).distinct()
    ckeys = (df.join(F.broadcast(cands),
                     df[id_col] == F.col("_cid"))
             .select(F.col("_cid"),
                     *[F.expr(e).alias(f"_ck{i}")
                       for i, e in enumerate(exprs)]))
    full = df.select(F.col(id_col).alias("_fid"),
                     *[F.expr(e).alias(f"_fk{i}")
                       for i, e in enumerate(exprs)])
    before = [F.sum(F.when(
        (F.col(f"_fk{i}") < F.col(f"_ck{i}"))
        | ((F.col(f"_fk{i}") == F.col(f"_ck{i}"))
           & (F.col("_fid") < F.col("_cid"))), 1).otherwise(0))
        .alias(f"_b{i}") for i in range(r)]
    ranks = (full.crossJoin(F.broadcast(ckeys))
             .groupBy("_cid").agg(*before))
    score = reduce(lambda a, b: a + b,
                   [F.expr(f"1000000 div ({kconst} + _b{i} + 1)")
                    for i in range(r)])
    return (ranks.select(
        F.col("_cid").alias(id_col),
        *[(F.col(f"_b{i}") + 1).cast("long").alias(f"rank_{i + 1}")
          for i in range(r)],
        score.cast("long").alias("score_ppm"))
        .orderBy(F.col("score_ppm").desc(), F.col(id_col).asc())
        .limit(int(k)))


def rrf_fuse_sql(docs_sql: str, rank_exprs, k: int, *,
                 id_col: str = "doc_id", kconst: int = 60) -> str:
    """DuckDB twin of rrf_fuse over a subquery — full window
    ROW_NUMBER per ranker (the small-data exact form the pruned
    Spark plan provably equals), identical floored ppm terms."""
    exprs = list(rank_exprs)
    rn = ", ".join(
        f"ROW_NUMBER() OVER (ORDER BY ({e}), {id_col}) AS r{i}"
        for i, e in enumerate(exprs))
    score = " + ".join(f"1000000 // ({kconst} + r{i})"
                       for i in range(len(exprs)))
    rcols = ", ".join(f"CAST(r{i} AS BIGINT) AS rank_{i + 1}"
                      for i in range(len(exprs)))
    return f"""
WITH rrf_r AS (SELECT {id_col}, {rn} FROM ({docs_sql}))
SELECT {id_col}, {rcols},
       CAST({score} AS BIGINT) AS score_ppm
FROM rrf_r
ORDER BY score_ppm DESC, {id_col} ASC LIMIT {int(k)}
"""


def score_auc(df, score_col: str, label_col: str, *,
              group_col: str = "source"):
    """Per-group ROC-AUC of an integer ranking score against a
    binary label — the one-number answer to 'does this quality
    signal actually separate the classes', via the Mann-Whitney
    rank-sum identity (AUC = P(score_pos > score_neg) + P(=)/2):
    exact tie handling in DOUBLED units, u2 = sum over score values
    of pos_s * (2 * neg_below + neg_s), so

        auc_ppm = (1e6 * u2) div (2 * n_pos * n_neg)

    is integer-exact end to end (no float ranks, no libm); NULL
    when a group is single-class. 500_000 = no signal, 1_000_000 =
    perfect separation.

    Scale: one map-side-combinable pass to (group, score, cnt,
    pos) — the only scan; the cumulative-negatives window orders
    DISTINCT SCORE VALUES within each group (aggregate rows, never
    input rows), and the final per-group agg inherits the window's
    partitioning, so the tail is exactly one aggregate-frame
    exchange. -> (group, n_pos, n_neg, auc_ppm)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    ct = (df.groupBy(F.col(group_col).alias("g"),
                     F.col(score_col).alias("_s"))
          .agg(F.count(F.lit(1)).alias("_c"),
               F.sum(F.col(label_col).cast("long")).alias("_p"))
          .withColumn("_ng", F.col("_c") - F.col("_p")))
    w = (Window.partitionBy("g").orderBy("_s")
         .rowsBetween(Window.unboundedPreceding, -1))
    ct = ct.withColumn("_nb", F.coalesce(F.sum("_ng").over(w),
                                         F.lit(0)))
    return (ct.groupBy("g")
            .agg(F.sum("_p").alias("n_pos"),
                 F.sum("_ng").alias("n_neg"),
                 F.sum(F.col("_p").cast("decimal(38,0)")
                       * (2 * F.col("_nb") + F.col("_ng")))
                 .alias("_u2"))
            .select(F.col("g").alias(group_col),
                    F.col("n_pos").cast("long").alias("n_pos"),
                    F.col("n_neg").cast("long").alias("n_neg"),
                    F.expr("CASE WHEN n_pos = 0 OR n_neg = 0 THEN "
                           "CAST(NULL AS BIGINT) ELSE CAST((_u2 * "
                           "1000000) div (2 * CAST(n_pos AS "
                           "DECIMAL(38,0)) * n_neg) AS BIGINT) "
                           "END").alias("auc_ppm")))


def score_auc_sql(scored_sql: str, *, group_col: str = "source") -> str:
    """DuckDB twin of score_auc over a subquery producing
    (<group>, score, label) — same doubled-unit tie identity, same
    positive truncating division."""
    return f"""
WITH ct AS (SELECT {group_col} AS g, score AS s, COUNT(*) AS c,
            CAST(SUM(CAST(label AS BIGINT)) AS BIGINT) AS p
            FROM ({scored_sql}) GROUP BY 1, 2),
cn AS (SELECT g, s, p, c - p AS ng,
       COALESCE(SUM(c - p) OVER (PARTITION BY g ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) AS nb
       FROM ct)
SELECT g AS {group_col},
       CAST(SUM(p) AS BIGINT) AS n_pos,
       CAST(SUM(ng) AS BIGINT) AS n_neg,
       CAST(CASE WHEN SUM(p) = 0 OR SUM(ng) = 0 THEN NULL
            ELSE (SUM(CAST(p AS HUGEINT) * (2 * nb + ng)) * 1000000)
                 // (2 * CAST(SUM(p) AS HUGEINT) * SUM(ng)) END
            AS BIGINT) AS auc_ppm
FROM cn GROUP BY 1
"""


def ks_stat(df, value_col: str, *, group_col: str = "source"):
    """Per-group two-sample Kolmogorov-Smirnov drift: for each
    group, the exact KS distance between ITS distribution of an
    integer value and the REST of the corpus — the standard
    'did this host/source drift from the pool' test on a whole
    distribution where token_drift tests term counts and score_auc
    tests a labeled ranking. D = sup_v |F_g(v) - F_rest(v)| is
    attained at a jump of either CDF, and both CDFs jump only at
    observed values, so evaluating at every global value is exact:

        ks_ppm = max_v 1e6 * |n_rest * C_g(v) - n_g * C_rest(v)|
                 div (n_g * n_rest)

    (C = cumulative count; one cross-multiplied fraction, no float
    CDFs, truncating div on a nonnegative numerator == floor in
    both engines). NULL when a group is the whole corpus (n_rest =
    0). 0 = identical distributions, 1e6 = disjoint supports.

    Scale: one map-side-combinable pass to (group, value) counts —
    the only input scan; global value counts derive from those
    AGGREGATE rows; the evaluation frame is groups x global values
    built by joining the group-total row set (tiny, broadcast) to
    the global value frame, never by rescanning input. Products in
    DECIMAL(38,0)/HUGEINT (n_rest * C_g ~ 1e24 at 1e12 rows). For
    a continuous value at planetary scale, pre-bin upstream — the
    frame is |groups| x |distinct values|, aggregate-sized only
    when the value is discrete. -> (group, n, n_rest, ks_ppm)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    gv = (df.groupBy(F.col(group_col).alias("g"),
                     F.col(value_col).alias("_v"))
          .agg(F.count(F.lit(1)).alias("_c")))
    vals = gv.groupBy("_v").agg(F.sum("_c").alias("_ca"))
    groups = gv.groupBy("g").agg(F.sum("_c").alias("_ng"))
    frame = (vals.crossJoin(F.broadcast(groups))
             .join(gv, ["g", "_v"], "left")
             .fillna(0, subset=["_c"]))
    w = (Window.partitionBy("g").orderBy("_v")
         .rowsBetween(Window.unboundedPreceding, 0))
    frame = (frame.withColumn("_cg", F.sum("_c").over(w))
             .withColumn("_call", F.sum("_ca").over(w)))
    tot = vals.agg(F.sum("_ca").alias("_t"))
    return (frame.crossJoin(F.broadcast(tot))
            .withColumn("_nr", F.col("_t") - F.col("_ng"))
            .withColumn("_d", F.abs(
                F.col("_nr").cast("decimal(38,0)") * F.col("_cg")
                - F.col("_ng").cast("decimal(38,0)")
                * (F.col("_call") - F.col("_cg"))))
            .groupBy("g")
            .agg(F.max("_ng").alias("n"), F.max("_nr").alias("_nr2"),
                 F.max("_d").alias("_dm"))
            .select(F.col("g").alias(group_col),
                    F.col("n").cast("long").alias("n"),
                    F.col("_nr2").cast("long").alias("n_rest"),
                    F.expr("CASE WHEN n = 0 OR _nr2 = 0 THEN "
                           "CAST(NULL AS BIGINT) ELSE CAST("
                           "(_dm * 1000000) div (CAST(n AS "
                           "DECIMAL(38,0)) * _nr2) AS BIGINT) END"
                           ).alias("ks_ppm")))


def ks_stat_sql(src_sql: str, *, group_col: str = "source") -> str:
    """DuckDB twin of ks_stat over a subquery producing
    (<group>, v) — same cross-multiplied sup over the global value
    grid, same truncating division."""
    return f"""
WITH gv AS (SELECT {group_col} AS g, v, COUNT(*) AS c
            FROM ({src_sql}) GROUP BY 1, 2),
vals AS (SELECT v, SUM(c) AS ca FROM gv GROUP BY 1),
grps AS (SELECT g, SUM(c) AS ng FROM gv GROUP BY 1),
tot AS (SELECT SUM(ca) AS t FROM vals),
frame AS (SELECT grps.g, vals.v, grps.ng, vals.ca,
          COALESCE(gv.c, 0) AS c
          FROM vals CROSS JOIN grps
          LEFT JOIN gv ON gv.g = grps.g AND gv.v = vals.v),
cum AS (SELECT g, ng, c, ca,
        SUM(c) OVER (PARTITION BY g ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
                     ROW) AS cg,
        SUM(ca) OVER (PARTITION BY g ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
                      ROW) AS call
        FROM frame)
SELECT g AS {group_col},
       CAST(MAX(ng) AS BIGINT) AS n,
       CAST(MAX((SELECT t FROM tot) - ng) AS BIGINT) AS n_rest,
       CAST(CASE WHEN MAX(ng) = 0 OR MAX((SELECT t FROM tot) - ng)
                 = 0 THEN NULL
            ELSE (MAX(ABS(CAST(((SELECT t FROM tot) - ng) AS
                              HUGEINT) * cg
                          - CAST(ng AS HUGEINT) * (call - cg)))
                  * 1000000)
                 // (CAST(MAX(ng) AS HUGEINT)
                     * MAX((SELECT t FROM tot) - ng)) END
            AS BIGINT) AS ks_ppm
FROM cum GROUP BY 1
"""


def kendall_tau(df, x_col: str, y_col: str, *,
                group_col: str = "source"):
    """Per-group exact Kendall tau-a between two integer signals —
    'do these two quality scores RANK documents the same way',
    the ordinal companion to score_auc (which needs a label) and
    quality_pr (which needs a threshold): tau_a = (C - D) /
    (n(n-1)/2) with C/D the strictly concordant/discordant pair
    counts; tied pairs (either coordinate) contribute 0 to the
    numerator and stay in the denominator, the classic tau-a
    convention — no sqrt tie correction, so the statistic is
    integer-exact:

        tau_ppm = sign(C - D) * (1e6 * |C - D|) div (n(n-1)/2)

    (sign decomposition because Spark's decimal div truncates
    toward zero while DuckDB's // floors — the moran_i rule).

    Scale: ONE map-side-combinable pass to the (group, x, y)
    CONTINGENCY counts — the only input scan; C and D come from a
    strict-x self-join over those AGGREGATE cells (each unordered
    pair counted once, from its lower-x cell), so the pair space is
    |cells|² per group, never n² — exact when the signals are
    discrete, and the documented contract at planetary scale is
    pre-binning x/y upstream (same as ks_stat). The cell join is
    equi-keyed on the group with a CPU-bound inequality residual:
    explicitly repartitioned one-partition-per-core first (AQE's
    byte-based coalescing cannot see CPU cost). n = 1 groups
    return NULL. -> (group, n, conc, disc, tau_ppm)."""
    from pyspark.sql import functions as F
    p = df.sparkSession.sparkContext.defaultParallelism
    ct = (df.groupBy(F.col(group_col).alias("g"),
                     F.col(x_col).alias("_x"),
                     F.col(y_col).alias("_y"))
          .agg(F.count(F.lit(1)).alias("_c"))
          .repartition(p, "g"))
    a, b = ct.alias("a"), ct.alias("b")
    pr = (a.join(b, (F.col("a.g") == F.col("b.g"))
                 & (F.col("b._x") > F.col("a._x")))
          .groupBy(F.col("a.g").alias("g"))
          .agg(F.sum(F.when(F.col("b._y") > F.col("a._y"),
                            F.col("a._c").cast("decimal(38,0)")
                            * F.col("b._c")).otherwise(F.lit(0)))
               .alias("_conc"),
               F.sum(F.when(F.col("b._y") < F.col("a._y"),
                            F.col("a._c").cast("decimal(38,0)")
                            * F.col("b._c")).otherwise(F.lit(0)))
               .alias("_disc")))
    grp = ct.groupBy("g").agg(F.sum("_c").alias("_n"))
    return (grp.join(pr, "g", "left")
            .fillna(0, subset=["_conc", "_disc"])
            .select(F.col("g").alias(group_col),
                    F.col("_n").cast("long").alias("n"),
                    F.col("_conc").cast("long").alias("conc"),
                    F.col("_disc").cast("long").alias("disc"),
                    F.expr("CASE WHEN _n < 2 THEN CAST(NULL AS "
                           "BIGINT) ELSE CAST("
                           "CASE WHEN _conc >= _disc THEN 1 ELSE -1 "
                           "END * ((1000000 * ABS(_conc - _disc)) "
                           "div (CAST(_n AS DECIMAL(38,0)) * "
                           "(_n - 1) div 2)) AS BIGINT) END"
                           ).alias("tau_ppm")))


def kendall_tau_sql(src_sql: str, *, group_col: str = "source") -> str:
    """DuckDB twin of kendall_tau over a subquery producing
    (<group>, x, y) — same contingency self-join, same sign-
    decomposed truncating division."""
    return f"""
WITH ct AS (SELECT {group_col} AS g, x, y, COUNT(*) AS c
            FROM ({src_sql}) GROUP BY 1, 2, 3),
pr AS (SELECT a.g,
       SUM(CASE WHEN b.y > a.y THEN CAST(a.c AS HUGEINT) * b.c
                ELSE 0 END) AS conc,
       SUM(CASE WHEN b.y < a.y THEN CAST(a.c AS HUGEINT) * b.c
                ELSE 0 END) AS disc
       FROM ct a JOIN ct b ON a.g = b.g AND b.x > a.x
       GROUP BY 1),
grp AS (SELECT g, SUM(c) AS n FROM ct GROUP BY 1)
SELECT grp.g AS {group_col},
       CAST(grp.n AS BIGINT) AS n,
       CAST(COALESCE(pr.conc, 0) AS BIGINT) AS conc,
       CAST(COALESCE(pr.disc, 0) AS BIGINT) AS disc,
       CAST(CASE WHEN grp.n < 2 THEN NULL
            ELSE (CASE WHEN COALESCE(pr.conc, 0) >=
                       COALESCE(pr.disc, 0) THEN 1 ELSE -1 END)
                 * ((1000000 * ABS(COALESCE(pr.conc, 0)
                                   - COALESCE(pr.disc, 0)))
                    // (CAST(grp.n AS HUGEINT) * (grp.n - 1) // 2))
            END AS BIGINT) AS tau_ppm
FROM grp LEFT JOIN pr ON grp.g = pr.g
"""


def spearman_rho(df, x_col: str, y_col: str, *,
                 group_col: str = "source"):
    """Per-group exact Spearman rank correlation between two integer
    signals, reported as SIGNED rho-squared in ppm — the magnitude
    companion to kendall_tau's concordance direction (tau saturates
    near +-1 slower than rho; reading both separates 'weakly
    monotone' from 'rank-linear'). Square roots would break integer
    exactness, so we emit sign(rho) * rho^2, which preserves order
    AND sign:

      doubled average ranks (ties -> midrank): 2r(v) = 2*cum_<v
        + c_v + 1 — integers, from ONE window over the per-(group,
        value) aggregate counts;
      with S_xy = sum 2r_x*2r_y, S_xx, S_yy over items and the
        identity sum(2r) = n(n+1):
        num = S_xy - n(n+1)^2, den_x = S_xx - n(n+1)^2,
        den_y = S_yy - n(n+1)^2   (the common factor n of the
        classic Pearson-on-ranks numerator/denominator cancels);
      srho2_ppm = sign(num) * (1e6 * num^2) div (den_x * den_y)

    (sign decomposition for the Spark-div/DuckDB-// mismatch — the
    moran_i rule). All-tied x or y (den = 0) -> NULL; n = 1 -> NULL.

    Scale: ONE map-side-combinable pass to (group, x, y) contingency
    cells — the only input scan; ranks come from windows over the
    per-axis AGGREGATE marginals (never a per-row sort), and the two
    rank joins are cell-count-sized and group-keyed. The 1e6*num^2
    product runs in DECIMAL(38,0)/HUGEINT, exact to |num| ~ 3e15 —
    i.e. n ~ 1e5 per group; past that pre-bin the signals upstream
    (the ks_stat/kendall_tau contract). -> (group, n, srho2_ppm)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    cells = (df.groupBy(F.col(group_col).alias("g"),
                        F.col(x_col).alias("_x"),
                        F.col(y_col).alias("_y"))
             .agg(F.count(F.lit(1)).alias("_c")))

    def ranks(axis):
        w = (Window.partitionBy("g").orderBy(axis)
             .rowsBetween(Window.unboundedPreceding, 0))
        return (cells.groupBy("g", axis)
                .agg(F.sum("_c").alias("_cv"))
                .withColumn("_2r", 2 * F.sum("_cv").over(w)
                            - F.col("_cv") + 1)
                .select("g", axis, "_2r"))
    rx = ranks("_x").withColumnRenamed("_2r", "_rx")
    ry = ranks("_y").withColumnRenamed("_2r", "_ry")
    dec = "CAST(_c AS DECIMAL(38,0))"
    agg = (cells.join(rx, ["g", "_x"]).join(ry, ["g", "_y"])
           .groupBy("g")
           .agg(F.sum("_c").alias("_n"),
                F.sum(F.expr(f"{dec} * _rx * _ry")).alias("_sxy"),
                F.sum(F.expr(f"{dec} * _rx * _rx")).alias("_sxx"),
                F.sum(F.expr(f"{dec} * _ry * _ry")).alias("_syy")))
    k = "CAST(_n AS DECIMAL(38,0)) * (_n + 1) * (_n + 1)"
    return (agg
            .withColumn("_num", F.expr(f"_sxy - {k}"))
            .withColumn("_dx", F.expr(f"_sxx - {k}"))
            .withColumn("_dy", F.expr(f"_syy - {k}"))
            .select(F.col("g").alias(group_col),
                    F.col("_n").cast("long").alias("n"),
                    F.expr("CASE WHEN _dx = 0 OR _dy = 0 OR _n < 2 "
                           "THEN CAST(NULL AS BIGINT) ELSE CAST("
                           "CASE WHEN _num >= 0 THEN 1 ELSE -1 END "
                           "* ((1000000 * _num * _num) "
                           "div (_dx * _dy)) AS BIGINT) END")
                    .alias("srho2_ppm")))


def spearman_rho_sql(src_sql: str, *,
                     group_col: str = "source") -> str:
    """DuckDB twin of spearman_rho over a subquery producing
    (<group>, x, y) — same midrank windows over aggregate marginals,
    same cancelled-n identity, sign-decomposed truncating HUGEINT
    division (num^2 is non-negative, so only the outer sign needs
    decomposing)."""
    def ranks(axis):
        return f"""(SELECT g, {axis},
        2 * SUM(cv) OVER (PARTITION BY g ORDER BY {axis}
                          ROWS UNBOUNDED PRECEDING) - cv + 1 AS r2
        FROM (SELECT g, {axis}, SUM(c) AS cv FROM cells
              GROUP BY 1, 2))"""
    return f"""
WITH cells AS (SELECT {group_col} AS g, x, y, COUNT(*) AS c
               FROM ({src_sql}) GROUP BY 1, 2, 3),
rx AS {ranks('x')},
ry AS {ranks('y')},
agg AS (SELECT cells.g, SUM(c) AS n,
        SUM(CAST(c AS HUGEINT) * rx.r2 * ry.r2) AS sxy,
        SUM(CAST(c AS HUGEINT) * rx.r2 * rx.r2) AS sxx,
        SUM(CAST(c AS HUGEINT) * ry.r2 * ry.r2) AS syy
        FROM cells
        JOIN rx ON cells.g = rx.g AND cells.x = rx.x
        JOIN ry ON cells.g = ry.g AND cells.y = ry.y
        GROUP BY 1),
fin AS (SELECT g, n,
        sxy - CAST(n AS HUGEINT) * (n + 1) * (n + 1) AS num,
        sxx - CAST(n AS HUGEINT) * (n + 1) * (n + 1) AS dx,
        syy - CAST(n AS HUGEINT) * (n + 1) * (n + 1) AS dy
        FROM agg)
SELECT g AS {group_col}, CAST(n AS BIGINT) AS n,
       CAST(CASE WHEN dx = 0 OR dy = 0 OR n < 2 THEN NULL
            ELSE (CASE WHEN num >= 0 THEN 1 ELSE -1 END)
                 * ((1000000 * num * num) // (dx * dy))
            END AS BIGINT) AS srho2_ppm
FROM fin
"""


# ---------------------------------------------------------------------------
# Benford first-digit audit (r5.43)
# ---------------------------------------------------------------------------

def _benford_ppm() -> dict[int, int]:
    """round(log10(1 + 1/d) * 1e6) for d = 1..9 — computed once in
    Python and embedded as the SAME literals in both engines, the
    constant-table convention (sketch._ln_ppm_case, freshness decay)
    that keeps log-based expectations integer-exact cross-engine."""
    import math
    return {d: round(math.log10(1 + 1 / d) * 1e6) for d in range(1, 10)}


def benford_digits(df, value_col: str, *, group_col: str = "source"):
    """Per-group Benford's-law first-digit audit over a positive
    INTEGER column — the classic generated-vs-organic data screen
    (fabricated counters, bot traffic and synthetic spam skew the
    leading-digit histogram away from log10(1 + 1/d); Benford 1938,
    Nigrini's audit framing). Emits the dense 9-digit grid per group
    so absent digits read as observed 0, not a missing row:

        obs_ppm = n_d * 1e6 div n,  dev_ppm = obs_ppm - exp_ppm

    with exp_ppm from the shared literal table. First digit comes
    from the decimal string of the BIGINT value (integer-to-string
    is engine-identical; doubles would not be) — rows with value
    <= 0 are excluded from the audit population.

    Scale: one groupBy(group, digit) count (map-side combinable, at
    most 9 rows per group per task) + a broadcast-sized dense-grid
    join; nothing touches row order. -> (group, digit, n_obs,
    obs_ppm, exp_ppm, dev_ppm), 9 rows per group."""
    from pyspark.sql import functions as F
    exp = _benford_ppm()
    pos = df.filter(F.col(value_col) > 0)
    fd = pos.select(
        F.col(group_col).alias("_g"),
        F.expr(f"CAST(substr(CAST({value_col} AS STRING), 1, 1) "
               f"AS BIGINT)").alias("_d"))
    counts = fd.groupBy("_g", "_d").agg(F.count(F.lit(1)).alias("_n"))
    totals = counts.groupBy("_g").agg(F.sum("_n").alias("_t"))
    spark = df.sparkSession
    digits = spark.range(1, 10).select(F.col("id").alias("_d"))
    grid = totals.crossJoin(F.broadcast(digits))
    exp_case = " ".join(f"WHEN _d = {d} THEN {p}"
                        for d, p in exp.items())
    out = (grid.join(counts, ["_g", "_d"], "left")
           .select("_g", "_d", F.coalesce("_n", F.lit(0)).alias("_n"),
                   "_t")
           .withColumn("obs_ppm", F.expr("_n * 1000000 div _t"))
           .withColumn("exp_ppm", F.expr(f"CASE {exp_case} END")))
    return out.select(
        F.col("_g").alias(group_col), F.col("_d").alias("digit"),
        F.col("_n").cast("long").alias("n_obs"),
        F.col("obs_ppm").cast("long").alias("obs_ppm"),
        F.col("exp_ppm").cast("long").alias("exp_ppm"),
        (F.col("obs_ppm") - F.col("exp_ppm")).cast("long")
        .alias("dev_ppm"))


def benford_digits_sql(src_sql: str, *, group_col: str = "source",
                       group_type: str = "VARCHAR") -> str:
    """DuckDB twin over a subquery producing ({group_col}, v) with v
    a positive BIGINT — same dense grid, same literal table."""
    exp = _benford_ppm()
    exp_case = " ".join(f"WHEN bf_grid.d = {dd} THEN {p}"
                        for dd, p in exp.items())
    return f"""
WITH bf_src AS (SELECT {group_col} AS g, v FROM ({src_sql})
                WHERE v > 0),
bf_fd AS (SELECT g, CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT)
                 AS d FROM bf_src),
bf_counts AS (SELECT g, d, COUNT(*) AS n FROM bf_fd GROUP BY 1, 2),
bf_tot AS (SELECT g, SUM(n) AS t FROM bf_counts GROUP BY 1),
bf_grid AS (SELECT g, t, gs.d FROM bf_tot,
            (SELECT unnest(range(1, 10)) AS d) gs),
bf_out AS (SELECT bf_grid.g AS g, bf_grid.d AS d,
           COALESCE(n, 0) AS nn, t,
           COALESCE(n, 0) * 1000000 // t AS obs_ppm,
           (CASE {exp_case} END) AS exp_ppm
           FROM bf_grid LEFT JOIN bf_counts
           ON bf_grid.g = bf_counts.g AND bf_grid.d = bf_counts.d)
SELECT CAST(g AS {group_type}) AS {group_col},
       CAST(d AS BIGINT) AS digit, CAST(nn AS BIGINT) AS n_obs,
       CAST(obs_ppm AS BIGINT) AS obs_ppm,
       CAST(exp_ppm AS BIGINT) AS exp_ppm,
       CAST(obs_ppm - exp_ppm AS BIGINT) AS dev_ppm
FROM bf_out
"""


# ---------------------------------------------------------------------------
# Distinctive-term odds ratios per source (r5.44)
# ---------------------------------------------------------------------------

def term_contrast(df, *, group_col: str = "source",
                  text_col: str = "text", id_col: str = "doc_id",
                  k: int = 10, min_docs: int = 5):
    """Top-``k`` DISTINCTIVE terms per source by document-frequency
    odds ratio against the rest of the corpus — the "what makes this
    crawl slice different" keyword contrast (the log-odds-ratio
    family of Monroe/Colaresi/Quinn 2008, kept integer-exact by
    ranking on the RAW Haldane-corrected odds ratio: log is monotone,
    so the ranking is identical and no ln() touches either engine):

        a = docs in g containing t        b = n_g - a
        c = docs outside g containing t   d = (N - n_g) - c
        or_ppm = (2a+1)(2d+1) * 1e6 div ((2b+1)(2c+1))

    The 2x+1 terms are the +0.5 Haldane-Anscombe correction cleared
    of fractions, so zero cells (a term absent outside its source)
    stay finite and every quantity is an integer. Document frequency,
    not token frequency — one spammy doc repeating a term 10^4 times
    should not crown it distinctive.

    Scale: one DISTINCT (doc, term) explode-shuffle is the only
    full-data pass; a, df_t and n_g are combinable aggregates over
    it; the rank window partitions by source over terms already
    filtered to a >= ``min_docs``. Products ride DECIMAL(38,0)/
    HUGEINT ((2N)^2 * 1e6 ~ 4e24 at N = 1e9 docs).
    -> (group, term, n_in, n_out, or_ppm, rank)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base = df.select(F.col(id_col).alias("_doc"),
                     F.col(group_col).alias("_g"),
                     F.col(text_col).alias("_t"))
    tok = (base.select("_doc", "_g",
                       F.explode(words_col("_t")).alias("term"))
           .distinct())
    a = tok.groupBy("_g", "term").agg(F.count(F.lit(1)).alias("_a"))
    dft = a.groupBy("term").agg(F.sum("_a").alias("_df"))
    ng = base.select("_doc", "_g").distinct() \
        .groupBy("_g").agg(F.count(F.lit(1)).alias("_ng"))
    n = base.select("_doc").distinct().agg(
        F.count(F.lit(1)).alias("_n"))
    j = (a.filter(F.col("_a") >= min_docs)
         .join(dft, "term")
         .join(F.broadcast(ng), "_g")
         .crossJoin(F.broadcast(n)))
    or_ = ("CAST(((2 * CAST(_a AS DECIMAL(38,0)) + 1) "
           "* (2 * (_n - _ng - _df + _a) + 1) * 1000000) div "
           "((2 * (_ng - _a) + 1) "
           "* (2 * CAST(_df - _a AS DECIMAL(38,0)) + 1)) AS BIGINT)")
    w = Window.partitionBy("_g").orderBy(
        F.col("or_ppm").desc(), F.col("term").asc())
    return (j.withColumn("or_ppm", F.expr(or_))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("_g").alias(group_col), "term",
                    F.col("_a").cast("long").alias("n_in"),
                    (F.col("_df") - F.col("_a")).cast("long")
                    .alias("n_out"),
                    "or_ppm", F.col("rank").cast("int").alias("rank")))


def term_contrast_sql(table: str = "documents", *,
                      group_col: str = "source", k: int = 10,
                      min_docs: int = 5) -> str:
    """DuckDB twin of term_contrast — identical token regex,
    identical cleared-fraction Haldane arithmetic in HUGEINT; every
    factor is positive so floor == trunc."""
    return f"""
WITH tc_tok AS (
  SELECT DISTINCT doc_id, {group_col} AS g,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RX}')) AS term
  FROM {table}),
tc_a AS (SELECT g, term, COUNT(*) AS a FROM tc_tok GROUP BY 1, 2),
tc_df AS (SELECT term, SUM(a) AS df FROM tc_a GROUP BY 1),
tc_ng AS (SELECT {group_col} AS g, COUNT(DISTINCT doc_id) AS ng
          FROM {table} GROUP BY 1),
tc_n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM {table}),
tc_or AS (
  SELECT g, term, a, df - a AS n_out,
         CAST(((2 * CAST(a AS HUGEINT) + 1)
               * (2 * (n - ng - df + a) + 1) * 1000000) //
              ((2 * (ng - a) + 1)
               * (2 * CAST(df - a AS HUGEINT) + 1)) AS BIGINT)
           AS or_ppm
  FROM tc_a JOIN tc_df USING (term) JOIN tc_ng USING (g), tc_n
  WHERE a >= {min_docs}),
tc_r AS (SELECT g, term, a, n_out, or_ppm,
         ROW_NUMBER() OVER (PARTITION BY g
             ORDER BY or_ppm DESC, term ASC) AS rank
         FROM tc_or)
SELECT g AS {group_col}, term, CAST(a AS BIGINT) AS n_in,
       CAST(n_out AS BIGINT) AS n_out, or_ppm,
       CAST(rank AS INTEGER) AS rank
FROM tc_r WHERE rank <= {k}
"""
