"""Ranked-retrieval declared queries: TF-IDF term weighting and BM25
document scoring over the documents corpus (training-data-pipeline
operators — corpus-level statistics feeding relevance-ranked selection,
the primitive behind quality-weighted sampling and dedup-aware search).

Reference parity: the reference has no retrieval engine; these are
declared extensions of the text-analysis family (SURVEY §7.2 M5),
built on the same tokenizer as ``txt_token_stats``
(`functions/text.py` WORD_RE).

Cross-engine determinism: Spark's ``ln`` and DuckDB's ``ln`` differ by
1 ulp on ~6% of inputs (measured), so every score is quantized with
``round(score, 4)`` before output/ranking — a 1-ulp input wobble
(~1e-16 relative) cannot cross a 1e-4 rounding boundary for the
transcendental values involved. BM25's per-term scores are summed as
DECIMAL(18,4) (exact, order-independent) and cast back to DOUBLE.

Scale notes (100 TB):
- Term frequencies are map-side partial-aggregated before their
  (doc_id, term) shuffle; document frequency is a partial-aggregated
  `groupBy(term).count()` joined back onto the postings. The join is
  left to AQE: a small dictionary becomes a broadcast join (postings
  never shuffle by term), a large one a shuffle join with AQE
  skew-splitting. A COUNT-over-Window.partitionBy(term) would instead
  pin every posting of a stopword term into ONE buffering task — the
  classic term-skew hotspot this shape avoids.
- BM25 filters to the query's terms immediately after tokenize, so the
  per-term shuffle carries only matching postings (query-term selective
  scan), never the full vocabulary.
- Corpus scalars (N, total token count) are one-row aggregates
  broadcast into the scoring stage.
- Final BM25 top-k is sort+limit (TakeOrderedAndProject — per-partition
  top-k then a k-row merge on the driver), deterministic because
  (score DESC, doc_id) is a total order; no global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sentiflow_spark.functions.text import WORD_RE
from sentiflow_spark.queries.registry import register
from sentiflow_spark.tables import load

TOP_TERMS = 3
BM25_TERMS = ("query", "join", "stream")
BM25_TOP_K = 20
K1 = 1.2
B = 0.75

_DUCK_TOKS = f"""
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{WORD_RE}')) AS term
  FROM documents
)"""


def _tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(WORD_RE), F.lit(0))
        ).alias("term"),
    )


@register(
    "ret_tfidf_topk",
    oracle=f"""
    WITH {_DUCK_TOKS},
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ),
    withdf AS (
      SELECT doc_id, term, tf, COUNT(*) OVER (PARTITION BY term) AS df FROM tf
    ),
    scored AS (
      SELECT doc_id, term, tf, df,
             round(CAST(tf AS DOUBLE) * ln(
               ((SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) + 1.0)
               / (CAST(df AS DOUBLE) + 1.0)), 4) AS score
      FROM withdf
    )
    SELECT doc_id, term, tf, df, score, rk FROM (
      SELECT doc_id, term, tf, df, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rk
      FROM scored
    ) WHERE rk <= {TOP_TERMS}
    """,
    tags=("retrieval", "text", "M5", "bench"),
    doc="Top-3 TF-IDF terms per document (smoothed idf, quantized score).",
)
def ret_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tf = (
        _tokens(docs)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        # pinned: TWO consumers (the df dictionary and the scoring
        # join) would otherwise each re-run the tokenize+explode+agg
        # lineage — the (doc, term, tf) postings table is the classic
        # materialization point (far smaller than the token stream it
        # derives from), so one corpus tokenize feeds both (r12,
        # guide §5 compute-once)
        .localCheckpoint(eager=False)
    )
    # df via partial-agg groupBy + join (AQE picks broadcast when the
    # term dictionary fits, skew-split shuffle join when it doesn't) —
    # never a Window over term, which would single-task stopword terms.
    df_map = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    withdf = tf.join(df_map, "term")
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n"))
    scored = withdf.join(F.broadcast(n)).withColumn(
        "score",
        F.round(
            F.col("tf").cast("double")
            * F.log((F.col("n") + F.lit(1.0)) / (F.col("df").cast("double") + F.lit(1.0))),
            4,
        ),
    )
    rk = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= TOP_TERMS)
        .select("doc_id", "term", "tf", "df", "score", "rk")
    )


_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

# BM25 oracle fragments, shared verbatim with ret_hybrid_rrf's oracle
# (queries/corpus_queries.py) so the sparse channel can never drift
# from the ranking it wraps. _DUCK_BM25_CTES expects the toks CTE
# (_DUCK_TOKS) in scope; _DUCK_BM25_TOPK expects scored.
_DUCK_BM25_CTES = f"""
    dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(dl) AS DOUBLE) AS total_dl
      FROM dl
    ),
    tfq AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks
      WHERE term IN ({_TERMS_SQL}) GROUP BY doc_id, term
    ),
    withdf AS (
      SELECT doc_id, term, tf, COUNT(*) OVER (PARTITION BY term) AS df FROM tfq
    ),
    scored AS (
      SELECT w.doc_id,
             CAST(round(
               ln(1.0 + (s.n - CAST(w.df AS DOUBLE) + 0.5)
                        / (CAST(w.df AS DOUBLE) + 0.5))
               * (CAST(w.tf AS DOUBLE) * {K1 + 1.0!r})
               / (CAST(w.tf AS DOUBLE)
                  + CAST({K1!r} AS DOUBLE)
                    * ((1.0 - CAST({B!r} AS DOUBLE))
                       + CAST({B!r} AS DOUBLE)
                         * (CAST(d.dl AS DOUBLE) / (s.total_dl / s.n)))),
               4) AS DECIMAL(18,4)) AS term_score
      FROM withdf w JOIN dl d ON d.doc_id = w.doc_id CROSS JOIN stats s
    )"""

_DUCK_BM25_TOPK = f"""SELECT doc_id, n_terms, score FROM (
      SELECT doc_id, COUNT(*) AS n_terms,
             CAST(SUM(term_score) AS DOUBLE) AS score
      FROM scored GROUP BY doc_id
    ) ORDER BY score DESC, doc_id LIMIT {BM25_TOP_K}"""


@register(
    "ret_bm25_topk",
    oracle=f"""
    WITH {_DUCK_TOKS},{_DUCK_BM25_CTES}
    {_DUCK_BM25_TOPK}
    """,
    tags=("retrieval", "text", "M5", "bench"),
    doc="BM25 ranked retrieval for a fixed term query, top-20 documents.",
)
def ret_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = _tokens(docs)
    # ONE tokenize pass, ONE partial-agg shuffle: for a fixed small
    # query, per-term tf comes out of the same per-doc aggregation as
    # dl (a conditional-count column per query term), so the corpus is
    # scanned once and the dl join disappears — measured 22 s → one
    # aggregation at the 20× probe vs the tokenize-twice shape. For
    # unbounded queries the (doc, term) groupBy shape is the fallback.
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum((F.col("term") == t).cast("long")).alias(f"_tf_{i}")
            for i, t in enumerate(BM25_TERMS)
        ],
    )
    # Corpus scalars (N = docs with >=1 token, total token count) come
    # from the same aggregate — no separate COUNT scans.
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("dl").cast("double").alias("total_dl"),
    )
    melted = (
        per_doc.select(
            "doc_id",
            "dl",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("term"), F.col(f"_tf_{i}").alias("tf")
                        )
                        for i, t in enumerate(BM25_TERMS)
                    ]
                )
            ).alias("x"),
        )
        .select("doc_id", "dl", "x.*")
        .filter(F.col("tf") > 0)
    )
    # df dictionary is |query| rows → always broadcast.
    dfq = melted.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    withdf = melted.join(F.broadcast(dfq), "term")
    tfd = F.col("tf").cast("double")
    dfd = F.col("df").cast("double")
    dld = F.col("dl").cast("double")
    idf = F.log(
        F.lit(1.0) + (F.col("n") - dfd + F.lit(0.5)) / (dfd + F.lit(0.5))
    )
    denom = tfd + F.lit(K1) * (
        (F.lit(1.0) - F.lit(B))
        + F.lit(B) * (dld / (F.col("total_dl") / F.col("n")))
    )
    scored = withdf.join(F.broadcast(stats)).withColumn(
        "term_score",
        F.round(idf * (tfd * F.lit(K1 + 1.0)) / denom, 4).cast("decimal(18,4)"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("term_score").cast("double").alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOP_K)
    )


# ------------------------------------------- cross-encoder rerank (stubbed)

RERANK_K = 10


@register(
    "ret_rerank_stub",
    oracle=f"""
    WITH {_DUCK_TOKS},{_DUCK_BM25_CTES},
    cand AS (
      SELECT doc_id, n_terms, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS bm25_rank
      FROM ({_DUCK_BM25_TOPK})
    ),
    rer AS (
      SELECT c.doc_id, c.score AS bm25_score, c.bm25_rank,
             ((d.n_chars * 131 + c.bm25_rank * 17) % 2001 - 1000) / 1000.0
               AS rerank_logit
      FROM cand c JOIN documents d USING (doc_id)
    )
    SELECT doc_id, bm25_score, bm25_rank, rerank_logit, rank FROM (
      SELECT *, row_number() OVER (ORDER BY rerank_logit DESC, doc_id) AS rank
      FROM rer
    ) WHERE rank <= {RERANK_K}
    """,
    tags=("retrieval", "M5", "rerank", "arrow-udf", "bench"),
    doc=f"Two-stage retrieve-then-rerank: BM25 narrows the corpus to "
    f"{BM25_TOP_K} candidates, a cross-encoder scores ONLY those "
    f"{BM25_TOP_K} rows through an Arrow-batched scalar pandas_udf, "
    f"and the final top-{RERANK_K} ranks by the model logit — the "
    "standard two-tower production shape where the expensive model "
    "never sees more than k rows per query no matter the corpus size "
    "(the 100 TB knob is BM25's k, not the model). The model is the "
    "repo's deterministic stub convention (U1-U3, mm_feature_extract): "
    "a fixed arithmetic pseudo-logit over (n_chars, bm25_rank) that "
    "the oracle mirrors exactly, so the Arrow plumbing, candidate "
    "pruning and rerank ordering are all hash-checked while the real "
    "transformer stays injectable. Plan: candidates come from the "
    "single-scan BM25 aggregate; the pandas_udf runs over "
    f"{BM25_TOP_K} rows (ArrowEvalPython, guarded by "
    "test_plans.py's arrow-udf sweep).",
)
def ret_rerank_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from sentiflow_spark.functions.pandas_fns import rerank_logit

    docs = load(spark, sf_dir, "documents")
    cand = ret_bm25_topk(spark, sf_dir).withColumn(
        "bm25_rank",
        F.row_number().over(W.orderBy(F.col("score").desc(), "doc_id")),
    )
    rer = cand.join(docs.select("doc_id", "n_chars"), "doc_id").select(
        "doc_id",
        F.col("score").alias("bm25_score"),
        "bm25_rank",
        rerank_logit(F.col("n_chars"), F.col("bm25_rank")).alias("rerank_logit"),
    )
    w = W.orderBy(F.col("rerank_logit").desc(), "doc_id")
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= RERANK_K)
        .select("doc_id", "bm25_score", "bm25_rank", "rerank_logit", "rank")
    )
