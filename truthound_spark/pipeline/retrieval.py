"""Distributed BM25 retrieval over a document corpus.

The "query your corpus" primitive a curation pipeline leans on daily —
keyword contamination hunts, eval-set leakage triage, corpus QA spot
checks — as pure relational algebra:

1. **Index** = two aggregates over the tokenized corpus: per-(doc, term)
   term frequencies and per-term document frequencies (plus N and the
   average doc length). At 100 TB this is one explode + two hash
   aggregations, shuffle keys are terms — the classic inverted index.
2. **Search** = broadcast the (tiny) query-term table, join it against
   the tf table ON TERM (only postings for query terms are touched),
   compute per-(query, doc, term) BM25 contributions, and sum per
   (query, doc) — map-side partials, then a per-query top-k window
   (WindowGroupLimit).

Determinism contract (same as the rest of the engine): every per-term
contribution is a fixed expression tree over exact integer counts —
bit-identical in any IEEE engine — and the per-document score sums
QUANTIZED longs (``round(contrib·10⁹)``), so the distributed sum is
addition-order-independent and a DuckDB oracle hash-certifies scores AND
ranks. BM25 parameters k1=1.2, b=0.75 (the standard Robertson defaults).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from truthound_spark.pipeline.dedup import words

__all__ = ["bm25_index", "bm25_search", "tfidf_keywords", "boilerplate_ngrams"]

_QSCALE = 1e9


def _terms(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term) rows — normalized words, empties dropped."""
    w = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.filter(words(F.col(text_col)), lambda x: x != F.lit("")).alias("__w"),
    )
    return w.select("id", F.explode_outer("__w").alias("term")).filter(
        F.col("term").isNotNull()
    )


def bm25_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame, int, float]:
    """Build the BM25 statistics: returns (tf, dfreq, n_docs, avgdl).

    tf = (id, term, tf, dl); dfreq = (term, df). Persist both as parquet
    (tf bucketed by term) to amortize indexing across searches."""
    terms = _terms(df, text_col, id_col)
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = terms.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    tf = tf.join(dl, "id")
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.count()
    total_len = dl.agg(F.sum("dl").cast("long")).collect()[0][0] or 0
    # float(total)/float(n): the CAST-then-divide rounding order a SQL
    # engine reproduces (cf. clustering.kmeans)
    avgdl = float(total_len) / float(n_docs) if n_docs else 0.0
    return tf, dfreq, n_docs, avgdl


def bm25_search(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_text_col: str = "text",
    query_id_col: str = "query_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k documents per query. Query terms are DISTINCT per query
    (standard bag-of-words query handling). Returns (query_id, doc_id,
    score, rank) — score is the 10⁻⁹-quantized BM25 sum (documented,
    deterministic)."""
    tf, dfreq, n_docs, avgdl = bm25_index(df, text_col, id_col)
    qterms = (
        _terms(queries, query_text_col, query_id_col)
        .withColumnRenamed("id", "query_id")
        .dropDuplicates(["query_id", "term"])
    )
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
    )
    contrib = idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq.join(F.broadcast(qterms.select("term").distinct()), "term")), "term")
        .select(
            "query_id",
            F.col("id").alias("doc_id"),
            F.round(contrib * F.lit(_QSCALE)).cast("long").alias("qcontrib"),
        )
        .groupBy("query_id", "doc_id")
        .agg((F.sum("qcontrib").cast("double") / F.lit(_QSCALE)).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col("doc_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def tfidf_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Per-document top-k TF-IDF keywords — the corpus-exploration /
    labeling primitive (what is this document about, relationally).

    tf and df come from the same two hash aggregations as
    :func:`bm25_index`; idf is the smoothed ln((1+N)/(1+df)) + 1 so
    corpus-universal terms still score positive. The per-term score is
    quantized to 1e-9 longs BEFORE ranking (same determinism contract as
    BM25: addition-order-independent, engine-reproducible ranks with
    (score desc, term) tie-break). Per-doc top-k is a WindowGroupLimit —
    map-side partial limiting, no global sort.

    Returns (id, term, tfidf, rank)."""
    terms = _terms(df, text_col, id_col)
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.count()
    idf = F.log(
        (F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("df"))
    ) + F.lit(1.0)
    qscore = F.round(F.col("tf") * idf * F.lit(_QSCALE)).cast("long")
    scored = tf.join(dfreq, "term").select(
        "id", "term", qscore.alias("__q")
    )
    w = Window.partitionBy("id").orderBy(F.desc("__q"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "id",
            "term",
            (F.col("__q").cast("double") / F.lit(_QSCALE)).alias("tfidf"),
            "rank",
        )
    )


def boilerplate_ngrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_docs: int = 2,
    k: int = 100,
) -> DataFrame:
    """Corpus-wide BOILERPLATE REPORT: the top-k n-grams by distinct-doc
    spread — the headers/footers/license-blocks/templates that
    :func:`truthound_spark.pipeline.dedup.self_dedup_spans` would excise,
    surfaced for human review first (curate with eyes open, then cut).

    One distinct + one groupBy on the n-gram string; the top-k is
    orderBy+limit (TakeOrdered: per-partition heads, driver merge of k
    rows), ranked deterministically by (doc spread desc, gram asc).

    Returns (gram, n_docs, rank)."""
    from truthound_spark.pipeline.dedup import _shingle_rows

    grams = _shingle_rows(df, text_col, id_col, n).dropDuplicates(["id", "g"])
    spread = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    top = spread.orderBy(F.desc("n_docs"), "g").limit(k)
    w = Window.orderBy(F.desc("n_docs"), "g")
    return top.withColumn("rank", F.row_number().over(w)).select(
        F.col("g").alias("gram"), "n_docs", "rank"
    )
