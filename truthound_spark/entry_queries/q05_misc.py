"""Entry-query registry section 5 (split from the single entry_queries module, r13). Import order = registration order = the original module's order."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from truthound_spark.entry_queries._core import (  # noqa: F401
    _BPE_ROUNDS,
    _BPE_SQL,
    _COS_SQL,
    _IVF_D2,
    _NORM_SQL,
    _SHINGLES_SQL,
    _WORDS_SQL,
    _bpe_oracle_ctes,
    _bpe_oracle_sql,
    _ivfpq_oracle_sql,
    _ivfpq_residual_oracle_sql,
    _lsh_multiprobe_oracle,
    _scalar_df,
    register,
    t,
)



@register(
    "semantic_decontaminate_embeddings",
    """
    WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    c AS (SELECT * FROM v WHERE id % 5 <> 0),
    p AS (SELECT * FROM v WHERE id % 5 = 0),
    m AS (
      SELECT c.id,
             list_dot_product(c.e, p.e) / (sqrt(list_dot_product(c.e, c.e)) * sqrt(list_dot_product(p.e, p.e))) AS cosine
      FROM c, p
    )
    SELECT id, CAST(COUNT(*) AS BIGINT) AS n_matches, MAX(ROUND(cosine, 6)) AS max_cosine
    FROM m WHERE cosine >= 0.45 GROUP BY id ORDER BY id
    """,
)
def q_semantic_decontaminate_embeddings(spark, sf_dir):
    """Embedding-space decontamination (pipeline/dedup.py
    semantic_decontaminate): corpus vectors (vec_id % 5 != 0) whose
    cosine to ANY probe vector (vec_id % 5 == 0) reaches 0.45 — the
    semantic complement to n-gram collision decontamination, catching
    paraphrased benchmark leakage. Probe side broadcast, cosine rides
    the nested-loop join, corpus never shuffles."""
    from truthound_spark.pipeline.dedup import semantic_decontaminate

    emb = t(spark, sf_dir, "embeddings")
    out = semantic_decontaminate(
        emb.filter(F.col("vec_id") % 5 != 0),
        emb.filter(F.col("vec_id") % 5 == 0),
        threshold=0.45,
    )
    return out.orderBy("id")


@register(
    "self_dedup_spans_documents",
    """
    WITH src AS (
      SELECT doc_id AS id, text,
             CASE WHEN length(trim(text)) > 0
                  THEN string_split_regex(trim(text), '\\s+')
                  ELSE [] END AS raw
      FROM documents
    ),
    nrm AS (
      SELECT id, raw,
             list_transform(raw, t -> regexp_replace(lower(t), '[^a-z0-9]', '', 'g')) AS nt
      FROM src
    ),
    grams AS (
      SELECT id, u.s AS start, array_to_string(nt[u.s:u.s + 7], ' ') AS gram
      FROM (
        SELECT id, nt,
               CASE WHEN len(nt) >= 8 THEN range(1, len(nt) - 8 + 2) ELSE [] END AS starts
        FROM nrm
      ), UNNEST(starts) AS u(s)
    ),
    ranked AS (
      SELECT id, start,
             COUNT(*) OVER (PARTITION BY gram) AS occ,
             ROW_NUMBER() OVER (PARTITION BY gram ORDER BY id, start) AS rn
      FROM grams
    ),
    covered AS (
      SELECT DISTINCT id, u.pos
      FROM (SELECT id, start FROM ranked WHERE occ >= 2 AND rn > 1) m,
           UNNEST(range(start, start + 8)) AS u(pos)
    ),
    toks AS (
      SELECT id, u.pos, raw[u.pos] AS tok
      FROM nrm, UNNEST(range(1, len(raw) + 1)) AS u(pos)
    ),
    kept AS (
      SELECT t.id, t.pos, t.tok FROM toks t
      LEFT JOIN covered c ON t.id = c.id AND t.pos = c.pos
      WHERE c.id IS NULL
    ),
    reb AS (
      SELECT id, string_agg(tok, ' ' ORDER BY pos) AS text, COUNT(*) AS kept
      FROM kept GROUP BY id
    )
    SELECT s.id, COALESCE(r.text, '') AS text,
           CAST(len(s.raw) - COALESCE(r.kept, 0) AS BIGINT) AS removed_tokens,
           CAST(len(s.raw) AS BIGINT) AS total_tokens
    FROM src s LEFT JOIN reb r ON s.id = r.id
    ORDER BY s.id
    """,
)
def q_self_dedup_spans_documents(spark, sf_dir):
    """Within-corpus repeated-span self-dedup (pipeline/dedup.py
    self_dedup_spans — Lee et al. 2022 substring dedup, relational form):
    every 8-token normalized span occurring more than once in the corpus
    keeps its globally-first (id, start) occurrence; all other
    occurrences are excised and the surviving original tokens re-spliced.
    The oracle replicates owner selection with a window (ROW_NUMBER over
    (id, start) per gram == Spark's min-struct) and must match the
    rebuilt text byte-for-byte. The corpus' seeded near-duplicates
    guarantee real repeated spans."""
    from truthound_spark.pipeline.dedup import self_dedup_spans

    docs = t(spark, sf_dir, "documents")
    return self_dedup_spans(docs, n=8).orderBy("id")


@register(
    "corpus_diff_documents",
    f"""
    WITH o AS (
      SELECT doc_id AS id, md5({_NORM_SQL.format(c='text')}) AS fp FROM documents
    ),
    n AS (
      SELECT doc_id AS id,
             md5({_NORM_SQL.format(c="CASE WHEN doc_id % 5 = 0 THEN text || ' edited' ELSE text END")}) AS fp
      FROM documents WHERE doc_id % 7 <> 0
      UNION ALL
      SELECT doc_id + 1000000, md5({_NORM_SQL.format(c='text')})
      FROM documents WHERE doc_id < 20
    )
    SELECT COALESCE(o.id, n.id) AS id,
           CASE WHEN o.id IS NULL THEN 'added'
                WHEN n.id IS NULL THEN 'removed'
                WHEN o.fp = n.fp THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM o FULL OUTER JOIN n ON o.id = n.id
    ORDER BY id
    """,
)
def q_corpus_diff_documents(spark, sf_dir):
    """Corpus snapshot diff (pipeline/dedup.py corpus_diff): the new
    version drops every 7th doc, edits every 5th, and adds 20 fresh ids —
    the diff reports added/removed/changed/unchanged per id from ONE
    fingerprint-only full-outer join (the incremental-revalidation and
    release-note primitive)."""
    from truthound_spark.pipeline.dedup import corpus_diff

    docs = t(spark, sf_dir, "documents")
    new = (
        docs.filter(F.col("doc_id") % 7 != 0)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" edited"))
            ).otherwise(F.col("text")),
        )
        .unionByName(
            docs.filter(F.col("doc_id") < 20).withColumn(
                "doc_id", F.col("doc_id") + 1_000_000
            )
        )
    )
    return corpus_diff(docs, new).orderBy("id")


@register(
    "ngram_novelty_documents",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    inv AS (
      SELECT id, g FROM (SELECT id, unnest(sh) AS g FROM sh) WHERE g IS NOT NULL AND g <> ''
    ),
    dfreq AS (SELECT g, COUNT(*) AS df FROM inv GROUP BY 1),
    per_doc AS (
      SELECT inv.id,
             CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(SUM(CASE WHEN dfreq.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS novel_grams
      FROM inv JOIN dfreq ON inv.g = dfreq.g GROUP BY 1
    )
    SELECT d.doc_id AS id,
           COALESCE(p.n_grams, 0) AS n_grams,
           COALESCE(p.novel_grams, 0) AS novel_grams,
           ROUND(COALESCE(CAST(p.novel_grams AS DOUBLE) / p.n_grams, 0.0), 6) AS novelty
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.id
    ORDER BY id
    """,
)
def q_ngram_novelty_documents(spark, sf_dir):
    """Per-document n-gram novelty (pipeline/text.py ngram_novelty): the
    fraction of a doc's distinct 3-grams unique to it corpus-wide — the
    self-information curation signal (seeded near-duplicates score low,
    original docs high). One shingle pass + one df aggregate + one join;
    shuffle keys are n-grams."""
    from truthound_spark.pipeline.text import ngram_novelty

    docs = t(spark, sf_dir, "documents")
    return ngram_novelty(docs, n=3).orderBy("id")


@register(
    "bigram_perplexity_documents",
    f"""
    WITH w AS (
      SELECT doc_id AS id,
             list_filter(string_split({_NORM_SQL.format(c='text')}, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    bg AS (
      SELECT id, u.b[1] AS w1, u.b[2] AS w2 FROM (
        SELECT id,
               CASE WHEN len(ws) >= 2
                    THEN list_transform(range(1, len(ws)), i -> [ws[i], ws[i + 1]])
                    ELSE [] END AS bs
        FROM w
      ), UNNEST(bs) AS u(b)
    ),
    uni AS (
      SELECT t AS w1, COUNT(*) AS c1 FROM (SELECT unnest(ws) AS t FROM w) GROUP BY 1
    ),
    v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS vocab FROM uni),
    big AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
    lp AS (
      SELECT bg.id,
             CAST(round(-LN((big.c12 + 1.0) / (uni.c1 + v.vocab)) * 1000000.0) AS BIGINT) AS qlp
      FROM bg JOIN big ON bg.w1 = big.w1 AND bg.w2 = big.w2
      JOIN uni ON bg.w1 = uni.w1, v
    ),
    s AS (
      SELECT id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(qlp) AS DOUBLE) / COUNT(*) / 1000000.0 AS anl
      FROM lp GROUP BY id
    )
    SELECT d.doc_id AS id, COALESCE(s.n_bigrams, 0) AS n_bigrams,
           ROUND(s.anl, 6) AS avg_neg_logprob,
           ROUND(EXP(s.anl), 4) AS perplexity
    FROM documents d LEFT JOIN s ON d.doc_id = s.id
    ORDER BY id
    """,
)
def q_bigram_perplexity_documents(spark, sf_dir):
    """Corpus-self-trained bigram-LM perplexity (pipeline/text.py
    bigram_perplexity — the relational CCNet/KenLM filter shape):
    add-one-smoothed p(w2|w1) from corpus-wide counts, per-doc mean
    -ln p over ALL bigram positions as a quantized-long sum (the exact
    mean that lets the oracle certify the floats), perplexity = e^score.
    Outlier-high = noise; outlier-low = boilerplate."""
    from truthound_spark.pipeline.text import bigram_perplexity

    docs = t(spark, sf_dir, "documents")
    return bigram_perplexity(docs).orderBy("id")


@register(
    "trained_classifier_scores_documents",
    f"""
    WITH w AS (
      SELECT doc_id, {_WORDS_SQL.format(t='text')} AS ws FROM documents
    ),
    f AS (
      SELECT doc_id,
             ws || list_transform(range(1, len(ws)), i -> ws[i] || '_' || ws[i+1]) AS feats
      FROM w
    ),
    b AS (
      SELECT doc_id,
             list_transform(feats,
               t -> CAST(('0x' || substr(md5(t), 1, 6)) AS BIGINT) % 4096) AS bk
      FROM f
    ),
    m AS (SELECT doc_id, u.bucket FROM b, UNNEST(bk) AS u(bucket)),
    cp AS (SELECT bucket, COUNT(*) AS n FROM m WHERE doc_id % 2 = 0 GROUP BY 1),
    cn AS (SELECT bucket, COUNT(*) AS n FROM m WHERE doc_id % 2 = 1 GROUP BY 1),
    tot AS (
      SELECT (SELECT COALESCE(SUM(n), 0) FROM cp) + 4096 AS pt,
             (SELECT COALESCE(SUM(n), 0) FROM cn) + 4096 AS nt
    ),
    wfull AS (
      SELECT gs.i AS bucket,
             LN((COALESCE(cp.n, 0) + 1) / tot.pt) - LN((COALESCE(cn.n, 0) + 1) / tot.nt) AS wt
      FROM generate_series(0, 4095) AS gs(i)
      LEFT JOIN cp ON gs.i = cp.bucket
      LEFT JOIN cn ON gs.i = cn.bucket, tot
    ),
    warr AS (SELECT list(wt ORDER BY bucket) AS ws FROM wfull)
    SELECT doc_id,
           ROUND(1.0 / (1.0 + EXP(-(CASE WHEN len(bk) > 0 THEN
             list_sum(list_transform(bk, x -> warr.ws[x + 1])) / len(bk)
             ELSE 0.0 END))), 6) AS classifier_score
    FROM b, warr ORDER BY doc_id
    """,
)
def q_trained_classifier_scores_documents(spark, sf_dir):
    """END-TO-END trained quality classifier (pipeline/text.py
    train_quality_weights + classifier_quality_score): even-id docs play
    the high-quality exemplar corpus, odd-id docs the raw crawl; training
    is the closed-form Naive Bayes log-odds over hashed features (one
    count aggregate per side, no gradient loop), scoring inlines the
    4096 trained weights as a literal array. The oracle retrains
    relationally and replays the identical list-fold scoring — the full
    train->apply cycle hash-certified."""
    from truthound_spark.pipeline.text import (
        classifier_quality_score,
        train_quality_weights,
    )

    docs = t(spark, sf_dir, "documents")
    weights = train_quality_weights(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
    )
    out = classifier_quality_score(docs, weights=weights)
    return out.select("doc_id", "classifier_score").orderBy("doc_id")


@register("bpe_train_documents", _bpe_oracle_sql(_BPE_ROUNDS))
def q_bpe_train_documents(spark, sf_dir):
    """Distributed BPE tokenizer training (pipeline/tokenizer.py
    bpe_train — Sennrich et al. 2016): the corpus collapses to a
    (word, count) table in ONE pass, then each merge round is one
    aggregate over that vocabulary-sized table (most-frequent adjacent
    symbol pair, ties (left, right)-lexicographic) plus a literal string
    replace on delimiter-wrapped symbol strings — which IS the greedy
    left-to-right merge fold, in both engines. The oracle replays all 6
    rounds as generated CTEs; counts are exact integers, so the whole
    iterative training loop hash-matches."""
    from truthound_spark.pipeline.tokenizer import bpe_train

    df = t(spark, sf_dir, "documents")
    return bpe_train(df, rounds=_BPE_ROUNDS).orderBy("round")


@register(
    "bpe_token_counts_documents",
    _bpe_oracle_ctes(_BPE_ROUNDS)
    + f""",
    enc AS (
      SELECT doc_id,
             len(list_filter(string_split({_NORM_SQL.format(c='text')}, ' '),
                             w -> w <> '')) AS n_words,
             {"".join("replace(" for _ in range(_BPE_ROUNDS))}array_to_string(
               list_transform(
                 list_filter(string_split({_NORM_SQL.format(c='text')}, ' '),
                             w -> w <> ''),
                 w -> '|' || array_to_string(string_split(w,''),'||') || '|'
               ), ' ')"""
    + "".join(
        f""",
               COALESCE((SELECT '|'||x||'||'||y||'|' FROM m{r}), chr(1)),
               COALESCE((SELECT '|'||x||y||'|' FROM m{r}), chr(1)))"""
        for r in range(1, _BPE_ROUNDS + 1)
    )
    + """ AS s
      FROM documents
    )
    SELECT doc_id AS id, CAST(n_words AS BIGINT) AS n_words,
           CASE WHEN n_words > 0 THEN
             CAST((length(s) - length(replace(s, '||', ''))) / 2 + n_words AS BIGINT)
           ELSE 0 END AS n_tokens
    FROM enc ORDER BY id
    """,
)
def q_bpe_token_counts_documents(spark, sf_dir):
    """Tokenizer-true token budget (pipeline/tokenizer.py
    bpe_token_counts): the 6 trained merges apply to every document as
    nested literal replaces inside ONE map-only projection — no
    tokenized array materializes; the count falls out of delimiter
    arithmetic. The oracle retrains the merges (same CTEs as
    bpe_train_documents) and replays the replace chain + length
    arithmetic — training AND application certified end-to-end."""
    from truthound_spark.pipeline.tokenizer import bpe_token_counts, bpe_train

    df = t(spark, sf_dir, "documents")
    merges = bpe_train(df, rounds=_BPE_ROUNDS)
    return bpe_token_counts(df, merges).orderBy("id")


@register(
    "cluster_split_documents",
    f"""
    WITH RECURSIVE reach(node, root) AS (
      SELECT CAST(doc_id AS BIGINT), CAST(doc_id AS BIGINT) FROM documents
      UNION
      SELECT e.v, r.root FROM reach r JOIN (
        WITH shf AS (
          SELECT id, list_filter(sh, x -> x <> '') AS sh FROM ({_SHINGLES_SQL})
        ),
        p AS (
          SELECT a.id AS id_a, b.id AS id_b
          FROM shf a JOIN shf b ON a.id < b.id
          WHERE len(list_intersect(a.sh, b.sh))
                / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) >= 0.7
        )
        SELECT id_a AS u, id_b AS v FROM p
        UNION SELECT id_b, id_a FROM p
      ) e ON e.u = r.node
    ),
    cl AS (SELECT node AS id, MIN(root) AS cluster_id FROM reach GROUP BY node)
    SELECT cl.id, cl.cluster_id AS cluster_key,
           CASE WHEN CAST(('0x' || substr(md5(CAST(cl.cluster_id AS VARCHAR)), 1, 6)) AS BIGINT)
                     % 10000 < 1000
                THEN 'val' ELSE 'train' END AS side
    FROM cl ORDER BY cl.id
    """,
)
def q_cluster_split_documents(spark, sf_dir):
    """Near-dup-aware leak-proof split (pipeline/export.py
    split_by_cluster): the split key is the MinHash-dedup CLUSTER id, so
    near-duplicate documents — which content-hash splitting cannot pin
    together — always land on the same side of train/val. The md5-bucket
    arithmetic is engine-portable, so the oracle certifies the EXACT
    membership (recursive-CTE clusters + identical bucket math), not
    just invariants."""
    from truthound_spark.pipeline.dedup import dedup_clusters
    from truthound_spark.pipeline.export import split_by_cluster

    df = t(spark, sf_dir, "documents")
    clusters = dedup_clusters(
        df, "text", "doc_id", threshold=0.7, num_hashes=64, bands=32,
        max_bucket_size=None,  # exact all-pairs: the oracle-certified mode
    ).select(F.col("doc_id").alias("id"), "cluster_id")
    return split_by_cluster(df, clusters, val_fraction=0.1).orderBy("id")


@register(
    "ann_recall_embeddings",
    f"""
    WITH ed AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
    ),
    c AS (
      SELECT CAST(vec_id AS BIGINT) AS cell, embedding AS cv
      FROM ed ORDER BY vec_id LIMIT 16
    ),
    a AS (
      SELECT id, v, cell FROM (
        SELECT CAST(e.vec_id AS BIGINT) AS id, e.embedding AS v, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_IVF_D2.format(a='e.embedding', b='c.cv')}, c.cell
               ) AS rn
        FROM ed e, c
      ) WHERE rn = 1
    ),
    probe AS (
      SELECT query_id, qv, cell FROM (
        SELECT CAST(q.vec_id AS BIGINT) AS query_id, q.embedding AS qv, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_IVF_D2.format(a='q.embedding', b='c.cv')}, c.cell
               ) AS rn
        FROM ed q, c WHERE q.vec_id < 8
      ) WHERE rn <= 1
    ),
    approx AS (
      SELECT query_id, id FROM (
        SELECT p.query_id, a.id,
               ROW_NUMBER() OVER (
                 PARTITION BY p.query_id
                 ORDER BY list_dot_product(a.v, p.qv)
                   / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(p.qv, p.qv))) DESC,
                   a.id
               ) AS rank
        FROM probe p JOIN a ON a.cell = p.cell WHERE a.id <> p.query_id
      ) WHERE rank <= 5
    ),
    q AS (SELECT CAST(vec_id AS BIGINT) AS query_id, embedding AS qv FROM ed WHERE vec_id < 8),
    ex AS (
      SELECT query_id, id FROM (
        SELECT q.query_id, CAST(c2.vec_id AS BIGINT) AS id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_dot_product(c2.embedding, q.qv)
                   / (sqrt(list_dot_product(c2.embedding, c2.embedding)) * sqrt(list_dot_product(q.qv, q.qv))) DESC,
                   CAST(c2.vec_id AS BIGINT)
               ) AS rank
        FROM q, ed c2 WHERE CAST(c2.vec_id AS BIGINT) <> q.query_id
      ) WHERE rank <= 5
    ),
    hits AS (
      SELECT ap.query_id, COUNT(*) AS n_hit
      FROM approx ap JOIN ex ON ap.query_id = ex.query_id AND ap.id = ex.id
      GROUP BY 1
    ),
    den AS (SELECT query_id, COUNT(*) AS n_exact FROM ex GROUP BY 1)
    SELECT den.query_id, CAST(COALESCE(hits.n_hit, 0) AS BIGINT) AS n_hit,
           CAST(den.n_exact AS BIGINT) AS n_exact,
           ROUND(COALESCE(hits.n_hit, 0) / den.n_exact, 6) AS recall
    FROM den LEFT JOIN hits ON den.query_id = hits.query_id
    ORDER BY den.query_id
    """,
)
def q_ann_recall_embeddings(spark, sf_dir):
    """ANN recall@k evaluation (pipeline/similarity.py ann_recall): the
    1-probe seeded IVF's top-5 measured against brute-force cosine
    top-5 per query — the tuning loop that decides nprobe/num_planes
    before an index replaces brute force. The oracle recomputes both
    sides relationally and the same hit/denominator join; deliberately
    nprobe=1 so recall is genuinely < 1 for some queries and the metric
    is exercised off the trivial fixed point."""
    from truthound_spark.pipeline.similarity import (
        ann_recall,
        brute_force_topk,
        ivf_seeded_topk,
    )

    df = t(spark, sf_dir, "embeddings")
    q = df.filter(F.col("vec_id") < 8)
    approx = ivf_seeded_topk(df, q, k=5, num_cells=16, nprobe=1)
    exact = brute_force_topk(df, q, k=5)
    return ann_recall(approx, exact, k=5).orderBy("query_id")


@register(
    "temperature_weights_documents",
    f"""
    WITH avail AS (
      SELECT source,
             CAST(SUM({_BPE_SQL.format(c='text')}) AS BIGINT) AS available_tokens
      FROM documents GROUP BY source
    ),
    q AS (
      SELECT source, available_tokens,
             CAST(round(pow(CAST(available_tokens AS DOUBLE), 0.3) * 1000000.0)
                  AS BIGINT) AS qp
      FROM avail
    ),
    tot AS (SELECT SUM(qp) AS t FROM q)
    SELECT source, available_tokens, ROUND(qp / tot.t, 6) AS weight
    FROM q, tot ORDER BY source
    """,
)
def q_temperature_weights_documents(spark, sf_dir):
    """Temperature mixture weights (pipeline/export.py
    temperature_weights — the mT5/XLM-R alpha-sampling recipe): source
    weight ∝ available_tokens^0.3, up-weighting low-resource sources
    without per-source hand targets. The powered sizes quantize to 1e-6
    longs BEFORE the normalization sum, so the denominator is exact and
    order-independent — the weights hash-match across engines."""
    from truthound_spark.pipeline.export import temperature_weights

    df = t(spark, sf_dir, "documents")
    return temperature_weights(df, alpha=0.3).orderBy("source")


@register(
    "decontaminate_multi_documents",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    tr AS (SELECT id, unnest(sh) AS g FROM sh WHERE id % 2 = 0),
    pa AS (SELECT DISTINCT 'suite_a' AS benchmark, unnest(sh) AS g
           FROM sh WHERE id % 4 = 1),
    pb AS (SELECT DISTINCT 'suite_b' AS benchmark, unnest(sh) AS g
           FROM sh WHERE id % 4 = 3),
    pr AS (SELECT * FROM pa UNION ALL SELECT * FROM pb)
    SELECT tr.id AS doc_id, pr.benchmark, CAST(COUNT(*) AS BIGINT) AS overlap_ngrams
    FROM tr JOIN pr ON tr.g = pr.g AND tr.g <> ''
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_decontaminate_multi_documents(spark, sf_dir):
    """Multi-benchmark decontamination (pipeline/dedup.py
    decontaminate_multi): the whole eval battery screens in ONE corpus
    pass — every suite's distinct n-grams union with a suite tag into a
    single broadcast probe, grouped by (doc, suite). Per-suite results
    equal K separate decontaminate() runs at 1/K the corpus scans
    (equality pinned by tests); here suites are the odd doc_ids split
    %4 into two batteries."""
    from truthound_spark.pipeline.dedup import decontaminate_multi

    df = t(spark, sf_dir, "documents")
    return decontaminate_multi(
        df.filter(F.col("doc_id") % 2 == 0),
        {
            "suite_a": df.filter(F.col("doc_id") % 4 == 1),
            "suite_b": df.filter(F.col("doc_id") % 4 == 3),
        },
    ).orderBy("doc_id", "benchmark")


@register(
    "tag_documents_documents",
    f"""
    WITH w AS (
      SELECT doc_id, text,
             string_split(CASE WHEN LEN(TRIM(text)) = 0 THEN ''
                  ELSE {_NORM_SQL.format(c='text')} END, ' ') AS words,
             string_split(text, chr(10)) AS lines
      FROM documents
    ),
    lang AS (
      SELECT doc_id,
        len(list_filter(list_distinct(words), x -> list_contains(['der','die','das','und','ist','von','mit','den','ein','eine'], x))) AS de,
        len(list_filter(list_distinct(words), x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x))) AS en,
        len(list_filter(list_distinct(words), x -> list_contains(['el','la','de','que','y','en','un','una','los','por'], x))) AS es,
        len(list_filter(list_distinct(words), x -> list_contains(['le','la','de','et','les','des','un','une','du','que'], x))) AS fr
      FROM w
    ),
    clf AS (
      SELECT doc_id,
             list_transform(
               fw || list_transform(range(1, len(fw)), i -> fw[i] || '_' || fw[i+1]),
               t -> CAST(('0x' || substr(md5(t), 1, 6)) AS BIGINT) % 4096) AS bk
      FROM (SELECT doc_id, list_filter(words, x -> x <> '') AS fw FROM w)
    )
    SELECT w.doc_id,
      ROUND(CASE WHEN len(words) > 0 THEN
        len(list_filter(words, x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x)))
        / CAST(len(words) AS DOUBLE) ELSE 0.0 END, 6) AS stopword_ratio,
      ROUND(CASE WHEN length(text) > 0 THEN
        len(regexp_extract_all(text, '[^\\x{{30}}-\\x{{39}}a-zA-Z_\\s]')) / CAST(length(text) AS DOUBLE)
        ELSE 0.0 END, 6) AS punct_ratio,
      ROUND(CASE WHEN len(words) > 0 THEN len(list_distinct(words)) / CAST(len(words) AS DOUBLE)
            ELSE 0.0 END, 6) AS uniq_word_ratio,
      CASE WHEN GREATEST(lang.de, lang.en, lang.es, lang.fr) = 0 THEN 'unknown'
           WHEN lang.de >= lang.en AND lang.de >= lang.es AND lang.de >= lang.fr THEN 'de'
           WHEN lang.en >= lang.es AND lang.en >= lang.fr THEN 'en'
           WHEN lang.es >= lang.fr THEN 'es'
           ELSE 'fr' END AS predicted_lang,
      md5({_NORM_SQL.format(c='text')}) AS fingerprint,
      ROUND(CASE WHEN len(lines) > 0
            THEN 1.0 - len(list_distinct(lines)) / CAST(len(lines) AS DOUBLE)
            ELSE 0.0 END, 6) AS dup_line_fraction,
      ROUND(CASE WHEN len(words) > 0
            THEN 1.0 - len(list_distinct(words)) / CAST(len(words) AS DOUBLE)
            ELSE 0.0 END, 6) AS dup_word_fraction,
      ROUND(1.0 / (1.0 + EXP(-(CASE WHEN len(clf.bk) > 0 THEN
        list_sum(list_transform(clf.bk, x -> ((x % 2001) - 1000) / 1000.0)) / len(clf.bk)
        ELSE 0.0 END))), 6) AS classifier_score
    FROM w JOIN lang ON w.doc_id = lang.doc_id
           JOIN clf ON w.doc_id = clf.doc_id
    ORDER BY w.doc_id
    """,
)
def q_tag_documents_documents(spark, sf_dir):
    """Fused one-pass document tagger (pipeline/text.py tag_documents —
    the Dolma 'taggers' stage shape): quality ratios, language id,
    content fingerprint, Gopher repetition signals, and the classifier
    score in ONE projection over ONE scan (CollapseProject folds the
    whole helper stack; a plan test pins zero exchanges). Each signal's
    expression is byte-identical to its individually-certified slot —
    this slot certifies they stay identical when fused."""
    from truthound_spark.pipeline.text import tag_documents

    df = t(spark, sf_dir, "documents")
    out = tag_documents(df)
    return out.select(
        "doc_id",
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("uniq_word_ratio", 6).alias("uniq_word_ratio"),
        "predicted_lang",
        "fingerprint",
        F.round("dup_line_fraction", 6).alias("dup_line_fraction"),
        F.round("dup_word_fraction", 6).alias("dup_word_fraction"),
        "classifier_score",
    ).orderBy("doc_id")


@register(
    "bpe_vocab_documents",
    _bpe_oracle_ctes(_BPE_ROUNDS)
    + f""",
    toks AS (
      SELECT t AS token, SUM(n) AS n FROM (
        SELECT n, unnest(string_split(trim(sym,'|'),'||')) AS t
        FROM w{_BPE_ROUNDS}
      ) GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS t FROM toks),
    ranked AS (
      SELECT token, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rank,
             SUM(n) OVER (ORDER BY n DESC, token
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM toks
    )
    SELECT token, n, CAST(rank AS BIGINT) AS rank,
           ROUND(cum / tot.t, 6) AS cum_coverage
    FROM ranked, tot WHERE rank <= 50 ORDER BY rank
    """,
)
def q_bpe_vocab_documents(spark, sf_dir):
    """BPE vocabulary + coverage curve (pipeline/tokenizer.py bpe_vocab):
    the surviving symbols after the 6 trained merges, ranked by corpus
    occurrence with the cumulative coverage fraction — the freeze-check
    a tokenizer ships with (does top-V cover enough?). Vocabulary-scale
    work throughout; exact long counts make the curve hash-certifiable.
    The oracle replays training (same CTEs) then the token explosion +
    window."""
    from truthound_spark.pipeline.tokenizer import bpe_train, bpe_vocab

    df = t(spark, sf_dir, "documents")
    merges = bpe_train(df, rounds=_BPE_ROUNDS)
    return bpe_vocab(df, merges, top_v=50).orderBy("rank")


@register(
    "bitext_mining_embeddings",
    f"""
    WITH ed AS (
      SELECT CAST(vec_id AS BIGINT) AS id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ),
    s AS (SELECT * FROM ed WHERE id % 2 = 0),
    tt AS (SELECT * FROM ed WHERE id % 2 = 1),
    fwd AS (
      SELECT src_id, tgt_id, cosine FROM (
        SELECT s.id AS src_id, tt.id AS tgt_id,
               {_COS_SQL.format(a='s.v', b='tt.v')} AS cosine,
               ROW_NUMBER() OVER (
                 PARTITION BY s.id
                 ORDER BY {_COS_SQL.format(a='s.v', b='tt.v')} DESC, tt.id
               ) AS rn
        FROM s, tt
      ) WHERE rn <= 4
    ),
    bwd AS (
      SELECT src_id, tgt_id, cosine FROM (
        SELECT tt.id AS tgt_id, s.id AS src_id,
               {_COS_SQL.format(a='tt.v', b='s.v')} AS cosine,
               ROW_NUMBER() OVER (
                 PARTITION BY tt.id
                 ORDER BY {_COS_SQL.format(a='tt.v', b='s.v')} DESC, s.id
               ) AS rn
        FROM tt, s
      ) WHERE rn <= 4
    ),
    asrc AS (
      SELECT src_id,
             SUM(CAST(round(cosine * 1000000.0) AS BIGINT)) / COUNT(*) / 1000000.0
               AS nbhd_src
      FROM fwd GROUP BY 1
    ),
    atgt AS (
      SELECT tgt_id,
             SUM(CAST(round(cosine * 1000000.0) AS BIGINT)) / COUNT(*) / 1000000.0
               AS nbhd_tgt
      FROM bwd GROUP BY 1
    ),
    cand AS (
      SELECT f.src_id, f.tgt_id, f.cosine,
             ROUND(f.cosine / ((a.nbhd_src + b.nbhd_tgt) / 2), 6) AS margin
      FROM fwd f JOIN asrc a ON f.src_id = a.src_id
                 JOIN atgt b ON f.tgt_id = b.tgt_id
    ),
    bestf AS (
      SELECT src_id, tgt_id, ROUND(cosine, 6) AS cosine, margin FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS rn
        FROM cand
      ) WHERE rn = 1
    ),
    bcand AS (
      SELECT w.src_id, w.tgt_id,
             ROUND(w.cosine / ((a.nbhd_src + b.nbhd_tgt) / 2), 6) AS margin
      FROM bwd w JOIN asrc a ON w.src_id = a.src_id
                 JOIN atgt b ON w.tgt_id = b.tgt_id
    ),
    bestb AS (
      SELECT tgt_id, src_id AS b_src FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY tgt_id ORDER BY margin DESC, src_id) AS rn
        FROM bcand
      ) WHERE rn = 1
    )
    SELECT f.src_id, f.tgt_id, f.cosine, f.margin
    FROM bestf f JOIN bestb b ON f.tgt_id = b.tgt_id AND f.src_id = b.b_src
    ORDER BY f.src_id
    """,
)
def q_bitext_mining_embeddings(spark, sf_dir):
    """Margin-based bitext mining (pipeline/align.py mine_bitext —
    Artetxe & Schwenk 2019, the LASER/CCMatrix parallel-corpus recipe):
    even vec_ids play the source corpus, odd the target; each side's
    k-NN neighborhood mean (exact quantized sums) normalizes the cosine
    into the ratio margin, each src nominates its max-margin tgt, and
    only MUTUAL nominations survive. Two broadcast-query top-k passes —
    the corpora never cross-shuffle; all post-candidate work is
    candidate-sized. The oracle replays both passes and the margin/
    mutual chain."""
    from truthound_spark.pipeline.align import mine_bitext

    df = t(spark, sf_dir, "embeddings")
    src = df.filter(F.col("vec_id") % 2 == 0)
    tgt = df.filter(F.col("vec_id") % 2 == 1)
    return mine_bitext(src, tgt, k=4).orderBy("src_id")


@register(
    "hard_negatives_embeddings",
    f"""
    WITH ed AS (
      SELECT CAST(vec_id AS BIGINT) AS id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ),
    q AS (SELECT id AS query_id, v AS qv FROM ed WHERE id < 6),
    pos AS (
      SELECT id AS query_id, id + 1 AS id FROM ed WHERE id < 6
    ),
    scored AS (
      SELECT q.query_id, c.id, {_COS_SQL.format(a='c.v', b='q.qv')} AS cosine
      FROM ed c, q
      WHERE NOT EXISTS (
        SELECT 1 FROM pos p WHERE p.query_id = q.query_id AND p.id = c.id
      )
    )
    SELECT query_id, id, ROUND(cosine, 6) AS cosine, CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT query_id, id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rank
      FROM scored WHERE cosine <= 0.98
    ) WHERE rank <= 8 ORDER BY query_id, rank
    """,
)
def q_hard_negatives_embeddings(spark, sf_dir):
    """Hard-negative mining (pipeline/align.py mine_hard_negatives — the
    DPR/bi-encoder training recipe): per query the top-8 most-similar
    corpus vectors that are NOT labeled positives (gold = each query's
    id+1 neighbor here), anti-joined BEFORE ranking so every rank is a
    usable negative, with a 0.98 cosine ceiling as the false-negative
    guard. One scored corpus pass + broadcast anti-join + per-query
    window; the oracle replays scoring, NOT EXISTS, band, and ranks."""
    from truthound_spark.pipeline.align import mine_hard_negatives

    df = t(spark, sf_dir, "embeddings")
    q = df.filter(F.col("vec_id") < 6).withColumnRenamed("vec_id", "query_id")
    pos = (
        df.filter(F.col("vec_id") < 6)
        .select(
            F.col("vec_id").alias("query_id"),
            (F.col("vec_id") + 1).alias("vec_id"),
        )
    )
    return mine_hard_negatives(
        df, q, pos, k=8, max_cosine=0.98
    ).orderBy("query_id", "rank")


@register(
    "curriculum_order_documents",
    """
    WITH sc AS (
      SELECT doc_id,
             CAST(round((CASE WHEN n_chars > 0 THEN LEAST(n_chars / 200.0, 1.0)
                         ELSE 0.0 END) * 1000000.0) AS BIGINT) AS qs
      FROM documents
    ),
    hist AS (SELECT qs, COUNT(*) AS c FROM sc GROUP BY qs),
    tot AS (SELECT SUM(c) AS t FROM hist),
    bands AS (
      SELECT qs,
             CAST(LEAST(
               FLOOR((SUM(c) OVER (ORDER BY qs DESC
                                   ROWS UNBOUNDED PRECEDING) - c) * 4 / tot.t),
               3) AS INT) AS band
      FROM hist, tot
    ),
    keyed AS (
      SELECT sc.doc_id AS id, b.band,
             md5('0:' || CAST(sc.doc_id AS VARCHAR)) AS okey
      FROM sc JOIN bands b ON sc.qs = b.qs
    )
    SELECT id, band,
           CAST(CAST(('0x' || substr(okey, 1, 6)) AS BIGINT) % 8 AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY band, CAST(('0x' || substr(okey, 1, 6)) AS BIGINT) % 8
             ORDER BY okey, id
           ) AS BIGINT) AS position
    FROM keyed ORDER BY id
    """,
)
def q_curriculum_order_documents(spark, sf_dir):
    """Curriculum export order (pipeline/export.py curriculum_order):
    exact quality-quantile bands WITHOUT a global sort — scores quantize
    to 1e-6 longs into a value histogram (distinct-score-sized), whose
    running count gives each value's rank range and band; the corpus
    gets its band via broadcast join, then a per-(band, shard)
    deterministic md5 order. Score here = bounded length signal
    least(n_chars/200, 1). The oracle replays histogram, band
    arithmetic, and the md5 shuffle — exact membership and positions."""
    from truthound_spark.pipeline.export import curriculum_order

    df = t(spark, sf_dir, "documents")
    scored = df.withColumn(
        "score",
        F.when(F.col("n_chars") > 0, F.least(F.col("n_chars") / 200.0, F.lit(1.0)))
        .otherwise(F.lit(0.0)),
    )
    return curriculum_order(scored, "score", n_bands=4, n_shards=8).orderBy("id")


@register(
    "curation_funnel_documents",
    f"""
    WITH RECURSIVE reach(node, root) AS (
      SELECT CAST(doc_id AS BIGINT), CAST(doc_id AS BIGINT) FROM documents
      UNION
      SELECT e.v, r.root FROM reach r JOIN (
        WITH shf AS (
          SELECT id, list_filter(sh, x -> x <> '') AS sh FROM ({_SHINGLES_SQL})
        ),
        p AS (
          SELECT a.id AS id_a, b.id AS id_b
          FROM shf a JOIN shf b ON a.id < b.id
          WHERE len(list_intersect(a.sh, b.sh))
                / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) >= 0.7
        )
        SELECT id_a AS u, id_b AS v FROM p
        UNION SELECT id_b, id_a FROM p
      ) e ON e.u = r.node
    ),
    canon AS (
      SELECT node AS id FROM (
        SELECT node, MIN(root) AS root FROM reach GROUP BY node
      ) WHERE root = node
    ),
    c0 AS (SELECT COUNT(*) AS n FROM documents),
    c1 AS (
      SELECT COUNT(DISTINCT md5({_NORM_SQL.format(c='text')})) AS n FROM documents
    ),
    c2 AS (SELECT COUNT(*) AS n FROM canon),
    c3 AS (
      SELECT COUNT(*) AS n FROM canon JOIN documents d ON canon.id = d.doc_id
      WHERE d.n_chars >= 100
    ),
    f(stage_idx, stage, rows) AS (
      SELECT 0, 'raw', (SELECT n FROM c0)
      UNION ALL SELECT 1, 'exact_canonical', (SELECT n FROM c1)
      UNION ALL SELECT 2, 'fuzzy_canonical', (SELECT n FROM c2)
      UNION ALL SELECT 3, 'length_gated', (SELECT n FROM c3)
    )
    SELECT stage_idx, stage, CAST(rows AS BIGINT) AS rows,
           CAST(COALESCE(LAG(rows) OVER (ORDER BY stage_idx) - rows, 0) AS BIGINT)
             AS dropped,
           CASE WHEN LAG(rows) OVER (ORDER BY stage_idx) IS NULL THEN 0.0
                ELSE ROUND(
                  CAST(LAG(rows) OVER (ORDER BY stage_idx) - rows AS DOUBLE)
                    / NULLIF(LAG(rows) OVER (ORDER BY stage_idx), 0), 6)
           END AS drop_rate,
           ROUND(CAST(rows AS DOUBLE) / NULLIF((SELECT n FROM c0), 0), 6)
             AS keep_rate
    FROM f ORDER BY stage_idx
    """,
)
def q_curation_funnel_documents(spark, sf_dir):
    """Curation funnel report (pipeline/report.py curation_funnel): row
    accounting across raw → exact-canonical (distinct fingerprints) →
    fuzzy-canonical (MinHash cluster representatives) → length-gated.
    One O(1)-result count per stage — the audit that catches a silent
    40%% drop no validator would flag. The oracle recomputes each
    stage's membership relationally (recursive-CTE clusters for the
    fuzzy stage) and the same dropped/drop_rate/keep_rate arithmetic."""
    from truthound_spark.pipeline.dedup import content_fingerprint, dedup_clusters
    from truthound_spark.pipeline.report import curation_funnel

    df = t(spark, sf_dir, "documents")
    exact = df.withColumn("__fp", content_fingerprint(F.col("text"))).dropDuplicates(
        ["__fp"]
    )
    clusters = dedup_clusters(df, threshold=0.7, max_bucket_size=None)
    canon = df.join(
        clusters.filter(F.col("is_canonical")).select("doc_id"), "doc_id"
    )
    gated = canon.filter(F.col("n_chars") >= 100)
    return curation_funnel(
        [("raw", df), ("exact_canonical", exact), ("fuzzy_canonical", canon),
         ("length_gated", gated)]
    ).orderBy("stage_idx")


@register(
    "soft_dedup_weights_documents",
    f"""
    WITH fp AS (
      SELECT CAST(doc_id AS BIGINT) AS id,
             md5({_NORM_SQL.format(c='text')}) AS f
      FROM documents
    ),
    sz AS (SELECT f, COUNT(*) AS n FROM fp GROUP BY f)
    SELECT fp.id, CAST(sz.n AS BIGINT) AS n_copies,
           ROUND(1.0 / sz.n, 6) AS weight
    FROM fp JOIN sz ON fp.f = sz.f ORDER BY fp.id
    """,
)
def q_soft_dedup_weights_documents(spark, sf_dir):
    """Soft deduplication (pipeline/dedup.py soft_dedup_weights): every
    copy kept, weighted 1/n_copies so a duplicate family contributes one
    document's worth of training mass — the drop-free alternative that
    preserves the family's best member and its frequency signal.
    Fingerprint groupBy shuffles 32-byte hashes only. The Spark side
    groups on xxhash64(fingerprint) (shorter shuffle key); n_copies is
    identical because md5 fingerprints are already distinct per content,
    so the oracle groups on the fingerprint itself."""
    from truthound_spark.pipeline.dedup import soft_dedup_weights

    df = t(spark, sf_dir, "documents")
    return soft_dedup_weights(df).orderBy("id")


@register(
    "ivfpq_search_embeddings",
    _ivfpq_oracle_sql(
        m=2, pq_k=4, iters=1, dim=8, num_cells=8, nprobe=2, n_queries=6, topk=5
    ),
)
def q_ivfpq_search_embeddings(spark, sf_dir):
    """IVF-PQ search (pipeline/similarity.py ivfpq_search — the FAISS
    IVFx,PQy billion-scale layout): seeded coarse cells prune candidates
    to nprobe cells, PQ ADC lookups score them from m-byte codes — the
    corpus vectors are read ONCE (cell + codes in one combined pass) and
    never touched again. Vectors sliced to 8 dims so the generated
    oracle (coarse assignment/probe CTEs composed with the PQ
    train/encode/LUT CTEs) stays reviewable; every stage — Lloyd
    training, coarse argmin, probing, ADC, ranking — hash-matches."""
    from truthound_spark.pipeline.similarity import ivfpq_search

    df = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.slice(F.col("embedding").cast("array<double>"), 1, 8).alias("embedding"),
    )
    q = df.filter(F.col("vec_id") < 6)
    out = ivfpq_search(
        df, q, k=5, num_cells=8, nprobe=2, m=2, pq_k=4, iters=1,
        query_id_col="vec_id",
    )
    return out.select(
        "query_id", "id", "adc_dist", F.col("rank").cast("long").alias("rank")
    ).orderBy("query_id", "rank")


@register(
    "blocklist_filter_documents",
    f"""
    WITH base AS (
      SELECT CAST(doc_id AS BIGINT) AS id,
             list_distinct(string_split({_NORM_SQL.format(c='text')}, ' ')) AS dw
      FROM documents
    )
    SELECT id,
           list_sort(list_intersect(dw, ['fast', 'shuffle', 'window'])) AS matched_terms,
           CAST(len(list_intersect(dw, ['fast', 'shuffle', 'window'])) AS BIGINT)
             AS n_matched,
           len(list_intersect(dw, ['fast', 'shuffle', 'window'])) > 0 AS blocked
    FROM base ORDER BY id
    """,
)
def q_blocklist_filter_documents(spark, sf_dir):
    """Blocklist screening (pipeline/text.py blocklist_filter — the C4
    bad-words filter shape): whole-word matches against a normalized
    term list that rides in as a broadcast one-row array column (O(1)
    plan size at 10k+ terms), one array_intersect per document. Terms
    here are common corpus words so matches are exercised nonzero. The
    oracle replays the distinct-words intersect and the match
    arithmetic."""
    from truthound_spark.pipeline.text import blocklist_filter

    df = t(spark, sf_dir, "documents")
    return blocklist_filter(df, ["fast", "Shuffle!", "window"]).orderBy("id")


@register(
    "bpe_tokenize_documents",
    _bpe_oracle_ctes(_BPE_ROUNDS)
    + ",\n    mp AS (SELECT "
    + ", ".join(
        f"COALESCE((SELECT '|'||x||'||'||y||'|' FROM m{r}), chr(1)) AS f{r}, "
        f"COALESCE((SELECT '|'||x||y||'|' FROM m{r}), chr(1)) AS t{r}"
        for r in range(1, _BPE_ROUNDS + 1)
    )
    + ")"
    + f""",
    enc AS (
      SELECT doc_id,
             flatten(list_transform(
               list_filter(string_split({_NORM_SQL.format(c='text')}, ' '),
                           w -> w <> ''),
               w -> string_split(trim(
                 {"".join("replace(" for _ in range(_BPE_ROUNDS))}'|' || array_to_string(string_split(w,''),'||') || '|'"""
    + "".join(f", mp.f{r}, mp.t{r})" for r in range(1, _BPE_ROUNDS + 1))
    + """, '|'), '||')
             )) AS tokens
      FROM documents, mp
    )
    SELECT doc_id AS id, tokens, CAST(len(tokens) AS BIGINT) AS n_tokens
    FROM enc ORDER BY id
    """,
)
def q_bpe_tokenize_documents(spark, sf_dir):
    """Materialized BPE tokenization (pipeline/tokenizer.py bpe_tokenize):
    the actual per-document token sequences under the 6 trained merges —
    the trainer-input export form. Map-only (per-word replace chain +
    split + flatten, no shuffles, no UDFs); the oracle retrains the
    merges and replays the identical per-word chain, so token ARRAYS —
    not just counts — hash-match."""
    from truthound_spark.pipeline.tokenizer import bpe_tokenize, bpe_train

    df = t(spark, sf_dir, "documents")
    merges = bpe_train(df, rounds=_BPE_ROUNDS)
    return bpe_tokenize(df, merges).orderBy("id")


@register(
    "ivfpq_residual_search_embeddings",
    _ivfpq_residual_oracle_sql(
        m=2, pq_k=4, iters=1, dim=8, num_cells=8, nprobe=2, n_queries=6, topk=5
    ),
)
def q_ivfpq_residual_search_embeddings(spark, sf_dir):
    """RESIDUAL IVF-PQ (pipeline/similarity.py ivfpq_search(residual=
    True) — the canonical FAISS refinement): PQ trains on and encodes
    x − centroid(cell), whose norms are far smaller than raw vectors,
    so the same m·log2(k) bits quantize much more finely; each (query,
    probed cell) pair gets its own ADC LUT over q − centroid(cell).
    The oracle feeds a residual CTE into the source-parameterized PQ
    training replay and scores per probed cell — coarse assignment,
    residual computation, Lloyd training, encoding, per-cell LUTs, and
    ranking all hash-match."""
    from truthound_spark.pipeline.similarity import ivfpq_search

    df = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.slice(F.col("embedding").cast("array<double>"), 1, 8).alias("embedding"),
    )
    q = df.filter(F.col("vec_id") < 6)
    out = ivfpq_search(
        df, q, k=5, num_cells=8, nprobe=2, m=2, pq_k=4, iters=1,
        query_id_col="vec_id", residual=True,
    )
    return out.select(
        "query_id", "id", "adc_dist", F.col("rank").cast("long").alias("rank")
    ).orderBy("query_id", "rank")


@register(
    "pool_embeddings_by_label",
    """
    WITH ex AS (
      SELECT label, u.pos - 1 AS pos, u.x
      FROM embeddings,
           LATERAL (SELECT unnest(CAST(embedding AS DOUBLE[])) AS x,
                           generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS pos) u
    ),
    pd AS (
      SELECT label AS "group", pos, COUNT(*) AS n,
             ROUND(SUM(CAST(round(x * 1000000.0) AS BIGINT)) / COUNT(*) / 1000000.0, 6) AS v
      FROM ex GROUP BY 1, 2
    )
    SELECT "group", CAST(MAX(n) AS BIGINT) AS n_vectors,
           list(v ORDER BY pos) AS pooled
    FROM pd GROUP BY 1 ORDER BY 1
    """,
)
def q_pool_embeddings_by_label(spark, sf_dir):
    """Embedding pooling (pipeline/similarity.py pool_embeddings): the
    chunk→document rollup — one mean vector per label group, quantized
    per-dimension long sums so the distributed mean is exact and
    order-independent (the kmeans_vec centroid trick applied to
    pooling). One (group, dim)-keyed shuffle with map-side partials; no
    UDFs. The oracle replays the explode/quantize/mean/ordered-collect
    chain."""
    from truthound_spark.pipeline.similarity import pool_embeddings

    df = t(spark, sf_dir, "embeddings")
    return pool_embeddings(df, "label").orderBy("group")


@register(
    "embedding_drift_embeddings",
    """
    WITH cur AS (
      SELECT list_transform(
               list_zip(CAST(embedding AS DOUBLE[]),
                        range(len(CAST(embedding AS DOUBLE[])))),
               p -> p[1] + p[2] / 100.0) AS v
      FROM embeddings
    ),
    bas AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    exc AS (
      SELECT u.pos - 1 AS pos, u.x FROM cur,
        LATERAL (SELECT unnest(v) AS x, generate_subscripts(v, 1) AS pos) u
    ),
    exb AS (
      SELECT u.pos - 1 AS pos, u.x FROM bas,
        LATERAL (SELECT unnest(v) AS x, generate_subscripts(v, 1) AS pos) u
    ),
    sc AS (
      SELECT pos, COUNT(*) AS n,
             SUM(CAST(round(x * 1000000.0) AS BIGINT)) AS s,
             SUM(CAST(round(x * x * 1000000.0) AS BIGINT)) AS ss
      FROM exc GROUP BY pos
    ),
    sb AS (
      SELECT pos, COUNT(*) AS n,
             SUM(CAST(round(x * 1000000.0) AS BIGINT)) AS s,
             SUM(CAST(round(x * x * 1000000.0) AS BIGINT)) AS ss
      FROM exb GROUP BY pos
    ),
    m AS (
      SELECT sc.pos,
             sb.s / sb.n / 1000000.0 AS mb, sc.s / sc.n / 1000000.0 AS mc,
             GREATEST(sb.ss / sb.n / 1000000.0
               - (sb.s / sb.n / 1000000.0) * (sb.s / sb.n / 1000000.0), 0.0) AS vb,
             GREATEST(sc.ss / sc.n / 1000000.0
               - (sc.s / sc.n / 1000000.0) * (sc.s / sc.n / 1000000.0), 0.0) AS vc
      FROM sc JOIN sb ON sc.pos = sb.pos
    )
    SELECT pos, ROUND(mb, 6) AS mean_base, ROUND(mc, 6) AS mean_cur,
           ROUND(sqrt(vb), 6) AS std_base, ROUND(sqrt(vc), 6) AS std_cur,
           ROUND(CASE WHEN sqrt((vc + vb) / 2) > 0
                 THEN abs(mc - mb) / sqrt((vc + vb) / 2)
                 WHEN abs(mc - mb) > 0 THEN CAST('infinity' AS DOUBLE)
                 ELSE 0.0 END, 6) AS shift
    FROM m ORDER BY pos
    """,
)
def q_embedding_drift_embeddings(spark, sf_dir):
    """Embedding-snapshot drift (pipeline/similarity.py embedding_drift):
    per-dimension mean/std on both sides from exact quantized-long sums
    plus the standardized shift — the regression check after an
    embedding-model update. The entry injects a deterministic
    index-proportional perturbation (x + pos/100) as the 'current'
    snapshot so every dimension's shift is nonzero and grows with pos;
    the oracle replays the mutation and the whole moment arithmetic."""
    from truthound_spark.pipeline.similarity import embedding_drift

    df = t(spark, sf_dir, "embeddings")
    cur = df.select(
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, i: x + i / F.lit(100.0),
        ).alias("embedding")
    )
    return embedding_drift(cur, df).orderBy("pos")


@register(
    "dedup_pair_evidence_documents",
    f"""
    WITH shf AS (
      SELECT id, list_filter(sh, x -> x <> '') AS sh FROM ({_SHINGLES_SQL})
    ),
    p AS (
      SELECT a.id AS id_a, b.id AS id_b, a.sh AS sa, b.sh AS sb
      FROM shf a JOIN shf b ON a.id < b.id
      WHERE len(list_intersect(a.sh, b.sh))
            / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) >= 0.7
    )
    SELECT id_a, id_b,
           CAST(len(list_intersect(sa, sb)) AS BIGINT) AS n_shared,
           list_sort(list_intersect(sa, sb))[1:10] AS shared_ngrams
    FROM p ORDER BY id_a, id_b
    """,
)
def q_dedup_pair_evidence_documents(spark, sf_dir):
    """Near-dup pair EVIDENCE (pipeline/dedup.py dedup_pair_evidence):
    for every flagged MinHash pair, the concrete shared word 3-grams —
    the reviewer-facing WHY behind a deletion decision (the dedup-side
    analogue of the validator layer's evidence sampling). Only docs
    appearing in pairs are shingled (semi-join); the oracle recomputes
    the exhaustive >= 0.7 pair set and the identical sorted/truncated
    intersection."""
    from truthound_spark.pipeline.dedup import dedup_pair_evidence, minhash_dedup_pairs

    df = t(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(
        df, threshold=0.7, num_hashes=64, bands=32, max_bucket_size=None
    )
    return dedup_pair_evidence(df, pairs).orderBy("id_a", "id_b")


@register(
    "trigram_backoff_documents",
    f"""
    WITH wd AS (
      SELECT doc_id AS id,
             list_filter(string_split({_NORM_SQL.format(c='text')}, ' '),
                         x -> x <> '') AS w
      FROM documents
    ),
    score_w AS (SELECT * FROM wd WHERE id % 2 = 1),
    ref_w AS (SELECT * FROM wd WHERE id % 2 = 0),
    uni AS (
      SELECT t, COUNT(*) AS c1 FROM (SELECT unnest(w) AS t FROM ref_w) GROUP BY t
    ),
    vt AS (SELECT COUNT(*) AS vocab, (SELECT COUNT(*) FROM (SELECT unnest(w) FROM ref_w)) AS total FROM uni),
    bi AS (
      SELECT p[1] AS wa, p[2] AS wb, COUNT(*) AS cb FROM (
        SELECT unnest(list_zip(w[1:len(w)-1], w[2:len(w)])) AS p FROM ref_w
        WHERE len(w) >= 2
      ) GROUP BY 1, 2
    ),
    rtri AS (
      SELECT p[1] AS w1, p[2] AS w2, p[3] AS w3, COUNT(*) AS c123 FROM (
        SELECT unnest(list_zip(w[1:len(w)-2], w[2:len(w)-1], w[3:len(w)])) AS p
        FROM ref_w WHERE len(w) >= 3
      ) GROUP BY 1, 2, 3
    ),
    pos AS (
      SELECT id, p[1] AS w1, p[2] AS w2, p[3] AS w3 FROM (
        SELECT id, unnest(list_zip(w[1:len(w)-2], w[2:len(w)-1], w[3:len(w)])) AS p
        FROM score_w WHERE len(w) >= 3
      )
    ),
    lp AS (
      SELECT pos.id,
             CAST(round(1000000.0 * (
               CASE WHEN COALESCE(rtri.c123, 0) > 0
                    THEN -ln(rtri.c123 / CAST(b12.cb AS DOUBLE))
                    WHEN COALESCE(b23.cb, 0) > 0
                    THEN -ln(b23.cb / CAST(u2.c1 AS DOUBLE)) - ln(0.4)
                    ELSE -ln((COALESCE(u3.c1, 0) + 1.0)
                             / (vt.total + vt.vocab)) - 2 * ln(0.4)
               END)) AS BIGINT) AS qlp
      FROM pos
      LEFT JOIN rtri ON rtri.w1 = pos.w1 AND rtri.w2 = pos.w2 AND rtri.w3 = pos.w3
      LEFT JOIN bi b12 ON b12.wa = pos.w1 AND b12.wb = pos.w2
      LEFT JOIN bi b23 ON b23.wa = pos.w2 AND b23.wb = pos.w3
      LEFT JOIN uni u2 ON u2.t = pos.w2
      LEFT JOIN uni u3 ON u3.t = pos.w3, vt
    ),
    sc AS (
      SELECT id, COUNT(*) AS n_trigrams,
             SUM(qlp) / COUNT(*) / 1000000.0 AS alp
      FROM lp GROUP BY id
    )
    SELECT w.id, CAST(COALESCE(sc.n_trigrams, 0) AS BIGINT) AS n_trigrams,
           ROUND(sc.alp, 6) AS avg_neg_logprob,
           ROUND(EXP(sc.alp), 6) AS perplexity
    FROM score_w w LEFT JOIN sc ON w.id = sc.id ORDER BY w.id
    """,
)
def q_trigram_backoff_documents(spark, sf_dir):
    """Trigram LM with stupid backoff (pipeline/text.py
    trigram_backoff_score — Brants et al. 2007): the model trains on
    even-id docs, odd-id docs are scored, so unseen grams genuinely
    exercise every backoff level (trigram → α·bigram → α²·add-one
    unigram). Exact corpus counts + quantized per-position −ln p means
    make the whole three-level model hash-certifiable. A sharper
    noise/boilerplate signal than the bigram model — 3-gram context
    separates fluent text from locally-plausible garble."""
    from truthound_spark.pipeline.text import trigram_backoff_score

    df = t(spark, sf_dir, "documents")
    return trigram_backoff_score(
        df.filter(F.col("doc_id") % 2 == 1),
        reference=df.filter(F.col("doc_id") % 2 == 0),
    ).orderBy("id")


@register(
    "embedding_health_check_embeddings",
    """
    WITH ed AS (
      SELECT CAST(vec_id AS BIGINT) AS id, CAST(embedding AS DOUBLE[]) AS v0
      FROM embeddings
    ),
    mut AS (
      SELECT id,
             CASE
               WHEN id % 53 = 0 THEN NULL
               WHEN id % 71 = 0 THEN list_transform(v0, x -> 0.0)
               WHEN id % 89 = 0 THEN list_append(v0[2:], CAST('nan' AS DOUBLE))
               WHEN id % 61 = 0 THEN v0[1:len(v0) - 1]
               ELSE v0
             END AS v
      FROM ed
    ),
    dref AS (
      SELECT dim AS dim_ref FROM (
        SELECT len(v) AS dim, COUNT(*) AS c FROM mut WHERE v IS NOT NULL
        GROUP BY 1 ORDER BY c DESC, dim LIMIT 1
      )
    )
    SELECT
      CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      CAST(SUM(CASE WHEN v IS NOT NULL
                     AND len(list_filter(v, x -> isnan(x))) > 0
               THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
      CAST(SUM(CASE WHEN v IS NOT NULL AND len(v) > 0
                     AND len(list_filter(v, x -> x <> 0.0)) = 0
               THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
      CAST(SUM(CASE WHEN v IS NOT NULL AND len(v) <> (SELECT dim_ref FROM dref)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_dim_mismatch,
      FALSE AS check_success
    FROM mut
    """,
)
def q_embedding_health_check_embeddings(spark, sf_dir):
    """Vector-column validation through the PUBLIC check() path
    (validators/corpus.py EmbeddingHealthValidator): the same injected
    failure modes as the embedding_stats slot (null @ id%53, zero @
    id%71, NaN @ id%89, truncated dim @ id%61), but counted by the
    fused-agg validator inside th.check — certifying that embedding
    health runs as a first-class suite member, not just a pipeline
    report. Oracle recomputes all four counters + the failing verdict."""
    import truthound_spark as th
    from truthound_spark.validators.corpus import EmbeddingHealthValidator

    df = t(spark, sf_dir, "embeddings")
    idc = F.col("vec_id").cast("long")
    v = F.col("embedding").cast("array<double>")
    mut = df.select(
        F.when(idc % 53 == 0, F.lit(None).cast("array<double>"))
        .when(idc % 71 == 0, F.transform(v, lambda x: F.lit(0.0)))
        .when(
            idc % 89 == 0,
            F.concat(F.slice(v, 2, F.size(v)), F.array(F.lit(float("nan")))),
        )
        .when(idc % 61 == 0, F.slice(v, 1, F.size(v) - 1))
        .otherwise(v)
        .alias("embedding")
    )
    res = th.check(mut, validators=[EmbeddingHealthValidator()])
    by_type = {i.issue_type: i.count for i in res.issues}
    return _scalar_df(
        spark,
        n_null=int(by_type.get("null_vectors", 0)),
        n_nan=int(by_type.get("nan_components", 0)),
        n_zero=int(by_type.get("zero_vectors", 0)),
        n_dim_mismatch=int(by_type.get("dim_mismatch", 0)),
        check_success=bool(res.success),
    )


@register("ann_lsh_multiprobe_topk", _lsh_multiprobe_oracle())
def q_ann_lsh_multiprobe_topk(spark, sf_dir):
    """Multi-probe sign-LSH top-k (pipeline/similarity.py lsh_topk with
    probe_hamming=1 — Lv et al. 2007): each query additionally probes
    the num_planes buckets one sign-flip away, recovering the near-miss
    neighbors a single-bucket probe loses WITHOUT coarsening the
    bucketing — the corpus side (and any persisted bucketed layout) is
    untouched; only the tiny broadcast query side fans out. Same seeded
    planes as literals in the oracle; candidates = Hamming ≤ 1 bucket
    match, identical ranks."""
    from truthound_spark.pipeline.similarity import lsh_topk

    df = t(spark, sf_dir, "embeddings")
    queries = df.filter(F.col("vec_id") < 5)
    res = lsh_topk(df, queries, k=5, num_planes=6, probe_hamming=1)
    return res.select(
        "query_id", "id", F.round("cosine", 6).alias("cosine"), "rank"
    ).orderBy("query_id", "rank")


@register(
    "dedup_threshold_curve_documents",
    f"""
    WITH shf AS (
      SELECT id, list_filter(sh, x -> x <> '') AS sh FROM ({_SHINGLES_SQL})
    ),
    p AS (
      SELECT a.id AS id_a, b.id AS id_b,
             len(list_intersect(a.sh, b.sh))
               / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               AS jaccard
      FROM shf a JOIN shf b ON a.id < b.id
      WHERE len(list_intersect(a.sh, b.sh)) > 0
    ),
    binned AS (
      SELECT ROUND(FLOOR(round(jaccard * 1000000.0) / 1000000.0 / 0.05) * 0.05, 6)
               AS bin_lo
      FROM p WHERE jaccard >= 0.05
    ),
    hist AS (SELECT bin_lo, COUNT(*) AS n_pairs FROM binned GROUP BY bin_lo)
    SELECT bin_lo, CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(SUM(n_pairs) OVER (ORDER BY bin_lo DESC
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS n_pairs_at_least
    FROM hist ORDER BY bin_lo DESC
    """,
)
def q_dedup_threshold_curve_documents(spark, sf_dir):
    """Dedup threshold calibration curve (pipeline/dedup.py
    dedup_threshold_curve): binned pair counts by exact Jaccard with the
    cumulative from-the-top totals — the evidence behind choosing 0.7
    instead of guessing. Exact down to min_jaccard because the
    inverted-index path's candidates are complete (any overlapping pair
    shares a shingle); the oracle recomputes the exhaustive pair set
    and the identical binning/cumulative arithmetic."""
    from truthound_spark.pipeline.dedup import dedup_threshold_curve

    df = t(spark, sf_dir, "documents")
    return dedup_threshold_curve(df).orderBy(F.desc("bin_lo"))
