"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Everything here is pure pyspark.sql.functions column math (split, regexp,
array_intersect, aggregate) — whole-stage-codegen'd, zero Python UDFs —
so the same expressions run unchanged over 100 TB of documents.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from truthound_spark.pipeline.dedup import content_fingerprint, normalized_text, words

#: Tiny per-language stopword lists for the n-gram/stopword-overlap
#: language-ID heuristic. Deliberately small + deterministic so the same
#: sets can be inlined into an oracle SQL query.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "que"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "eine"],
}

#: A BPE-ish token pattern: word pieces, numbers, or single non-space symbols.
BPE_TOKEN_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def whitespace_token_count(col: Column) -> Column:
    """Token count by whitespace split (0 for empty/blank)."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(col: Column) -> Column:
    """Approximate subword token count: number of BPE-ish pattern matches.
    regexp_count is JVM-side (Spark 3.5+)."""
    return F.regexp_count(col, F.lit(BPE_TOKEN_PATTERN))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    """Fraction of words that are stopwords — a classic quality signal."""
    w = words(col)
    sw = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    hits = F.size(F.filter(w, lambda x: F.array_contains(sw, x)))
    return F.when(F.size(w) > 0, hits / F.size(w)).otherwise(F.lit(0.0))


def language_scores(col: Column) -> dict[str, Column]:
    """Per-language stopword-overlap score (distinct stopwords present)."""
    w = F.array_distinct(words(col))
    out = {}
    for lang, sws in STOPWORDS.items():
        sw = F.array(*[F.lit(s) for s in sws])
        out[lang] = F.size(F.array_intersect(w, sw))
    return out


def _language_id_from_tokens(w: Column, default: str = "unknown") -> Column:
    """Argmax language over an ALREADY-STAGED distinct-word column (see
    detect_languages: the inline form re-tokenizes once per language)."""
    scores = {}
    for lang, sws in STOPWORDS.items():
        sw = F.array(*[F.lit(s) for s in sws])
        scores[lang] = F.size(F.array_intersect(w, sw))
    langs = sorted(scores)
    best = None
    for lang in langs:
        s = scores[lang]
        if best is None:
            best = (s, F.lit(lang))
        else:
            best = (
                F.when(s > best[0], s).otherwise(best[0]),
                F.when(s > best[0], F.lit(lang)).otherwise(best[1]),
            )
    return F.when(best[0] > 0, best[1]).otherwise(F.lit(default))


def language_id(col: Column, default: str = "unknown") -> Column:
    """Argmax language by stopword overlap; ties break by language-code
    order; 0 overlap → default."""
    scores = language_scores(col)
    langs = sorted(scores)
    best = None
    for lang in langs:
        s = scores[lang]
        if best is None:
            best = (s, F.lit(lang))
        else:
            best = (
                F.when(s > best[0], s).otherwise(best[0]),
                F.when(s > best[0], F.lit(lang)).otherwise(best[1]),
            )
    return F.when(best[0] > 0, best[1]).otherwise(F.lit(default))


def quality_features(
    df: DataFrame, text_col: str = "text", _words: Column | None = None
) -> DataFrame:
    """Per-document quality features (the reference's profiler analyzers,
    re-aimed at LLM data curation): lengths, token counts, ratios.

    The word array is STAGED into a column first: the features reference
    it ~9x between them, and codegen re-evaluates higher-order-function
    subtrees per reference — inline it tokenized every document ~9 times
    (same finding as ``_buckets_from_tokens``, SCALING.md r12). Same
    expressions over the staged column → bit-identical outputs (oracle-
    pinned)."""
    col = F.col(text_col)
    if _words is None:
        staged = df.withColumn("__qf_w", words(col))
        w = F.col("__qf_w")
        drop = ["__qf_w"]
    else:  # caller (tag_documents) already staged the shared word array
        staged, w, drop = df, _words, []
    sw = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    sw_hits = F.size(F.filter(w, lambda x: F.array_contains(sw, x)))
    return staged.withColumns(
        {
            "n_chars": F.length(col),
            "n_words": whitespace_token_count(col),
            "n_tokens_bpe": bpe_ish_token_count(col),
            "avg_word_len": F.when(
                F.size(w) > 0,
                F.aggregate(w, F.lit(0.0), lambda acc, x: acc + F.length(x)) / F.size(w),
            ).otherwise(F.lit(0.0)),
            "stopword_ratio": F.when(
                F.size(w) > 0, sw_hits / F.size(w)
            ).otherwise(F.lit(0.0)),
            "punct_ratio": F.when(
                F.length(col) > 0,
                F.regexp_count(col, F.lit(r"[^\w\s]")).cast("double") / F.length(col),
            ).otherwise(F.lit(0.0)),
            "digit_ratio": F.when(
                F.length(col) > 0,
                F.regexp_count(col, F.lit(r"[0-9]")).cast("double") / F.length(col),
            ).otherwise(F.lit(0.0)),
            "uniq_word_ratio": F.when(
                F.size(w) > 0, F.size(F.array_distinct(w)).cast("double") / F.size(w)
            ).otherwise(F.lit(0.0)),
        }
    ).drop(*drop)


def quality_score(
    df: DataFrame, text_col: str = "text", _words: Column | None = None
) -> DataFrame:
    """Composite 0-1 quality score from the features (heuristic weights:
    enough words, healthy stopword presence, low punctuation/digit noise,
    lexical diversity)."""
    feats = quality_features(df, text_col, _words=_words)
    score = (
        F.least(F.col("n_words") / 50.0, F.lit(1.0)) * 0.3
        + F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0)) * 0.2
        + (1.0 - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))) * 0.2
        + (1.0 - F.least(F.col("digit_ratio") * 5.0, F.lit(1.0))) * 0.1
        + F.least(F.col("uniq_word_ratio") * 1.25, F.lit(1.0)) * 0.2
    )
    return feats.withColumn("quality_score", score)


def fingerprint_documents(
    df: DataFrame, text_col: str = "text", _words: Column | None = None
) -> DataFrame:
    """Add a deterministic md5 content fingerprint column.

    With a staged word array, the md5 input is rebuilt as
    ``array_join(words, " ")`` — EXACTLY normalized_text (words =
    split(norm, " ") with norm trimmed/single-spaced, so split-then-join
    is the identity; oracle-pinned) without re-running the normalization
    regexes."""
    fp = (
        content_fingerprint(F.col(text_col))
        if _words is None
        else F.md5(F.array_join(_words, " "))
    )
    return df.withColumn("fingerprint", fp)


def detect_languages(
    df: DataFrame, text_col: str = "text", _words: Column | None = None
) -> DataFrame:
    """Add predicted_lang via the stopword-overlap heuristic. The
    distinct-word array is staged once — the inline language_id column
    re-tokenizes per LANGUAGE (codegen re-evaluates HOF subtrees per
    reference, SCALING.md r12); same argmax over the staged column is
    bit-identical (oracle-pinned)."""
    base = words(F.col(text_col)) if _words is None else _words
    return (
        df.withColumn("__lid_w", F.array_distinct(base))
        .withColumn("predicted_lang", _language_id_from_tokens(F.col("__lid_w")))
        .drop("__lid_w")
    )


# ---------------------------------------------------------------------------
# cleaning + repetition filters (C4/Gopher-style corpus hygiene)
# ---------------------------------------------------------------------------

#: Markup / URL / control-character strippers — all RE2-safe so the same
#: patterns run in an oracle SQL regexp_replace.
_TAG_RE = r"<[^>]{0,500}>"
_URL_RE = r"https?://[^\s]+"
_CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"


def clean_text(col: Column) -> Column:
    """C4-style cleaning as one codegen'd expression chain: strip HTML
    tags, URLs, control chars, then collapse runs of whitespace. No UDFs —
    the identical chain runs over 100 TB unchanged."""
    c = F.regexp_replace(col, _TAG_RE, " ")
    c = F.regexp_replace(c, _URL_RE, " ")
    c = F.regexp_replace(c, _CTRL_RE, "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def scrub_pii_text(col: Column) -> Column:
    """Training-text PII scrub: replace emails / intl phone numbers /
    SSN-shaped tokens inside free text with typed placeholders (the
    column-level maskers handle structured columns; this is the free-text
    path a pretraining pipeline needs)."""
    c = F.regexp_replace(
        col, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
    )
    c = F.regexp_replace(c, r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>")
    c = F.regexp_replace(c, r"\+[0-9][0-9()\s.-]{6,18}[0-9]", "<PHONE>")
    return c


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    top_word_window: int = 512,
    _words: Column | None = None,
) -> DataFrame:
    """Gopher-style repetition features, all higher-order-function column
    math (no shuffle, no UDF):

      dup_line_fraction     — 1 − distinct(lines)/lines
      top_word_fraction     — frequency of the most common word / words
      dup_word_fraction     — 1 − distinct(words)/words

    The reference corpus filters drop documents whose signals exceed
    Gopher's thresholds (dup lines > 0.3, top word > 0.2, ...).

    top_word_fraction scans distinct×occurrences pairs, which is quadratic
    in document length — so it is computed over the first
    ``top_word_window`` words (a repeated-token pathology shows up in any
    window; the dup_* signals remain exact over the full document)."""
    staged = df.withColumn("__rep_lines", F.split(F.col(text_col), r"\n"))
    drop = ["__rep_lines"]
    if _words is None:
        staged = staged.withColumn("__rep_w", words(F.col(text_col)))
        ws = F.col("__rep_w")
        drop.append("__rep_w")
    else:
        ws = _words
    lines = F.col("__rep_lines")
    wsw = F.slice(ws, 1, top_word_window)
    n_lines = F.size(lines)
    n_words = F.size(ws)
    # Most-common-word count as the longest equal-run in the SORTED window:
    # one aggregate() pass referencing the words array exactly once.
    # (A distinct×filter formulation re-inlines the whole normalize+split
    # chain into every lambda via Catalyst projection collapse — the same
    # quadratic-expansion trap as dedup.py's shingle pipeline; measured
    # ~10x slower at sf0.1.)
    top_count = F.aggregate(
        F.sort_array(wsw),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return staged.select(
        "*",
        F.when(n_lines > 0, 1.0 - F.size(F.array_distinct(lines)) / n_lines)
        .otherwise(0.0)
        .alias("dup_line_fraction"),
        F.when(F.size(wsw) > 0, top_count / F.size(wsw))
        .otherwise(0.0)
        .alias("top_word_fraction"),
        F.when(n_words > 0, 1.0 - F.size(F.array_distinct(ws)) / n_words)
        .otherwise(0.0)
        .alias("dup_word_fraction"),
    ).drop(*drop)


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    max_dup_line_fraction: float = 0.30,
    max_top_word_fraction: float = 0.20,
    min_words: int = 5,
    max_words: int = 100_000,
) -> DataFrame:
    """Drop documents failing the Gopher repetition/length gates — a
    filter over the signal columns, fully pushdown-friendly."""
    sig = repetition_signals(df, text_col)
    n_words = F.size(words(F.col(text_col)))
    return sig.filter(
        (F.col("dup_line_fraction") <= max_dup_line_fraction)
        & (F.col("top_word_fraction") <= max_top_word_fraction)
        & n_words.between(min_words, max_words)
    ).drop("dup_line_fraction", "top_word_fraction", "dup_word_fraction")


# ---------------------------------------------------------------------------
# Hashed-feature quality classifier, paragraph dedup, RAG chunking
# ---------------------------------------------------------------------------


def _md5_bucket(col: Column, num_buckets: int) -> Column:
    """Engine-portable feature hash: first 6 md5 hex digits → long → mod.
    (Same idiom as maskers._stable_index; SQL mirror is
    ``('0x' || substr(md5(x),1,6))::BIGINT % B``.)"""
    return F.conv(F.substring(F.md5(col), 1, 6), 16, 10).cast("long") % num_buckets


def _hash_bucket(col: Column, num_buckets: int, hash_fn: str) -> Column:
    """Token → bucket id under the chosen hash.

    ``md5`` (default everywhere) is the engine-PORTABLE hash — DuckDB
    replays it bit-for-bit, which is what lets the classifier slots be
    oracle-certified. ``xxhash64`` exists for engines/pipelines that
    standardize on it — NOT as a performance lever: measured at 500k
    docs the whole classifier runs 25.3 s (md5) vs 24.3 s (xxhash64),
    ~4 % — the cost lives in tokenization and per-token array
    construction, not the hash (SCALING.md r12). Identical output
    SHAPE but different bucket assignment, so weights trained under one
    hash only score under the same hash."""
    if hash_fn == "md5":
        return _md5_bucket(col, num_buckets)
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(col), F.lit(num_buckets)).cast("long")
    raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn!r}")


def clean_tokens(text_col: str) -> Column:
    """Non-empty normalized word tokens of ``text_col`` — the SHARED
    tokenization every hashed-feature consumer stages into a column
    first. words('') yields [''] (split semantics), so empty tokens are
    dropped: blank documents score exactly sigmoid(bias), not a
    hashed-''-bucket weight."""
    return F.filter(words(F.col(text_col)), lambda x: x != F.lit(""))


def _buckets_from_tokens(
    tokens: Column, num_buckets: int, use_bigrams: bool, hash_fn: str
) -> Column:
    """Bucket ids from an ALREADY-STAGED token array column.

    The token expression is referenced ~5x here (unigrams, both bigram
    slices, the size guard); Spark's whole-stage codegen re-evaluates
    higher-order-function subtrees PER REFERENCE, so building this
    directly over ``words(text)`` tokenizes every document ~5 times —
    measured 8.06 s vs 1.80 s at 500k docs (SCALING.md r12). Callers
    must pass a COLUMN REFERENCE to tokens staged in a prior projection
    (CollapseProject keeps the stage split because the alias is
    multiply-referenced)."""
    feats = tokens
    if use_bigrams:
        n = F.size(tokens)
        bigrams = F.zip_with(
            F.slice(tokens, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(tokens, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit("_"), b),
        )
        feats = F.concat(tokens, bigrams)
    return F.transform(feats, lambda t: _hash_bucket(t, num_buckets, hash_fn))


def hashed_feature_buckets(
    text_col: str,
    num_buckets: int = 4096,
    use_bigrams: bool = True,
    hash_fn: str = "md5",
) -> Column:
    """The classifier's feature extractor as a reusable Column: word
    unigrams (+ bigrams) hashed into buckets — shared by scoring
    (classifier_quality_score) and training (train_quality_weights) so
    the two can never drift apart. ``hash_fn`` — see ``_hash_bucket``:
    md5 = portable/oracle-replayable default, xxhash64 = fast path.

    NOTE this inline form re-tokenizes per expression reference (see
    ``_buckets_from_tokens``); the engine's own consumers stage
    ``clean_tokens`` into a column first and call the from-tokens form —
    prefer that in any hot path."""
    return _buckets_from_tokens(
        clean_tokens(text_col), num_buckets, use_bigrams, hash_fn
    )


def train_quality_weights(
    pos: DataFrame,
    neg: DataFrame,
    text_col: str = "text",
    num_buckets: int = 4096,
    use_bigrams: bool = True,
    hash_fn: str = "md5",
) -> list[float]:
    """Train the hashed-feature quality classifier CLOSED-FORM: per-bucket
    Naive Bayes log-odds ln((pos_b+1)/(pos_total+B)) −
    ln((neg_b+1)/(neg_total+B)) from one count aggregate per side —
    distributed, single-pass, deterministic (exact integer counts; no
    gradient loop). ``pos`` = exemplar high-quality corpus (e.g.
    Wikipedia), ``neg`` = raw crawl. Feed the result straight into
    ``classifier_quality_score(weights=…)`` — the standard
    fastText-style quality-filter training recipe, relationally.

    Returns a dense ``num_buckets`` weight list (unseen buckets get the
    smoothing-only weight)."""
    import math

    # ONE side-tagged aggregate job for both corpora instead of two
    # sequential count jobs: union the exploded bucket streams with a
    # side flag and conditional-sum per bucket. Same exact integer
    # counts (hash-pinned by the dsir/classifier oracle slots), half
    # the scheduling and one shared shuffle.
    b = _buckets_from_tokens(F.col("__toks"), num_buckets, use_bigrams, hash_fn)
    tagged = pos.withColumn("__toks", clean_tokens(text_col)).select(
        F.lit(1).alias("__side"), F.explode_outer(b).alias("bucket")
    ).unionByName(
        neg.withColumn("__toks", clean_tokens(text_col)).select(
            F.lit(0).alias("__side"), F.explode_outer(b).alias("bucket")
        )
    )
    rows = (
        tagged.filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(
            F.sum(F.col("__side")).alias("np"),
            F.sum(1 - F.col("__side")).alias("nn"),
        )
        .collect()
    )
    pc = {int(r["bucket"]): int(r["np"]) for r in rows if r["np"]}
    nc = {int(r["bucket"]): int(r["nn"]) for r in rows if r["nn"]}
    pt = sum(pc.values()) + num_buckets
    nt = sum(nc.values()) + num_buckets
    return [
        math.log((pc.get(b, 0) + 1) / pt) - math.log((nc.get(b, 0) + 1) / nt)
        for b in range(num_buckets)
    ]


def classifier_quality_score(
    df: DataFrame,
    text_col: str = "text",
    weights: list[float] | None = None,
    num_buckets: int = 4096,
    bias: float = 0.0,
    use_bigrams: bool = True,
    hash_fn: str = "md5",
    _words: Column | None = None,
) -> DataFrame:
    """fastText-style linear quality classifier over hashed n-gram
    features (the CCNet/LLaMA-pipeline "quality filter" shape): word
    unigrams (+ bigrams) hash into ``num_buckets`` buckets, the document
    score is sigmoid(bias + mean bucket weight).

    The heavy lifting is the HASHING TRICK as pure column math: tokens →
    md5 bucket ids → weight lookup → ``F.aggregate`` mean — zero UDFs, so
    scoring 100 TB is one codegen'd projection. ``weights`` is the trained
    model (index = bucket id); when omitted, a deterministic stand-in
    derived from the bucket id itself ((b % 2001 − 1000)/1000) exercises
    the full plumbing so the operator is testable end-to-end — swap in
    real trained weights for production filtering.

    Inlining the weight vector as an array literal is right for the
    fastText regime (vocab-hashed buckets, tens of KB); a million-bucket
    model should become a broadcast join against a weights table instead.
    """
    # stage tokens ONCE (see _buckets_from_tokens: the inline form
    # re-tokenizes ~5x per document — measured 4.5x slower); with a
    # shared staged word array the filter is one cheap array pass
    df = df.withColumn(
        "__clf_toks",
        clean_tokens(text_col)
        if _words is None
        else F.filter(_words, lambda x: x != F.lit("")),
    )
    buckets = _buckets_from_tokens(
        F.col("__clf_toks"), num_buckets, use_bigrams, hash_fn
    )
    trained = weights is not None
    if trained:
        if len(weights) != num_buckets:
            raise ValueError(
                f"weights has {len(weights)} entries, expected {num_buckets}"
            )
        # broadcast one-row array column, not a num_buckets-literal array
        # expression: Catalyst analyzes one attribute, not thousands of
        # literal children per optimizer pass (same trick and identical-
        # result argument as dsir_log_importance)
        wdf = df.sparkSession.createDataFrame(
            [([float(x) for x in weights],)], "__clf_w: array<double>"
        )
        df = df.crossJoin(F.broadcast(wdf))
        weight_of = lambda b: F.element_at(  # noqa: E731
            F.col("__clf_w"), (b + 1).cast("int")
        )
    else:
        weight_of = lambda b: ((b % 2001) - 1000) / F.lit(1000.0)  # noqa: E731
    total = F.aggregate(
        buckets, F.lit(0.0), lambda acc, b: acc + weight_of(b)
    )
    mean = F.when(F.size(buckets) > 0, total / F.size(buckets)).otherwise(F.lit(0.0))
    logit = F.lit(float(bias)) + mean
    out = df.withColumn(
        "classifier_score", F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6)
    ).drop("__clf_toks")
    return out.drop("__clf_w") if trained else out


def char_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Shannon entropy of the NORMALIZED character
    distribution (bits/char) — the language-model-free noise signal:
    random gibberish scores near log2(alphabet), keyboard-mash and
    run-length spam score far below typical prose (~4.0-4.3 bits for
    English), so both tails are filterable without any trained model.

    Normalization ([a-z0-9 ] after case-fold) pins the alphabet to
    ASCII, so char segmentation is identical in any engine (no
    surrogate-pair or grapheme ambiguity). Per-char terms
    -p·log2(p) sum as 1e-9-quantized longs — the distributed sum is
    addition-order-independent and the oracle hash-certifies the
    floats. Shape: explode to (id, char) — shuffle key a few dozen
    distinct values per doc — two hash aggregations, no Python.

    Returns (id, n_chars, entropy_bits); empty/normalized-empty docs
    get entropy 0 over 0 chars."""
    ch = (
        df.select(
            F.col(id_col).cast("long").alias("id"),
            F.explode_outer(F.split(normalized_text(F.col(text_col)), "")).alias(
                "__c"
            ),
        )
        .filter(F.col("__c").isNotNull() & (F.col("__c") != ""))
    )
    cc = ch.groupBy("id", "__c").agg(F.count(F.lit(1)).alias("__n"))
    tot = cc.groupBy("id").agg(F.sum("__n").alias("__t"))
    p = F.col("__n") / F.col("__t").cast("double")
    term_q = F.round(-(p * F.log(p) / F.lit(math.log(2.0))) * F.lit(1e9)).cast(
        "long"
    )
    ent = (
        cc.join(tot, "id")
        .select("id", F.col("__t").alias("__tt"), term_q.alias("__q"))
        .groupBy("id")
        .agg(
            F.max("__tt").cast("long").alias("n_chars"),
            F.round(F.sum("__q") / F.lit(1e9), 6).alias("entropy_bits"),
        )
    )
    base = df.select(F.col(id_col).cast("long").alias("id"))
    return base.join(ent, "id", "left").select(
        "id",
        F.coalesce("n_chars", F.lit(0)).alias("n_chars"),
        F.coalesce("entropy_bits", F.lit(0.0)).alias("entropy_bits"),
    )


def quantile_gate(
    df: DataFrame,
    score_col: str,
    group_col: str | None = None,
    keep_fraction: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """ADAPTIVE quality gating: keep the top ``keep_fraction`` of rows by
    ``score_col`` WITHIN each ``group_col`` stratum (per-source, per-lang,
    per-crawl-snapshot…). A single global threshold silently empties weak
    sources and keeps the whole strongest one — per-stratum quantiles are
    how production corpus mixes hold their source composition while still
    dropping each source's worst tail (the CCNet per-language-bucket
    recipe).

    Exact, not sketched: cume_dist over (score desc, id) per stratum, keep
    where cume_dist ≤ fraction — so the kept count per stratum is
    ⌊fraction·n⌋ (+ ties broken deterministically by id) and the oracle
    can certify the exact membership. One shuffle on the stratum key with
    an in-partition sort; at extreme per-stratum cardinality swap in
    percentile_approx for the threshold and accept sketch tolerance.

    Returns (id, group, score, kept)."""
    if not 0.0 < keep_fraction <= 1.0:
        raise ValueError(f"keep_fraction must be in (0, 1], got {keep_fraction}")
    from pyspark.sql import Window

    grp = F.col(group_col) if group_col else F.lit("__all__")
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        grp.cast("string").alias("group"),
        F.col(score_col).cast("double").alias("score"),
    )
    w = Window.partitionBy("group").orderBy(F.desc("score"), "id")
    return base.withColumn(
        "kept", (F.cume_dist().over(w) <= F.lit(keep_fraction)).cast("boolean")
    )


def dsir_log_importance(
    df: DataFrame,
    weights: list[float],
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 4096,
    use_bigrams: bool = True,
) -> DataFrame:
    """Per-document DSIR log importance weight (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): the sum of
    per-feature log(p_target/p_raw) over the document's hashed n-gram
    features. ``weights`` is exactly the Naive Bayes log-odds vector from
    :func:`train_quality_weights` trained on (target, raw) — DSIR's
    bag-of-hashed-ngrams importance estimate IS that closed form, so the
    trainer is shared verbatim.

    Pure column math: bucket hashing + one F.aggregate fold over the
    weight vector, which rides in as a BROADCAST one-row array column
    (crossJoin of a single-row frame), not a 4096-literal array
    expression — Catalyst analyzes ONE attribute instead of walking
    thousands of literal children on every optimizer pass (that literal
    tree alone cost seconds of driver time per job). The per-document
    fold stays the same sequential left-to-right accumulation, so the
    scores are bit-identical (pinned by the dsir_select oracle slot).

    Returns df + ``log_importance`` (double)."""
    if len(weights) != num_buckets:
        raise ValueError(f"weights has {len(weights)} entries, expected {num_buckets}")
    buckets = _buckets_from_tokens(
        F.col("__dsir_toks"), num_buckets, use_bigrams, "md5"
    )
    wdf = df.sparkSession.createDataFrame(
        [([float(x) for x in weights],)], "__dsir_w: array<double>"
    )
    logw = F.aggregate(
        buckets,
        F.lit(0.0),
        lambda acc, b: acc + F.element_at(F.col("__dsir_w"), (b + 1).cast("int")),
    )
    return (
        df.withColumn("__dsir_toks", clean_tokens(text_col))
        .crossJoin(F.broadcast(wdf))
        .withColumn("log_importance", logw)
        .drop("__dsir_w", "__dsir_toks")
    )


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    n_select: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 4096,
    use_bigrams: bool = True,
    weights: list[float] | None = None,
) -> DataFrame:
    """DSIR data selection: importance-RESAMPLE ``n_select`` documents
    from the raw corpus toward the ``target`` distribution — Gumbel
    top-k sampling without replacement, so inclusion probability follows
    softmax(log_importance) rather than a hard threshold (the paper's
    resampling step; hard top-k over-concentrates on near-duplicates of
    the target).

    Determinism at scale: the Gumbel noise derives from md5 of the doc id
    (u = (first-12-hex-digits + 0.5) / 2^48, g = -ln(-ln u)) — reruns and
    engines agree, no RNG state. The sampling key is quantized to 1e-6
    before ranking so the selection boundary never hinges on sub-ulp
    float disagreement. Selection is orderBy+limit — Spark's TakeOrdered
    (per-partition top-n, driver merge of n_select rows), not a global
    sort.

    Returns (id, log_importance, rank) for the selected documents.

    Audited single-reference (r13 HOF/reuse sweep): tokens are staged
    once (``__dsir_toks``, see :func:`dsir_log_importance`), the bucket
    transform feeds exactly one aggregate, and the only corpus re-scan
    is the weight TRAINER's own count pass — inherent to
    train-then-score, not an expression-reuse artifact."""
    if weights is None:
        weights = train_quality_weights(
            target, df, text_col, num_buckets, use_bigrams
        )
    scored = dsir_log_importance(
        df, weights, text_col, id_col, num_buckets, use_bigrams
    ).select(F.col(id_col).cast("long").alias("id"), "log_importance")
    u = (
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 12), 16, 10).cast(
            "double"
        )
        + F.lit(0.5)
    ) / F.lit(float(2**48))
    gumbel = -F.log(-F.log(u))
    key_q = F.round((F.col("log_importance") + gumbel) * 1e6).cast("long")
    ranked = (
        scored.withColumn("__key", key_q)
        .orderBy(F.desc("__key"), "id")
        .limit(n_select)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("__key"), "id")
    return ranked.withColumn("rank", F.row_number().over(w)).select(
        "id", F.round("log_importance", 6).alias("log_importance"), "rank"
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 4,
) -> DataFrame:
    """WINNOWING document fingerprints (Schleimer, Wilkerson, Aiken 2003
    — the MOSS algorithm): hash every normalized k-token gram, slide a
    w-gram window over the hash sequence, and select each window's
    minimum hash (rightmost occurrence on ties). The selected set is a
    position-aware fingerprint with the winnowing guarantee: any shared
    token run of length ≥ w + k - 1 between two documents yields at
    least one shared fingerprint, while storage is ~2/(w+1) of the gram
    count — the local-document complement to MinHash (which sketches
    whole-document similarity and has no locality guarantee).

    Hashes are the first 16 hex chars of md5 over the gram text —
    compared AS STRINGS, where lexicographic order equals unsigned
    numeric order, so selection is engine-reproducible. The whole
    extraction is array higher-order-function column math: ZERO shuffles,
    zero Python, whole-stage-codegen'd — fingerprinting 100 TB is a
    single map-only scan.

    Returns (id, fingerprints: array<struct<pos:int, h:string>>),
    pos = 1-based gram start of the selected hash."""
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k}, w={w}")
    nt = words(F.col(text_col))
    nt = F.when(F.length(normalized_text(F.col(text_col))) > 0, nt).otherwise(
        F.array().cast("array<string>")
    )
    base = df.select(F.col(id_col).cast("long").alias("id"), nt.alias("__nt"))
    hs = F.when(
        F.size("__nt") >= k,
        F.transform(
            F.sequence(F.lit(1), F.size("__nt") - k + 1),
            lambda i: F.struct(
                F.substring(F.md5(F.concat_ws(" ", F.slice("__nt", i, k))), 1, 16).alias(
                    "h"
                ),
                i.cast("int").alias("pos"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<h:string,pos:int>>"))
    with_h = base.select("id", hs.alias("__hs"))
    n_g = F.size("__hs")
    # window starts: 1..n_g-w+1 (short docs with 1..w grams get ONE
    # window over everything). sequence() with start > stop counts DOWN
    # in Spark, so the empty case must be guarded explicitly.
    starts = F.when(
        n_g >= 1, F.sequence(F.lit(1), F.greatest(n_g - w + 1, F.lit(1)))
    ).otherwise(F.array().cast("array<int>"))
    # per window: min over (h asc, -pos asc) == smallest hash, rightmost
    # position on ties — the robust-winnowing tie rule.
    sel = F.transform(
        starts,
        lambda s: F.array_min(
            F.transform(
                F.slice("__hs", s, w),
                lambda e: F.struct(e["h"].alias("h"), (-e["pos"]).alias("np")),
            )
        ),
    )
    fps = F.array_distinct(
        F.transform(
            sel, lambda m: F.struct((-m["np"]).cast("int").alias("pos"), m["h"].alias("h"))
        )
    )
    return with_h.select("id", fps.alias("fingerprints"))


def winnow_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """Document-overlap detection on winnowing fingerprints: pairs of
    documents sharing ≥ ``min_shared`` selected hashes, with a
    containment score shared/|smaller fingerprint set| — the MOSS
    plagiarism report, distributed.

    Shape: map-only fingerprint extraction (:func:`winnow_fingerprints`),
    explode to a (hash, id) inverted index — 16-char hashes, never text —
    self-join on the hash, aggregate per pair. Identical to the n-gram
    Jaccard plan but over the winnowed ~2/(w+1) subsample, so the index
    and join are ~5x smaller at the same detection guarantee for runs
    ≥ w + k - 1 tokens.

    Returns (id_a, id_b, shared_fingerprints, containment)."""
    # explode_outer, NOT explode: InferFiltersFromGenerate would add a
    # size(fingerprints) > 0 predicate and filter pushdown inlines the
    # ENTIRE winnowing HOF pipeline into it — re-evaluating extraction
    # once per emitted fingerprint (was ~60x the extraction cost; same
    # pathology as dedup._shingle_rows, see its docstring).
    # localCheckpoint: fp feeds THREE consumers (the size aggregate and
    # both sides of the hash self-join) — uncheckpointed, each re-runs
    # the md5-per-gram winnowing extraction, tripling the map cost (r13
    # HOF/reuse sweep; same inline-reuse pattern as minhash_dedup_pairs'
    # checkpointed shingle table). The pinned relation is bare
    # (id, 16-char hash) rows, a ~2/(w+1) subsample of the gram count.
    fp = (
        winnow_fingerprints(df, text_col, id_col, k=k, w=w)
        .select("id", F.explode_outer("fingerprints").alias("f"))
        .filter(F.col("f").isNotNull())
        .select("id", F.col("f.h").alias("h"))
        .dropDuplicates(["id", "h"])
        .localCheckpoint(eager=True)
    )
    sizes = fp.groupBy("id").agg(F.count(F.lit(1)).alias("__n"))
    a = fp.select(F.col("id").alias("id_a"), "h")
    b = fp.select(F.col("id").alias("id_b"), "h")
    pairs = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fingerprints"))
        .filter(F.col("shared_fingerprints") >= min_shared)
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("__n").alias("__na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("__n").alias("__nb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "shared_fingerprints",
            F.round(
                F.col("shared_fingerprints")
                / F.least("__na", "__nb").cast("double"),
                6,
            ).alias("containment"),
        )
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    separator: str = r"\n{2,}",
    join_with: str = "\n\n",
) -> DataFrame:
    """Corpus-wide PARAGRAPH-level exact dedup (the C4/RefinedWeb line- or
    paragraph-hash pass): every paragraph keeps exactly its first
    occurrence — ordered by (doc_id, position) — and later repeats are
    dropped from their documents; document rows survive (possibly with
    empty text) so ids never vanish mid-pipeline.

    Shape: split+posexplode, one window rank over the paragraph's md5 (the
    shuffle key is a 32-char hash, not the paragraph body — the text rides
    exactly once to its winning position), then groupBy(id) reassembly in
    original order. Engine-portable decisions (md5 + deterministic
    ordering) keep this SQL-replicable.

    Returns the input frame with ``text_col`` rewritten plus
    ``paragraphs_kept`` / ``paragraphs_removed`` counts.
    """
    from pyspark.sql import Window

    paras = (
        df.select(
            F.col(id_col).alias("__id"),
            F.posexplode(F.split(F.col(text_col), separator)).alias("__pos", "__para"),
        )
        .filter(F.trim(F.col("__para")) != "")
    )
    ranked = paras.withColumn(
        "__rk",
        F.row_number().over(
            Window.partitionBy(F.md5(F.col("__para"))).orderBy("__id", "__pos")
        ),
    )
    kept = ranked.withColumn("__keep", F.col("__rk") == 1)
    rebuilt = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__keep"),
                            F.struct(F.col("__pos"), F.col("__para")),
                        )
                    )
                ),
                lambda s: s["__para"],
            ),
            join_with,
        ).alias("__new_text"),
        F.sum(F.when(F.col("__keep"), 1).otherwise(0)).cast("long").alias("paragraphs_kept"),
        F.sum(F.when(F.col("__keep"), 0).otherwise(1)).cast("long").alias("paragraphs_removed"),
    )
    return (
        df.join(rebuilt, df[id_col] == rebuilt["__id"], "left")
        .drop("__id")
        .withColumn(text_col, F.coalesce(F.col("__new_text"), F.lit("")))
        .drop("__new_text")
        .withColumn("paragraphs_kept", F.coalesce("paragraphs_kept", F.lit(0)))
        .withColumn("paragraphs_removed", F.coalesce("paragraphs_removed", F.lit(0)))
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Split documents into token-bounded chunks (the RAG / context-window
    packing primitive): whitespace tokens, windows of ``max_tokens`` with
    ``overlap`` tokens shared between consecutive chunks.

    One projection computes every chunk boundary with ``sequence`` +
    ``slice`` (no UDF, no shuffle); posexplode yields
    ``(id, chunk_index, chunk_text, chunk_tokens)``. Empty/blank docs
    produce zero chunks.
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"overlap must be in [0, max_tokens), got {overlap}")
    stride = max_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # last start obeys s <= n - overlap so a tail chunk is never fully
    # contained in its predecessor (pure duplication otherwise)
    starts = F.sequence(F.lit(1), F.greatest(n - overlap, F.lit(1)), F.lit(stride))
    chunks = F.transform(starts, lambda s: F.array_join(F.slice(toks, s, max_tokens), " "))
    return (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col),
            F.posexplode(chunks).alias("chunk_index", "chunk_text"),
        )
        .withColumn(
            "chunk_tokens",
            F.when(F.length(F.col("chunk_text")) == 0, F.lit(0)).otherwise(
                F.size(F.split(F.col("chunk_text"), " "))
            ),
        )
    )


def corpus_drift(
    baseline: DataFrame,
    current: DataFrame,
    text_col: str = "text",
    threshold: float = 0.1,
) -> DataFrame:
    """Corpus-version drift: PSI between two snapshots over the curation
    signals (composite quality score, BPE-ish token count, char length).

    The "did my crawl/filters change the corpus distribution" check a
    training-data pipeline runs on every refresh — each signal reduces
    both sides to 10-bin histogram aggregates (drift.detectors.psi), so
    the comparison cost is two fused scans regardless of corpus size.
    Returns one row per signal: (signal, psi, threshold, drifted)."""
    from truthound_spark.drift.detectors import psi
    from truthound_spark.validators.corpus import _quality_score_expr

    signals = {
        "quality_score": lambda d: d.select(
            _quality_score_expr(F.col(text_col)).alias("__sig")
        ),
        "token_count": lambda d: d.select(
            bpe_ish_token_count(F.col(text_col)).cast("double").alias("__sig")
        ),
        "char_length": lambda d: d.select(
            F.coalesce(F.length(text_col), F.lit(0)).cast("double").alias("__sig")
        ),
    }
    rows = []
    for name, proj in signals.items():
        r = psi(proj(baseline), proj(current), "__sig", threshold=threshold)
        rows.append((name, round(r.statistic, 6), float(threshold), bool(r.drifted)))
    return baseline.sparkSession.createDataFrame(
        rows, "signal string, psi double, threshold double, drifted boolean"
    )


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-document novelty: the fraction of a document's DISTINCT word
    n-grams that occur in no other document — a self-information proxy
    that separates templated/boilerplate-heavy docs (novelty → 0) from
    genuinely original text (→ 1), and a cheap complement to near-dup
    detection (a doc can evade pairwise Jaccard while still being built
    entirely from corpus-common n-grams).

    Plan: ONE shingling pass — the shingle ARRAYS are persisted (tracked;
    ``dedup.release_dedup_caches()`` frees them) so the tokenize
    pipeline is evaluated once, then two skew-immune aggregates read the
    arrays back. The r13 window form (count over partitionBy gram) kept
    the single pass but dropped map-side partial aggregation and forced
    every occurrence of a hot gram into ONE window task — and AQE skew
    splitting does not apply to window exchanges, so a corpus-common
    stop-word trigram (exactly this operator's target data) serialized
    the stage (ADVICE r13). Here instead: (a) per-doc totals are an
    id-keyed groupBy; (b) per-gram frequency is a gram-keyed groupBy
    with partial agg — a hot gram collapses to one partial row per task
    — and because a ``df == 1`` gram's single occurrence also pins its
    owning document, ``min(id)`` of the group replaces the old
    gram-keyed join-back entirely. The only join left is id-keyed
    between two doc-counted aggregates. Returns (id, n_grams,
    novel_grams, novelty ∈ [0,1]; docs too short for any n-gram report
    0 grams and novelty 0.0)."""
    from truthound_spark.pipeline.dedup import _persist_tracked, _shingle_arrays

    sh = _persist_tracked(_shingle_arrays(df, text_col, id_col, n))
    # per-doc totals never need the exploded relation: count the kept
    # grams INSIDE the array (doc-granularity rows, one tiny id-keyed
    # aggregate) instead of exploding a second corpus-sized relation
    n_per_doc = (
        sh.select(
            "id",
            F.size(F.filter("sh", lambda x: x != F.lit(""))).alias("__k"),
        )
        .groupBy("id")
        .agg(F.sum("__k").cast("long").alias("n_grams"))
    )
    inv = (
        sh.select("id", F.explode_outer("sh").alias("g"))
        .filter(F.col("g").isNotNull() & (F.col("g") != ""))
    )
    novel_per_doc = (
        inv.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"), F.min("id").alias("id"))
        .filter(F.col("df") == 1)
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("novel_grams"))
    )
    per_doc = n_per_doc.join(novel_per_doc, "id", "left")
    ids = df.select(F.col(id_col).cast("long").alias("id"))
    return ids.join(per_doc, "id", "left").select(
        "id",
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce("novel_grams", F.lit(0)).alias("novel_grams"),
        F.round(
            F.coalesce(
                F.col("novel_grams") / F.col("n_grams"), F.lit(0.0)
            ),
            6,
        ).alias("novelty"),
    )


def bigram_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Perplexity under a corpus-self-trained bigram LM — the relational
    analog of the CCNet/KenLM perplexity filter (their LM is external;
    here the corpus IS the model, so "perplexing" means "unlike this
    corpus"): outlier-high perplexity flags noise/garbled text,
    outlier-low flags boilerplate.

    Model: add-one-smoothed bigram probabilities p(w₂|w₁) =
    (c(w₁w₂)+1)/(c(w₁)+V) with corpus-wide counts and vocabulary V;
    score(doc) = mean −ln p over the doc's bigram positions (ALL
    positions, not distinct — LM scoring weights repetition);
    perplexity = e^score.

    Plan: one tokenize pass feeds bigram + unigram count aggregates
    (shuffle keys are grams), scores join counts back and average
    QUANTIZED per-position logprobs (round(lp·10⁶) longs — the engine's
    standard exact-mean trick, so a SQL oracle certifies the floats).
    Returns (id, n_bigrams, avg_neg_logprob, perplexity); docs with < 2
    tokens report 0 bigrams and NULL scores."""
    from truthound_spark.pipeline.dedup import words

    w = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.filter(words(F.col(text_col)), lambda x: x != F.lit("")).alias("__w"),
    )
    n = F.size("__w")
    bigrams = w.select(
        "id",
        F.when(
            n >= 2,
            F.zip_with(
                F.slice("__w", 1, n - 1),
                F.slice("__w", 2, n - 1),
                lambda a, b_: F.struct(a.alias("w1"), b_.alias("w2")),
            ),
        )
        .otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        .alias("__b"),
    ).select("id", F.explode_outer("__b").alias("bg")).select(
        "id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    ).filter(F.col("w1").isNotNull())
    unigrams = w.select(F.explode_outer("__w").alias("t")).filter(
        F.col("t").isNotNull()
    )
    uni = unigrams.groupBy("t").agg(F.count(F.lit(1)).alias("c1"))
    vocab = uni.count()
    big = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    lp = (
        bigrams.join(big, ["w1", "w2"])
        .join(uni.withColumnRenamed("t", "w1"), "w1")
        .select(
            "id",
            F.round(
                -F.log(
                    (F.col("c12") + F.lit(1.0))
                    / (F.col("c1") + F.lit(float(vocab)))
                )
                * F.lit(1e6)
            )
            .cast("long")
            .alias("qlp"),
        )
    )
    scored = lp.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        (F.sum("qlp").cast("double") / F.count(F.lit(1)) / F.lit(1e6)).alias(
            "avg_neg_logprob"
        ),
    )
    ids = df.select(F.col(id_col).cast("long").alias("id"))
    return ids.join(scored, "id", "left").select(
        "id",
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.round("avg_neg_logprob", 6).alias("avg_neg_logprob"),
        F.round(F.exp("avg_neg_logprob"), 4).alias("perplexity"),
    )


def tag_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    classifier_weights: list[float] | None = None,
    classifier_hash_fn: str = "md5",
) -> DataFrame:
    """Dolma-style FUSED document tagger: every per-document curation
    signal this module offers, computed in ONE corpus pass.

    Attaches quality features + composite score (``quality_score``),
    language id (``detect_languages``), content fingerprint
    (``fingerprint_documents``), Gopher repetition signals
    (``repetition_signals``) and the hashed-feature classifier score
    (``classifier_quality_score``) — all of which are pure column math,
    so Catalyst's CollapseProject folds the whole stack into a single
    projection over the scan: NO join, NO shuffle, no second pass
    (pinned by a plan test). Running the taggers separately costs K
    corpus scans at 100 TB; this is the one-pass form a production
    tagging stage actually ships.

    Returns df + the ~15 signal columns; filter/gate downstream
    (``gopher_filter`` thresholds, ``quantile_gate`` on quality_score,
    …) or write the tagged corpus once and let every later stage reuse
    it. The classifier is ~73 % of this pass's wall (SCALING.md r12
    stage split); the cost is tokenization + per-token array math, NOT
    the hash — swapping md5 for xxhash64 measured only ~4 %
    (``classifier_hash_fn`` exists for hash standardization, weights
    valid only under their training hash; md5 stays the default because
    the oracle replays it bit-for-bit)."""
    # ONE tokenization for the whole tagger: every stage reads the shared
    # staged word array (normalize+split are the floor cost of this pass,
    # and each stage would otherwise re-run them — SCALING.md r12)
    shared = F.col("__tag_w")
    out = df.withColumn("__tag_w", words(F.col(text_col)))
    out = quality_score(out, text_col, _words=shared)
    out = detect_languages(out, text_col, _words=shared)
    out = fingerprint_documents(out, text_col, _words=shared)
    out = repetition_signals(out, text_col, _words=shared)
    out = classifier_quality_score(
        out,
        text_col,
        weights=classifier_weights,
        hash_fn=classifier_hash_fn,
        _words=shared,
    )
    return out.drop("__tag_w")


def blocklist_filter(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "word",
) -> DataFrame:
    """Blocklist screening (the C4 "bad words" filter shape): flag
    documents containing blocked terms.

    ``mode="word"`` matches whole normalized words — the scalable form:
    the blocklist rides in as a BROADCAST one-row array column (same
    O(1)-plan-size trick as the classifier weights; a 10k-term literal
    array would bloat every optimizer pass) and the per-doc check is one
    ``array_intersect`` against the doc's distinct words. ``mode=
    "phrase"`` additionally matches multi-word phrases by substring
    over the space-padded normalized text — literal ``contains`` chain,
    meant for SMALL phrase lists (every phrase is one codegen'd
    predicate).

    Matching is over the same normalization as every other text
    operator (lowercase, alnum, collapsed spaces), so obfuscation by
    case/punctuation ("B.a.d") is folded before matching.

    Returns (id, matched_terms array<string>, n_matched, blocked)."""
    if not terms:
        raise ValueError("terms must contain at least one entry")
    if mode not in ("word", "phrase"):
        raise ValueError(f"mode must be 'word' or 'phrase', got {mode!r}")
    import re as _re

    def _norm(t: str) -> str:
        # Python mirror of normalized_text: lowercase, alnum, collapsed
        return _re.sub(r"\s+", " ", _re.sub(r"[^a-z0-9\s]", " ", t.lower())).strip()

    norm_terms = sorted({n for n in (_norm(t) for t in terms) if n})
    if not norm_terms:
        raise ValueError("terms normalize to nothing")
    if mode == "word":
        multi = [t for t in norm_terms if " " in t]
        if multi:
            raise ValueError(
                "word mode cannot match multi-word terms (normalization "
                f"split {multi[:3]}...); use mode='phrase' for these"
            )
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(text_col).alias("__t"),
    )
    if mode == "word":
        bl = df.sparkSession.createDataFrame(
            [(norm_terms,)], "__bl: array<string>"
        )
        w = F.array_distinct(words(F.col("__t")))
        matched = F.array_sort(F.array_intersect(w, F.col("__bl")))
        out = (
            base.crossJoin(F.broadcast(bl))
            .select("id", matched.alias("matched_terms"))
        )
    else:
        padded = F.concat(F.lit(" "), normalized_text(F.col("__t")), F.lit(" "))
        hits = F.array(
            *[
                F.when(
                    padded.contains(F.lit(f" {t} ")), F.lit(t)
                )
                for t in norm_terms
            ]
        )
        out = base.select(
            "id",
            F.array_sort(
                F.filter(hits, lambda x: x.isNotNull())
            ).alias("matched_terms"),
        )
    # NULL text propagates to NULL matched_terms; coalesce so n_matched /
    # blocked are 0/false and a downstream filter(~blocked) keeps the row
    nn = F.coalesce(F.col("matched_terms"), F.array().cast("array<string>"))
    return out.select(
        "id",
        nn.alias("matched_terms"),
        F.size(nn).cast("long").alias("n_matched"),
        (F.size(nn) > 0).alias("blocked"),
    )


def _gram_structs(wcol, n_gram: int):
    """array<struct<w1..wN>> of consecutive word n-grams over a words
    array column — THE single extraction expression shared by the LM
    scorers (review r5: the nested zip_with builder existed in three
    near-verbatim copies)."""
    n = F.size(wcol)
    length = F.greatest(n - (n_gram - 1), F.lit(0))
    slices = [F.slice(wcol, i + 1, length) for i in range(n_gram)]
    if n_gram == 2:
        z = F.zip_with(
            slices[0], slices[1],
            lambda a, b_: F.struct(a.alias("w1"), b_.alias("w2")),
        )
        typ = "array<struct<w1:string,w2:string>>"
    elif n_gram == 3:
        inner = F.zip_with(
            slices[1], slices[2],
            lambda b_, c_: F.struct(b_.alias("w2"), c_.alias("w3")),
        )
        z = F.zip_with(
            slices[0], inner,
            lambda a, bc: F.struct(
                a.alias("w1"), bc["w2"].alias("w2"), bc["w3"].alias("w3")
            ),
        )
        typ = "array<struct<w1:string,w2:string,w3:string>>"
    else:
        raise ValueError(f"n_gram must be 2 or 3, got {n_gram}")
    return F.when(n >= n_gram, z).otherwise(F.array().cast(typ))


def trigram_backoff_score(
    df: DataFrame,
    reference: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
) -> DataFrame:
    """Perplexity under a corpus-self-trained trigram LM with STUPID
    BACKOFF (Brants et al. 2007 — the web-scale LM scoring recipe:
    score(w₃|w₁w₂) = c₁₂₃/c₁₂, backing off to α·c₂₃/c₂, then to
    α²·(c₃+1)/(N+V)): a sharper noise/boilerplate signal than the
    bigram model because 3-gram context separates fluent text from
    locally-plausible-but-globally-garbled noise.

    All counts are corpus-wide exact integers; the backoff CASE picks
    the highest-order level with evidence; per-position −ln p quantizes
    to 1e-6 longs before the per-doc mean (the engine's exact-mean
    trick) — the whole model hash-certifies relationally.

    ``reference`` is the corpus the MODEL trains on (its
    trigram/bigram/unigram counts); ``df`` is what gets scored. With
    the default (reference = df itself) every observed trigram has
    count ≥ 1 and the backoff never fires — useful as a pure
    typicality score; train on a held-out/reference slice to exercise
    real backoff on unseen grams (as the entry does).

    Plan: one tokenize pass per side feeds the count aggregates
    (shuffle keys = grams); scoring is four left joins of the doc's
    trigram positions against the count tables. Docs with < 3 tokens
    report 0 trigrams and NULL scores.

    Returns (id, n_trigrams, avg_neg_logprob, perplexity)."""
    import math as _math

    from truthound_spark.pipeline.dedup import words

    w = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.filter(words(F.col(text_col)), lambda x: x != F.lit("")).alias("__w"),
    ).localCheckpoint(eager=True)
    ref_w = (
        w
        if reference is None
        else reference.select(
            F.col(id_col).cast("long").alias("id"),
            F.filter(words(F.col(text_col)), lambda x: x != F.lit("")).alias("__w"),
        ).localCheckpoint(eager=True)
    )
    n = F.size("__w")
    tri = (
        w.select("id", _gram_structs(F.col("__w"), 3).alias("__t"))
        .select("id", F.explode_outer("__t").alias("tg"))
        .select(
            "id",
            F.col("tg.w1").alias("w1"),
            F.col("tg.w2").alias("w2"),
            F.col("tg.w3").alias("w3"),
        )
        .filter(F.col("w1").isNotNull())
    )
    unigrams = ref_w.select(F.explode_outer("__w").alias("t")).filter(
        F.col("t").isNotNull()
    )
    uni = unigrams.groupBy("t").agg(F.count(F.lit(1)).alias("c1"))
    # ONE action returns both scalars (review r5 #6: two full count
    # jobs over the reference corpus collapsed into one aggregate)
    stats = uni.agg(
        F.count(F.lit(1)).alias("__v"), F.sum("c1").alias("__t")
    ).first()
    vocab = int(stats["__v"] or 0)
    total = int(stats["__t"] or 0)
    bi = (
        ref_w.select(_gram_structs(F.col("__w"), 2).alias("__b"))
        .select(F.explode_outer("__b").alias("bg"))
        .select(F.col("bg.w1").alias("wa"), F.col("bg.w2").alias("wb"))
        .filter(F.col("wa").isNotNull())
        .groupBy("wa", "wb")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    ref_tri = (
        ref_w.select(_gram_structs(F.col("__w"), 3).alias("__t"))
        .select(F.explode_outer("__t").alias("tg"))
        .select(
            F.col("tg.w1").alias("w1"),
            F.col("tg.w2").alias("w2"),
            F.col("tg.w3").alias("w3"),
        )
        .filter(F.col("w1").isNotNull())
    )
    tg = ref_tri.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("c123"))
    a = float(alpha)
    la = _math.log(a)
    p = (
        tri.join(tg, ["w1", "w2", "w3"], "left")
        .join(
            bi.select(
                F.col("wa").alias("w1"), F.col("wb").alias("w2"),
                F.col("cb").alias("c12"),
            ),
            ["w1", "w2"],
            "left",
        )
        .join(
            bi.select(
                F.col("wa").alias("w2"), F.col("wb").alias("w3"),
                F.col("cb").alias("c23"),
            ),
            ["w2", "w3"],
            "left",
        )
        .join(uni.select(F.col("t").alias("w2"), F.col("c1").alias("c2")), "w2", "left")
        .join(uni.select(F.col("t").alias("w3"), F.col("c1").alias("c3")), "w3", "left")
    )
    # backoff CASE: trigram evidence → bigram → add-one unigram; the
    # −ln p terms fold the α factors in log space (exactly −ln α·x =
    # −ln x − ln α, same float ops the oracle replays)
    neg_lp = (
        F.when(
            F.coalesce(F.col("c123"), F.lit(0)) > 0,
            -F.log(F.col("c123") / F.col("c12").cast("double")),
        )
        .when(
            F.coalesce(F.col("c23"), F.lit(0)) > 0,
            -F.log(F.col("c23") / F.col("c2").cast("double")) - F.lit(la),
        )
        .otherwise(
            -F.log(
                (F.coalesce(F.col("c3"), F.lit(0)) + F.lit(1.0))
                / F.lit(float(total + vocab))
            )
            - F.lit(2 * la)
        )
    )
    lp = p.select("id", F.round(neg_lp * F.lit(1e6)).cast("long").alias("qlp"))
    scored = lp.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_trigrams"),
        (F.sum("qlp").cast("double") / F.count(F.lit(1)) / F.lit(1e6)).alias(
            "avg_neg_logprob"
        ),
    )
    ids = df.select(F.col(id_col).cast("long").alias("id"))
    return ids.join(scored, "id", "left").select(
        "id",
        F.coalesce("n_trigrams", F.lit(0)).alias("n_trigrams"),
        F.round("avg_neg_logprob", 6).alias("avg_neg_logprob"),
        F.round(F.exp("avg_neg_logprob"), 6).alias("perplexity"),
    )


def canonicalize_url(col: Column) -> Column:
    """Canonical URL form — the first dedup key of any web corpus
    (CommonCrawl/C4-style pipelines dedup by canonical URL before any
    content pass, since crawls re-fetch the same page under trivially
    different URLs).

    Normalizations (pure column math, no UDF; each mirrors what
    url-normalize/courlan do):
      * scheme + host lowercased; fragment (#…) dropped
      * default ports stripped (:80 for http, :443 for https)
      * trailing slash on a non-root path stripped
      * tracking params removed (utm_*, fbclid, gclid, msclkid,
        mc_eid, ref) and the surviving query params SORTED — parameter
        order is transport noise, not identity

    100 TB story: this is a per-row projection feeding an exact-dedup
    groupBy whose key is the canonical string — the cheapest dedup mass
    removal available, run before any shingling."""
    scheme = F.lower(F.regexp_extract(col, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(col, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = F.when(
        (scheme == "http") & host.endswith(":80"),
        F.regexp_replace(host, r":80$", ""),
    ).otherwise(
        F.when(
            (scheme == "https") & host.endswith(":443"),
            F.regexp_replace(host, r":443$", ""),
        ).otherwise(host)
    )
    path = F.regexp_extract(col, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.regexp_replace(path, r"/$", ""),
    ).otherwise(path)
    query = F.regexp_extract(col, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0)
        & ~F.lower(p).startswith("utm_")
        & ~F.lower(p).startswith("fbclid=")
        & ~F.lower(p).startswith("gclid=")
        & ~F.lower(p).startswith("msclkid=")
        & ~F.lower(p).startswith("mc_eid=")
        & ~F.lower(p).startswith("ref="),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(F.length(sorted_q) > 0, F.concat(F.lit("?"), sorted_q)).otherwise(
            F.lit("")
        ),
    )
