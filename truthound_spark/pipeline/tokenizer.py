"""Distributed tokenizer-training operators: BPE merge learning and
corpus token accounting.

Reference surface: the reference engine's corpus-preparation layer stops
at token *counting* (`src/truthound/validators/corpus.py` token-budget
checks); training the tokenizer itself is the canonical upstream step a
100 TB training-data pipeline owns, so it is implemented here as a
first-class relational operator set (BASELINE.json "beyond-reference
LLM-pipeline operators" north star).

Design — the fast-BPE shape (what HuggingFace tokenizers / SentencePiece
BPE do, relationally):

* The corpus is scanned ONCE, into a (word, count) table — vocabulary
  scale (≤ millions of rows), not corpus scale. Every merge round after
  that runs on the compact word table; 100 TB of text trains with one
  corpus pass + R tiny-table rounds.
* Words are represented as delimiter-wrapped symbol strings
  (``low`` → ``|l||o||w|``). A BPE merge of pair (x, y) is then EXACTLY
  the SQL ``replace(sym, '|x||y|', '|xy|')``: string replace scans left
  to right taking non-overlapping matches — identical to the canonical
  greedy left-to-right merge fold (``aaa`` + merge(a,a) → ``aa a``, the
  second ``a`` is NOT re-merged), and because every symbol carries its
  own delimiters, adjacent occurrences share no boundary characters and
  all merge in one pass. The same expression runs verbatim in DuckDB,
  which is what lets the oracle hash-certify the whole training loop.
* Pair selection per round is one aggregate over the word table:
  explode adjacent symbol pairs weighted by word count, sum, take the
  (count DESC, left ASC, right ASC) maximum — exact integer counts and
  a total deterministic order, so reruns and engines agree.

No UDFs anywhere: wrapping, pair explosion, and merge application are
all codegen'd column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from truthound_spark.pipeline.dedup import words

__all__ = [
    "word_counts",
    "wrap_symbols",
    "merge_pairs",
    "bpe_token_count_expr",
    "bpe_train",
    "bpe_token_counts",
    "bpe_fertility",
    "bpe_tokenize",
    "bpe_vocab",
]


def word_counts(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, n) over the normalized corpus — the ONE corpus-scale pass
    of BPE training. Same tokenizer as every other text operator
    (``dedup.words``: lowercase, strip non-alphanumerics, split), so the
    trained vocabulary matches what the dedup/quality operators see."""
    w = F.explode(
        F.filter(words(F.col(text_col)), lambda x: x != F.lit(""))
    ).alias("word")
    return df.select(w).groupBy("word").agg(F.count(F.lit(1)).alias("n"))


def wrap_symbols(col: Column) -> Column:
    """``low`` → ``|l||o||w|``: each character becomes a delimiter-wrapped
    symbol. Safe because normalized words are [a-z0-9] — the delimiter
    can never occur inside a symbol."""
    return F.concat(F.lit("|"), F.array_join(F.split(col, ""), "||"), F.lit("|"))


def _sym_array(col: Column) -> Column:
    """Wrapped symbol string back to array<string> of symbols."""
    return F.split(F.btrim(col, F.lit("|")), r"\|\|")


def merge_pairs(merges) -> list[tuple[str, str]]:
    """Normalize a merge table — :func:`bpe_train`'s DataFrame or an
    equivalent (round, left, right, …) tuple list — into ordered
    (left, right) pairs. THE single parser shared by every consumer
    (bpe_token_counts / bpe_vocab / CorpusTokenCountValidator), so the
    merge-application semantics can never drift between them."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("round").collect()
        return [(r["left"], r["right"]) for r in rows]
    return [(m[1], m[2]) for m in sorted(merges, key=lambda m: m[0])]


def bpe_token_count_expr(col: Column, pairs: list[tuple[str, str]]) -> tuple[Column, Column]:
    """(n_words, n_tokens) Columns for ``col`` under the given merges —
    the ONE implementation of merge application + delimiter arithmetic
    (wrapped words joined by a space no pattern can cross; R nested
    literal replaces; tokens = interior-delimiter pairs / 2 + words).
    Shared by :func:`bpe_token_counts` and the corpus token-budget
    validator so they can never diverge."""
    wlist = F.filter(words(col), lambda x: x != F.lit(""))
    doc_sym = F.array_join(F.transform(wlist, wrap_symbols), " ")
    for x, y in pairs:
        doc_sym = F.replace(doc_sym, F.lit(f"|{x}||{y}|"), F.lit(f"|{x}{y}|"))
    n_words = F.size(wlist)
    n_sep = (
        F.length(doc_sym) - F.length(F.replace(doc_sym, F.lit("||"), F.lit("")))
    ) / 2
    n_tokens = F.when(n_words > 0, (n_sep + n_words).cast("long")).otherwise(F.lit(0))
    return n_words, n_tokens


def bpe_train(
    df: DataFrame,
    rounds: int = 8,
    text_col: str = "text",
    min_pair_count: int = 2,
    word_counts_df: DataFrame | None = None,
) -> DataFrame:
    """Learn ``rounds`` BPE merges from the corpus (Sennrich et al. 2016,
    arXiv:1508.07909 — the byte-pair-encoding subword algorithm every
    modern LLM tokenizer descends from).

    Per round: ONE aggregate over the (word, count) table picks the
    most frequent adjacent symbol pair (ties broken by (left, right)
    lexicographically — fully deterministic), then a literal string
    ``replace`` applies the merge to every word. The corpus itself is
    read exactly once (``word_counts``); rounds run on the vocabulary-
    sized table, which is what makes training tractable at 100 TB.
    Stops early when no pair reaches ``min_pair_count`` (never returns
    noise merges from an exhausted vocabulary).

    Pass ``word_counts_df`` (word, n) to reuse a precomputed/persisted
    count table across experiments.

    Returns a DataFrame (round, left, right, merged, pair_count) —
    round is 1-based, in learned order (feed to ``bpe_token_counts``)."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    spark = df.sparkSession
    wc = word_counts_df if word_counts_df is not None else word_counts(df, text_col)
    wt = wc.select(
        wrap_symbols(F.col("word")).alias("sym"), F.col("n").cast("long").alias("n")
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(1, rounds + 1):
        a = _sym_array(F.col("sym"))
        pair = F.zip_with(
            F.slice(a, 1, F.greatest(F.size(a) - 1, F.lit(0))),
            F.slice(a, 2, F.greatest(F.size(a) - 1, F.lit(0))),
            lambda p, q: F.struct(p.alias("x"), q.alias("y")),
        )
        top = (
            wt.select("n", F.explode(pair).alias("p"))
            .groupBy("p.x", "p.y")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.desc("c"), "x", "y")
            .limit(1)
            .collect()
        )
        if not top or int(top[0]["c"]) < min_pair_count:
            break
        x, y, c = top[0]["x"], top[0]["y"], int(top[0]["c"])
        merges.append((r, x, y, x + y, c))
        wt = wt.withColumn(
            "sym",
            F.replace(
                F.col("sym"), F.lit(f"|{x}||{y}|"), F.lit(f"|{x}{y}|")
            ),
        )
        # constant-depth lineage: each round's replace nests one level;
        # checkpoint every few rounds so the chain never grows unbounded
        if r % 8 == 0:
            wt = wt.localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "round int, left string, right string, merged string, pair_count long"
    )


def _staged_bpe_counts(df: DataFrame, text_col: str, pairs):
    """Stage the token array AND the merged symbol string as columns,
    returning (staged_df, n_words, n_tokens) built over them.

    ``bpe_token_count_expr`` references its word list twice and its
    merge-chain result twice; codegen re-evaluates subtrees per
    reference, so the inline form tokenizes every document twice and
    runs the WHOLE R-round merge chain twice (same finding as the
    staged tagger — SCALING.md r12). Two staged columns make each
    evaluate once; identical expressions → bit-identical counts (the
    bpe_* oracle slots pin it). The inline expr form stays for
    single-aggregate contexts (validators) that cannot stage columns."""
    staged = df.withColumn(
        "__bpe_w", F.filter(words(F.col(text_col)), lambda x: x != F.lit(""))
    )
    doc_sym = F.array_join(F.transform(F.col("__bpe_w"), wrap_symbols), " ")
    for x, y in pairs:
        doc_sym = F.replace(doc_sym, F.lit(f"|{x}||{y}|"), F.lit(f"|{x}{y}|"))
    staged = staged.withColumn("__bpe_sym", doc_sym)
    n_words = F.size(F.col("__bpe_w"))
    n_sep = (
        F.length(F.col("__bpe_sym"))
        - F.length(F.replace(F.col("__bpe_sym"), F.lit("||"), F.lit("")))
    ) / 2
    n_tokens = F.when(n_words > 0, (n_sep + n_words).cast("long")).otherwise(
        F.lit(0)
    )
    return staged, n_words, n_tokens


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple] | DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply learned BPE merges to the corpus and count tokens per
    document — the tokenizer-true token budget (vs the whitespace /
    regex approximations in ``pipeline.text``).

    Map-only at any scale: the whole document becomes ONE wrapped-symbol
    string (words joined by a space, which no ``|x||y|`` pattern can
    cross, so merges never leak across word boundaries), the R merges
    apply as R nested literal ``replace`` calls inside a single
    codegen'd projection, and the token count falls out of arithmetic —
    tokens = interior-delimiter pairs / 2 + words — with NO tokenized
    array ever materialized. Zero shuffles, zero UDFs.

    ``merges`` is the output of :func:`bpe_train` (DataFrame, collected
    in round order) or an equivalent list of (round, left, right, …)
    tuples.

    Returns (id, n_words, n_tokens)."""
    staged, n_words, n_tokens = _staged_bpe_counts(
        df, text_col, merge_pairs(merges)
    )
    return staged.select(
        F.col(id_col).cast("long").alias("id"),
        n_words.cast("long").alias("n_words"),
        n_tokens.alias("n_tokens"),
    )


def bpe_vocab(
    df: DataFrame,
    merges: list[tuple] | DataFrame,
    text_col: str = "text",
    top_v: int | None = None,
) -> DataFrame:
    """Final vocabulary after applying the learned merges: every surviving
    symbol with its corpus occurrence count, ranked, with the cumulative
    coverage curve — the check you run before freezing a tokenizer (does
    the top-V vocabulary cover enough of the corpus? where does the
    long tail start?).

    Scale: same shape as training — the corpus collapses to the word
    table once, merges apply as literal replaces, and the vocabulary
    aggregate explodes SYMBOLS of distinct words weighted by word count
    (vocabulary-scale work throughout). The coverage window runs over
    the final (tokens × 1 row) relation, which is vocab-sized.
    Counts are exact longs; the cumulative fraction divides exact sums,
    so the curve is deterministic cross-engine.

    Returns (token, n, rank, cum_coverage) ordered by rank; ``top_v``
    truncates to the head of the curve."""
    from pyspark.sql import Window

    pairs = merge_pairs(merges)
    wc = word_counts(df, text_col)
    sym = wrap_symbols(F.col("word"))
    for x, y in pairs:
        sym = F.replace(sym, F.lit(f"|{x}||{y}|"), F.lit(f"|{x}{y}|"))
    toks = (
        wc.select(F.col("n"), F.explode(_sym_array(sym)).alias("token"))
        .groupBy("token")
        .agg(F.sum("n").alias("n"))
    )
    w = Window.orderBy(F.desc("n"), "token")
    total = toks.agg(F.sum("n").alias("__t"))
    out = (
        toks.join(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "token",
            "n",
            F.col("rank").cast("long").alias("rank"),
            F.round(
                F.sum("n").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                )
                / F.col("__t"),
                6,
            ).alias("cum_coverage"),
        )
    )
    return out.filter(F.col("rank") <= top_v) if top_v else out


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple] | DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize the actual BPE token sequence per document — the
    trainer-input form (``bpe_token_counts`` gives budgets without ever
    building arrays; exports need the tokens themselves).

    Map-only like the counter: words wrap, merges apply as nested
    literal replaces, and the token array falls out of splitting each
    merged word on the interior delimiter — per-word token lists
    flattened in document order. Zero shuffles, zero UDFs; the output
    column feeds straight into sequence packing / shard export.

    Returns (id, tokens array<string>, n_tokens)."""
    pairs = merge_pairs(merges)

    def merged_word(w):
        sym = wrap_symbols(w)
        for x, y in pairs:
            sym = F.replace(sym, F.lit(f"|{x}||{y}|"), F.lit(f"|{x}{y}|"))
        return _sym_array(sym)

    # token array staged once — it is referenced twice below, and the
    # merge chain must not run per reference (see _staged_bpe_counts)
    staged = df.withColumn(
        "__bpe_toks",
        F.flatten(
            F.transform(
                F.filter(words(F.col(text_col)), lambda x: x != F.lit("")),
                merged_word,
            )
        ),
    )
    toks = F.col("__bpe_toks")
    return staged.select(
        F.col(id_col).cast("long").alias("id"),
        F.coalesce(toks, F.array().cast("array<string>")).alias("tokens"),
        F.coalesce(F.size(toks), F.lit(0)).cast("long").alias("n_tokens"),
    )


def bpe_fertility(
    df: DataFrame,
    merges: list[tuple] | DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-group tokenizer fertility — the multilingual tokenizer-equity
    check (how many tokens does a word cost in each language / source?):
    fertility = tokens per word, compression = chars per token. High
    fertility for a language means its documents burn training budget
    and context length faster — the standard reason to retrain or
    rebalance a tokenizer (SentencePiece/BLOOM tokenizer audits).

    Same map-only merge application as :func:`bpe_token_counts` (shared
    ``bpe_token_count_expr``), then ONE groupBy(group) of exact long
    sums: corpus scanned once, output is group-sized, every ratio is a
    deterministic quotient of exact integers. Null text contributes
    0 tokens / NULL words exactly like the per-doc counter.

    Returns (group, n_docs, n_words, n_tokens, n_chars, fertility,
    chars_per_token)."""
    pairs = merge_pairs(merges)
    staged, n_words, n_tokens = _staged_bpe_counts(df, text_col, pairs)
    n_chars = F.length(F.array_join(F.col("__bpe_w"), ""))
    grp = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    per = staged.select(
        grp.alias("group"),
        n_words.cast("long").alias("__w"),
        n_tokens.alias("__t"),
        n_chars.cast("long").alias("__c"),
    )
    return per.groupBy("group").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__w").alias("n_words"),
        F.sum("__t").alias("n_tokens"),
        F.sum("__c").alias("n_chars"),
        F.round(F.sum("__t") / F.sum("__w"), 6).alias("fertility"),
        F.round(F.sum("__c") / F.sum("__t"), 6).alias("chars_per_token"),
    )
