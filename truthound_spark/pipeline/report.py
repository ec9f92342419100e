"""Curation-run observability: the stage funnel.

Reference surface: truthound's reporters/datadocs render VALIDATION
results; a curation pipeline additionally needs the funnel — how many
documents each stage admitted, dropped, and what survives end-to-end —
because a silent 40% drop at one stage is the most common way a
training corpus goes wrong without any check failing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def curation_funnel(stages: list[tuple[str, DataFrame]]) -> DataFrame:
    """Row-accounting funnel over ordered pipeline stages.

    ``stages`` is [(name, frame), …] in pipeline order; each frame is the
    corpus AS OF that stage (stage 0 = raw input). One ``count()`` per
    stage — each an O(1)-result aggregate over that stage's plan, the
    cheapest possible audit at any scale (no rows move to the driver).

    Returns (stage_idx, stage, rows, dropped, drop_rate, keep_rate):
    ``dropped``/``drop_rate`` are vs the PREVIOUS stage, ``keep_rate``
    is cumulative vs stage 0 — both rounded to 6dp. A negative
    ``dropped`` (stage grew — e.g. an explode snuck in) is reported
    as-is rather than clamped: it's exactly the anomaly the funnel
    exists to surface. Rates around a ZERO-count stage are NULL, not a
    fake-healthy 0.0/1.0 (review r5): growth out of an empty stage has
    no meaningful rate, and masking it would hide the very anomaly the
    signed ``dropped`` column flags."""
    if not stages:
        raise ValueError("stages must contain at least one (name, frame) pair")
    spark = stages[0][1].sparkSession
    counts = [(name, df.count()) for name, df in stages]
    base = counts[0][1]
    rows = []
    prev = None
    for i, (name, n) in enumerate(counts):
        dropped = 0 if prev is None else prev - n
        if prev is None:
            drop_rate = 0.0
        elif prev == 0:
            drop_rate = None
        else:
            drop_rate = round(dropped / prev, 6)
        keep_rate = None if base == 0 else round(n / base, 6)
        rows.append((i, name, n, dropped, drop_rate, keep_rate))
        prev = n
    return spark.createDataFrame(
        rows,
        "stage_idx int, stage string, rows long, dropped long,"
        " drop_rate double, keep_rate double",
    )


def corpus_composition(
    df: DataFrame,
    group_col: str = "source",
    weight_col: str | None = None,
    top_n: int | None = None,
) -> DataFrame:
    """Corpus composition by source/domain/language — the data-mixture
    audit every training run starts from (what fraction of the corpus
    is each source, and how head-heavy is the mix?).

    Reference surface: the reference's profiler reports per-column value
    frequencies (``profiler/analyzers``); composition of the CORPUS by a
    grouping key with mass shares and the cumulative head curve is the
    pipeline-level counterpart a 100 TB mix needs.

    ``weight_col`` (optional) must be an INTEGRAL mass column (token /
    char counts): weights sum as exact longs, so every share is a
    deterministic ratio of exact integers — hash-stable cross-engine.
    Without it, mass = document count.

    Scale: one groupBy(group) aggregate (map-side partial) → a
    group-cardinality table. With ``top_n`` set, the head is taken with
    an ``orderBy().limit()`` (TakeOrdered — never a global window), the
    window runs over ≤ top_n rows, and everything below the head folds
    into one ``__other__`` row computed from total-minus-head — safe
    even for URL-host-grade keys with 1e8 groups. With ``top_n=None``
    the cumulative window is unpartitioned and the caller asserts the
    key is low-cardinality (source / language).

    Returns (group, n_docs, weight, doc_share, weight_share, cum_share,
    rank) ordered by rank; shares rounded to 6dp; ``__other__`` (if
    present) carries rank top_n+1 and cum_share 1.0.
    """
    from pyspark.sql import Window, functions as F

    w = (
        F.coalesce(F.col(weight_col).cast("long"), F.lit(0))
        if weight_col
        else F.lit(1)
    )
    grp = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    g = df.select(grp.alias("group"), w.alias("__w")).groupBy("group").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("__w").alias("weight")
    )
    tot = g.agg(
        F.sum("n_docs").alias("__td"),
        F.sum("weight").alias("__tw"),
        F.count(F.lit(1)).alias("__ng"),
    )
    if top_n is not None:
        head = g.orderBy(F.desc("weight"), "group").limit(top_n)
    else:
        head = g
    win = Window.orderBy(F.desc("weight"), "group")
    out = (
        head.join(F.broadcast(tot))
        .withColumn("rank", F.row_number().over(win))
        .select(
            "group",
            "n_docs",
            "weight",
            F.round(F.try_divide(F.col("n_docs"), F.col("__td")), 6).alias("doc_share"),
            F.round(F.try_divide(F.col("weight"), F.col("__tw")), 6).alias(
                "weight_share"
            ),
            F.round(
                F.try_divide(
                    F.sum("weight").over(
                        win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                    ),
                    F.col("__tw"),
                ),
                6,
            ).alias("cum_share"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
    if top_n is None:
        return out
    other = (
        head.agg(
            F.sum("n_docs").alias("__hd"),
            F.sum("weight").alias("__hw"),
            F.count(F.lit(1)).alias("__nh"),
        )
        .join(F.broadcast(tot))
        .filter(F.col("__ng") > F.col("__nh"))
        .select(
            F.lit("__other__").alias("group"),
            (F.col("__td") - F.col("__hd")).alias("n_docs"),
            (F.col("__tw") - F.col("__hw")).alias("weight"),
            F.round(
                F.try_divide(F.col("__td") - F.col("__hd"), F.col("__td")), 6
            ).alias("doc_share"),
            F.round(
                F.try_divide(F.col("__tw") - F.col("__hw"), F.col("__tw")), 6
            ).alias("weight_share"),
            F.lit(1.0).alias("cum_share"),
            (F.col("__nh") + 1).cast("long").alias("rank"),
        )
    )
    return out.unionByName(other)


def concentration_report(
    df: DataFrame,
    group_col: str = "source",
    weight_col: str | None = None,
) -> DataFrame:
    """One-row concentration diagnostics over a grouping key: is the
    corpus dangerously dominated by a few sources?

    * ``hhi`` — Herfindahl–Hirschman index Σ share² (1 = single source).
    * ``effective_groups`` — 1/HHI, the "effective number of sources".
    * ``entropy_bits`` — Shannon entropy of the mix.
    * ``top1_share`` — largest single group's mass share (a plain max,
      no ordering pass).

    Determinism: shares are ratios of exact long sums; the hhi/entropy
    per-group terms are quantized to 1e-9 longs before summing (the
    char_entropy pattern), so the whole report is order-independent and
    engine-portable. Scale: groupBy → group-sized table → one aggregate;
    no window, no sort, nothing driver-side.
    """
    from pyspark.sql import functions as F

    w = (
        F.coalesce(F.col(weight_col).cast("long"), F.lit(0))
        if weight_col
        else F.lit(1)
    )
    grp = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    g = df.select(grp.alias("group"), w.alias("__w")).groupBy("group").agg(
        F.sum("__w").alias("weight")
    )
    tot = g.agg(F.sum("weight").alias("__tw"))
    share = F.try_divide(F.col("weight"), F.col("__tw"))  # all-zero mass -> NULL report, not a crash
    q = 1_000_000_000
    hhi_term = F.round(share * share * q).cast("long")
    ent_term = F.when(
        F.col("weight") > 0, F.round(-share * F.log2(share) * q).cast("long")
    ).otherwise(F.lit(0))
    out = (
        g.join(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.max("__tw").cast("long").alias("total_weight"),
            (F.sum(hhi_term) / q).alias("__hhi"),
            F.round(F.sum(ent_term) / q, 6).alias("entropy_bits"),
            F.round(F.try_divide(F.max("weight"), F.max("__tw")), 6).alias("top1_share"),
        )
        .select(
            "n_groups",
            "total_weight",
            F.round("__hhi", 6).alias("hhi"),
            F.round(F.try_divide(F.lit(1.0), F.col("__hhi")), 6).alias("effective_groups"),
            "entropy_bits",
            "top1_share",
        )
    )
    return out


def corpus_card(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str | None = "lang",
    source_col: str | None = "source",
    top_sources: int = 10,
) -> dict:
    """One-call corpus datasheet (Gebru et al. '21 "Datasheets for
    Datasets", the corpus-level sections) — the summary a training run's
    data card starts from: size, token budget, composition,
    concentration, exact-duplicate mass, quality quantiles.

    Cost is bounded and stated: one size/quality aggregate, one
    fingerprint groupBy (exact-dup mass), one composition groupBy per
    grouping column, one concentration aggregate — each map-side
    partial, none corpus-wide sorted. Reuses the certified operators
    (corpus_composition / concentration_report / fingerprint counts), so
    every number on the card has an oracle-backed twin.

    Returns a plain dict (json-ready); render with
    :func:`render_corpus_card`."""
    from pyspark.sql import functions as F

    from truthound_spark.pipeline.text import (
        bpe_ish_token_count,
        fingerprint_documents,
        quality_score,
    )

    size = df.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.length(text_col)).alias("chars"),
        F.sum(F.coalesce(bpe_ish_token_count(F.col(text_col)), F.lit(0))).alias(
            "tokens_est"
        ),
        F.sum(F.col(text_col).isNull().cast("long")).alias("null_text"),
    ).collect()[0]
    qq = (
        quality_score(df.filter(F.col(text_col).isNotNull()), text_col)
        .agg(
            F.percentile_approx(
                "quality_score", [0.1, 0.5, 0.9], 10_000
            ).alias("q")
        )
        .collect()[0]["q"]
    )
    dup = (
        fingerprint_documents(df.filter(F.col(text_col).isNotNull()), text_col)
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum("n").alias("docs"),
            F.sum(F.col("n") - 1).alias("excess"),
        )
        .collect()[0]
    )
    card: dict = {
        "docs": int(size["docs"]),
        "chars": int(size["chars"] or 0),
        "tokens_est": int(size["tokens_est"] or 0),
        "null_text": int(size["null_text"] or 0),
        "quality_p10_p50_p90": [round(float(x), 4) for x in (qq or [])],
        "exact_dup_ratio": (
            round(int(dup["excess"] or 0) / int(dup["docs"]), 6)
            if dup["docs"]
            else 0.0
        ),
    }
    for label, col in (("source", source_col), ("language", lang_col)):
        if col is None or col not in df.columns:
            continue
        comp = corpus_composition(df, col, weight_col=None, top_n=top_sources)
        card[f"by_{label}"] = [
            {
                "group": r["group"],
                "n_docs": int(r["n_docs"]),
                "doc_share": float(r["doc_share"]),
            }
            for r in comp.collect()
        ]
        conc = concentration_report(df, col).collect()[0]
        if conc["hhi"] is None:  # empty corpus → no concentration to report
            continue
        card[f"{label}_concentration"] = {
            "n_groups": int(conc["n_groups"]),
            "hhi": float(conc["hhi"]),
            "effective_groups": float(conc["effective_groups"]),
            "entropy_bits": float(conc["entropy_bits"]),
            "top1_share": float(conc["top1_share"]),
        }
    return card


def render_corpus_card(card: dict, title: str = "Corpus card") -> str:
    """Markdown rendering of :func:`corpus_card` — publishable next to
    the exported shards."""
    lines = [f"# {title}", ""]
    lines.append(f"- **Documents**: {card['docs']:,} ({card['null_text']:,} null-text)")
    lines.append(f"- **Characters**: {card['chars']:,}")
    lines.append(f"- **Tokens (BPE-ish estimate)**: {card['tokens_est']:,}")
    if card.get("quality_p10_p50_p90"):
        p10, p50, p90 = card["quality_p10_p50_p90"]
        lines.append(f"- **Quality score** p10/p50/p90: {p10} / {p50} / {p90}")
    lines.append(f"- **Exact-duplicate mass**: {card['exact_dup_ratio']:.2%}")
    for label in ("source", "language"):
        rows = card.get(f"by_{label}")
        conc = card.get(f"{label}_concentration")
        if not rows or conc is None:
            continue
        lines += [
            "",
            f"## By {label} "
            f"({conc['n_groups']} groups, effective {conc['effective_groups']:.1f}, "
            f"top-1 {conc['top1_share']:.1%}, {conc['entropy_bits']:.2f} bits)",
            "",
            "| group | docs | share |",
            "|---|---|---|",
        ]
        for r in rows:
            lines.append(
                f"| {r['group']} | {r['n_docs']:,} | {r['doc_share']:.2%} |"
            )
    return "\n".join(lines) + "\n"
