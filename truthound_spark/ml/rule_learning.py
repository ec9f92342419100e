"""Rule learning: profile rules, constraint mining, pattern learning.

Reference surfaces re-expressed:
  * ml/rule_learning/profile_learner.py:53-458 DataProfileRuleLearner —
    profile → not_null/unique/range/non_negative/length/format rules;
  * ml/rule_learning/constraint_miner.py:48-455 ConstraintMiner —
    functional dependencies, value implications, conditional rules;
  * ml/rule_learning/pattern_learner.py:83-497 PatternRuleLearner —
    string generalization to character-class patterns → regex rules.

Spark-first inversion: the reference SAMPLES rows to the driver
(constraint_miner.py:101 ``df.sample(sample_for_discovery)``) and mines
in-memory; here every discovery is a bounded DISTRIBUTED aggregate —

  * FD mining: ONE ``groupBy(determinant)`` covering ALL dependents per
    determinant (``countDistinct(dep1), countDistinct(dep2), ...`` in a
    single shuffle), then a second tiny aggregate over the group relation
    — never a row collect, exact over the full table, not a sample;
  * determinant candidates are pre-filtered by one fused
    ``approx_count_distinct`` pass so a high-cardinality column (user_id
    mistyped as categorical) never becomes a groupBy key with billions of
    groups;
  * value implications: ``groupBy(X, Y).count()`` + a window over X —
    only the mined (x,y,confidence) rows (bounded by card(X)·card(Y) ≤
    cap²) ever reach the driver;
  * pattern learning: character-class generalization as
    ``regexp_replace`` column chains (JVM-side), pattern histogram via
    groupBy — the corpus is scanned once.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from truthound_spark.core.base import (
    NUMERIC_TYPES,
    STRING_TYPES,
    Validator,
    pct_agg,
)

# ---------------------------------------------------------------------------
# result containers (reference ml/rule_learning/base.py LearnedRule)
# ---------------------------------------------------------------------------


@dataclass
class LearnedRule:
    name: str
    rule_type: str
    column: Any
    condition: str
    support: float
    confidence: float
    validator_config: dict[str, Any] = field(default_factory=dict)
    description: str = ""

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "rule_type": self.rule_type,
            "column": self.column,
            "condition": self.condition,
            "support": round(self.support, 6),
            "confidence": round(self.confidence, 6),
            "validator_config": self.validator_config,
            "description": self.description,
        }


@dataclass
class RuleLearningResult:
    rules: tuple[LearnedRule, ...]
    total_rules: int
    filtered_rules: int
    data_profile: dict[str, Any] = field(default_factory=dict)

    def by_type(self, rule_type: str) -> list[LearnedRule]:
        return [r for r in self.rules if r.rule_type == rule_type]


def _filter_rank(
    rules: list[LearnedRule], min_confidence: float, min_support: float, max_rules: int
) -> tuple[tuple[LearnedRule, ...], int]:
    """reference constraint_miner.py:126-136 filter + rank."""
    kept = [r for r in rules if r.confidence >= min_confidence and r.support >= min_support]
    kept.sort(key=lambda r: (-r.confidence, -r.support, r.name))
    return tuple(kept[:max_rules]), len(rules) - min(len(kept), max_rules)


# ---------------------------------------------------------------------------
# profile-based learner (reference profile_learner.py)
# ---------------------------------------------------------------------------


class DataProfileRuleLearner:
    """Profile → rules. The profile is the distributed one-pass aggregate
    (profiler/table_profiler.py); rule emission mirrors reference
    profile_learner.py:299-458 (thresholds, strictness percentile picks).
    """

    def __init__(
        self,
        null_threshold: float = 0.01,
        uniqueness_threshold: float = 0.999,
        strictness: str = "medium",
        min_confidence: float = 0.5,
        min_support: float = 0.0,
        max_rules: int = 200,
        approx: bool = False,
    ) -> None:
        if strictness not in ("strict", "medium", "loose"):
            raise ValueError(f"unknown strictness {strictness!r}")
        self.null_threshold = null_threshold
        self.uniqueness_threshold = uniqueness_threshold
        self.strictness = strictness
        self.min_confidence = min_confidence
        self.min_support = min_support
        self.max_rules = max_rules
        self.approx = approx
        self._profiles: dict[str, dict[str, Any]] = {}

    def learn_rules(self, df: DataFrame, columns: list[str] | None = None) -> RuleLearningResult:
        from truthound_spark.profiler.table_profiler import profile as profile_fn

        if columns:
            df = df.select(*columns)
        prof = profile_fn(df, approx=self.approx, with_duplicates=False)

        # strict/medium strictness needs tail percentiles the profiler
        # doesn't carry (p01/p05/p95/p99) — ONE extra fused aggregate
        # covering every numeric column (reference profile_learner.py:203
        # computes them per-column on collected data).
        numeric = [
            f.name for f in df.schema.fields if isinstance(f.dataType, NUMERIC_TYPES)
        ]
        pcts: dict[str, list[float]] = {}
        if numeric and self.strictness != "loose":
            row = df.agg(
                *[
                    pct_agg(c, [0.01, 0.05, 0.95, 0.99], self.approx).alias(c)
                    for c in numeric
                ]
            ).collect()[0]
            pcts = {c: list(row[c]) if row[c] is not None else [] for c in numeric}

        rules: list[LearnedRule] = []
        for name, cp in prof.columns.items():
            p: dict[str, Any] = {
                "null_ratio": cp.null_ratio,
                "distinct_ratio": cp.unique_ratio,
                "is_numeric": name in numeric,
                "min": cp.min,
                "max": cp.max,
                "min_length": cp.min_length,
                "max_length": cp.max_length,
            }
            self._profiles[name] = p

            # not_null (reference profile_learner.py:312-325)
            if cp.null_ratio < self.null_threshold:
                rules.append(
                    LearnedRule(
                        name=f"not_null_{name}",
                        rule_type="not_null",
                        column=name,
                        condition=f"{name} is not null",
                        support=1.0 - cp.null_ratio,
                        confidence=1.0 - cp.null_ratio,
                        validator_config={"columns": [name]},
                        description=f"{name} should not be null",
                    )
                )
            # unique (reference :327-340)
            if cp.unique_ratio >= self.uniqueness_threshold and cp.distinct_count > 1:
                rules.append(
                    LearnedRule(
                        name=f"unique_{name}",
                        rule_type="unique",
                        column=name,
                        condition=f"{name} is unique",
                        support=cp.unique_ratio,
                        confidence=cp.unique_ratio,
                        validator_config={"columns": [name]},
                        description=f"{name} should be unique",
                    )
                )
            # range (reference :342-374 strictness percentile picks)
            if p["is_numeric"] and cp.min is not None and cp.max is not None:
                lo_hi = pcts.get(name) or []
                if self.strictness == "strict" and len(lo_hi) == 4:
                    lower, upper = float(lo_hi[0]), float(lo_hi[3])  # p01..p99
                elif self.strictness == "medium" and len(lo_hi) == 4:
                    lower, upper = float(lo_hi[1]), float(lo_hi[2])  # p05..p95
                else:  # loose: min/max ± 10% of the span (reference :353-356)
                    mn, mx = float(cp.min), float(cp.max)
                    span = (mx - mn) if mx != mn else abs(mn) * 0.1
                    lower, upper = mn - span * 0.1, mx + span * 0.1
                rules.append(
                    LearnedRule(
                        name=f"range_{name}",
                        rule_type="range",
                        column=name,
                        condition=f"{lower:.6g} <= {name} <= {upper:.6g}",
                        support=0.9 if self.strictness == "medium" else 0.95,
                        confidence=0.95,
                        validator_config={
                            "columns": [name],
                            "min_value": lower,
                            "max_value": upper,
                        },
                        description=f"{name} in [{lower:.6g}, {upper:.6g}]",
                    )
                )
                # non_negative (reference :377-387)
                if float(cp.min) >= 0:
                    rules.append(
                        LearnedRule(
                            name=f"non_negative_{name}",
                            rule_type="min_value",
                            column=name,
                            condition=f"{name} >= 0",
                            support=1.0,
                            confidence=1.0,
                            validator_config={"columns": [name], "min_value": 0},
                            description=f"{name} should be non-negative",
                        )
                    )
            # length (reference :422-458)
            if cp.min_length is not None and cp.max_length is not None:
                mn_l, mx_l = int(cp.min_length), int(cp.max_length)
                rules.append(
                    LearnedRule(
                        name=(
                            f"fixed_length_{name}" if mn_l == mx_l else f"length_{name}"
                        ),
                        rule_type="length",
                        column=name,
                        condition=(
                            f"len({name}) == {mn_l}"
                            if mn_l == mx_l
                            else f"{mn_l} <= len({name}) <= {mx_l}"
                        ),
                        support=1.0,
                        confidence=1.0 if mn_l == mx_l else 0.95,
                        validator_config={
                            "columns": [name],
                            "min_length": mn_l,
                            "max_length": mx_l,
                        },
                        description=f"{name} length in [{mn_l}, {mx_l}]",
                    )
                )
        kept, n_filtered = _filter_rank(
            rules, self.min_confidence, self.min_support, self.max_rules
        )
        return RuleLearningResult(
            rules=kept,
            total_rules=len(rules),
            filtered_rules=n_filtered,
            data_profile={"columns": len(df.columns), "rows": prof.row_count},
        )

    def get_column_profiles(self) -> dict[str, dict[str, Any]]:
        return dict(self._profiles)


# ---------------------------------------------------------------------------
# constraint miner (reference constraint_miner.py)
# ---------------------------------------------------------------------------


class ConstraintMiner:
    """FD + value-implication mining as bounded distributed aggregates."""

    def __init__(
        self,
        min_confidence: float = 0.95,
        min_support: float = 0.01,
        max_rules: int = 100,
        max_determinant_card: int = 100_000,
        categorical_max_card: int = 20,
        discover_functional_deps: bool = True,
        discover_value_implications: bool = True,
        discover_conditional_rules: bool = False,
        max_implication_rows: int = 10_000,
        max_conditional_columns: int = 12,
        max_fd_determinants: int = 16,
    ) -> None:
        self.min_confidence = min_confidence
        self.min_support = min_support
        self.max_rules = max_rules
        self.max_determinant_card = max_determinant_card
        self.categorical_max_card = categorical_max_card
        self.discover_functional_deps = discover_functional_deps
        self.discover_value_implications = discover_value_implications
        self.discover_conditional_rules = discover_conditional_rules
        self.max_implication_rows = max_implication_rows
        self.max_conditional_columns = max_conditional_columns
        self.max_fd_determinants = max_fd_determinants

    # -- cardinality prefilter: one fused sketch pass ----------------------
    def _cardinalities(self, df: DataFrame, columns: list[str]) -> dict[str, int]:
        row = df.agg(
            F.count(F.lit(1)).alias("__n"),
            *[F.approx_count_distinct(c).alias(c) for c in columns],
        ).collect()[0]
        self._n_rows = int(row["__n"])
        return {c: int(row[c]) for c in columns}

    def learn_rules(
        self,
        df: DataFrame,
        columns: list[str] | None = None,
        fd_candidates: list[tuple[str, str]] | None = None,
    ) -> RuleLearningResult:
        cols = columns or df.columns
        card = self._cardinalities(df, cols)
        n = self._n_rows
        rules: list[LearnedRule] = []

        if self.discover_functional_deps:
            if fd_candidates is None:
                # every (X, Y) pair whose determinant is group-able —
                # the sketch prefilter keeps the group count bounded;
                # auto mode costs 2 jobs PER determinant, so cap the
                # determinant list (lowest cardinality first — cheap
                # groupBys and the most FD-like columns) rather than
                # silently launching hundreds of shuffles on wide tables
                dets = sorted(
                    (c for c in cols if card[c] <= self.max_determinant_card),
                    key=lambda c: (card[c], c),
                )[: self.max_fd_determinants]
                fd_candidates = [(x, y) for x in dets for y in cols if y != x]
            else:
                # composite determinants are gated on their JOINT
                # cardinality (one fused sketch pass over the distinct
                # tuples) — per-component checks would admit a pair of
                # 100k-card columns whose product is data-sized, exactly
                # the billion-group groupBy the prefilter exists to stop
                tuples = sorted(
                    {tuple(x) for x, _ in fd_candidates if not isinstance(x, str)}
                )
                joint: dict[tuple[str, ...], int] = {}
                if tuples:
                    jrow = df.agg(
                        *[
                            F.approx_count_distinct(F.struct(*xs)).alias(f"__j{i}")
                            for i, xs in enumerate(tuples)
                        ]
                    ).collect()[0]
                    joint = {xs: int(jrow[f"__j{i}"]) for i, xs in enumerate(tuples)}
                fd_candidates = [
                    (x, y)
                    for x, y in fd_candidates
                    if (
                        card.get(x, 0) <= self.max_determinant_card
                        if isinstance(x, str)
                        else joint.get(tuple(x), 0) <= self.max_determinant_card
                    )
                ]
            rules.extend(self._mine_fds(df, fd_candidates, n))

        if self.discover_value_implications:
            cats = [c for c in cols if 2 <= card[c] <= self.categorical_max_card]
            rules.extend(self._mine_implications(df, cats, cols, n))

        if self.discover_conditional_rules:
            rules.extend(
                self._mine_conditionals(df, cols[: self.max_conditional_columns], n)
            )

        kept, n_filtered = _filter_rank(
            rules, self.min_confidence, self.min_support, self.max_rules
        )
        return RuleLearningResult(
            rules=kept,
            total_rules=len(rules),
            filtered_rules=n_filtered,
            data_profile={"columns": len(cols), "rows": n},
        )

    def _mine_fds(
        self,
        df: DataFrame,
        candidates: list[tuple[str | tuple[str, ...] | list[str], str]],
        n_rows: int,
    ) -> list[LearnedRule]:
        """FD X→Y holds iff every X-group has exactly one distinct Y
        (reference constraint_miner.py:163-260; composite determinants
        (X1,X2)→Y at :222-254). One groupBy(X) covers ALL dependents of
        that X; the per-group relation is reduced by a second aggregate
        (groups, single-Y groups per dependent) — two jobs per
        determinant regardless of dependent count, shuffle keyed on the
        determinant columns only."""
        from collections import defaultdict

        by_det: dict[tuple[str, ...], list[str]] = defaultdict(list)
        for x, y in candidates:
            key = (x,) if isinstance(x, str) else tuple(x)
            by_det[key].append(y)

        rules: list[LearnedRule] = []
        for xs, deps in sorted(by_det.items()):
            grouped = df.groupBy(*xs).agg(
                F.count(F.lit(1)).alias("__n"),
                *[F.countDistinct(F.col(y)).alias(f"__u_{y}") for y in deps],
            )
            stat = grouped.agg(
                F.count(F.lit(1)).alias("__groups"),
                *[
                    F.sum((F.col(f"__u_{y}") <= 1).cast("long")).alias(f"__s_{y}")
                    for y in deps
                ],
                *[
                    # support = fraction of ROWS living in single-valued
                    # groups (review r7: support==confidence made the
                    # min_support gate vacuous for FDs)
                    F.sum(
                        F.when(F.col(f"__u_{y}") <= 1, F.col("__n")).otherwise(0)
                    ).alias(f"__r_{y}")
                    for y in deps
                ],
            ).collect()[0]
            total_groups = int(stat["__groups"])
            x_label = "_".join(xs)
            x_cond = ", ".join(xs) if len(xs) > 1 else xs[0]
            for y in deps:
                single = int(stat[f"__s_{y}"] or 0)
                if total_groups == 0:
                    continue
                confidence = single / total_groups
                support = (int(stat[f"__r_{y}"] or 0) / n_rows) if n_rows else 0.0
                rules.append(
                    LearnedRule(
                        name=f"fd_{x_label}_to_{y}",
                        rule_type="functional_dependency",
                        column=(*xs, y),
                        condition=(
                            f"({x_cond}) -> {y}" if len(xs) > 1 else f"{x_cond} -> {y}"
                        ),
                        support=support,
                        confidence=confidence,
                        validator_config={
                            "determinant": xs[0] if len(xs) == 1 else list(xs),
                            "dependent": y,
                        },
                        description=f"{x_cond} functionally determines {y}",
                    )
                )
        return rules

    def _mine_implications(
        self, df: DataFrame, cats: list[str], cols: list[str], n_rows: int
    ) -> list[LearnedRule]:
        """Value implications X=x ⇒ Y=y (reference constraint_miner.py:
        262-326). groupBy(X,Y) + a window over X computes confidence
        without ever collecting raw rows; only (x,y) combinations above
        the confidence/support gates reach the driver, capped at
        ``max_implication_rows``."""
        rules: list[LearnedRule] = []
        for x in cats:
            ys = [y for y in cats if y != x]
            if not ys:
                continue
            # ONE grouping-sets aggregate per determinant covers (x) and
            # every (x, y) — K jobs for K categoricals instead of K²
            # separate groupBy+window jobs (review r7). grouping_id bit i
            # (first listed column = highest bit) is 1 iff that column is
            # aggregated away in the row's set.
            cols_order = [x] + ys
            k = len(ys)
            full = (1 << (k + 1)) - 1
            bit = {c: 1 << (k - i) for i, c in enumerate(cols_order)}
            gid_x = full & ~bit[x]
            g = (
                df.where(F.col(x).isNotNull())
                .groupingSets(
                    [[F.col(x)]] + [[F.col(x), F.col(y)] for y in ys],
                    *[F.col(c) for c in cols_order],
                )
                .agg(
                    F.count(F.lit(1)).alias("__c"),
                    F.grouping_id().alias("__gid"),
                )
            )
            tot = g.where(F.col("__gid") == gid_x).select(
                F.col(x).alias("__xv"), F.col("__c").alias("__xt")
            )
            w = Window.partitionBy("__gid").orderBy(
                F.desc("__c"), *[F.col(c).cast("string") for c in cols_order]
            )
            mined = (
                g.where(F.col("__gid") != gid_x)
                .join(F.broadcast(tot), F.col(x) == F.col("__xv"))
                .where(
                    (F.col("__c") / F.col("__xt") >= self.min_confidence)
                    & (F.col("__c") / F.lit(n_rows) >= self.min_support)
                )
                .withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") <= self.max_implication_rows)
                .collect()
            )
            for r in mined:
                y = next(c for c in ys if not r["__gid"] & bit[c])
                x_val, y_val = r[x], r[y]
                conf = r["__c"] / r["__xt"]
                supp = r["__c"] / n_rows
                rules.append(
                    LearnedRule(
                        name=f"value_impl_{x}_{x_val}_to_{y}",
                        rule_type="value_implication",
                        column=(x, y),
                        condition=f"if {x}={x_val!r} then {y}={y_val!r}",
                        support=supp,
                        confidence=conf,
                        validator_config={
                            "condition_column": x,
                            "condition_value": x_val,
                            "expected_column": y,
                            "expected_value": y_val,
                        },
                        description=f"When {x} is {x_val!r}, {y} should be {y_val!r}",
                    )
                )
        return rules


    def _mine_conditionals(
        self, df: DataFrame, cols: list[str], n_rows: int
    ) -> list[LearnedRule]:
        """Conditional constraints (reference constraint_miner.py:
        328-455): null implications (X not null ⇒ Y not null, gate 0.99,
        X coverage > 10%), positive implications (X>0 ⇒ Y>0, gate 0.95),
        and orderings (X ≤ Y, gate 0.99, joint coverage > 50%).

        The reference runs 3·C² filter passes over collected rows; here
        ALL pair statistics come from ONE fused aggregate — each stat is
        a sum of boolean products, so the whole candidate grid costs a
        single table scan regardless of pair count."""
        pairs, stats = conditional_stats(df, cols)
        if stats is None:
            return []
        numeric = {
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, NUMERIC_TYPES) and f.name in cols
        }
        row = stats.collect()[0]

        rules: list[LearnedRule] = []
        for i, (x, y) in enumerate(pairs):
            nx = int(row[f"nx_{i}"] or 0)
            nxy = int(row[f"nxy_{i}"] or 0)
            # null implication (reference :343-373)
            if nx > n_rows * 0.1 and nx > 0 and nxy / nx >= 0.99:
                rules.append(
                    LearnedRule(
                        name=f"null_impl_{x}_to_{y}",
                        rule_type="null_implication",
                        column=(x, y),
                        condition=f"if {x} is not null then {y} is not null",
                        support=nxy / n_rows,
                        confidence=nxy / nx,
                        validator_config={
                            "condition": f"{x} IS NOT NULL",
                            "constraint": f"{y} IS NOT NULL",
                        },
                        description=f"When {x} has a value, {y} should too",
                    )
                )
            if x in numeric and y in numeric:
                px = int(row[f"px_{i}"] or 0)
                pxy = int(row[f"pxy_{i}"] or 0)
                # positive implication (reference :391-415)
                if px >= n_rows * 0.1 and px > 0 and pxy / px >= 0.95:
                    rules.append(
                        LearnedRule(
                            name=f"positive_impl_{x}_to_{y}",
                            rule_type="comparison_implication",
                            column=(x, y),
                            condition=f"if {x} > 0 then {y} > 0",
                            support=pxy / n_rows,
                            confidence=pxy / px,
                            validator_config={
                                "condition": f"{x} > 0",
                                "constraint": f"{y} > 0",
                            },
                            description=f"When {x} is positive, {y} should be too",
                        )
                    )
                # ordering (reference :418-443)
                ordered = int(row[f"ord_{i}"] or 0)
                if nxy >= n_rows * 0.5 and nxy > 0 and ordered / nxy >= 0.99:
                    rules.append(
                        LearnedRule(
                            name=f"order_{x}_leq_{y}",
                            rule_type="ordering",
                            column=(x, y),
                            condition=f"{x} <= {y}",
                            support=ordered / n_rows,
                            confidence=ordered / nxy,
                            validator_config={
                                "column_a": x,
                                "column_b": y,
                                "op": "<=",
                            },
                            description=f"{x} should be <= {y}",
                        )
                    )
        return rules


def conditional_stats(
    df: DataFrame, cols: list[str]
) -> tuple[list[tuple[str, str]], DataFrame | None]:
    """The miner's fused conditional-stat aggregate, exposed UNCOLLECTED
    so plan tests certify the actual product plan (one scan, one
    aggregate) rather than a re-implementation. Returns (pairs, 1-row
    DataFrame) with nx_i / nxy_i / px_i / pxy_i / ord_i columns."""
    numeric = {
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, NUMERIC_TYPES) and f.name in cols
    }
    pairs = [(x, y) for x in cols for y in cols if x != y]
    aggs: list = []
    for i, (x, y) in enumerate(pairs):
        xc, yc = F.col(x), F.col(y)
        aggs.append(F.sum(xc.isNotNull().cast("long")).alias(f"nx_{i}"))
        aggs.append(
            F.sum((xc.isNotNull() & yc.isNotNull()).cast("long")).alias(f"nxy_{i}")
        )
        if x in numeric and y in numeric:
            aggs.append(F.sum((xc > 0).cast("long")).alias(f"px_{i}"))
            aggs.append(F.sum(((xc > 0) & (yc > 0)).cast("long")).alias(f"pxy_{i}"))
            aggs.append(
                F.sum(
                    (xc.isNotNull() & yc.isNotNull() & (xc <= yc)).cast("long")
                ).alias(f"ord_{i}")
            )
    return pairs, (df.agg(*aggs) if aggs else None)


# ---------------------------------------------------------------------------
# pattern learner (reference pattern_learner.py)
# ---------------------------------------------------------------------------

#: generalization order matters: digit runs first (the introduced '9'
#: marker is never re-matched — regexp_replace is a single pass), then
#: letter runs, then whitespace runs. Mirrors reference
#: pattern_learner.py:343-425 D/A/S class grouping (level 2: consecutive
#: same-class chars collapse to one marker). The whitespace marker is a
#: single SPACE — unambiguous because every literal whitespace run is
#: itself collapsed by this step; an underscore marker would collide
#: with literal '_' in snake_case values and emit regexes that reject
#: the very corpus they were learned from.
_GENERALIZE_STEPS: tuple[tuple[str, str], ...] = (
    (r"[0-9]+", "9"),
    (r"[A-Za-z]+", "A"),
    (r"\s+", " "),
)


def generalize_expr(col):
    """Column expression generalizing a string to its class pattern —
    pure JVM-side regexp_replace chain, whole-stage-codegen friendly."""
    out = col
    for pat, rep in _GENERALIZE_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def _pattern_to_regex(pattern: str) -> str:
    """Class pattern → anchored regex (reference pattern_learner.py:428)."""
    out = []
    for ch in pattern:
        if ch == "9":
            out.append("[0-9]+")
        elif ch == "A":
            out.append("[A-Za-z]+")
        elif ch == " ":
            out.append(r"\s+")
        elif ch in r"\^$.|?*+()[]{}":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "^" + "".join(out) + "$"


class PatternRuleLearner:
    """Dominant string patterns → regex rules (reference
    pattern_learner.py:83-497). The histogram is a groupBy over the
    GENERALIZED pattern (distinct patterns ≪ distinct values — phone
    formats, ID shapes), so driver traffic is pattern-count rows."""

    def __init__(
        self,
        min_coverage: float = 0.9,
        top_k: int = 5,
        min_confidence: float = 0.5,
        max_rules: int = 50,
    ) -> None:
        self.min_coverage = min_coverage
        self.top_k = top_k
        self.min_confidence = min_confidence
        self.max_rules = max_rules
        self._patterns: dict[str, list[dict[str, Any]]] = {}

    def pattern_histogram(self, df: DataFrame, column: str) -> DataFrame:
        """(pattern, n, coverage) relation, most frequent first.

        The total joins in as a broadcast 1-row aggregate rather than an
        unpartitioned window: distinct patterns are usually few, but a
        high-entropy column (free text) can yield corpus-sized pattern
        counts, and a bare ``Window.partitionBy()`` would funnel them
        through ONE task."""
        non_null = df.where(F.col(column).isNotNull())
        hist = (
            non_null.select(generalize_expr(F.col(column)).alias("pattern"))
            .groupBy("pattern")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        total = hist.agg(F.sum("n").alias("__total"))
        return (
            hist.crossJoin(F.broadcast(total))
            .withColumn("coverage", F.col("n") / F.col("__total"))
            .drop("__total")
            .orderBy(F.desc("n"), "pattern")
        )

    def learn_rules(
        self, df: DataFrame, columns: list[str] | None = None
    ) -> RuleLearningResult:
        str_cols = columns or [
            f.name for f in df.schema.fields if isinstance(f.dataType, STRING_TYPES)
        ]
        rules: list[LearnedRule] = []
        for c in str_cols:
            top = self.pattern_histogram(df, c).limit(self.top_k).collect()
            self._patterns[c] = [
                {"pattern": r["pattern"], "n": int(r["n"]), "ratio": float(r["coverage"])}
                for r in top
            ]
            for r in top:
                cov = float(r["coverage"])
                if cov >= self.min_coverage:
                    regex = _pattern_to_regex(r["pattern"])
                    rules.append(
                        LearnedRule(
                            name=f"pattern_{c}",
                            rule_type="regex",
                            column=c,
                            condition=f"{c} matches {r['pattern']!r}",
                            support=cov,
                            confidence=cov,
                            validator_config={"columns": [c], "pattern": regex},
                            description=f"{c} should match learned pattern {r['pattern']!r}",
                        )
                    )
        kept, n_filtered = _filter_rank(rules, self.min_confidence, 0.0, self.max_rules)
        return RuleLearningResult(
            rules=kept,
            total_rules=len(rules),
            filtered_rules=n_filtered,
            data_profile={"columns": len(str_cols)},
        )

    def get_detected_patterns(self) -> dict[str, list[dict[str, Any]]]:
        return dict(self._patterns)


# ---------------------------------------------------------------------------
# rules → validator suite
# ---------------------------------------------------------------------------


class MostlyWrapped(Validator):
    """Tolerance adapter: enforce any spec-based validator at its MINED
    confidence/coverage — pass while the violation share stays ≤
    1 − mostly (review r7: a p05–p95 range rule enforced strictly is
    guaranteed to flag ~10% of the corpus it was mined from). Delegates
    ``specs`` and swaps each spec's judge for the ratio tolerance; works
    for every count-style validator without touching its class."""

    def __init__(self, inner: object, mostly: float) -> None:
        self.inner = inner
        self.mostly = float(mostly)

    def specs(self, df: DataFrame) -> list:
        import dataclasses

        mostly = self.mostly

        def make_judge(spec):
            def judge(m):
                denom = m.get("denom") or 0
                count = int(m.get("count") or 0)
                ok = 1.0 - (count / denom) if denom else 1.0
                return (
                    ok >= mostly,
                    count,
                    f"{count}/{denom} {spec.issue_type}"
                    f" ({1 - ok:.2%} > {1 - mostly:.2%} allowed)",
                )

            return judge

        return [
            dataclasses.replace(sp, judge=make_judge(sp))
            for sp in self.inner.specs(df)
        ]


def rules_to_suite(rules: Iterable[LearnedRule]) -> list[object]:
    """LearnedRule records → validator instances (reference RuleLearner
    emits validator_config dicts for the same mapping). FD / implication
    rules map to the dedicated validators in validators/multi_column.py."""
    from truthound_spark.validators.completeness import NullValidator
    from truthound_spark.validators.distribution import RangeValidator
    from truthound_spark.validators.multi_column import (
        FunctionalDependencyValidator,
        ValueImplicationValidator,
    )
    from truthound_spark.validators.string import LengthValidator, RegexValidator
    from truthound_spark.validators.uniqueness import UniqueValidator

    suite: list[object] = []
    for r in rules:
        cfg = r.validator_config
        if r.rule_type == "not_null":
            # mined at confidence 1-null_ratio < 1 → enforce with the
            # matching mostly slack, same contract as orderings below (a
            # 0.5%-null column's not_null rule must not fail on the
            # corpus it was mined from)
            suite.append(
                NullValidator(
                    columns=cfg["columns"],
                    mostly=1.0 if r.confidence >= 1.0 else max(0.0, r.confidence - 0.005),
                )
            )
        elif r.rule_type == "unique":
            if r.confidence >= 1.0:
                suite.append(UniqueValidator(columns=cfg["columns"]))
            else:
                from truthound_spark.validators.uniqueness import UniqueRatioValidator

                suite.append(
                    UniqueRatioValidator(
                        cfg["columns"][0],
                        min_ratio=max(0.0, r.confidence - 0.005),
                    )
                )
        elif r.rule_type in ("range", "min_value"):
            v: object = RangeValidator(
                cfg["columns"][0],
                cfg.get("min_value"),
                cfg.get("max_value"),
            )
            # range rules mined from percentile bounds EXPECT tail mass
            # outside (support carries the coverage: 0.9 at medium)
            tol = min(r.support, r.confidence)
            if tol < 1.0:
                v = MostlyWrapped(v, max(0.0, tol - 0.005))
            suite.append(v)
        elif r.rule_type == "length":
            suite.append(
                LengthValidator(
                    cfg["columns"][0],
                    min_length=cfg.get("min_length", 0),
                    max_length=cfg.get("max_length"),
                )
            )
        elif r.rule_type == "regex":
            rv: object = RegexValidator(cfg["columns"][0], cfg["pattern"])
            if r.confidence < 1.0:  # pattern admitted at coverage ≥ 0.9
                rv = MostlyWrapped(rv, max(0.0, r.confidence - 0.005))
            suite.append(rv)
        elif r.rule_type == "functional_dependency":
            suite.append(
                FunctionalDependencyValidator(cfg["determinant"], cfg["dependent"])
            )
        elif r.rule_type == "value_implication":
            suite.append(
                ValueImplicationValidator(
                    cfg["condition_column"],
                    cfg["condition_value"],
                    cfg["expected_column"],
                    cfg["expected_value"],
                    mostly=1.0 if r.confidence >= 1.0 else max(0.0, r.confidence - 0.005),
                )
            )
        elif r.rule_type == "ordering":
            if r.confidence >= 1.0:
                from truthound_spark.validators.multi_column import ColumnPairValidator

                suite.append(
                    ColumnPairValidator(cfg["column_a"], cfg["column_b"], cfg["op"])
                )
            else:
                # enforce at the rule's own confidence (a 99.2%-true
                # mined ordering must not fail on the corpus it was
                # mined from); small slack absorbs batch-to-batch jitter.
                # NULL pairs pass explicitly — the mined confidence was
                # computed over non-null pairs, and counting null rows
                # as violations would deflate ok_ratio below it on any
                # sparse column (ColumnPairValidator's strict path
                # excludes nulls the same way).
                from truthound_spark.validators.query import CustomExpressionValidator

                a, b, op = cfg["column_a"], cfg["column_b"], cfg["op"]
                suite.append(
                    CustomExpressionValidator(
                        f"{a} IS NULL OR {b} IS NULL OR {a} {op} {b}",
                        name=r.name,
                        mostly=max(0.0, r.confidence - 0.005),
                    )
                )
        elif r.rule_type in ("null_implication", "comparison_implication"):
            from truthound_spark.validators.query import ConditionalExpressionValidator

            suite.append(
                ConditionalExpressionValidator(
                    cfg["condition"],
                    cfg["constraint"],
                    mostly=1.0 if r.confidence >= 1.0 else max(0.0, r.confidence - 0.005),
                )
            )
    return suite


def holdout_rule_eval(
    result: RuleLearningResult,
    eval_df: DataFrame,
    tolerance: float = 0.02,
) -> list[dict[str, Any]]:
    """Holdout confirmation of mined FD rules — the reference's
    rule-quality reporting role (cli_modules/advanced/quality.py ranks
    learned rules by how well they held up): re-measure every trained
    functional dependency's confidence on data it was NOT mined from,
    and flag the ones that degraded.

    Same bounded aggregates as mining (one groupBy per determinant over
    the eval frame — the candidate set is fixed, so cardinality
    prefilters are skipped and nothing explores); a rule absent from the
    eval side (empty frame) evaluates to confidence 0.

    Returns one record per trained FD:
    ``{name, determinant, dependent, trained_confidence,
    eval_confidence, drop, degraded}`` — ``degraded`` iff the holdout
    confidence fell more than ``tolerance`` below the trained one."""
    fd_rules = result.by_type("functional_dependency")
    if not fd_rules:
        return []
    # LearnedRule.column flattens composite determinants into (*xs, y) —
    # rebuild the (determinant, dependent) candidate shape (review r7)
    cands = []
    for r in fd_rules:
        *xs, dep = r.column
        cands.append((xs[0] if len(xs) == 1 else tuple(xs), dep))
    eval_res = ConstraintMiner(
        min_confidence=0.0,
        min_support=0.0,
        max_rules=max(len(cands), 100),
        # fixed candidate set → the high-cardinality prefilter must NOT
        # silently drop a trained FD on the eval side (it would read as
        # degraded); the determinant was already admitted at train time
        max_determinant_card=2**62,
        discover_value_implications=False,
        discover_conditional_rules=False,
    ).learn_rules(eval_df, fd_candidates=cands)
    eval_by = {r.name: r for r in eval_res.by_type("functional_dependency")}
    out: list[dict[str, Any]] = []
    for r in fd_rules:
        e = eval_by.get(r.name)
        ec = e.confidence if e is not None else 0.0
        *xs, dep = r.column
        det = xs[0] if len(xs) == 1 else "+".join(xs)
        drop = round(r.confidence - ec, 6)
        out.append(
            {
                "name": r.name,
                "determinant": det,
                "dependent": dep,
                "trained_confidence": round(r.confidence, 6),
                "eval_confidence": round(ec, 6),
                "drop": drop,
                "degraded": drop > tolerance,
            }
        )
    return out
