"""Referential / cross-table validators (reference:
src/truthound/validators/referential/, cross_table/, schema/referential.py).

Spark-first strategy (SURVEY §2.3): orphan detection is a LEFT ANTI join —
Catalyst/AQE pick broadcast-hash when the parent side is small (we hint it
when told so), else shuffled hash join on the key. Counting happens
distributively; only scalars reach the driver. Cycle detection is an
iterative join-based BFS (GraphFrames-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from truthound_spark.core.base import Validator
from truthound_spark.core.registry import register_validator
from truthound_spark.core.results import ValidationIssue
from truthound_spark.types import Severity, severity_from_ratio


def _colocated_orphans(
    child: DataFrame, parent: DataFrame, keys: list[tuple[str, str]]
) -> DataFrame | None:
    """The Exchange-free anti-join over a bucketed layout, or ``None``.

    Builds the merge-hinted anti-join on the RAW frames and lets
    Catalyst decide: when both sides are bucketed-table scans on the
    join keys with matching counts the physical plan carries ZERO
    Exchange nodes and this plan is strictly better than shuffling or
    broadcasting (layout.py's fk_orphans_bucketed measured FLAT across
    a decade vs linear shuffled); any Exchange in the plan means the
    layout does not apply and the candidate is discarded. The probe
    compiles a plan but runs no job."""
    try:
        from truthound_spark.layout import plan_exchanges

        parent_keys = parent.select(
            *[F.col(pk).alias(f"__pk_{i}") for i, (_, pk) in enumerate(keys)]
        )
        cond = None
        for i, (ck, _) in enumerate(keys):
            c = child[ck] == parent_keys[f"__pk_{i}"]
            cond = c if cond is None else (cond & c)
        joined = child.hint("merge").join(parent_keys, on=cond, how="left_anti")
        if plan_exchanges(joined) == 0:
            return joined
    except Exception:
        return None
    return None


def orphans(
    child: DataFrame,
    parent: DataFrame,
    keys: list[tuple[str, str]],
    broadcast_parent: bool = True,
    auto_colocated: bool = True,
) -> DataFrame:
    """Rows of ``child`` whose key has no match in ``parent`` (anti-join).

    reference: referential/foreign_key.py:158 "Find orphans using anti-join".
    ``broadcast_parent`` hints a broadcast of the deduplicated parent keys —
    the right call whenever the parent key set fits in executor memory
    (dimension tables at 100 TB fact scale).

    When BOTH inputs are bucketed catalog tables on the join keys (the
    ``layout.write_bucketed`` contract) the check auto-routes to the
    co-located Exchange-free anti-join instead — detected by plan
    introspection (see ``_colocated_orphans``), so per-ingest re-checks
    over layout-managed tables pay zero shuffle and zero broadcast
    without the caller opting in. ``auto_colocated=False`` disables the
    probe.
    """
    if auto_colocated:
        co = _colocated_orphans(child, parent, keys)
        if co is not None:
            return co
    parent_keys = parent.select(*[F.col(pk).alias(f"__pk_{i}") for i, (_, pk) in enumerate(keys)]).dropDuplicates()
    if broadcast_parent:
        parent_keys = F.broadcast(parent_keys)
    cond = None
    for i, (ck, _) in enumerate(keys):
        c = child[ck] == parent_keys[f"__pk_{i}"]
        cond = c if cond is None else (cond & c)
    return child.join(parent_keys, on=cond, how="left_anti")


@register_validator("foreign_key", category="referential")
class ForeignKeyValidator(Validator):
    """Child keys must exist in parent (reference: foreign_key.py:23-237;
    composite keys supported as in CompositeForeignKeyValidator)."""

    def __init__(
        self,
        reference_data: DataFrame,
        column: str | list[str],
        reference_column: str | list[str] | None = None,
        ignore_nulls: bool = True,
        broadcast_parent: bool = True,
    ) -> None:
        self.reference_data = reference_data
        self.columns = [column] if isinstance(column, str) else list(column)
        rc = reference_column if reference_column is not None else column
        self.reference_columns = [rc] if isinstance(rc, str) else list(rc)
        self.ignore_nulls = ignore_nulls
        self.broadcast_parent = broadcast_parent

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        child = df
        if self.ignore_nulls:
            for c in self.columns:
                child = child.filter(F.col(c).isNotNull())
        orphan_df = orphans(
            child,
            self.reference_data,
            list(zip(self.columns, self.reference_columns)),
            broadcast_parent=self.broadcast_parent,
        )
        n = orphan_df.count()
        if n == 0:
            return []
        total = row_count if row_count is not None else df.count()
        ratio = n / total if total else 0.0
        samples = [r.asDict() for r in orphan_df.select(*self.columns).limit(10).collect()]
        return [
            ValidationIssue(
                column=",".join(self.columns),
                issue_type="orphan_records",
                count=int(n),
                severity=severity_from_ratio(ratio),
                validator_name="foreign_key",
                expected=f"{self.columns} ⊆ parent {self.reference_columns}",
                actual=int(n),
                details=f"{n} orphan rows ({ratio:.2%})",
                sample_values=samples,
            )
        ]


@register_validator("referential_integrity", category="referential")
class ReferentialIntegrityValidator(ForeignKeyValidator):
    """Values of col ⊆ reference set (reference: schema/referential.py:17) —
    same anti-join plan as foreign_key."""


@register_validator("self_referential_fk", category="referential")
class SelfReferentialFKValidator(Validator):
    """parent_id ∈ id of the same table (reference: foreign_key.py:458)."""

    def __init__(self, id_column: str, parent_column: str) -> None:
        self.id_column = id_column
        self.parent_column = parent_column

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        fk = ForeignKeyValidator(
            reference_data=df.select(self.id_column),
            column=self.parent_column,
            reference_column=self.id_column,
        )
        issues = fk.validate(df, row_count)
        for i in issues:
            i.validator_name = "self_referential_fk"
            i.issue_type = "dangling_parent_reference"
        return issues


@register_validator("dangling_reference", category="referential")
class DanglingReferenceValidator(Validator):
    """Reverse-direction orphans: parents with no children
    (reference: referential/orphan.py:349)."""

    def __init__(self, child_data: DataFrame, column: str, child_column: str | None = None) -> None:
        self.child_data = child_data
        self.column = column
        self.child_column = child_column or column

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        dangling = df.join(
            self.child_data.select(F.col(self.child_column).alias(self.column)).dropDuplicates(),
            on=self.column,
            how="left_anti",
        )
        n = dangling.count()
        if n == 0:
            return []
        total = row_count if row_count is not None else df.count()
        return [
            ValidationIssue(
                column=self.column,
                issue_type="dangling_references",
                count=int(n),
                severity=severity_from_ratio(n / total if total else 0.0),
                validator_name="dangling_reference",
                expected="every parent referenced by ≥1 child",
                actual=int(n),
                details=f"{n} parents with no children",
            )
        ]


@register_validator("circular_reference", category="referential")
class CircularReferenceValidator(Validator):
    """Cycle detection over id→parent_id edges
    (reference: referential/circular.py:24; Tarjan utilities
    optimization/graph.py:59-403).

    Spark-first: iterative join-based pointer doubling — each round joins the
    frontier to the (self-)broadcast edge set, doubling walked depth;
    a node reached back at its own id is in a cycle. max_depth bounds rounds;
    for hierarchies deeper than 2^rounds the validator reports inconclusive
    depth rather than looping forever.
    """

    def __init__(self, id_column: str, parent_column: str, max_iterations: int = 12) -> None:
        self.id_column = id_column
        self.parent_column = parent_column
        self.max_iterations = max_iterations

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        edges = (
            df.select(
                F.col(self.id_column).alias("src"),
                F.col(self.parent_column).alias("dst"),
            )
            .filter(F.col("dst").isNotNull())
            .dropDuplicates()
        )
        # TRUE pointer doubling: reach_{k+1} = reach_k ∪ (reach_k ∘ reach_k),
        # so after k rounds reach covers all paths of length ≤ 2^k — cycles up
        # to length 2^max_iterations are found (vs one-hop growth, which
        # silently misses cycles longer than the round budget). Each round is
        # localCheckpoint()ed: without it the union/dropDuplicates lineage
        # doubles per round and Spark recomputes the whole chain at every
        # count — quadratic recompute, a scale-killer.
        reach = edges.localCheckpoint(eager=True)
        size = reach.count()
        cyclic_nodes: set = set()
        converged = False
        for _ in range(self.max_iterations):
            hits = reach.filter(F.col("src") == F.col("dst")).select("src").limit(10000).collect()
            if hits:
                cyclic_nodes.update(r["src"] for r in hits)
                break
            doubled = (
                reach.alias("a")
                .join(reach.alias("b"), F.col("a.dst") == F.col("b.src"))
                .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
            )
            new_reach = reach.union(doubled).dropDuplicates().localCheckpoint(eager=True)
            new_size = new_reach.count()
            reach = new_reach
            if new_size == size:  # fixed point: full transitive closure built
                converged = True
                break
            size = new_size
        if not cyclic_nodes:
            hits = reach.filter(F.col("src") == F.col("dst")).select("src").limit(10000).collect()
            cyclic_nodes.update(r["src"] for r in hits)
        if not cyclic_nodes:
            if converged:
                return []
            # budget exhausted before the closure converged: report
            # inconclusive instead of a silent (possibly wrong) "acyclic"
            return [
                ValidationIssue(
                    column=self.id_column,
                    issue_type="circular_reference_inconclusive",
                    count=0,
                    severity=Severity.LOW,
                    validator_name="circular_reference",
                    expected="acyclic hierarchy",
                    actual=None,
                    details=(
                        f"no cycle found within {self.max_iterations} doubling rounds "
                        f"(paths ≤ 2^{self.max_iterations}); closure not converged — inconclusive"
                    ),
                )
            ]
        return [
            ValidationIssue(
                column=self.id_column,
                issue_type="circular_reference",
                count=len(cyclic_nodes),
                severity=Severity.CRITICAL,
                validator_name="circular_reference",
                expected="acyclic hierarchy",
                actual=len(cyclic_nodes),
                details=f"{len(cyclic_nodes)} nodes participate in cycles",
                sample_values=sorted(cyclic_nodes)[:10],
            )
        ]


@register_validator("hierarchy_depth", category="referential")
class HierarchyDepthValidator(Validator):
    """Max hierarchy depth ≤ bound (reference: circular.py:290) via
    iterative join BFS from roots."""

    def __init__(self, id_column: str, parent_column: str, max_depth: int = 10) -> None:
        self.id_column = id_column
        self.parent_column = parent_column
        self.max_depth = max_depth

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        edges = df.select(
            F.col(self.id_column).alias("id"), F.col(self.parent_column).alias("parent")
        ).localCheckpoint(eager=True)
        frontier = edges.filter(F.col("parent").isNull()).select("id")
        depth = 0
        while depth <= self.max_depth:
            # localCheckpoint per round: without it the frontier's lineage
            # stacks one join per level and every isEmpty() re-executes the
            # whole chain (quadratic recompute — same fix as CascadeDepth)
            nxt = edges.join(
                F.broadcast(frontier.withColumnRenamed("id", "parent")), on="parent"
            ).select("id").localCheckpoint(eager=True)
            if nxt.isEmpty():
                return []
            frontier = nxt
            depth += 1
        return [
            ValidationIssue(
                column=self.id_column,
                issue_type="hierarchy_too_deep",
                count=1,
                severity=Severity.MEDIUM,
                validator_name="hierarchy_depth",
                expected=f"depth <= {self.max_depth}",
                actual=f"> {self.max_depth}",
                details=f"hierarchy exceeds max depth {self.max_depth}",
            )
        ]


@register_validator("cross_table_row_count", category="cross_table")
class CrossTableRowCountValidator(Validator):
    """|count(A) − count(B)| ≤ tol, or count(A) ≈ k·count(B)
    (reference: cross_table/row_count.py:13,68)."""

    def __init__(self, reference_data: DataFrame, tolerance: float = 0.0, factor: float | None = None) -> None:
        self.reference_data = reference_data
        self.tolerance = tolerance
        self.factor = factor

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        a = row_count if row_count is not None else df.count()
        b = self.reference_data.count()
        if self.factor is not None:
            expected = self.factor * b
            ok = abs(a - expected) <= self.tolerance * max(expected, 1)
            desc = f"count(A)={a} vs {self.factor}·count(B)={expected:.0f}"
            deviation = int(abs(a - expected))
        else:
            ok = abs(a - b) <= self.tolerance * max(b, 1)
            desc = f"count(A)={a} vs count(B)={b}"
            deviation = abs(a - b)
        if ok:
            return []
        return [
            ValidationIssue(
                column=None,
                issue_type="row_count_mismatch",
                count=deviation,
                severity=Severity.HIGH,
                validator_name="cross_table_row_count",
                expected=f"within tolerance {self.tolerance}",
                actual=desc,
                details=desc,
            )
        ]


@register_validator("cross_table_aggregate", category="cross_table")
class CrossTableAggregateValidator(Validator):
    """Aggregate of a column equal across tables
    (reference: cross_table/aggregate.py:14). Two single-row aggs."""

    AGGS = {"sum": F.sum, "mean": F.mean, "min": F.min, "max": F.max, "count": F.count}

    def __init__(
        self,
        reference_data: DataFrame,
        column: str,
        reference_column: str | None = None,
        agg: str = "sum",
        rel_tolerance: float = 1e-9,
    ) -> None:
        self.reference_data = reference_data
        self.column = column
        self.reference_column = reference_column or column
        self.agg = agg
        self.rel_tolerance = rel_tolerance

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        fn = self.AGGS[self.agg]
        a = df.agg(fn(self.column).alias("v")).collect()[0]["v"]
        b = self.reference_data.agg(fn(self.reference_column).alias("v")).collect()[0]["v"]
        if a is None and b is None:
            return []
        if a is not None and b is not None and abs(a - b) <= self.rel_tolerance * max(abs(a), abs(b), 1.0):
            return []
        return [
            ValidationIssue(
                column=self.column,
                issue_type="cross_table_aggregate_mismatch",
                count=1,
                severity=Severity.HIGH,
                validator_name="cross_table_aggregate",
                expected=f"{self.agg}(A.{self.column}) == {self.agg}(B.{self.reference_column})",
                actual=f"{a} vs {b}",
                details=f"{self.agg} mismatch: {a} vs {b}",
            )
        ]


@register_validator("cross_table_distinct_count", category="cross_table")
class CrossTableDistinctCountValidator(Validator):
    """n_unique equal across tables (reference: cross_table/aggregate.py:106)."""

    def __init__(self, reference_data: DataFrame, column: str, reference_column: str | None = None) -> None:
        self.reference_data = reference_data
        self.column = column
        self.reference_column = reference_column or column

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        a = df.agg(F.countDistinct(self.column).alias("v")).collect()[0]["v"]
        b = self.reference_data.agg(F.countDistinct(self.reference_column).alias("v")).collect()[0]["v"]
        if a == b:
            return []
        return [
            ValidationIssue(
                column=self.column,
                issue_type="distinct_count_mismatch",
                count=abs(int(a) - int(b)),
                severity=Severity.MEDIUM,
                validator_name="cross_table_distinct_count",
                expected=f"n_unique(A) == n_unique(B)",
                actual=f"{a} vs {b}",
                details=f"distinct counts differ: {a} vs {b}",
            )
        ]


@register_validator("cascade_integrity", category="referential")
class CascadeIntegrityValidator(Validator):
    """Simulated cascade-delete consistency across an FK chain
    (reference: referential/cascade.py:51): given parents flagged deleted,
    every transitively-dependent child row must also be flagged — two
    anti-join counts per hop, fully distributed."""

    def __init__(
        self,
        parent_data: DataFrame,
        parent_key: str,
        child_key: str,
        deleted_predicate: str,
        child_deleted_predicate: str | None = None,
    ) -> None:
        self.parent_data = parent_data
        self.parent_key = parent_key
        self.child_key = child_key
        self.deleted_predicate = deleted_predicate
        self.child_deleted_predicate = child_deleted_predicate

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        deleted_parents = self.parent_data.filter(F.expr(self.deleted_predicate)).select(
            F.col(self.parent_key).alias(self.child_key)
        ).dropDuplicates()
        affected = df.join(F.broadcast(deleted_parents), on=self.child_key, how="inner")
        if self.child_deleted_predicate:
            violating = affected.filter(~F.expr(self.child_deleted_predicate))
        else:
            violating = affected  # child rows must not exist at all
        n = violating.count()
        if n == 0:
            return []
        return [
            ValidationIssue(
                column=self.child_key,
                issue_type="cascade_violation",
                count=int(n),
                severity=Severity.HIGH,
                validator_name="cascade_integrity",
                expected="children of deleted parents deleted/flagged",
                actual=int(n),
                details=f"{n} child rows survive deleted parents",
            )
        ]


@register_validator("cascade_depth", category="referential")
class CascadeDepthValidator(Validator):
    """FK dependency-chain depth ≤ bound (reference: referential/cascade.py:297):
    iterative frontier joins with localCheckpoint, like HierarchyDepth but
    over id→parent edges of the SAME table."""

    def __init__(self, id_column: str, parent_column: str, max_depth: int = 5) -> None:
        self.id_column = id_column
        self.parent_column = parent_column
        self.max_depth = max_depth

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        edges = df.select(
            F.col(self.id_column).alias("id"), F.col(self.parent_column).alias("parent")
        ).localCheckpoint(eager=True)
        frontier = edges.filter(F.col("parent").isNull()).select("id")
        depth = 0
        while depth <= self.max_depth + 1:
            nxt = edges.join(
                F.broadcast(frontier.withColumnRenamed("id", "parent")), on="parent"
            ).select("id").localCheckpoint(eager=True)
            if nxt.isEmpty():
                break
            depth += 1
            frontier = nxt
        if depth <= self.max_depth:
            return []
        return [
            ValidationIssue(
                column=self.id_column,
                issue_type="cascade_too_deep",
                count=1,
                severity=Severity.MEDIUM,
                validator_name="cascade_depth",
                expected=f"dependency depth <= {self.max_depth}",
                actual=depth,
                details=f"cascade chain reaches depth {depth}",
            )
        ]


@register_validator("multi_table_orphan", category="referential")
class MultiTableOrphanValidator(Validator):
    """Child rows orphaned w.r.t. ANY of several parent tables
    (reference: referential/orphan.py:191 MultiTableOrphan): one anti-join
    per relation, fused severity on the union count."""

    def __init__(self, relations: list[tuple[DataFrame, str, str]]) -> None:
        """relations: [(parent_df, child_key, parent_key), ...]"""
        self.relations = relations

    def validate(self, df: DataFrame, row_count: int | None = None) -> list[ValidationIssue]:
        issues = []
        total = row_count if row_count is not None else df.count()
        for parent, child_key, parent_key in self.relations:
            n = orphans(
                df.filter(F.col(child_key).isNotNull()),
                parent,
                [(child_key, parent_key)],
            ).count()
            if n:
                issues.append(
                    ValidationIssue(
                        column=child_key,
                        issue_type="orphan_records",
                        count=int(n),
                        severity=severity_from_ratio(n / total if total else 0.0),
                        validator_name="multi_table_orphan",
                        expected=f"{child_key} ⊆ parent {parent_key}",
                        actual=int(n),
                        details=f"{n} orphans vs parent on {parent_key}",
                    )
                )
        return issues


@register_validator("hierarchy_circular", category="referential")
class HierarchyCircularValidator(CircularReferenceValidator):
    """Hierarchy-specific cycle check (reference: referential/circular.py:119)
    — same pointer-doubling detection over the id→parent hierarchy."""


@register_validator("orphan_record", category="referential")
class OrphanRecordValidator(ForeignKeyValidator):
    """Reference naming parity (referential/orphan.py:24): orphaned child
    rows via the same anti-join plan as foreign_key."""
