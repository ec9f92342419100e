"""Lineage tracking + impact analysis.

Reference surfaces re-expressed (visualization stays a non-goal):
  * lineage/base.py:37-660 — NodeType/EdgeType, LineageNode/Edge/Graph
    with up/downstream traversal;
  * lineage/tracker.py:49-510 — LineageTracker
    (track_source/transformation/validation/output, get_lineage,
    get_path, export/save/load, module-level current tracker);
  * lineage/impact_analysis.py:24-470 — ImpactAnalyzer
    (analyze_impact levels, what_if_delete, dependency chains).

The graph is metadata-sized (nodes = tables/checks/reports, never rows),
so it lives driver-side regardless of data scale; the Spark tie-in is
``track_dataframe``, which registers a DataFrame's actual parquet/orc
input files (``df.inputFiles()``) as its source nodes — lineage falls
out of the plan instead of manual declarations. ``check(...,
lineage=tracker, asset="name")`` records one validation node per run
with the touched columns, so ``impact_of_column`` answers "which checks
break if this column changes" — the blast-radius query users script
against.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Any, Iterable

# ---------------------------------------------------------------------------
# graph primitives (reference lineage/base.py)
# ---------------------------------------------------------------------------

NODE_TYPES = (
    "source",
    "table",
    "file",
    "stream",
    "transformation",
    "validation",
    "model",
    "report",
    "external",
    "virtual",
)

EDGE_TYPES = (
    "derived_from",
    "validated_by",
    "used_by",
    "transformed_to",
    "joined_with",
    "aggregated_to",
    "filtered_to",
    "depends_on",
)


class LineageError(Exception):
    pass


class NodeNotFoundError(LineageError):
    def __init__(self, node_id: str) -> None:
        super().__init__(f"lineage node not found: {node_id!r}")
        self.node_id = node_id


@dataclass
class LineageNode:
    """reference base.py:200-300."""

    id: str
    node_type: str
    name: str = ""
    columns: list[str] = field(default_factory=list)
    metadata: dict[str, Any] = field(default_factory=dict)
    created_at: float = field(default_factory=time.time)

    def to_dict(self) -> dict[str, Any]:
        return {
            "id": self.id,
            "node_type": self.node_type,
            "name": self.name or self.id,
            "columns": self.columns,
            "metadata": self.metadata,
            "created_at": self.created_at,
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "LineageNode":
        return cls(
            id=d["id"],
            node_type=d["node_type"],
            name=d.get("name", ""),
            columns=list(d.get("columns") or []),
            metadata=dict(d.get("metadata") or {}),
            created_at=d.get("created_at", 0.0),
        )


@dataclass
class LineageEdge:
    """reference base.py:307-398."""

    source: str
    target: str
    edge_type: str = "depends_on"
    columns: dict[str, list[str]] | None = None  # target col -> source cols
    metadata: dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return {
            "source": self.source,
            "target": self.target,
            "edge_type": self.edge_type,
            "columns": self.columns,
            "metadata": self.metadata,
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "LineageEdge":
        return cls(
            source=d["source"],
            target=d["target"],
            edge_type=d.get("edge_type", "depends_on"),
            columns=d.get("columns"),
            metadata=dict(d.get("metadata") or {}),
        )


class LineageGraph:
    """Adjacency-indexed DAG (reference base.py:401-660). Cycles are
    rejected at add_edge time (reference CyclicDependencyError)."""

    def __init__(self) -> None:
        self.nodes: dict[str, LineageNode] = {}
        self.edges: list[LineageEdge] = []
        self._out: dict[str, list[str]] = {}
        self._in: dict[str, list[str]] = {}

    def add_node(self, node: LineageNode) -> LineageNode:
        if node.node_type not in NODE_TYPES:
            raise LineageError(f"unknown node type {node.node_type!r}")
        if node.id in self.nodes:
            # silent overwrite would corrupt history (a re-used
            # validation run_id replacing the earlier run's metadata
            # while its edges accumulate) — surface the collision
            raise LineageError(f"lineage node {node.id!r} already exists")
        self.nodes[node.id] = node
        return node

    def get_node(self, node_id: str) -> LineageNode:
        if node_id not in self.nodes:
            raise NodeNotFoundError(node_id)
        return self.nodes[node_id]

    def has_node(self, node_id: str) -> bool:
        return node_id in self.nodes

    def add_edge(self, edge: LineageEdge) -> LineageEdge:
        if edge.edge_type not in EDGE_TYPES:
            raise LineageError(f"unknown edge type {edge.edge_type!r}")
        for nid in (edge.source, edge.target):
            if nid not in self.nodes:
                raise NodeNotFoundError(nid)
        if edge.source == edge.target or self._reaches(edge.target, edge.source):
            raise LineageError(
                f"edge {edge.source}->{edge.target} would create a cycle"
            )
        self.edges.append(edge)
        self._out.setdefault(edge.source, []).append(edge.target)
        self._in.setdefault(edge.target, []).append(edge.source)
        return edge

    def _reaches(self, start: str, goal: str) -> bool:
        seen, stack = set(), [start]
        while stack:
            cur = stack.pop()
            if cur == goal:
                return True
            if cur in seen:
                continue
            seen.add(cur)
            stack.extend(self._out.get(cur, []))
        return False

    def _traverse(self, node_id: str, index: dict[str, list[str]], depth: int) -> list[LineageNode]:
        self.get_node(node_id)
        out: list[LineageNode] = []
        seen = {node_id}
        frontier = [node_id]
        d = 0
        while frontier and (depth < 0 or d < depth):
            nxt: list[str] = []
            for nid in frontier:
                for nb in index.get(nid, []):
                    if nb not in seen:
                        seen.add(nb)
                        out.append(self.nodes[nb])
                        nxt.append(nb)
            frontier = nxt
            d += 1
        return out

    def get_upstream(self, node_id: str, depth: int = -1) -> list[LineageNode]:
        return self._traverse(node_id, self._in, depth)

    def get_downstream(self, node_id: str, depth: int = -1) -> list[LineageNode]:
        return self._traverse(node_id, self._out, depth)

    def to_dict(self) -> dict[str, Any]:
        return {
            "nodes": [n.to_dict() for n in self.nodes.values()],
            "edges": [e.to_dict() for e in self.edges],
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "LineageGraph":
        g = cls()
        for nd in d.get("nodes", []):
            g.add_node(LineageNode.from_dict(nd))
        for ed in d.get("edges", []):
            g.add_edge(LineageEdge.from_dict(ed))
        return g


# ---------------------------------------------------------------------------
# tracker (reference lineage/tracker.py)
# ---------------------------------------------------------------------------

_CURRENT: "LineageTracker | None" = None


class LineageTracker:
    """Record sources / transformations / validations / outputs."""

    def __init__(self) -> None:
        self.graph = LineageGraph()
        self.history: list[dict[str, Any]] = []
        self._seq = 0

    # -- current-tracker plumbing (reference tracker.py:95-103) ------------
    @classmethod
    def get_current(cls) -> "LineageTracker | None":
        return _CURRENT

    @classmethod
    def set_current(cls, tracker: "LineageTracker | None") -> None:
        global _CURRENT
        _CURRENT = tracker

    def _next_id(self, prefix: str) -> str:
        # advance past any ids already in the graph (e.g. after load())
        while True:
            self._seq += 1
            nid = f"{prefix}-{self._seq:05d}"
            if not self.graph.has_node(nid):
                return nid

    def _log(self, op: str, **kw: Any) -> None:
        self.history.append({"op": op, "ts": time.time(), **kw})

    # -- recording ----------------------------------------------------------
    def track_source(
        self,
        name: str,
        node_type: str = "source",
        columns: Iterable[str] | None = None,
        **metadata: Any,
    ) -> LineageNode:
        node = LineageNode(
            id=name,
            node_type=node_type,
            name=name,
            columns=list(columns or []),
            metadata=metadata,
        )
        self.graph.add_node(node)
        self._log("track_source", node=name)
        return node

    def track_dataframe(self, name: str, df: Any, node_type: str = "table") -> LineageNode:
        """Register a DataFrame with its ACTUAL scan inputs: every file in
        ``df.inputFiles()`` becomes (or reuses) a file node with a
        derived_from edge — lineage extracted from the Spark plan, not
        hand-declared. File lists are bounded by partition count; only
        distinct parent DIRECTORIES are recorded (one node per dataset,
        not per part-file) to keep the graph metadata-sized.

        Caveat: if an identical scan is already .cache()d in the
        session, Spark substitutes the InMemoryRelation and
        ``inputFiles()`` reports no files — the node is still created,
        just without auto-derived source edges (add them with
        ``track_source`` + ``add_dependency`` in that case)."""
        node = LineageNode(
            id=name, node_type=node_type, name=name, columns=list(df.columns)
        )
        self.graph.add_node(node)
        dirs: list[str] = []
        try:
            files = df.inputFiles()
        except Exception:
            files = []
        for f in files:
            # collapse Spark part-files to their dataset directory; keep
            # standalone files (one-file parquet datasets) as themselves
            base = f.rsplit("/", 1)[-1]
            d = f.rsplit("/", 1)[0] if base.startswith(("part-", "_", ".")) else f
            if d not in dirs:
                dirs.append(d)
        for d in sorted(dirs):
            if not self.graph.has_node(d):
                self.graph.add_node(LineageNode(id=d, node_type="file", name=d))
            self.graph.add_edge(LineageEdge(source=d, target=name, edge_type="derived_from"))
        self._log("track_dataframe", node=name, n_inputs=len(dirs))
        return node

    def track_transformation(
        self,
        sources: Iterable[str],
        target: str,
        operation: str = "transform",
        columns: dict[str, list[str]] | None = None,
        **metadata: Any,
    ) -> LineageNode:
        node = LineageNode(
            id=target,
            node_type="transformation" if not self.graph.has_node(target) else
            self.graph.get_node(target).node_type,
            name=target,
            metadata={"operation": operation, **metadata},
        )
        if not self.graph.has_node(target):
            self.graph.add_node(node)
        for s in sources:
            self.graph.add_edge(
                LineageEdge(source=s, target=target, edge_type="transformed_to",
                            columns=columns, metadata={"operation": operation})
            )
        self._log("track_transformation", sources=list(sources), target=target)
        return self.graph.get_node(target)

    def track_validation(
        self,
        asset: str,
        run_id: str | None = None,
        validators: list[str] | None = None,
        columns: Iterable[str] | None = None,
        success: bool | None = None,
        issue_count: int = 0,
        **metadata: Any,
    ) -> LineageNode:
        """One validation node per check() run, edged validated_by from
        the asset (reference tracker.py:248-299)."""
        run_id = run_id or self._next_id("check")
        node = LineageNode(
            id=run_id,
            node_type="validation",
            name=run_id,
            columns=sorted(set(columns or [])),
            metadata={
                "asset": asset,
                "validators": validators or [],
                "success": success,
                "issue_count": issue_count,
                **metadata,
            },
        )
        self.graph.add_node(node)
        if not self.graph.has_node(asset):
            self.graph.add_node(LineageNode(id=asset, node_type="table", name=asset))
        self.graph.add_edge(
            LineageEdge(source=asset, target=run_id, edge_type="validated_by")
        )
        self._log("track_validation", asset=asset, run=run_id, success=success)
        return node

    def track_output(
        self, source: str, target: str, node_type: str = "report", **metadata: Any
    ) -> LineageNode:
        node = LineageNode(id=target, node_type=node_type, name=target, metadata=metadata)
        if not self.graph.has_node(target):
            self.graph.add_node(node)
        self.graph.add_edge(LineageEdge(source=source, target=target, edge_type="used_by"))
        self._log("track_output", source=source, target=target)
        return self.graph.get_node(target)

    def add_dependency(self, source: str, target: str, edge_type: str = "depends_on") -> None:
        self.graph.add_edge(LineageEdge(source=source, target=target, edge_type=edge_type))

    # -- queries ------------------------------------------------------------
    def get_lineage(self, node_id: str, direction: str = "both") -> dict[str, Any]:
        """reference tracker.py:410-431."""
        node = self.graph.get_node(node_id)
        out: dict[str, Any] = {"node": node.to_dict()}
        if direction in ("upstream", "both"):
            out["upstream"] = [n.to_dict() for n in self.graph.get_upstream(node_id)]
        if direction in ("downstream", "both"):
            out["downstream"] = [n.to_dict() for n in self.graph.get_downstream(node_id)]
        return out

    def get_path(self, source_id: str, target_id: str) -> list[LineageNode] | None:
        """BFS shortest path (reference tracker.py:433-473 uses DFS; BFS
        gives the minimal chain, which is what impact reports print)."""
        self.graph.get_node(source_id)
        self.graph.get_node(target_id)
        prev: dict[str, str] = {}
        seen = {source_id}
        frontier = [source_id]
        while frontier:
            nxt = []
            for nid in frontier:
                for nb in self.graph._out.get(nid, []):
                    if nb in seen:
                        continue
                    seen.add(nb)
                    prev[nb] = nid
                    if nb == target_id:
                        path = [target_id]
                        while path[-1] != source_id:
                            path.append(prev[path[-1]])
                        return [self.graph.nodes[p] for p in reversed(path)]
                    nxt.append(nb)
            frontier = nxt
        return None

    def validations_for(self, asset: str) -> list[LineageNode]:
        return [
            n
            for n in self.graph.get_downstream(asset, depth=1)
            if n.node_type == "validation"
        ]

    # -- persistence ----------------------------------------------------------
    def export_to_json(self) -> str:
        return json.dumps({"graph": self.graph.to_dict(), "history": self.history})

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.export_to_json())

    def load(self, path: str) -> None:
        with open(path) as f:
            d = json.load(f)
        self.graph = LineageGraph.from_dict(d["graph"])
        self.history = d.get("history", [])
        self._seq = len(self.graph.nodes)

    def clear(self) -> None:
        self.graph = LineageGraph()
        self.history = []
        self._seq = 0


def get_tracker() -> LineageTracker:
    """Module-level tracker (reference tracker.py:501-510)."""
    t = LineageTracker.get_current()
    if t is None:
        t = LineageTracker()
        LineageTracker.set_current(t)
    return t


def set_tracker(tracker: LineageTracker | None) -> None:
    LineageTracker.set_current(tracker)


# ---------------------------------------------------------------------------
# impact analysis (reference lineage/impact_analysis.py)
# ---------------------------------------------------------------------------

IMPACT_LEVELS = ("none", "low", "medium", "high", "critical")

#: per-node-type base impact (reference impact_analysis.py:161-171)
_IMPACT_RULES: dict[str, str] = {
    "validation": "high",
    "report": "high",
    "model": "critical",
    "table": "medium",
    "transformation": "medium",
    "file": "low",
    "source": "low",
    "stream": "medium",
    "external": "low",
    "virtual": "low",
}


@dataclass
class AffectedNode:
    node: LineageNode
    level: str
    distance: int
    reason: str

    def to_dict(self) -> dict[str, Any]:
        return {
            "id": self.node.id,
            "node_type": self.node.node_type,
            "level": self.level,
            "distance": self.distance,
            "reason": self.reason,
        }


@dataclass
class ImpactResult:
    source: str
    affected: list[AffectedNode]

    def get_by_level(self, level: str) -> list[AffectedNode]:
        return [a for a in self.affected if a.level == level]

    def get_critical_nodes(self) -> list[AffectedNode]:
        return self.get_by_level("critical")

    def to_dict(self) -> dict[str, Any]:
        return {"source": self.source, "affected": [a.to_dict() for a in self.affected]}

    def summary(self) -> str:
        by = {lv: len(self.get_by_level(lv)) for lv in IMPACT_LEVELS}
        parts = ", ".join(f"{n} {lv}" for lv, n in by.items() if n)
        return f"{self.source}: {len(self.affected)} affected ({parts or 'none'})"


class ImpactAnalyzer:
    """Downstream blast radius (reference impact_analysis.py:130-470)."""

    def __init__(self, tracker: LineageTracker) -> None:
        self.tracker = tracker

    def analyze_impact(self, node_id: str, max_depth: int = -1) -> ImpactResult:
        g = self.tracker.graph
        g.get_node(node_id)
        affected: list[AffectedNode] = []
        seen = {node_id}
        frontier = [(node_id, 0)]
        while frontier:
            nxt: list[tuple[str, int]] = []
            for nid, dist in frontier:
                if max_depth >= 0 and dist >= max_depth:
                    continue
                for nb in g._out.get(nid, []):
                    if nb in seen:
                        continue
                    seen.add(nb)
                    node = g.nodes[nb]
                    level = _IMPACT_RULES.get(node.node_type, "low")
                    # distance decay (reference :267-294): 3+ hops away
                    # drops one level unless already low
                    if dist + 1 >= 3 and level in ("critical", "high", "medium"):
                        level = IMPACT_LEVELS[IMPACT_LEVELS.index(level) - 1]
                    affected.append(
                        AffectedNode(
                            node=node,
                            level=level,
                            distance=dist + 1,
                            reason=f"{node.node_type} {dist + 1} hop(s) downstream of {node_id}",
                        )
                    )
                    nxt.append((nb, dist + 1))
            frontier = nxt
        order = {lv: i for i, lv in enumerate(IMPACT_LEVELS)}
        affected.sort(key=lambda a: (-order[a.level], a.distance, a.node.id))
        return ImpactResult(source=node_id, affected=affected)

    def impact_of_column(self, asset: str, column: str) -> ImpactResult:
        """Which checks/outputs break if ``asset.column`` changes: every
        validation node on the asset whose recorded column set includes
        the column, plus their downstream closure."""
        g = self.tracker.graph
        hits: list[AffectedNode] = []
        seen: set[str] = set()
        for v in self.tracker.validations_for(asset):
            if column in v.columns or not v.columns:
                if v.id not in seen:
                    seen.add(v.id)
                    hits.append(
                        AffectedNode(
                            node=v,
                            level="high",
                            distance=1,
                            reason=f"validation touches {asset}.{column}",
                        )
                    )
                for down in g.get_downstream(v.id):
                    if down.id not in seen:
                        seen.add(down.id)
                        hits.append(
                            AffectedNode(
                                node=down,
                                level=_IMPACT_RULES.get(down.node_type, "low"),
                                distance=2,
                                reason=f"downstream of a {asset}.{column} check",
                            )
                        )
        return ImpactResult(source=f"{asset}.{column}", affected=hits)

    def what_if_delete(self, node_id: str) -> dict[str, Any]:
        """reference impact_analysis.py:335-379."""
        res = self.analyze_impact(node_id)
        n_crit = len(res.get_critical_nodes())
        n_high = len(res.get_by_level("high"))
        if n_crit:
            rec = "do_not_delete"
        elif n_high:
            rec = "review_required"
        elif res.affected:
            rec = "caution"
        else:
            rec = "safe_to_delete"
        return {
            "node": node_id,
            "affected_count": len(res.affected),
            "critical_count": n_crit,
            "high_count": n_high,
            "recommendation": rec,
            "affected": [a.to_dict() for a in res.affected],
        }
