"""OpenLineage emission: LineageTracker graphs → standard RunEvents.

Reference: lineage/integrations/openlineage.py — EventType (:27),
OpenLineageConfig (:39), DatasetFacets (:57), RunEvent (:117),
OpenLineageEmitter (:142) with start_run / emit_running / emit_complete
/ emit_fail / emit_abort, dataset builders (:399-482) and
``emit_from_graph`` (:488) that maps a lineage graph's edges to one
START+COMPLETE run per transformation target. The event JSON follows
the public OpenLineage 1-0-5 RunEvent spec (https://openlineage.io/spec),
so the engine's queryable tracker (lineage.py:235) becomes
interoperable with Marquez/astronomer-style collectors.

Transport is PLUGGABLE: the default buffers events in memory (tests /
dry runs), ``file_transport`` appends JSONL (the durable local option),
and ``http_transport`` posts to a collector endpoint (gated behind an
import-try on ``requests`` — absent in this sandbox, never required).
``run_id_factory``/``clock`` are injectable so tests can pin golden
events byte-for-byte; visualization remains a non-goal (SURVEY §7).
"""

from __future__ import annotations

import json
import logging
import uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any, Callable

logger = logging.getLogger(__name__)

EVENT_TYPES = ("START", "RUNNING", "COMPLETE", "ABORT", "FAIL", "OTHER")

_SPEC = "https://openlineage.io/spec/1-0-5/OpenLineage.json#/$defs/RunEvent"
_FACET_BASE = "https://openlineage.io/spec/facets/1-0-0"


@dataclass
class OpenLineageConfig:
    """reference openlineage.py:39 (endpoint only used by http transport)."""

    endpoint: str = "http://localhost:5000/api/v1/lineage"
    api_key: str | None = None
    namespace: str = "truthound"
    producer: str = "truthound-spark"
    timeout_seconds: int = 30


@dataclass
class DatasetFacets:
    """reference openlineage.py:57-114 — rendered to spec facet keys."""

    schema_fields: list[dict[str, Any]] = field(default_factory=list)
    data_source: dict[str, str] | None = None
    lifecycle_state: str | None = None
    ownership: dict[str, Any] | None = None
    quality_metrics: dict[str, Any] | None = None

    def to_dict(self) -> dict[str, Any]:
        facets: dict[str, Any] = {}
        if self.schema_fields:
            facets["schema"] = {
                "_producer": "truthound-spark",
                "_schemaURL": f"{_FACET_BASE}/SchemaDatasetFacet.json",
                "fields": self.schema_fields,
            }
        if self.data_source:
            facets["dataSource"] = {
                "_producer": "truthound-spark",
                "_schemaURL": f"{_FACET_BASE}/DatasourceDatasetFacet.json",
                **self.data_source,
            }
        if self.lifecycle_state:
            facets["lifecycleStateChange"] = {
                "_producer": "truthound-spark",
                "_schemaURL": f"{_FACET_BASE}/LifecycleStateChangeDatasetFacet.json",
                "lifecycleStateChange": self.lifecycle_state,
            }
        if self.ownership:
            facets["ownership"] = {
                "_producer": "truthound-spark",
                "_schemaURL": f"{_FACET_BASE}/OwnershipDatasetFacet.json",
                **self.ownership,
            }
        if self.quality_metrics:
            facets["dataQualityMetrics"] = {
                "_producer": "truthound-spark",
                "_schemaURL": f"{_FACET_BASE}/DataQualityMetricsInputDatasetFacet.json",
                **self.quality_metrics,
            }
        return facets


@dataclass
class RunEvent:
    """reference openlineage.py:117."""

    run_id: str
    job_name: str
    job_namespace: str
    event_type: str = "START"
    inputs: list[dict[str, Any]] = field(default_factory=list)
    outputs: list[dict[str, Any]] = field(default_factory=list)
    parent: dict[str, Any] | None = None
    facets: dict[str, Any] = field(default_factory=dict)


# ---------------------------------------------------------------------------
# transports
# ---------------------------------------------------------------------------
def file_transport(path: str) -> Callable[[dict[str, Any]], None]:
    """Append each event as one JSON line (durable local collector)."""

    def send(event: dict[str, Any]) -> None:
        with open(path, "a") as f:
            f.write(json.dumps(event, sort_keys=True) + "\n")

    return send


def http_transport(config: OpenLineageConfig) -> Callable[[dict[str, Any]], None]:
    """POST to an OpenLineage collector; degrades to a logged warning
    when ``requests`` is unavailable (reference _emit :303-362 falls
    back the same way)."""

    def send(event: dict[str, Any]) -> None:
        try:
            import requests  # noqa: PLC0415
        except ImportError:
            logger.warning("requests not available for OpenLineage emit")
            return
        headers = {"Content-Type": "application/json"}
        if config.api_key:
            headers["Authorization"] = f"Bearer {config.api_key}"
        try:
            resp = requests.post(
                config.endpoint,
                json=event,
                headers=headers,
                timeout=config.timeout_seconds,
            )
            if resp.status_code >= 400:
                logger.warning("OpenLineage emit failed: %s", resp.status_code)
        except Exception as e:  # network failure must never break the pipeline
            logger.warning("OpenLineage emit error: %s", e)

    return send


# ---------------------------------------------------------------------------
# emitter
# ---------------------------------------------------------------------------
class OpenLineageEmitter:
    """reference openlineage.py:142. Default transport buffers to
    ``self.events`` (inspectable); inject file/http transports for real
    collectors, and run_id_factory/clock for deterministic tests."""

    def __init__(
        self,
        config: OpenLineageConfig | None = None,
        transport: Callable[[dict[str, Any]], None] | None = None,
        run_id_factory: Callable[[], str] | None = None,
        clock: Callable[[], str] | None = None,
    ) -> None:
        self.config = config or OpenLineageConfig()
        self.events: list[dict[str, Any]] = []
        self._transport = transport or self.events.append
        self._run_id = run_id_factory or (lambda: str(uuid.uuid4()))
        self._clock = clock or (
            lambda: datetime.now(timezone.utc).isoformat()
        )
        self._active_runs: dict[str, RunEvent] = {}

    # -- lifecycle (reference :166-301) ---------------------------------------
    def start_run(
        self,
        job_name: str,
        inputs: list[dict[str, Any]] | None = None,
        parent_run_id: str | None = None,
        facets: dict[str, Any] | None = None,
    ) -> RunEvent:
        run_id = self._run_id()
        parent = None
        if parent_run_id:
            parent_run = self._active_runs.get(parent_run_id)
            if parent_run:
                parent = {
                    "run": {"runId": parent_run_id},
                    "job": {
                        "namespace": parent_run.job_namespace,
                        "name": parent_run.job_name,
                    },
                }
        run = RunEvent(
            run_id=run_id,
            job_name=job_name,
            job_namespace=self.config.namespace,
            event_type="START",
            inputs=inputs or [],
            parent=parent,
            facets=facets or {},
        )
        self._active_runs[run_id] = run
        self._emit(run)
        return run

    def emit_running(self, run: RunEvent, facets: dict[str, Any] | None = None) -> None:
        run.event_type = "RUNNING"
        if facets:
            run.facets.update(facets)
        self._emit(run)

    def emit_complete(
        self,
        run: RunEvent,
        outputs: list[dict[str, Any]] | None = None,
        facets: dict[str, Any] | None = None,
    ) -> None:
        run.event_type = "COMPLETE"
        if outputs:
            run.outputs = outputs
        if facets:
            run.facets.update(facets)
        self._emit(run)
        self._active_runs.pop(run.run_id, None)

    def emit_fail(
        self,
        run: RunEvent,
        error: Exception | str,
        facets: dict[str, Any] | None = None,
    ) -> None:
        run.event_type = "FAIL"
        run.facets["errorMessage"] = {
            "_producer": self.config.producer,
            "_schemaURL": f"{_FACET_BASE}/ErrorMessageRunFacet.json",
            "message": str(error),
            "programmingLanguage": "python",
        }
        if facets:
            run.facets.update(facets)
        self._emit(run)
        self._active_runs.pop(run.run_id, None)

    def emit_abort(self, run: RunEvent, reason: str | None = None) -> None:
        run.event_type = "ABORT"
        if reason:
            run.facets["abortInfo"] = {
                "_producer": self.config.producer,
                "reason": reason,
            }
        self._emit(run)
        self._active_runs.pop(run.run_id, None)

    def _emit(self, run: RunEvent) -> None:
        self._transport(self._build_event(run))

    def _build_event(self, run: RunEvent) -> dict[str, Any]:
        """reference :364-393 — the spec RunEvent shape."""
        event: dict[str, Any] = {
            "eventType": run.event_type,
            "eventTime": self._clock(),
            "producer": f"https://openlineage.io/producers/{self.config.producer}",
            "schemaURL": _SPEC,
            "run": {"runId": run.run_id, "facets": dict(run.facets)},
            "job": {"namespace": run.job_namespace, "name": run.job_name},
            "inputs": run.inputs,
            "outputs": run.outputs,
        }
        if run.parent:
            event["run"]["facets"]["parent"] = run.parent
        return event

    # -- dataset builders (reference :399-482) --------------------------------
    def build_dataset(
        self,
        name: str,
        namespace: str | None = None,
        facets: DatasetFacets | None = None,
    ) -> dict[str, Any]:
        ds: dict[str, Any] = {
            "namespace": namespace or self.config.namespace,
            "name": name,
        }
        if facets:
            rendered = facets.to_dict()
            if rendered:
                ds["facets"] = rendered
        return ds

    def build_input_dataset(
        self,
        name: str,
        namespace: str | None = None,
        schema: list[dict[str, str]] | None = None,
    ) -> dict[str, Any]:
        facets = DatasetFacets()
        if schema:
            facets.schema_fields = [
                {"name": f["name"], "type": f.get("type", "string")} for f in schema
            ]
        return self.build_dataset(name, namespace, facets)

    def build_output_dataset(
        self,
        name: str,
        namespace: str | None = None,
        schema: list[dict[str, str]] | None = None,
        row_count: int | None = None,
    ) -> dict[str, Any]:
        facets = DatasetFacets()
        if schema:
            facets.schema_fields = [
                {"name": f["name"], "type": f.get("type", "string")} for f in schema
            ]
        if row_count is not None:
            facets.quality_metrics = {"rowCount": row_count}
        return self.build_dataset(name, namespace, facets)

    # -- tracker graph → events (reference :488-548) ---------------------------
    def emit_from_graph(
        self, graph: Any, job_name: str = "truthound-lineage"
    ) -> list[RunEvent]:
        """One START+COMPLETE run per edge-target: the target node is
        the job's output, its in-edge sources the inputs. Column lists
        become schema facets; a node's ``row_count`` metadata becomes
        the output's quality facet. Deterministic order: targets in
        first-edge order (the graph appends edges in tracked order)."""
        targets: dict[str, list[str]] = {}
        for edge in graph.edges:
            targets.setdefault(edge.target, []).append(edge.source)
        runs: list[RunEvent] = []
        for target_id, source_ids in targets.items():
            if not graph.has_node(target_id):
                continue
            node = graph.get_node(target_id)
            inputs = []
            for sid in source_ids:
                if not graph.has_node(sid):
                    continue
                src = graph.get_node(sid)
                inputs.append(
                    self.build_input_dataset(
                        src.name or src.id,
                        schema=[{"name": c} for c in src.columns] or None,
                    )
                )
            output = self.build_output_dataset(
                node.name or node.id,
                schema=[{"name": c} for c in node.columns] or None,
                row_count=node.metadata.get("row_count"),
            )
            run = self.start_run(
                job_name=f"{job_name}:{node.name or node.id}", inputs=inputs
            )
            self.emit_complete(run, outputs=[output])
            runs.append(run)
        return runs


def emit_tracker(
    tracker: Any,
    job_name: str = "truthound-lineage",
    path: str | None = None,
    emitter: OpenLineageEmitter | None = None,
) -> OpenLineageEmitter:
    """Convenience: LineageTracker → OpenLineage events (buffered, or
    JSONL at ``path``)."""
    em = emitter or OpenLineageEmitter(
        transport=file_transport(path) if path else None
    )
    em.emit_from_graph(tracker.graph, job_name=job_name)
    return em


class OpenLineageAction:
    """Checkpoint action: emit each validation run as an OpenLineage
    START→COMPLETE/FAIL run whose input dataset carries the spec's
    dataQualityAssertions facet (one assertion per executed validator,
    failures marked) — the interop join of the engine's checkpoint layer
    (checkpoint.py actions) and the reference's OpenLineage integration:
    a Marquez-style collector sees every data-quality run beside the
    pipeline jobs that produced the data.

    Usage: ``Checkpoint(name, validators=[...], actions=[
    OpenLineageAction(emitter, dataset="warehouse.orders")])``."""

    def __init__(
        self,
        emitter: OpenLineageEmitter | None = None,
        dataset: str = "dataset",
        namespace: str | None = None,
        job_prefix: str = "truthound-check",
    ) -> None:
        self.emitter = emitter or OpenLineageEmitter()
        self.dataset = dataset
        self.namespace = namespace
        self.job_prefix = job_prefix

    def _assertions_facet(self, result: Any) -> dict[str, Any]:
        # the run result enumerates FAILURES only (passing validators
        # emit no issues), so every enumerated assertion is success=False
        assertions = [
            {
                "assertion": v,
                "success": False,
                **({"column": c} if c else {}),
            }
            for v, c in sorted(
                {(i.validator_name, i.column) for i in result.issues},
                key=lambda t: (t[0], t[1] or ""),
            )
        ]
        # passing validators aren't enumerated in the result; the facet
        # carries the failures plus a run-level summary assertion
        assertions.append(
            {
                "assertion": "suite",
                "success": result.success,
            }
        )
        return {
            "dataQualityAssertions": {
                "_producer": self.emitter.config.producer,
                "_schemaURL": f"{_FACET_BASE}/DataQualityAssertionsDatasetFacet.json",
                "assertions": assertions,
            }
        }

    def __call__(self, name: str, result: Any) -> RunEvent:
        ds = self.emitter.build_dataset(self.dataset, self.namespace)
        ds["facets"] = self._assertions_facet(result)
        run = self.emitter.start_run(
            f"{self.job_prefix}:{name}",
            inputs=[ds],
            facets={
                "truthound": {
                    "_producer": self.emitter.config.producer,
                    "rowCount": result.row_count,
                    "checksRun": result.checks_run,
                    "issueCount": len(result.issues),
                }
            },
        )
        if result.success:
            self.emitter.emit_complete(run)
        else:
            self.emitter.emit_fail(
                run, f"{len(result.issues)} validation issues"
            )
        return run
