"""Dataset artifact envelope + bundles: the CI hand-off format.

Reference: _datasets/contracts.py:1-139 (DatasetArtifactEnvelope — a
versioned container with schema/fingerprint/sampling policy version
checks), _datasets/bundles.py:1-665 (Snapshot/Diff/QualityGate bundles
+ ``restore_dataset_artifact`` dispatch), _datasets/primitives.py
(artifact type registry, asset/snapshot manifests),
_datasets/redaction.py + _redaction.py (the summary-only boundary:
artifacts NEVER carry raw rows or PII-like literals).

This module packages the three payloads the repo already computes —
``fingerprint.DatasetFingerprint``/``DatasetDiff`` and
``quality_gates.QualityGateResult`` — into one machine-readable,
version-checked JSON artifact that a CI pipeline can emit on one side
and parse on the other (build → serialize → parse → equality is the
round-trip contract). Pure driver-side metadata: every payload is
summary-sized (digests, counts, statuses), so nothing here touches the
cluster — the scale story is that a 100 TB dataset's artifact is the
same few KB as a 100-row one.

Envelope JSON shape::

    {"artifact_schema_version": "0.1", "artifact_type": "...",
     "payload": {...}, "fingerprint_policy_version": "0.1",
     "sampling_policy_version": "0.1", "created_at": "...",
     "metadata": {...}}
"""

from __future__ import annotations

import datetime as _dt
import json
import re
from dataclasses import dataclass, field
from typing import Any

from truthound_spark.fingerprint import DatasetDiff, DatasetFingerprint
from truthound_spark.quality_gates import QualityGateResult

ARTIFACT_SCHEMA_VERSION = "0.1"
FINGERPRINT_POLICY_VERSION = "0.1"
SAMPLING_POLICY_VERSION = "0.1"

# artifact type registry (reference primitives.py DatasetArtifactType)
SNAPSHOT_BUNDLE = "dataset_snapshot_bundle"
DIFF_BUNDLE = "dataset_diff_bundle"
QUALITY_GATE_BUNDLE = "quality_gate_bundle"
FINGERPRINT_ARTIFACT = "dataset_fingerprint"
DIFF_ARTIFACT = "dataset_diff"
QUALITY_GATE_ARTIFACT = "quality_gate_result"
EVIDENCE_INPUT_PAYLOAD = "dataset_evidence_input_payload"


class ArtifactContractError(ValueError):
    """Malformed artifact payload (reference DatasetArtifactContractError)."""


class ArtifactVersionError(ArtifactContractError):
    """Unsupported artifact schema / policy version."""


class RedactionError(ValueError):
    """Payload violates the summary-only redaction boundary."""


# --- summary-only redaction boundary (reference _redaction.py:15-36) ---

_FORBIDDEN_KEYS = {
    "sample", "samples", "sample_values", "raw_rows", "raw_row",
    "row_samples", "row_sample", "record_samples", "record_sample",
    "example_rows", "example_row",
}
_FORBIDDEN_KEY_MARKERS = ("sample_values", "raw_row", "row_sample",
                          "record_sample", "example_row")
# PII-like literal detection on string leaves — a compact subset of
# scanners.PII_PATTERNS (email/ssn/credit-card shapes are what leak in
# practice through free-form metadata)
_PII_RES = [
    re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    re.compile(r"\b\d{3}-\d{2}-\d{4}\b"),
]
# card numbers are gated on the Luhn checksum, not shape alone: a bare
# 13-16 digit run matches epoch-millis timestamps, digit-prefixed run
# ids, and hash fragments, which would make LEGITIMATE artifacts
# (snapshot ids carrying timestamps, logical paths) unserializable
_CARD_RE = re.compile(r"\b\d(?:[ -]?\d){12,15}\b")


def _luhn_ok(digits: str) -> bool:
    total, alt = 0, False
    for ch in reversed(digits):
        d = ord(ch) - 48
        if alt:
            d *= 2
            if d > 9:
                d -= 9
        total += d
        alt = not alt
    return total % 10 == 0


def _card_like(text: str) -> bool:
    for m in _CARD_RE.finditer(text):
        if _luhn_ok(re.sub(r"[ -]", "", m.group())):
            return True
    return False


def assert_artifact_safe(payload: Any, label: str = "dataset artifact") -> None:
    """Reject payloads carrying row-level samples or PII-like literals
    (the reference's SummaryOnlyRedactor.assert_safe contract)."""
    violations: list[str] = []

    def walk(node: Any, path: str) -> None:
        if isinstance(node, dict):
            for k, v in node.items():
                kl = str(k).lower()
                if kl in _FORBIDDEN_KEYS or any(
                    m in kl for m in _FORBIDDEN_KEY_MARKERS
                ):
                    violations.append(
                        f"{path}.{k}: field suggests row-level samples"
                    )
                    continue
                walk(v, f"{path}.{k}")
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{path}[{i}]")
        elif isinstance(node, str):
            if any(rx.search(node) for rx in _PII_RES) or _card_like(node):
                violations.append(f"{path}: PII-like literal content")

    walk(payload, "$")
    if violations:
        raise RedactionError(
            f"summary-only redaction rejected {label}: " + "; ".join(violations)
        )


def _utc_now_iso() -> str:
    return _dt.datetime.now(_dt.timezone.utc).isoformat()


def _require_mapping(value: Any, name: str) -> dict[str, Any]:
    if not isinstance(value, dict):
        raise ArtifactContractError(f"{name} must be a mapping, got {type(value).__name__}")
    return value


def _require_str(value: Any, name: str) -> str:
    if not isinstance(value, str) or not value.strip():
        raise ArtifactContractError(f"{name} must be a non-empty string")
    return value


@dataclass
class DatasetArtifactEnvelope:
    """Versioned container for dataset artifacts (reference
    contracts.py:33-130). ``validate()`` enforces the three version
    pins and the redaction boundary; parsing an envelope written by a
    newer/older incompatible emitter fails loudly instead of
    mis-reading."""

    artifact_type: str
    payload: dict[str, Any]
    artifact_schema_version: str = ARTIFACT_SCHEMA_VERSION
    fingerprint_policy_version: str = FINGERPRINT_POLICY_VERSION
    sampling_policy_version: str = SAMPLING_POLICY_VERSION
    created_at: str = field(default_factory=_utc_now_iso)
    metadata: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        self.artifact_type = _require_str(self.artifact_type, "artifact_type")
        self.payload = _require_mapping(self.payload, "payload")
        self.metadata = _require_mapping(self.metadata, "metadata")
        self.validate()

    def validate(self) -> None:
        if self.artifact_schema_version != ARTIFACT_SCHEMA_VERSION:
            raise ArtifactVersionError(
                f"unsupported artifact schema version {self.artifact_schema_version!r}"
                f" (supported: {ARTIFACT_SCHEMA_VERSION})"
            )
        if self.fingerprint_policy_version != FINGERPRINT_POLICY_VERSION:
            raise ArtifactVersionError(
                f"unsupported fingerprint policy version "
                f"{self.fingerprint_policy_version!r}"
            )
        if self.sampling_policy_version != SAMPLING_POLICY_VERSION:
            raise ArtifactVersionError(
                f"unsupported sampling policy version "
                f"{self.sampling_policy_version!r}"
            )
        assert_artifact_safe(
            {"artifact_type": self.artifact_type, "payload": self.payload,
             "metadata": self.metadata},
            label=f"dataset artifact {self.artifact_type}",
        )

    def to_dict(self) -> dict[str, Any]:
        self.validate()
        return {
            "artifact_schema_version": self.artifact_schema_version,
            "artifact_type": self.artifact_type,
            "payload": dict(self.payload),
            "fingerprint_policy_version": self.fingerprint_policy_version,
            "sampling_policy_version": self.sampling_policy_version,
            "created_at": self.created_at,
            "metadata": dict(self.metadata),
        }

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> "DatasetArtifactEnvelope":
        data = _require_mapping(data, "envelope")
        missing = [
            k
            for k in ("artifact_schema_version", "artifact_type", "payload")
            if k not in data
        ]
        if missing:
            raise ArtifactContractError(f"envelope missing fields: {missing}")
        return cls(
            artifact_type=str(data["artifact_type"]),
            payload=_require_mapping(data["payload"], "payload"),
            artifact_schema_version=str(data["artifact_schema_version"]),
            fingerprint_policy_version=str(
                data.get("fingerprint_policy_version", FINGERPRINT_POLICY_VERSION)
            ),
            sampling_policy_version=str(
                data.get("sampling_policy_version", SAMPLING_POLICY_VERSION)
            ),
            created_at=str(data.get("created_at", "")) or _utc_now_iso(),
            metadata=_require_mapping(data.get("metadata", {}), "metadata"),
        )

    def to_json(self, indent: int | None = None) -> str:
        return json.dumps(self.to_dict(), indent=indent, sort_keys=True)

    @classmethod
    def from_json(cls, data: str) -> "DatasetArtifactEnvelope":
        try:
            parsed = json.loads(data)
        except ValueError as exc:
            raise ArtifactContractError(f"envelope is not valid JSON: {exc}") from exc
        return cls.from_dict(parsed)


def _fingerprint_dict(fp: DatasetFingerprint | dict[str, Any]) -> dict[str, Any]:
    return fp.to_dict() if isinstance(fp, DatasetFingerprint) else dict(fp)


@dataclass
class SnapshotBundle:
    """Snapshot artifact: manifest + fingerprint + optional asset
    manifest + profile summary (reference bundles.py:33-142).

    The manifest identifies WHICH dataset version this is (ids, digests,
    counts, lineage via parent_snapshot_id); the fingerprint carries the
    content identity the digests came from; asset_manifest points at the
    physical asset (logical_path, source_kind); profile_summary is
    free-form summary stats (column → aggregate metrics — never rows)."""

    snapshot_manifest: dict[str, Any]
    fingerprint: dict[str, Any]
    asset_manifest: dict[str, Any] | None = None
    profile_summary: dict[str, Any] = field(default_factory=dict)
    validation_refs: list[str] = field(default_factory=list)
    metadata: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        self.snapshot_manifest = _require_mapping(
            self.snapshot_manifest, "snapshot_manifest"
        )
        for k in ("snapshot_id", "asset_id", "fingerprint"):
            if not self.snapshot_manifest.get(k):
                raise ArtifactContractError(f"snapshot_manifest.{k} is required")
        self.fingerprint = _fingerprint_dict(self.fingerprint)

    @classmethod
    def from_fingerprint(
        cls,
        fp: DatasetFingerprint | dict[str, Any],
        snapshot_id: str,
        asset_id: str,
        parent_snapshot_id: str | None = None,
        created_by: str = "truthound_spark",
        asset_manifest: dict[str, Any] | None = None,
        profile_summary: dict[str, Any] | None = None,
        validation_refs: list[str] | None = None,
        metadata: dict[str, Any] | None = None,
    ) -> "SnapshotBundle":
        """Build the manifest from a computed fingerprint — the digest
        fields the reference manifest pins (fingerprint / schema /
        profile) map onto our fingerprint's content / schema / null-
        profile hashes."""
        f = _fingerprint_dict(fp)
        manifest = {
            "snapshot_id": _require_str(snapshot_id, "snapshot_id"),
            "asset_id": _require_str(asset_id, "asset_id"),
            "parent_snapshot_id": parent_snapshot_id,
            "fingerprint": f.get("content_checksum") or f["sampled_row_hash"],
            "schema_fingerprint": f["schema_hash"],
            "profile_fingerprint": f["null_profile_hash"],
            "row_count": int(f["row_count"]),
            "column_count": len(f.get("metadata", {}).get("schema") or []),
            "created_by": created_by,
        }
        return cls(
            snapshot_manifest=manifest,
            fingerprint=f,
            asset_manifest=asset_manifest,
            profile_summary=profile_summary or {},
            validation_refs=list(validation_refs or []),
            metadata=metadata or {},
        )

    def to_dict(self) -> dict[str, Any]:
        return {
            "snapshot_manifest": dict(self.snapshot_manifest),
            "fingerprint": dict(self.fingerprint),
            "asset_manifest": dict(self.asset_manifest)
            if self.asset_manifest
            else None,
            "profile_summary": dict(self.profile_summary),
            "validation_refs": list(self.validation_refs),
            "metadata": dict(self.metadata),
        }

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> "SnapshotBundle":
        data = _require_mapping(data, "snapshot bundle")
        return cls(
            snapshot_manifest=_require_mapping(
                data.get("snapshot_manifest"), "snapshot_manifest"
            ),
            fingerprint=_require_mapping(data.get("fingerprint"), "fingerprint"),
            asset_manifest=data.get("asset_manifest"),
            profile_summary=dict(data.get("profile_summary") or {}),
            validation_refs=list(data.get("validation_refs") or []),
            metadata=dict(data.get("metadata") or {}),
        )

    def to_envelope(self) -> DatasetArtifactEnvelope:
        return DatasetArtifactEnvelope(
            artifact_type=SNAPSHOT_BUNDLE, payload=self.to_dict()
        )

    def to_json(self, indent: int | None = None) -> str:
        return self.to_envelope().to_json(indent=indent)


@dataclass
class DiffBundle:
    """Diff artifact: a fingerprint/summary diff plus the two snapshot
    refs it compares (reference bundles.py:147-274)."""

    diff: dict[str, Any]
    source_ref: str
    target_ref: str
    blocking_categories: list[str] = field(default_factory=list)
    metadata: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_diff(
        cls,
        diff: DatasetDiff | dict[str, Any],
        blocking_categories: list[str] | None = None,
        metadata: dict[str, Any] | None = None,
    ) -> "DiffBundle":
        d = diff.to_dict() if isinstance(diff, DatasetDiff) else dict(diff)
        return cls(
            diff=d,
            source_ref=str(d.get("source_snapshot_id") or "source"),
            target_ref=str(d.get("target_snapshot_id") or "target"),
            blocking_categories=list(blocking_categories or []),
            metadata=metadata or {},
        )

    @property
    def blocking(self) -> bool:
        cats = set(self.diff.get("categories") or [])
        return bool(cats & set(self.blocking_categories))

    def to_dict(self) -> dict[str, Any]:
        return {
            "diff": dict(self.diff),
            "source_ref": self.source_ref,
            "target_ref": self.target_ref,
            "blocking_categories": list(self.blocking_categories),
            "blocking": self.blocking,
            "metadata": dict(self.metadata),
        }

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> "DiffBundle":
        data = _require_mapping(data, "diff bundle")
        return cls(
            diff=_require_mapping(data.get("diff"), "diff"),
            source_ref=_require_str(data.get("source_ref"), "source_ref"),
            target_ref=_require_str(data.get("target_ref"), "target_ref"),
            blocking_categories=list(data.get("blocking_categories") or []),
            metadata=dict(data.get("metadata") or {}),
        )

    def to_envelope(self) -> DatasetArtifactEnvelope:
        return DatasetArtifactEnvelope(artifact_type=DIFF_BUNDLE, payload=self.to_dict())

    def to_json(self, indent: int | None = None) -> str:
        return self.to_envelope().to_json(indent=indent)


@dataclass
class QualityGateBundle:
    """Quality-gate artifact: the gate projection of a check() run
    (reference bundles.py:278-391), with the blocking summary CI keys
    on (exit code discipline: ``0 if passed else 1``)."""

    gate_result: dict[str, Any]
    gate_type: str = "upload"
    dataset_ref: str | None = None
    metadata: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_gate_result(
        cls,
        result: QualityGateResult | dict[str, Any],
        gate_type: str = "upload",
        dataset_ref: str | None = None,
        metadata: dict[str, Any] | None = None,
    ) -> "QualityGateBundle":
        r = result.to_dict() if isinstance(result, QualityGateResult) else dict(result)
        return cls(
            gate_result=r,
            gate_type=gate_type,
            dataset_ref=dataset_ref,
            metadata=metadata or {},
        )

    @property
    def passed(self) -> bool:
        return bool(self.gate_result.get("passed"))

    def to_dict(self) -> dict[str, Any]:
        return {
            "gate_result": dict(self.gate_result),
            "gate_type": self.gate_type,
            "dataset_ref": self.dataset_ref,
            "blocking_summary": {
                "status": self.gate_result.get("status"),
                "passed": self.passed,
                "blocking_count": len(self.gate_result.get("blocking_failures") or []),
                "warning_count": len(self.gate_result.get("warnings") or []),
            },
            "metadata": dict(self.metadata),
        }

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> "QualityGateBundle":
        data = _require_mapping(data, "quality gate bundle")
        return cls(
            gate_result=_require_mapping(data.get("gate_result"), "gate_result"),
            gate_type=str(data.get("gate_type") or "upload"),
            dataset_ref=data.get("dataset_ref"),
            metadata=dict(data.get("metadata") or {}),
        )

    def to_envelope(self) -> DatasetArtifactEnvelope:
        return DatasetArtifactEnvelope(
            artifact_type=QUALITY_GATE_BUNDLE, payload=self.to_dict()
        )

    def to_json(self, indent: int | None = None) -> str:
        return self.to_envelope().to_json(indent=indent)


@dataclass
class EvidenceInputPayload:
    """Redacted evidence payload derived from other artifacts
    (reference bundles.py:395-493 DatasetEvidenceInputPayload): the
    reviewer-facing digest a downstream evidence/review system ingests
    — refs to the source artifacts, their summary dicts, and risk
    flags. Summary-only by construction: the envelope's redaction
    boundary rejects raw rows or PII-like literals."""

    evidence_id: str
    source_artifact_refs: list[str] = field(default_factory=list)
    artifact_summaries: list[dict[str, Any]] = field(default_factory=list)
    risk_flags: list[str] = field(default_factory=list)
    reviewer_summary: dict[str, Any] = field(default_factory=dict)
    metadata: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        self.evidence_id = _require_str(self.evidence_id, "evidence_id")
        for i, s in enumerate(self.artifact_summaries):
            _require_mapping(s, f"artifact_summaries[{i}]")

    @classmethod
    def from_bundles(
        cls,
        evidence_id: str,
        bundles: list[Any],
        risk_flags: list[str] | None = None,
        metadata: dict[str, Any] | None = None,
    ) -> "EvidenceInputPayload":
        """Derive the digest from built bundles: snapshot bundles
        contribute their manifests, diff bundles their category/blocking
        summary, gate bundles their blocking summary; refs are the
        bundles' natural ids."""
        refs: list[str] = []
        summaries: list[dict[str, Any]] = []
        flags = list(risk_flags or [])
        for b in bundles:
            if isinstance(b, SnapshotBundle):
                m = b.snapshot_manifest
                refs.append(str(m["snapshot_id"]))
                summaries.append(
                    {
                        "artifact_type": SNAPSHOT_BUNDLE,
                        "snapshot_id": m["snapshot_id"],
                        "asset_id": m["asset_id"],
                        "row_count": m.get("row_count"),
                        "fingerprint": m.get("fingerprint"),
                    }
                )
            elif isinstance(b, DiffBundle):
                refs.append(f"{b.source_ref}->{b.target_ref}")
                summaries.append(
                    {
                        "artifact_type": DIFF_BUNDLE,
                        "categories": list(b.diff.get("categories") or []),
                        "blocking": b.blocking,
                    }
                )
                if b.blocking:
                    flags.append("blocking_diff")
            elif isinstance(b, QualityGateBundle):
                refs.append(str(b.dataset_ref or b.gate_result.get("gate_id")))
                summaries.append(
                    {
                        "artifact_type": QUALITY_GATE_BUNDLE,
                        "status": b.gate_result.get("status"),
                        "passed": b.passed,
                    }
                )
                if not b.passed:
                    flags.append("gate_not_passed")
            else:
                raise ArtifactContractError(
                    f"cannot summarize {type(b).__name__} into evidence"
                )
        return cls(
            evidence_id=evidence_id,
            source_artifact_refs=refs,
            artifact_summaries=summaries,
            risk_flags=sorted(set(flags)),
            metadata=metadata or {},
        )

    def to_dict(self) -> dict[str, Any]:
        return {
            "evidence_id": self.evidence_id,
            "source_artifact_refs": list(self.source_artifact_refs),
            "artifact_summaries": [dict(s) for s in self.artifact_summaries],
            "risk_flags": list(self.risk_flags),
            "reviewer_summary": dict(self.reviewer_summary),
            "metadata": dict(self.metadata),
        }

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> "EvidenceInputPayload":
        data = _require_mapping(data, "evidence payload")
        return cls(
            evidence_id=_require_str(data.get("evidence_id"), "evidence_id"),
            source_artifact_refs=list(data.get("source_artifact_refs") or []),
            artifact_summaries=list(data.get("artifact_summaries") or []),
            risk_flags=list(data.get("risk_flags") or []),
            reviewer_summary=dict(data.get("reviewer_summary") or {}),
            metadata=dict(data.get("metadata") or {}),
        )

    def to_envelope(self) -> DatasetArtifactEnvelope:
        return DatasetArtifactEnvelope(
            artifact_type=EVIDENCE_INPUT_PAYLOAD, payload=self.to_dict()
        )

    def to_json(self, indent: int | None = None) -> str:
        return self.to_envelope().to_json(indent=indent)


_RESTORERS = {
    SNAPSHOT_BUNDLE: SnapshotBundle.from_dict,
    DIFF_BUNDLE: DiffBundle.from_dict,
    QUALITY_GATE_BUNDLE: QualityGateBundle.from_dict,
    EVIDENCE_INPUT_PAYLOAD: EvidenceInputPayload.from_dict,
    # bare payloads round-trip as plain dicts
    FINGERPRINT_ARTIFACT: dict,
    DIFF_ARTIFACT: dict,
    QUALITY_GATE_ARTIFACT: dict,
}


def restore_artifact(
    data: str | dict[str, Any] | DatasetArtifactEnvelope,
) -> Any:
    """Versioned-envelope JSON/mapping → the typed bundle it carries
    (reference bundles.py restore_dataset_artifact:497-525)."""
    if isinstance(data, DatasetArtifactEnvelope):
        env = data
    elif isinstance(data, str):
        env = DatasetArtifactEnvelope.from_json(data)
    else:
        env = DatasetArtifactEnvelope.from_dict(data)
    restorer = _RESTORERS.get(env.artifact_type)
    if restorer is None:
        raise ArtifactContractError(
            f"unsupported dataset artifact type {env.artifact_type!r}"
        )
    return restorer(env.payload)


__all__ = [
    "ARTIFACT_SCHEMA_VERSION",
    "FINGERPRINT_POLICY_VERSION",
    "SAMPLING_POLICY_VERSION",
    "ArtifactContractError",
    "ArtifactVersionError",
    "RedactionError",
    "DatasetArtifactEnvelope",
    "SnapshotBundle",
    "DiffBundle",
    "QualityGateBundle",
    "EvidenceInputPayload",
    "assert_artifact_safe",
    "restore_artifact",
]
