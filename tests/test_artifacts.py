"""Dataset artifact envelope + bundles (artifacts.py; reference
_datasets/contracts.py DatasetArtifactEnvelope, bundles.py
Snapshot/Diff/QualityGate bundles + restore dispatch, _redaction.py
summary-only boundary): build → serialize → parse → equality is the
CI hand-off contract."""

from __future__ import annotations

import json

import pytest

from truthound_spark.artifacts import (
    ARTIFACT_SCHEMA_VERSION,
    ArtifactContractError,
    ArtifactVersionError,
    DatasetArtifactEnvelope,
    DiffBundle,
    QualityGateBundle,
    RedactionError,
    SnapshotBundle,
    assert_artifact_safe,
    restore_artifact,
)


@pytest.fixture(scope="module")
def fp(spark):
    from truthound_spark.fingerprint import fingerprint_dataset

    df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    return fingerprint_dataset(df, include_content_checksum=True)


def test_envelope_roundtrip_and_version_pins():
    env = DatasetArtifactEnvelope(
        artifact_type="dataset_fingerprint", payload={"schema_hash": "abc"}
    )
    back = DatasetArtifactEnvelope.from_json(env.to_json())
    assert back.to_dict() == env.to_dict()
    assert back.artifact_schema_version == ARTIFACT_SCHEMA_VERSION

    tampered = json.loads(env.to_json())
    tampered["artifact_schema_version"] = "9.9"
    with pytest.raises(ArtifactVersionError):
        DatasetArtifactEnvelope.from_dict(tampered)
    with pytest.raises(ArtifactContractError):
        DatasetArtifactEnvelope.from_json("{not json")
    with pytest.raises(ArtifactContractError):
        DatasetArtifactEnvelope.from_dict({"artifact_type": "x"})  # no payload


def test_redaction_boundary_rejects_samples_and_pii():
    with pytest.raises(RedactionError, match="row-level"):
        assert_artifact_safe({"sample_values": [1, 2, 3]})
    with pytest.raises(RedactionError, match="PII-like"):
        assert_artifact_safe({"note": "contact alice@example.com"})
    with pytest.raises(RedactionError):
        DatasetArtifactEnvelope(
            artifact_type="dataset_diff",
            payload={"summary": {"raw_rows": ["a|b|c"]}},
        )
    # summary-only payloads pass
    assert_artifact_safe({"null_profile_hash": "ab12", "row_count": 10})


def test_snapshot_bundle_roundtrip(fp):
    b = SnapshotBundle.from_fingerprint(
        fp,
        snapshot_id="snap-2",
        asset_id="nation",
        parent_snapshot_id="snap-1",
        profile_summary={"n_nation": {"null_ratio": 0.0}},
        validation_refs=["run-77"],
    )
    m = b.snapshot_manifest
    assert m["fingerprint"] == fp.content_checksum
    assert m["schema_fingerprint"] == fp.schema_hash
    assert m["row_count"] == fp.row_count and m["column_count"] == 3
    assert m["parent_snapshot_id"] == "snap-1"

    restored = restore_artifact(b.to_json())
    assert isinstance(restored, SnapshotBundle)
    assert restored.to_dict() == b.to_dict()


def test_snapshot_bundle_requires_ids(fp):
    with pytest.raises(ArtifactContractError, match="snapshot_id"):
        SnapshotBundle.from_fingerprint(fp, snapshot_id="", asset_id="a")


def test_diff_bundle_roundtrip_and_blocking(spark):
    from truthound_spark.fingerprint import diff_datasets

    a = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    d = diff_datasets(
        a, a.limit(10), source_snapshot_id="v1", target_snapshot_id="v2"
    )
    b = DiffBundle.from_diff(d, blocking_categories=["row_count_changed"])
    assert b.source_ref == "v1" and b.target_ref == "v2"
    assert b.blocking  # 25 → 10 rows
    ok = DiffBundle.from_diff(d, blocking_categories=["schema_removed"])
    assert not ok.blocking

    restored = restore_artifact(b.to_json())
    assert isinstance(restored, DiffBundle)
    assert restored.to_dict() == b.to_dict()


def test_quality_gate_bundle_roundtrip(spark):
    from truthound_spark.quality_gates import gate_check
    from truthound_spark.validators.distribution import RangeValidator

    df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    res = gate_check(df, validators=[RangeValidator("n_nationkey", 0, 3)])
    b = QualityGateBundle.from_gate_result(res, dataset_ref="nation")
    assert not b.passed
    assert b.to_dict()["blocking_summary"]["blocking_count"] >= 1

    restored = restore_artifact(b.to_json())
    assert isinstance(restored, QualityGateBundle)
    assert restored.to_dict() == b.to_dict()
    assert restored.passed == b.passed


def test_restore_rejects_unknown_type():
    env = DatasetArtifactEnvelope(artifact_type="mystery", payload={})
    with pytest.raises(ArtifactContractError, match="unsupported"):
        restore_artifact(env)


def test_cli_bundle_commands(tmp_path, capsys):
    from truthound_spark.cli import main

    out = tmp_path / "snap.json"
    rc = main(
        [
            "bundle", "snapshot", "/root/testdata/sf0.001/nation.parquet",
            "--snapshot-id", "s1", "--asset-id", "nation",
            "--output", str(out),
        ]
    )
    assert rc == 0
    restored = restore_artifact(out.read_text())
    assert isinstance(restored, SnapshotBundle)
    assert restored.snapshot_manifest["snapshot_id"] == "s1"
    capsys.readouterr()

    rc = main(
        [
            "bundle", "diff",
            "/root/testdata/sf0.001/nation.parquet",
            "/root/testdata/sf0.001/nation.parquet",
        ]
    )
    assert rc == 0  # identical datasets: no change
    payload = json.loads(capsys.readouterr().out)
    assert payload["artifact_type"] == "dataset_diff_bundle"

    rc = main(["bundle", "gate", "/root/testdata/sf0.001/nation.parquet"])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out)
    assert payload["payload"]["blocking_summary"]["passed"] is True


def test_evidence_payload_from_bundles_roundtrip(spark, fp):
    from truthound_spark.artifacts import EvidenceInputPayload
    from truthound_spark.fingerprint import diff_datasets
    from truthound_spark.quality_gates import gate_check
    from truthound_spark.validators.distribution import RangeValidator

    df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    snap = SnapshotBundle.from_fingerprint(fp, snapshot_id="s1", asset_id="nation")
    d = diff_datasets(df, df.limit(10), source_snapshot_id="s0", target_snapshot_id="s1")
    diffb = DiffBundle.from_diff(d, blocking_categories=["row_count_changed"])
    gateb = QualityGateBundle.from_gate_result(
        gate_check(df, validators=[RangeValidator("n_nationkey", 0, 3)]),
        dataset_ref="nation",
    )
    ev = EvidenceInputPayload.from_bundles("ev-1", [snap, diffb, gateb])
    assert ev.source_artifact_refs[0] == "s1"
    assert set(ev.risk_flags) == {"blocking_diff", "gate_not_passed"}
    assert len(ev.artifact_summaries) == 3
    restored = restore_artifact(ev.to_json())
    from truthound_spark.artifacts import EvidenceInputPayload as E

    assert isinstance(restored, E)
    assert restored.to_dict() == ev.to_dict()


def test_redaction_allows_timestamps_and_ids_but_catches_luhn_cards():
    # 13-digit epoch millis in ids/paths must NOT trip the card check
    assert_artifact_safe(
        {
            "snapshot_id": "run-1723708800000",
            "logical_path": "/data/run-1723708800000/part.parquet",
            "fingerprint": "1234567890123deadbeef",
        }
    )
    # a Luhn-valid card number (test number) must still be rejected
    with pytest.raises(RedactionError, match="PII-like"):
        assert_artifact_safe({"note": "card 4539 1488 0343 6467"})
    with pytest.raises(RedactionError, match="PII-like"):
        assert_artifact_safe({"note": "4111111111111111"})


def test_cli_bundle_diff_requires_target(capsys):
    from truthound_spark.cli import main

    with pytest.raises(SystemExit, match="requires a second dataset"):
        main(["bundle", "diff", "/root/testdata/sf0.001/nation.parquet"])


def test_cli_bundle_evidence_chain(tmp_path, capsys):
    """The full CI chain: emit snapshot + gate envelopes, then derive
    the evidence digest from the files; exit 1 only on risk flags."""
    from truthound_spark.cli import main

    snap = tmp_path / "snap.json"
    gate = tmp_path / "gate.json"
    assert main(
        ["bundle", "snapshot", "/root/testdata/sf0.001/nation.parquet",
         "--snapshot-id", "s1", "--asset-id", "nation", "--output", str(snap)]
    ) == 0
    assert main(
        ["bundle", "gate", "/root/testdata/sf0.001/nation.parquet",
         "--output", str(gate)]
    ) == 0
    capsys.readouterr()
    out = tmp_path / "ev.json"
    rc = main(
        ["bundle", "evidence", "ev-9", "--from", str(snap), str(gate),
         "--output", str(out)]
    )
    assert rc == 0  # default-validator gate passes → no risk flags
    from truthound_spark.artifacts import EvidenceInputPayload

    ev = restore_artifact(out.read_text())
    assert isinstance(ev, EvidenceInputPayload)
    assert ev.evidence_id == "ev-9" and len(ev.artifact_summaries) == 2
    with pytest.raises(SystemExit, match="--from"):
        main(["bundle", "evidence", "ev-9"])
