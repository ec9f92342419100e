"""CLI (reference: src/truthound/cli.py + cli_modules/core/{check,scan,
mask,profile,learn,compare}.py — `th <command> <path>`).

spark-submit-able: ``python -m truthound_spark check data.parquet``.
Exit code reflects failure severity (reference tests/e2e/utils.py
assert_cli_error contract): 0 = pass, 1 = issues found, 2 = usage error.
"""

from __future__ import annotations

import argparse
import sys
from typing import Any

from pyspark.sql import SparkSession


def _spark(cpus: str = "*") -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("truthound_spark_cli")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _load(spark: SparkSession, path: str):
    from truthound_spark.adapters import to_dataframe

    return to_dataframe(path, spark)


def cmd_check(args: argparse.Namespace) -> int:
    from truthound_spark import api
    from truthound_spark.reporters import render, save_report

    df = _load(_spark(), args.path)
    if getattr(args, "suite", None):
        from truthound_spark.suite_io import load_suite

        validators = load_suite(args.suite).validators
    else:
        validators = args.validators.split(",") if args.validators else None
    result = api.check(df, validators=validators, learn=args.learn)
    print(render(result, args.format))
    if args.output:
        save_report(result, args.output)
    return 0 if result.success else 1


def cmd_profile(args: argparse.Namespace) -> int:
    from truthound_spark.profiler.table_profiler import profile

    df = _load(_spark(), args.path)
    p = profile(df, approx=args.approx)
    if args.output and args.output.endswith(".html"):
        from truthound_spark.datadocs import save_profile_docs

        save_profile_docs(p, args.output, title=f"Profile — {args.path}")
        print(f"wrote {args.output}")
    else:
        print(p.to_json())
    return 0


def cmd_scan(args: argparse.Namespace) -> int:
    from truthound_spark.scanners import scan

    df = _load(_spark(), args.path)
    report = scan(df)
    for f in report.findings:
        print(f"{f.column}: {f.pii_type} ({f.match_count} matches, {f.match_ratio:.2%})")
    return 1 if report.findings else 0


def cmd_mask(args: argparse.Namespace) -> int:
    from truthound_spark.maskers import mask

    df = _load(_spark(), args.path)
    columns = args.columns.split(",") if args.columns else None
    masked = mask(df, columns=columns, strategy=args.strategy)
    masked.write.mode("overwrite").parquet(args.output)
    print(f"wrote masked data to {args.output}")
    return 0


def cmd_learn(args: argparse.Namespace) -> int:
    from truthound_spark.schema import learn

    df = _load(_spark(), args.path)
    schema = learn(df)
    if args.output:
        schema.save(args.output)
        print(f"wrote baseline to {args.output}")
    else:
        print(schema.to_json())
    return 0


def cmd_compare(args: argparse.Namespace) -> int:
    from truthound_spark.drift.detectors import compare

    spark = _spark()
    baseline = _load(spark, args.baseline)
    current = _load(spark, args.path)
    results = compare(baseline, current, method=args.method)
    drifted = False
    for col, r in results.items():
        flag = "DRIFT" if r.drifted else "ok"
        print(f"{col}: {r.method}={r.statistic:.6f} (threshold {r.threshold:.6f}) {flag}")
        drifted = drifted or r.drifted
    return 1 if drifted else 0


def cmd_anomaly(args: argparse.Namespace) -> int:
    """reference cli_modules/advanced/ml.py:43 ``truthound ml anomaly``:
    fit a detector on the data, report anomaly count/ratio + top scores.
    Methods zscore | iqr | mad | ensemble (reference offers the three
    statistical detectors + isolation_forest; ensemble combines the
    statistical trio, ml/anomaly_models/ensemble.py)."""
    import json as _json

    from pyspark.sql import functions as F

    from truthound_spark.ml.ensemble import (
        EnsembleAnomalyDetector,
        IQRDetector,
        MADDetector,
        ZScoreDetector,
    )

    df = _load(_spark(), args.path)
    cols = args.columns.split(",") if args.columns else None
    numeric = [
        c
        for c, t in df.dtypes
        if (cols is None or c in cols)
        and t.split("(")[0]
        in ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal")
    ]
    if not numeric:
        print("error: no numeric columns to analyze", file=sys.stderr)
        return 1
    kw = {"score_threshold": None, "contamination": args.contamination}
    if args.method == "ensemble":
        ens = EnsembleAnomalyDetector(
            strategy=args.strategy, contamination=args.contamination
        ).fit(df, columns=numeric)
    else:
        det_cls = {"zscore": ZScoreDetector, "iqr": IQRDetector, "mad": MADDetector}
        if args.method not in det_cls:
            print(
                f"error: unknown method {args.method!r} "
                "(zscore | iqr | mad | ensemble)",
                file=sys.stderr,
            )
            return 1
        ens = EnsembleAnomalyDetector.from_fitted(
            [det_cls[args.method](numeric, **kw).fit(df)], "max"
        )
        ens.contamination = args.contamination
    pred = ens.predict(df)
    agg = pred.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_anomaly").cast("long")).alias("anomalies"),
    ).collect()[0]
    n, anomalies = int(agg["n"]), int(agg["anomalies"] or 0)
    top = (
        pred.filter("is_anomaly")
        .orderBy(F.desc("anomaly_score"))
        .limit(10)
        .collect()
    )
    if args.format == "json":
        out = {
            "method": args.method,
            "total_points": n,
            "anomaly_count": anomalies,
            "anomaly_ratio": round(anomalies / n, 6) if n else 0.0,
            "threshold_used": ens.threshold,
            "top": [
                {"score": round(r["anomaly_score"], 6), "votes": r["detector_votes"]}
                for r in top
            ],
        }
        text = _json.dumps(out, indent=2)
        if args.output:
            with open(args.output, "w") as f:
                f.write(text)
        print(text)
    else:
        print(f"Anomaly Detection Results ({args.method})")
        print(f"Total points: {n}")
        print(f"Anomalies found: {anomalies}")
        print(f"Anomaly ratio: {anomalies / n:.2%}" if n else "Anomaly ratio: n/a")
        print(f"Threshold used: {ens.threshold:.4f}")
        for r in top:
            print(
                f"  score={r['anomaly_score']:.4f} votes={r['detector_votes']} "
                f"type={r['anomaly_type']}"
            )
    return 0


def cmd_concept_drift(args: argparse.Namespace) -> int:
    """Concept drift between two snapshots (ml/concept_drift.py;
    reference cli ml drift compares distributions — this compares the
    feature↔target RELATIONSHIP). Exit 1 on drift."""
    import json as _json

    from truthound_spark.ml.concept_drift import ConceptDriftDetector

    spark = _spark()
    baseline = _load(spark, args.baseline)
    current = _load(spark, args.path)
    det = ConceptDriftDetector(
        args.target,
        feature_columns=args.features.split(",") if args.features else None,
        threshold=args.threshold,
    ).fit(baseline)
    res = det.detect(current)
    if args.format == "json":
        print(_json.dumps(res.to_dict(), indent=2))
    else:
        flag = "DRIFT" if res.is_drifted else "ok"
        print(f"concept drift: {flag} score={res.drift_score:.4f} "
              f"type={res.drift_type}")
        for col, score in res.column_scores:
            print(f"  {col}: {score:.4f}")
        if res.details:
            print(f"  details: {res.details}")
    return 1 if res.is_drifted else 0


def cmd_fingerprint(args: argparse.Namespace) -> int:
    """Deterministic dataset fingerprint (fingerprint.py; reference
    _datasets/fingerprinting.py) — the did-the-data-change artifact."""
    import json as _json

    from truthound_spark.fingerprint import fingerprint_dataset

    df = _load(_spark(), args.path)
    fp = fingerprint_dataset(
        df,
        sample_size=args.sample_size,
        include_content_checksum=args.checksum,
    )
    text = _json.dumps(fp.to_dict(), indent=2)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text)
    print(text)
    return 0


def cmd_diff(args: argparse.Namespace) -> int:
    """Summary fingerprint diff between two datasets (reference
    _datasets/diffing.py). Exit 1 when changed (CI-friendly)."""
    import json as _json

    from truthound_spark.fingerprint import diff_datasets

    spark = _spark()
    d = diff_datasets(
        _load(spark, args.source),
        _load(spark, args.target),
        source_snapshot_id=args.source,
        target_snapshot_id=args.target,
        include_content_checksum=args.checksum,
    )
    print(_json.dumps(d.to_dict(), indent=2))
    return 1 if d.changed else 0


def cmd_bundle(args: argparse.Namespace) -> int:
    """Versioned dataset artifact bundle (artifacts.py; reference
    _datasets/bundles.py) — one machine-readable envelope carrying a
    snapshot (fingerprint + manifest), a two-dataset diff, or a
    quality-gate run, for CI hand-off. Exit codes: snapshot always 0;
    diff 1 when a blocking category changed; gate 1 when not passed;
    evidence 1 when any risk flag is raised."""
    import json as _json

    from truthound_spark.artifacts import (
        DiffBundle,
        QualityGateBundle,
        SnapshotBundle,
    )

    if args.kind == "evidence":
        # driver-only: derive the reviewer digest from ALREADY-EMITTED
        # envelope files (no Spark session needed)
        from truthound_spark.artifacts import (
            EvidenceInputPayload,
            restore_artifact,
        )

        if not args.from_artifacts:
            raise SystemExit(
                "bundle evidence requires --from <envelope.json> [...]"
            )
        from truthound_spark.artifacts import ArtifactContractError

        restored = []
        for ap in args.from_artifacts:
            try:
                with open(ap) as fh:
                    restored.append(restore_artifact(fh.read()))
            except OSError as exc:
                raise SystemExit(f"cannot read artifact {ap}: {exc}") from exc
            except ArtifactContractError as exc:
                raise SystemExit(f"{ap} is not a usable envelope: {exc}") from exc
        try:
            ev = EvidenceInputPayload.from_bundles(args.path, restored)
        except ArtifactContractError as exc:
            raise SystemExit(
                f"cannot summarize into evidence: {exc} "
                "(--from takes snapshot/diff/gate bundle envelopes)"
            ) from exc
        text = ev.to_json(indent=2)
        if args.output:
            with open(args.output, "w") as f:
                f.write(text)
        print(text)
        return 1 if ev.risk_flags else 0

    spark = _spark()
    rc = 0
    if args.kind == "snapshot":
        from truthound_spark.fingerprint import fingerprint_dataset

        fp = fingerprint_dataset(
            _load(spark, args.path), include_content_checksum=args.checksum
        )
        bundle = SnapshotBundle.from_fingerprint(
            fp,
            snapshot_id=args.snapshot_id or args.path,
            asset_id=args.asset_id or args.path,
            parent_snapshot_id=args.parent,
            asset_manifest={
                "asset_id": args.asset_id or args.path,
                "asset_name": args.asset_id or args.path,
                "asset_type": "generic_dataset",
                "logical_path": args.path,
                "source_kind": "file",
            },
        )
    elif args.kind == "diff":
        if not args.target:
            raise SystemExit("bundle diff requires a second dataset: "
                             "bundle diff SOURCE TARGET")
        from truthound_spark.fingerprint import diff_datasets

        d = diff_datasets(
            _load(spark, args.path),
            _load(spark, args.target),
            source_snapshot_id=args.path,
            target_snapshot_id=args.target,
            include_content_checksum=args.checksum,
        )
        blocking = [s for s in (args.blocking or "").split(",") if s]
        bundle = DiffBundle.from_diff(d, blocking_categories=blocking)
        rc = 1 if (bundle.blocking if blocking else d.changed) else 0
    elif args.kind == "gate":
        from truthound_spark.quality_gates import gate_check

        result = gate_check(_load(spark, args.path), gate_id=args.gate_id)
        bundle = QualityGateBundle.from_gate_result(result, dataset_ref=args.path)
        rc = 0 if bundle.passed else 1
    else:
        raise SystemExit(f"unknown bundle kind {args.kind!r}")
    text = bundle.to_json(indent=2)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text)
    print(text)
    return rc


def cmd_sample_check(args: argparse.Namespace) -> int:
    """Sampled pre-check with Wilson intervals (sampled.py): estimate
    violation ratios from a deterministic sample instead of scanning the
    full table; exit 1 when any check's ci_low clears --fail-above."""
    from truthound_spark.core.registry import resolve
    from truthound_spark.sampled import sampled_check_report

    df = _load(_spark(), args.path)
    validators = resolve(args.validators.split(",")) if args.validators else None
    if not validators:
        print("sample-check requires --validators", file=sys.stderr)
        return 2
    rep = sampled_check_report(
        df,
        validators,
        key_col=args.key_col,
        modulus=args.modulus,
        residue=args.residue,
        fraction=args.fraction,
        seed=args.seed,
        confidence=args.confidence,
        level=args.level,
    ).collect()
    failed = 0
    for r in rep:
        verdict = "ok"
        if r["ci_low"] is not None and r["ci_low"] > args.fail_above:
            verdict = "violates"
            failed += 1
        elif r["ci_high"] is not None and r["ci_high"] > args.fail_above:
            verdict = "inconclusive"
        print(
            f"{r['check']}\t{r['column']}\tn={r['denom']}"
            f"\tviolations={r['violations']}\tratio={r['ratio']}"
            f"\tci=[{r['ci_low']}, {r['ci_high']}]\t{verdict}"
        )
    return 1 if failed else 0


def cmd_tune(args: argparse.Namespace) -> int:
    """Profile → thresholds (reference auto_threshold.py tune_thresholds);
    with --history-root, learn from stored profile runs instead and
    optionally append this run first (--save)."""
    import json as _json

    from truthound_spark.ml import (
        HistoryThresholdLearner,
        ProfileHistoryStore,
        ThresholdTuner,
    )
    from truthound_spark.profiler.table_profiler import profile

    if args.history_root:
        store = ProfileHistoryStore(root=args.history_root)
        table = args.table or args.path.rsplit("/", 1)[-1].split(".")[0]
        if args.save:
            # only scan the table when this run is actually recorded —
            # learning itself reads stored history, never the data
            df = _load(_spark(), args.path)
            run_id = store.save(table, profile(df, approx=args.approx))
            print(f"saved profile run {run_id} for {table}", flush=True)
        history = store.load_history(table)
        if len(history) < 2:
            print(f"only {len(history)} stored run(s); need >= 2 to learn")
            return 1
        tt = HistoryThresholdLearner().learn(history, table=table)
    else:
        df = _load(_spark(), args.path)
        p = profile(df, approx=args.approx)
        tt = ThresholdTuner(args.strategy, args.strictness).tune(p, table=args.path)
    if args.emit_suite:
        from truthound_spark.ml import thresholds_to_suite
        from truthound_spark.suite_io import save_suite

        save_suite(
            thresholds_to_suite(tt),
            args.emit_suite,
            name=args.table or "learned",
            strategy=tt.strategy,
        )
        print(f"wrote suite to {args.emit_suite}")
    print(_json.dumps(tt.to_dict(), indent=2, default=str))
    return 0


def cmd_mine(args: argparse.Namespace) -> int:
    """Rule mining (reference ml/rule_learning/): profile rules,
    constraints (FD/implications/conditionals), string patterns."""
    import json as _json

    from truthound_spark.ml import ConstraintMiner, DataProfileRuleLearner, PatternRuleLearner

    df = _load(_spark(), args.path)
    if args.miner == "profile":
        res = DataProfileRuleLearner(strictness=args.strictness).learn_rules(df)
    elif args.miner == "constraints":
        res = ConstraintMiner(discover_conditional_rules=True).learn_rules(df)
    else:
        res = PatternRuleLearner().learn_rules(df)
    print(
        _json.dumps(
            {
                "rules": [r.to_dict() for r in res.rules],
                "total": res.total_rules,
                "filtered": res.filtered_rules,
            },
            indent=2,
            default=str,
        )
    )
    return 0


def cmd_evolve(args: argparse.Namespace) -> int:
    """Profile two snapshots and diff them (reference profiler/
    comparison.py + evolution/): exit 1 on breaking changes."""
    from truthound_spark.profiler.evolution import DriftThresholds, compare_profiles
    from truthound_spark.profiler.table_profiler import profile

    spark = _spark()
    old = profile(_load(spark, args.old), approx=args.approx)
    new = profile(_load(spark, args.path), approx=args.approx)
    th = {
        "strict": DriftThresholds.strict(),
        "default": DriftThresholds(),
        "loose": DriftThresholds.loose(),
    }[args.thresholds]
    cmp = compare_profiles(old, new, th)
    print(cmp.to_report())
    return 1 if cmp.breaking else 0


def cmd_curate(args: argparse.Namespace) -> int:
    """End-to-end corpus curation (the pipeline test_e2e_curation pins):
    C4/Gopher hygiene -> fuzzy-dedup canonical selection -> optional probe
    decontamination -> quality gate -> deterministic global shuffle ->
    sharded parquet at OUTPUT. Prints one JSON line of stage counts."""
    import json as _json

    from pyspark.sql import functions as F

    from truthound_spark.pipeline.dedup import decontaminate, dedup_clusters
    from truthound_spark.pipeline.export import global_shuffle
    from truthound_spark.pipeline.text import clean_text, gopher_filter, quality_score

    spark = _spark()
    df = _load(spark, args.path)
    tc, ic = args.text_col, args.id_col
    counts: dict[str, int] = {"input": df.count()}
    work = df
    if not args.skip_hygiene:
        work = gopher_filter(
            df.withColumn(tc, clean_text(F.col(tc))), text_col=tc
        )
        counts["after_hygiene"] = work.count()
    if args.self_dedup:
        # Lee et al. '22 ordering: excise repeated spans BEFORE document
        # dedup, so boilerplate can't mask whole-document near-dups
        from truthound_spark.pipeline.dedup import self_dedup_spans

        excised = self_dedup_spans(work, text_col=tc, id_col=ic, n=args.self_dedup)
        keep_cols = [c for c in work.columns if c not in (tc, ic)]
        work = (
            work.select(F.col(ic).cast("long").alias("id"), *keep_cols)
            .join(excised.select("id", F.col("text").alias(tc)), "id")
            .withColumnRenamed("id", ic)
            .select(*work.columns)
        )
        counts["after_self_dedup"] = work.count()
    clusters = dedup_clusters(work, text_col=tc, id_col=ic, threshold=args.dedup_threshold)
    work = work.join(clusters.filter("is_canonical").select(ic), ic, "left_semi")
    counts["after_dedup"] = work.count()
    if args.decontaminate:
        probe = _load(spark, args.decontaminate)
        flagged = decontaminate(
            work, probe, text_col=tc, id_col=ic, min_overlap=args.min_overlap
        )
        work = work.join(flagged.select(ic), ic, "left_anti")
        counts["after_decontamination"] = work.count()
    scored = quality_score(work, tc)
    work = scored.filter(F.col("quality_score") >= args.min_quality).select(*df.columns)
    counts["after_quality_gate"] = work.count()
    if args.quantile_gate is not None:
        # per-stratum adaptive gate on top of the absolute floor: keeps
        # source composition while dropping each stratum's worst tail
        from truthound_spark.pipeline.text import quantile_gate

        rescored = quality_score(work, tc).withColumn(
            "__qs", F.round("quality_score", 6)
        )
        gated = quantile_gate(
            rescored,
            "__qs",
            group_col=args.gate_by if args.gate_by else None,
            keep_fraction=args.quantile_gate,
            id_col=ic,
        )
        work = work.join(
            gated.filter("kept").select(F.col("id").alias(ic)), ic, "left_semi"
        )
        counts["after_quantile_gate"] = work.count()
    shuffled = global_shuffle(work, n_shards=args.n_shards, key_col=ic, seed=args.seed)
    (
        shuffled.repartitionByRange(args.n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "position")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(args.output)
    )
    counts["written"] = counts.get("after_quantile_gate", counts["after_quality_gate"])
    print(_json.dumps({"output": args.output, "counts": counts}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="truthound-spark")
    sub = p.add_subparsers(dest="command", required=True)

    c = sub.add_parser(
        "sample-check",
        help="sampled pre-check with Wilson confidence intervals",
    )
    c.add_argument("path")
    c.add_argument("--validators", help="comma-separated registry names")
    c.add_argument("--key-col", dest="key_col", help="deterministic key-mod sampling column")
    c.add_argument("--modulus", type=int, default=20)
    c.add_argument("--residue", type=int, default=3)
    c.add_argument("--fraction", type=float, default=0.05)
    c.add_argument("--seed", type=int, default=42)
    c.add_argument("--confidence", type=float, default=0.95)
    c.add_argument("--level", choices=["rows", "files"], default="rows")
    c.add_argument(
        "--fail-above", dest="fail_above", type=float, default=0.0,
        help="exit 1 when a check's ci_low exceeds this ratio",
    )
    c.set_defaults(fn=cmd_sample_check)

    c = sub.add_parser("check", help="validate a dataset")
    c.add_argument("path")
    c.add_argument("--validators", help="comma-separated validator names")
    c.add_argument("--suite", help="run a saved suite file (json/yaml) instead")
    c.add_argument("--learn", action="store_true", help="learn a baseline first")
    c.add_argument("--format", default="console", choices=["console", "json", "markdown", "html"])
    c.add_argument("--output", help="write report to file")
    c.set_defaults(fn=cmd_check)

    c = sub.add_parser("profile", help="profile a dataset")
    c.add_argument("path")
    c.add_argument("--approx", action="store_true")
    c.add_argument("--output", help=".html → datadocs page, else JSON to stdout")
    c.set_defaults(fn=cmd_profile)

    c = sub.add_parser("scan", help="PII scan")
    c.add_argument("path")
    c.set_defaults(fn=cmd_scan)

    c = sub.add_parser("mask", help="mask PII columns")
    c.add_argument("path")
    c.add_argument("output")
    c.add_argument("--columns")
    c.add_argument("--strategy", default="redact", choices=["redact", "hash", "fake"])
    c.set_defaults(fn=cmd_mask)

    c = sub.add_parser("learn", help="learn a schema baseline")
    c.add_argument("path")
    c.add_argument("--output")
    c.set_defaults(fn=cmd_learn)

    c = sub.add_parser("compare", help="drift compare baseline vs current")
    c.add_argument("baseline")
    c.add_argument("path")
    c.add_argument("--method", default="psi")
    c.set_defaults(fn=cmd_compare)

    c = sub.add_parser(
        "concept-drift",
        help="feature-target relationship drift between two snapshots (exit 1 on drift)",
    )
    c.add_argument("baseline")
    c.add_argument("path")
    c.add_argument("--target", required=True)
    c.add_argument("--features", default=None, help="comma-separated; default all numeric")
    c.add_argument("--threshold", type=float, default=0.05)
    c.add_argument("--format", default="console", choices=["console", "json"])
    c.set_defaults(fn=cmd_concept_drift)

    c = sub.add_parser("fingerprint", help="deterministic dataset fingerprint")
    c.add_argument("path")
    c.add_argument("--sample-size", type=int, default=128)
    c.add_argument("--checksum", action="store_true", help="full content checksum")
    c.add_argument("--output", default=None)
    c.set_defaults(fn=cmd_fingerprint)

    c = sub.add_parser(
        "diff", help="summary fingerprint diff of two datasets (exit 1 when changed)"
    )
    c.add_argument("source")
    c.add_argument("target")
    c.add_argument("--checksum", action="store_true")
    c.set_defaults(fn=cmd_diff)

    c = sub.add_parser(
        "bundle",
        help="versioned dataset artifact envelope: snapshot | diff | gate | evidence",
    )
    c.add_argument("kind", choices=["snapshot", "diff", "gate", "evidence"])
    c.add_argument("path", help="dataset path (snapshot/diff/gate) or "
                                "evidence id (evidence)")
    c.add_argument("target", nargs="?", default=None, help="diff: second dataset")
    c.add_argument(
        "--from",
        dest="from_artifacts",
        nargs="+",
        default=None,
        metavar="ENVELOPE.json",
        help="evidence: emitted envelope files to summarize "
        "(exit 1 when any risk flag is raised)",
    )
    c.add_argument("--snapshot-id", default=None)
    c.add_argument("--asset-id", default=None)
    c.add_argument("--parent", default=None, help="parent snapshot id (lineage)")
    c.add_argument("--gate-id", default="gate")
    c.add_argument("--checksum", action="store_true", help="full content checksum")
    c.add_argument(
        "--blocking",
        default=None,
        help="diff: comma-separated categories that exit 1 (default: any change)",
    )
    c.add_argument("--output", default=None)
    c.set_defaults(fn=cmd_bundle)

    c = sub.add_parser(
        "dashboard",
        help="static dashboard page: run history x gates + drift sparklines "
        "+ docs versions",
    )
    c.add_argument("runs", help="run-history JSON (list of run records)")
    c.add_argument("--out", default="dashboard.html")
    c.add_argument("--title", default="Data quality dashboard")
    c.add_argument("--version-store", default=None)
    c.add_argument("--report-id", default=None)
    c.add_argument("--drift-threshold", type=float, default=0.05)
    c.set_defaults(fn=cmd_dashboard)

    c = sub.add_parser(
        "anomaly", help="ML anomaly detection: zscore | iqr | mad | ensemble"
    )
    c.add_argument("path")
    c.add_argument("--method", default="zscore")
    c.add_argument("--strategy", default="average", help="ensemble combiner")
    c.add_argument("--contamination", type=float, default=0.1)
    c.add_argument("--columns", default=None, help="comma-separated numeric columns")
    c.add_argument("--format", default="console", choices=["console", "json"])
    c.add_argument("--output", default=None)
    c.set_defaults(fn=cmd_anomaly)

    c = sub.add_parser("read", help="load a source and show schema + head")
    c.add_argument("path")
    c.add_argument("-n", type=int, default=10)
    c.set_defaults(fn=cmd_read)

    c = sub.add_parser("tune", help="learn validation thresholds (profile or run history)")
    c.add_argument("path")
    c.add_argument("--strategy", default="balanced",
                   choices=["conservative", "balanced", "permissive", "adaptive",
                            "statistical", "domain_aware"])
    c.add_argument("--strictness", default="medium", choices=["loose", "medium", "strict"])
    c.add_argument("--approx", action="store_true")
    c.add_argument("--history-root", help="profile-history dir: learn from stored runs")
    c.add_argument("--table", help="history table name (default: file stem)")
    c.add_argument("--save", action="store_true", help="append this run to the history first")
    c.add_argument("--emit-suite", help="also write the learned suite to this json/yaml file")
    c.set_defaults(fn=cmd_tune)

    c = sub.add_parser("mine", help="mine rules: profile | constraints | patterns")
    c.add_argument("path")
    c.add_argument("--miner", default="profile", choices=["profile", "constraints", "patterns"])
    c.add_argument("--strictness", default="medium", choices=["loose", "medium", "strict"])
    c.set_defaults(fn=cmd_mine)

    c = sub.add_parser("evolve", help="diff two snapshot profiles; exit 1 on breaking changes")
    c.add_argument("old")
    c.add_argument("path")
    c.add_argument("--thresholds", default="default", choices=["strict", "default", "loose"])
    c.add_argument("--approx", action="store_true")
    c.set_defaults(fn=cmd_evolve)

    c = sub.add_parser("curate", help="LLM-corpus curation: hygiene -> dedup -> quality gate -> shuffle -> sharded parquet")
    c.add_argument("path")
    c.add_argument("output")
    c.add_argument("--text-col", default="text")
    c.add_argument("--id-col", default="doc_id")
    c.add_argument("--dedup-threshold", type=float, default=0.7)
    c.add_argument("--min-quality", type=float, default=0.2)
    c.add_argument("--decontaminate", help="path to a probe/eval dataset")
    c.add_argument("--min-overlap", type=int, default=5)
    c.add_argument("--n-shards", type=int, default=64)
    c.add_argument("--seed", type=int, default=0)
    c.add_argument("--skip-hygiene", action="store_true")
    c.add_argument(
        "--self-dedup",
        type=int,
        default=0,
        metavar="N",
        help="excise repeated N-token spans corpus-wide before dedup (0 = off)",
    )
    c.add_argument(
        "--quantile-gate",
        type=float,
        default=None,
        metavar="FRACTION",
        help="additionally keep only the top FRACTION by quality per stratum",
    )
    c.add_argument(
        "--gate-by", help="stratum column for --quantile-gate (default: global)"
    )
    c.set_defaults(fn=cmd_curate)

    c = sub.add_parser(
        "docs", help="build a static data-docs site (profile + optional check run)"
    )
    c.add_argument("path")
    c.add_argument("out_dir")
    c.add_argument("--title", default=None)
    c.add_argument("--with-check", action="store_true", help="include a validation run page")
    c.add_argument("--baseline", help="earlier parquet snapshot for a versioned diff page")
    c.add_argument(
        "--version-store",
        metavar="DIR",
        help="also save the profile page into a DocsVersionStore at DIR; "
        "when it differs from the previous version, write a "
        "v<prev>_v<new>_diff.html page linking both",
    )
    c.set_defaults(fn=cmd_docs)

    c = sub.add_parser(
        "lineage", help="query a saved lineage graph: nodes / impact radius"
    )
    c.add_argument("graph", help="lineage JSON written by LineageTracker.save()")
    c.add_argument("--impact", metavar="NODE_ID", help="blast radius of this node")
    c.add_argument("--direction", default="downstream", choices=["downstream", "upstream"])
    c.set_defaults(fn=cmd_lineage)

    c = sub.add_parser(
        "checkpoint", help="run a named checkpoint: check + actions (console/store/report)"
    )
    c.add_argument("name")
    c.add_argument("path")
    c.add_argument("--validators", help="comma list (default: suite or null,duplicate)")
    c.add_argument("--suite", help="saved suite JSON/YAML (suite_io.load_suite)")
    c.add_argument("--store", help="directory: persist the run result as JSON")
    c.add_argument("--report", help="write an HTML report of the run here")
    c.set_defaults(fn=cmd_checkpoint)

    c = sub.add_parser(
        "stream",
        help="streaming validation over a landing directory (file source)",
    )
    c.add_argument("path", help="directory that receives data files")
    c.add_argument("--schema", required=True, help='DDL, e.g. "id LONG, email STRING"')
    c.add_argument("--format", default="json", choices=["json", "csv", "parquet", "text", "orc"])
    c.add_argument("--validators", default="null,duplicate")
    c.add_argument("--checkpoint", required=True, help="checkpoint directory (exactly-once)")
    c.add_argument("--follow", type=float, default=0.0, metavar="SECONDS",
                   help="keep polling this long (0 = drain once and exit)")
    c.set_defaults(fn=cmd_stream)

    c = sub.add_parser("card", help="corpus datasheet: size/tokens/composition/dup mass/quality")
    c.add_argument("path")
    c.add_argument("--text-col", default="text")
    c.add_argument("--lang-col", default="lang")
    c.add_argument("--source-col", default="source")
    c.add_argument("--output", help="write markdown here (default: stdout)")
    c.add_argument("--json", action="store_true", help="emit the raw dict as JSON")
    c.set_defaults(fn=cmd_card)

    c = sub.add_parser("doctor", help="diagnose the runtime environment")
    c.add_argument("--validators", action="store_true",
                   help="list every registered validator by category")
    c.set_defaults(fn=cmd_doctor)
    return p


def cmd_docs(args: argparse.Namespace) -> int:
    """Static data-docs site (reference cli_modules/advanced/docs.py role):
    profile → per-table page; --with-check adds a validation-run page;
    --baseline adds the versioned diff page."""
    from truthound_spark.datadocs import build_site
    from truthound_spark.profiler.table_profiler import profile

    spark = _spark()
    df = _load(spark, args.path)
    name = args.title or args.path.rsplit("/", 1)[-1].split(".")[0]
    profiles = {name: profile(df)}
    runs = None
    if args.with_check:
        from truthound_spark import api

        runs = [("cli_check", api.check(df, validators=["null", "duplicate"]))]
    previous = None
    if args.baseline:
        previous = {name: profile(_load(spark, args.baseline))}
    index = build_site(
        args.out_dir, profiles=profiles, runs=runs, previous_profiles=previous
    )
    if args.version_store:
        import os as _os

        from truthound_spark.datadocs import profile_docs
        from truthound_spark.datadocs_versioning import (
            DocsVersionStore,
            diff_versions,
            render_diff_page,
        )

        store = DocsVersionStore(args.version_store)
        prev = store.latest(name)
        info = store.save(name, profile_docs(profiles[name], title=name))
        print(f"versioned {name} v{info.version}")
        if prev and info.version > prev.version:
            page = render_diff_page(
                diff_versions(store, name, prev.version, info.version)
            )
            # the page's relative v<N>.html links resolve against the
            # report's own directory, so the diff page lives there too
            diff_path = _os.path.join(
                store.report_dir(name),
                f"v{prev.version}_v{info.version}_diff.html",
            )
            with open(diff_path, "w") as fh:
                fh.write(page)
            print(f"wrote {diff_path}")
    print(f"wrote {index}")
    return 0


def cmd_dashboard(args: argparse.Namespace) -> int:
    """Static dashboard-lite (reference datadocs/dashboard/app.py role,
    zero server): run-history JSON → tiles + runs×gates + drift
    sparklines, optionally joined with a DocsVersionStore's history."""
    from truthound_spark.datadocs_dashboard import load_runs, save_dashboard

    store = None
    if args.version_store:
        from truthound_spark.datadocs_versioning import DocsVersionStore

        store = DocsVersionStore(args.version_store)
        if not args.report_id:
            print("--report-id is required with --version-store")
            return 2
    path = save_dashboard(
        args.out,
        load_runs(args.runs),
        store=store,
        report_id=args.report_id,
        title=args.title,
        drift_threshold=args.drift_threshold,
    )
    print(f"wrote {path}")
    return 0


def cmd_lineage(args: argparse.Namespace) -> int:
    """Query a persisted lineage graph (reference cli_modules/advanced/
    lineage.py role): list nodes, or print the blast radius of one."""
    import json as _json

    from truthound_spark.lineage import ImpactAnalyzer, LineageTracker

    tracker = LineageTracker()
    tracker.load(args.graph)
    if args.impact:
        if args.direction == "upstream":
            print(
                _json.dumps(
                    tracker.get_lineage(args.impact, direction="upstream"),
                    indent=2,
                    default=str,
                )
            )
            return 0
        result = ImpactAnalyzer(tracker).analyze_impact(args.impact)
        print(_json.dumps(result.to_dict(), indent=2, default=str))
        return 0
    for node in tracker.graph.nodes.values():
        print(f"{node.id}\t{node.node_type}\t{node.name}")
    return 0


def cmd_stream(args: argparse.Namespace) -> int:
    """Streaming validation from a landing directory (reference
    cli_modules/advanced/realtime.py validate command; file source is the
    broker-free path — swap read_file_stream for read_kafka_stream on a
    cluster). Drains available files (exactly-once via --checkpoint),
    prints one JSON line per micro-batch, exit 1 if any batch failed."""
    import json as _json
    import time as _time

    from truthound_spark.streaming.sources import read_file_stream
    from truthound_spark.streaming.validate import validate_stream

    spark = _spark()
    stream = read_file_stream(spark, args.path, args.schema, format=args.format)
    failed = [False]

    def on_result(batch_id: int, result) -> None:
        failed[0] = failed[0] or not result.success
        print(
            _json.dumps(
                {
                    "batch_id": batch_id,
                    "rows": result.row_count,
                    "success": result.success,
                    "issues": len(result.issues),
                }
            ),
            flush=True,
        )

    q, _sink = validate_stream(
        stream,
        args.validators.split(","),
        checkpoint_location=args.checkpoint,
        on_result=on_result,
        query_name="cli_stream",
    )
    try:
        q.processAllAvailable()
        deadline = _time.time() + args.follow
        while _time.time() < deadline:
            _time.sleep(min(1.0, max(0.0, deadline - _time.time())))
            q.processAllAvailable()
    finally:
        q.stop()
    return 1 if failed[0] else 0


def cmd_checkpoint(args: argparse.Namespace) -> int:
    """Run a named checkpoint end-to-end (reference cli_modules/checkpoint
    role): suite or validator list + console/store/report actions; exit
    code mirrors `check` (0 pass / 1 issues)."""
    from truthound_spark.checkpoint import (
        Checkpoint,
        ConsoleAction,
        SaveReportAction,
        StoreResultAction,
    )

    validators: Any = None
    if args.suite:
        from truthound_spark.suite_io import load_suite

        validators = list(load_suite(args.suite))
    elif args.validators:
        validators = args.validators.split(",")
    else:
        validators = ["null", "duplicate"]
    actions: list[Any] = [ConsoleAction()]
    if args.store:
        from truthound_spark.stores import FilesystemStore

        actions.append(StoreResultAction(FilesystemStore(args.store)))
    if args.report:
        actions.append(SaveReportAction(args.report))
    df = _load(_spark(), args.path)
    cp = Checkpoint(args.name, validators=validators, actions=actions)
    result = cp.run(df)
    return 0 if result.success else 1




def cmd_read(args: argparse.Namespace) -> int:
    """reference: cli read — load a source, print schema + head + counts."""
    from truthound_spark import get_spark
    from truthound_spark.adapters import _read_path

    spark = get_spark()
    df = _read_path(spark, args.path)
    print(f"rows: {df.count()}")
    for f_ in df.schema.fields:
        print(f"  {f_.name}: {f_.dataType.simpleString()}")
    df.show(args.n, truncate=80)
    return 0


def cmd_card(args: argparse.Namespace) -> int:
    """Corpus datasheet (pipeline/report.py corpus_card) — the data-card
    markdown published next to exported shards."""
    import json as _json

    from truthound_spark.pipeline.report import corpus_card, render_corpus_card

    df = _load(_spark(), args.path)
    card = corpus_card(
        df,
        text_col=args.text_col,
        lang_col=args.lang_col,
        source_col=args.source_col,
    )
    out = _json.dumps(card, indent=2) if args.json else render_corpus_card(
        card, title=f"Corpus card — {args.path.rsplit('/', 1)[-1]}"
    )
    if args.output:
        with open(args.output, "w") as f:
            f.write(out)
        print(f"wrote {args.output}")
    else:
        print(out)
    return 0


def cmd_doctor(args: argparse.Namespace) -> int:
    """reference: cli doctor — environment diagnosis; --validators adds
    the registry inventory (reference cli_modules/profiler/metadata.py
    analyzer-listing role)."""
    import importlib
    import os as _os

    if getattr(args, "validators", False):
        import truthound_spark.validators  # noqa: F401 - populate registry
        from truthound_spark.core.registry import list_categories, list_validators

        total = len(list_validators())
        print(f"registered validators: {total}")
        for cat in list_categories():
            names = list_validators(cat)
            print(f"  {cat} ({len(names)}): {', '.join(names)}")
        return 0

    ok = True
    print(f"python: {sys.version.split()[0]}")
    for mod in ["pyspark", "pyarrow", "pandas", "numpy", "duckdb"]:
        try:
            m = importlib.import_module(mod)
            print(f"{mod}: {getattr(m, '__version__', '?')}")
        except ImportError:
            print(f"{mod}: MISSING")
            ok = mod in ("duckdb",) and ok  # duckdb optional for the engine
    java = _os.environ.get("JAVA_HOME")
    print(f"JAVA_HOME: {java or 'NOT SET'}")
    if not java:
        ok = False
    try:
        from truthound_spark import get_spark

        spark = get_spark()
        n = spark.range(10).count()
        print(f"spark session: OK (local count={n}, version {spark.version})")
    except Exception as ex:  # pragma: no cover - env-specific
        print(f"spark session: FAILED ({ex})")
        ok = False
    print("doctor:", "healthy" if ok else "problems found")
    return 0 if ok else 1


def main(argv: list[str] | None = None) -> int:
    try:
        args = build_parser().parse_args(argv)
    except SystemExit as e:
        return 2 if e.code not in (0, None) else 0
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
