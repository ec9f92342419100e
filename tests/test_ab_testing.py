"""A/B threshold-experiment harness (reference profiler/ab_testing/*).

The planted-better-variant round trip the r9 verdict asked for: create an
experiment whose treatment threshold genuinely separates good from bad
rows, record batched runs, and assert the analysis picks the planted
winner with a significant p-value — plus fused-scan-count, deterministic
assignment, tracking round-trip, and statistics-math pins.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from truthound_spark.profiler.ab_testing import (
    ABExperiment,
    ExperimentConfig,
    ExperimentRunner,
    ExperimentStatus,
    ExperimentTracker,
    FileExperimentStore,
    MemoryExperimentStore,
    MetricType,
    StatisticalAnalyzer,
    ThresholdVariant,
    VariantType,
    assign_variants,
    calculate_sample_size,
    is_significant,
    run_fused_variants,
    variant_metrics_df,
)


@pytest.fixture()
def labeled_df(spark):
    # 400 rows: value ~ [0, 100); rows with value >= 90 are "bad"
    # (label=true). A max_value=89.5 gate flags exactly the bad rows; a
    # max_value=200 gate flags nothing.
    return spark.range(400).select(
        F.col("id"),
        (F.col("id") % 100).cast("double").alias("value"),
        ((F.col("id") % 100) >= 90).alias("is_bad"),
    )


def _config(primary=MetricType.RECALL, **kw):
    control = ThresholdVariant(
        name="loose",
        variant_type=VariantType.CONTROL,
        thresholds={"value": {"max_value": 200.0}},
    )
    treatment = ThresholdVariant(
        name="strict",
        variant_type=VariantType.TREATMENT,
        thresholds={"value": {"max_value": 89.5}},
    )
    return ExperimentConfig(
        name="max_value_tuning",
        control=control,
        treatments=[treatment],
        primary_metric=primary,
        minimum_sample_size=50,
        **kw,
    )


class TestFusedEvaluation:
    def test_single_scan_for_all_variants(self, labeled_df):
        variants = [
            ThresholdVariant(name=f"v{i}", thresholds={"max_value": 50.0 + i})
            for i in range(6)
        ]
        metrics, n = run_fused_variants(
            labeled_df, variants, columns=["value"], label_col="is_bad"
        )
        assert n == 400
        assert set(metrics) == {f"v{i}" for i in range(6)}
        # every variant flags value > 50+i → 49-i values per 100 block
        for i in range(6):
            assert metrics[f"v{i}"]["flagged_row_rate"] == pytest.approx(
                (49 - i) / 100
            )

    def test_confusion_metrics_exact(self, labeled_df):
        variants = [
            ThresholdVariant(name="strict", thresholds={"max_value": 89.5})
        ]
        metrics, _ = run_fused_variants(
            labeled_df, variants, columns=["value"], label_col="is_bad"
        )
        m = metrics["strict"]
        # gate flags exactly the 10 bad values per 100 block: perfect
        assert m["precision"] == pytest.approx(1.0)
        assert m["recall"] == pytest.approx(1.0)
        assert m["f1_score"] == pytest.approx(1.0)
        assert m["false_positive_rate"] == pytest.approx(0.0)
        assert m["false_negative_rate"] == pytest.approx(0.0)

    def test_null_threshold_violation(self, spark):
        df = spark.range(100).select(
            F.when(F.col("id") % 4 == 0, None).otherwise(F.col("id")).alias("x")
        )
        # 25% nulls: gate at 0.1 violates, gate at 0.5 passes
        tight = ThresholdVariant(name="tight", thresholds={"null_threshold": 0.1})
        loose = ThresholdVariant(name="loose", thresholds={"null_threshold": 0.5})
        metrics, _ = run_fused_variants(df, [tight, loose], columns=["x"])
        assert metrics["tight"]["violation_count"] == 1.0
        assert metrics["loose"]["violation_count"] == 0.0

    def test_variant_metrics_df_shape(self, labeled_df):
        variants = [
            ThresholdVariant(name="a", thresholds={"max_value": 89.5}),
            ThresholdVariant(name="b", thresholds={"max_value": 200.0}),
        ]
        out = variant_metrics_df(
            labeled_df, variants, columns=["value"], label_col="is_bad"
        )
        rows = {r["variant"]: r.asDict() for r in out.collect()}
        assert rows["a"]["recall"] == pytest.approx(1.0)
        assert rows["b"]["recall"] == pytest.approx(0.0)


class TestExperiment:
    def test_planted_better_variant_wins(self, labeled_df):
        """The r9 verdict's acceptance shape: create → record runs →
        analysis picks the planted-better variant."""
        config = _config()
        exp = ABExperiment(config)
        # four batches so std_dev comes from real per-batch samples
        batches = [
            labeled_df.filter(F.col("id") % 4 == k) for k in range(4)
        ]
        result = exp.run_batches(batches, label_col="is_bad", columns=["value"])
        assert result.status == ExperimentStatus.COMPLETED
        assert result.winner == "strict"
        pa = result.primary_analysis
        assert pa is not None and pa.is_significant
        assert pa.treatment_mean > pa.control_mean  # recall 1.0 vs 0.0
        assert "strict" in result.recommendation

    def test_single_run_lower_is_better_metric(self, labeled_df):
        config = _config(primary=MetricType.FALSE_NEGATIVE_RATE)
        result = ABExperiment(config).run(
            labeled_df, label_col="is_bad", columns=["value"]
        )
        # strict has fnr 0, loose has fnr 1 → strict wins on lower-is-better
        assert result.winner == "strict"

    def test_early_stopping(self, labeled_df):
        config = _config(early_stopping=True, early_stopping_threshold=0.05)
        exp = ABExperiment(config)
        batches = [labeled_df.filter(F.col("id") % 8 == k) for k in range(8)]
        result = exp.run_batches(batches, label_col="is_bad", columns=["value"])
        assert result.metadata.get("early_stopped") is True
        assert result.total_samples < 400  # stopped before all 8 batches

    def test_custom_validator(self, labeled_df):
        config = _config()
        exp = ABExperiment(config)
        exp.set_validator(
            "strict",
            lambda df, thresholds: {"violation_rate": 0.123, "recall": 0.5},
        )
        result = exp.run(labeled_df, label_col="is_bad", columns=["value"])
        tm = result.treatment_metrics["strict"]
        assert tm[MetricType.VIOLATION_RATE].value == pytest.approx(0.123)

    def test_guardrails(self, labeled_df):
        config = _config(
            guardrail_metrics=[(MetricType.FLAGGED_ROW_RATE, "<", 0.05)]
        )
        result = ABExperiment(config).run(
            labeled_df, label_col="is_bad", columns=["value"]
        )
        # strict flags 10% of rows → violates the 5% guardrail
        assert any("strict" in v for v in result.guardrail_violations)

    def test_runner_best_variant(self, labeled_df):
        runner = ExperimentRunner()
        runner.add_experiment(ABExperiment(_config()))
        results = runner.run_all(labeled_df, label_col="is_bad", columns=["value"])
        assert len(results) == 1
        best = runner.get_best_variant(MetricType.RECALL, minimize=False)
        assert best is not None and best[1] == "strict"


class TestAssignment:
    def test_deterministic_and_complete(self, spark):
        df = spark.range(1000)
        variants = [
            ThresholdVariant(name="a", weight=0.5),
            ThresholdVariant(name="b", weight=0.5),
        ]
        out1 = assign_variants(df, variants, "id", seed=7)
        out2 = assign_variants(df, variants, "id", seed=7)
        assert out1.filter(F.col("variant").isNull()).count() == 0
        # sticky: identical assignment across calls
        assert (
            out1.join(out2.withColumnRenamed("variant", "v2"), "id")
            .filter(F.col("variant") != F.col("v2"))
            .count()
            == 0
        )
        counts = {
            r["variant"]: r["count"]
            for r in out1.groupBy("variant").count().collect()
        }
        assert set(counts) == {"a", "b"}
        assert abs(counts["a"] - counts["b"]) < 200  # roughly balanced

    def test_weighted_allocation(self, spark):
        df = spark.range(4000)
        variants = [
            ThresholdVariant(name="a", weight=0.9),
            ThresholdVariant(name="b", weight=0.1),
        ]
        out = assign_variants(df, variants, "id", strategy="weighted", seed=3)
        counts = {
            r["variant"]: r["count"]
            for r in out.groupBy("variant").count().collect()
        }
        assert counts["a"] > counts.get("b", 0) * 4

    def test_unknown_strategy_raises(self, spark):
        with pytest.raises(ValueError):
            assign_variants(
                spark.range(1), [ThresholdVariant(name="a")], "id", strategy="x"
            )


class TestStatistics:
    def test_p_value_symmetric_and_bounded(self):
        p = StatisticalAnalyzer._p_value(0.5, 0.5, 0.1, 0.1, 100, 100)
        assert p == pytest.approx(1.0)
        p2 = StatisticalAnalyzer._p_value(0.1, 0.9, 0.1, 0.1, 500, 500)
        assert p2 < 1e-6
        assert StatisticalAnalyzer._p_value(0.1, 0.9, 0.1, 0.1, 0, 100) == 1.0

    def test_proportion_fallback_when_std_zero(self):
        # both std 0 → pooled Bernoulli variance path
        p = StatisticalAnalyzer._p_value(0.10, 0.30, 0.0, 0.0, 400, 400)
        assert 0.0 < p < 0.05

    def test_sample_size_monotone_in_effect(self):
        n_small = calculate_sample_size(0.1, 0.5)
        n_large = calculate_sample_size(0.1, 0.05)
        assert n_large > n_small >= 100

    def test_is_significant(self):
        assert is_significant(0.1, 0.9, 1000, 1000)
        assert not is_significant(0.5, 0.5, 10, 10)

    def test_power_bounds(self):
        assert 0.0 <= StatisticalAnalyzer._power(0.8, 100, 100, 0.05) <= 1.0
        assert StatisticalAnalyzer._power(0.0, 0, 10, 0.05) == 0.0


class TestTracking:
    def test_file_store_round_trip(self, tmp_path):
        store = FileExperimentStore(str(tmp_path / "exp"))
        tracker = ExperimentTracker(store)
        config = _config()
        tracker.register(config, "exp1")
        tracker.update_status("exp1", ExperimentStatus.RUNNING)
        data = tracker.get_experiment("exp1")
        assert data["status"] == "running"
        assert data["config"]["name"] == "max_value_tuning"
        assert "exp1" in store.list_experiments()
        assert tracker.delete_experiment("exp1")
        assert tracker.get_experiment("exp1") is None

    def test_result_persistence_and_summary(self, labeled_df, tmp_path):
        store = FileExperimentStore(str(tmp_path / "exp"))
        tracker = ExperimentTracker(store)
        config = _config()
        exp = ABExperiment(config)
        tracker.register(config, exp.experiment_id)
        result = exp.run(labeled_df, label_col="is_bad", columns=["value"])
        tracker.save_result(result)
        loaded = tracker.get_result(exp.experiment_id)
        assert loaded["winner"] == "strict"
        summary = tracker.get_summary()
        assert summary["total_experiments"] == 1
        assert summary["winner_counts"] == {"strict": 1}

    def test_memory_store(self):
        store = MemoryExperimentStore()
        store.save_experiment("a", {"x": 1})
        assert store.load_experiment("a") == {"x": 1}
        assert store.list_experiments() == ["a"]
        store.clear()
        assert store.list_experiments() == []

    def test_path_traversal_guard(self, tmp_path):
        store = FileExperimentStore(str(tmp_path / "exp"))
        store.save_experiment("../evil", {"x": 1})
        # sanitized inside the store dir, nothing written outside
        assert not (tmp_path / "evil.json").exists()


def test_config_requires_control():
    with pytest.raises(ValueError):
        ABExperiment(ExperimentConfig(name="x"))


def test_to_dict_round_trips(labeled_df):
    result = ABExperiment(_config()).run(
        labeled_df, label_col="is_bad", columns=["value"]
    )
    d = result.to_dict()
    assert d["winner"] == "strict"
    assert d["primary_analysis"]["metric_type"] == "recall"
    assert isinstance(d["control_metrics"]["recall"]["value"], float)
    # json-serializable end to end
    import json

    json.dumps(d)


class TestReviewFixes:
    """Round-10 review findings (code-review pass): multi-treatment
    winner, run() reuse, custom-metric visibility, CI/test agreement,
    disabled-null-gate emission."""

    def test_multi_treatment_winner_is_best_not_first(self, labeled_df):
        control = ThresholdVariant(
            name="loose",
            variant_type=VariantType.CONTROL,
            thresholds={"value": {"max_value": 200.0}},  # recall 0
        )
        mediocre = ThresholdVariant(
            name="mediocre", thresholds={"value": {"max_value": 94.5}}
        )  # flags values 95..99 -> recall 0.5
        best = ThresholdVariant(
            name="best", thresholds={"value": {"max_value": 89.5}}
        )  # flags 90..99 -> recall 1.0
        config = ExperimentConfig(
            name="multi",
            control=control,
            treatments=[mediocre, best],  # mediocre FIRST
            primary_metric=MetricType.RECALL,
            minimum_sample_size=50,
        )
        exp = ABExperiment(config)
        batches = [labeled_df.filter(F.col("id") % 4 == k) for k in range(4)]
        result = exp.run_batches(batches, label_col="is_bad", columns=["value"])
        assert result.winner == "best"
        assert result.primary_analysis.treatment_name == "best"
        # the runner-up's analysis is still reported
        assert any(
            a.treatment_name == "mediocre" for a in result.secondary_analyses
        )

    def test_repeated_run_does_not_accumulate(self, labeled_df):
        exp = ABExperiment(_config())
        r1 = exp.run(labeled_df, label_col="is_bad", columns=["value"])
        r2 = exp.run(labeled_df, label_col="is_bad", columns=["value"])
        assert r1.total_samples == r2.total_samples == 400
        m1 = r1.treatment_metrics["strict"][MetricType.RECALL]
        m2 = r2.treatment_metrics["strict"][MetricType.RECALL]
        assert m1.sample_size == m2.sample_size == 400

    def test_custom_validator_unknown_metrics_surface(self, labeled_df):
        exp = ABExperiment(_config())
        exp.set_validator(
            "strict", lambda df, th: {"my_quality": 0.9, "recall": 0.5}
        )
        result = exp.run(labeled_df, label_col="is_bad", columns=["value"])
        assert result.metadata["custom_metrics"]["strict"][
            "my_quality"
        ] == pytest.approx(0.9)

    def test_ci_agrees_with_significance(self):
        from truthound_spark.profiler.ab_testing import MetricResult

        analyzer = StatisticalAnalyzer(ExperimentConfig(name="x"))
        # the case from the review: diff=0.006, std=0.1, n=1000/1000 —
        # z=1.34 is NOT significant and the CI must include 0
        c = MetricResult(MetricType.RECALL, "c", 0.500, 1000, std_dev=0.1)
        t = MetricResult(MetricType.RECALL, "t", 0.506, 1000, std_dev=0.1)
        a = analyzer._analyze_metric(c, t, MetricType.RECALL)
        assert not a.is_significant
        assert a.confidence_interval[0] < 0 < a.confidence_interval[1]
        # and a clearly significant diff excludes 0
        t2 = MetricResult(MetricType.RECALL, "t", 0.60, 1000, std_dev=0.1)
        a2 = analyzer._analyze_metric(c, t2, MetricType.RECALL)
        assert a2.is_significant
        assert a2.confidence_interval[0] > 0

    def test_far_tail_p_value_not_zero(self):
        # z = 0.012/0.001 = 12: the old 2*(1-erf-form-cdf) rounds to 0.0
        # past z≈8.2; erfc keeps ~1e-33 here (and stays nonzero to z≈37)
        p = StatisticalAnalyzer._p_value(0.0, 0.012, 0.1, 0.1, 20000, 20000)
        assert 0.0 < p < 1e-30

    def test_disabled_null_gate_emits_no_aggregate(self):
        from truthound_spark.profiler.ab_testing import _variant_exprs

        v = ThresholdVariant(
            name="v",
            thresholds={"c": {"null_threshold": None, "min_value": 0.0}},
        )
        exprs, _ = _variant_exprs(v, 0, ["c"], {"c"}, None)
        names = [e.__str__() for e in exprs]
        assert not any("v0_null_c" in n for n in names)
        assert any("v0_min_c" in n for n in names)


class TestRound11AdviceFixes:
    """The five ADVICE r10 items: exact z, recorded runner failures,
    collision-free file store, duplicate-variant guard, lazy import."""

    def test_z_for_is_exact_inverse_of_the_p_value(self):
        from truthound_spark.profiler.ab_testing import _normal_tail, _z_for

        # erfc(z/sqrt(2)) == alpha to float rounding, at ANY level —
        # including ones outside the old {0.90, 0.95, 0.99} table
        for conf in (0.80, 0.90, 0.95, 0.98, 0.99, 0.995):
            z = _z_for(conf)
            assert abs(_normal_tail(z) - (1 - conf)) < 1e-12, conf
        # table levels still land on the textbook values
        assert abs(_z_for(0.95) - 1.959964) < 1e-5
        assert abs(_z_for(0.99) - 2.575829) < 1e-5
        with pytest.raises(ValueError):
            _z_for(1.0)
        with pytest.raises(ValueError):
            _z_for(0.0)

    def test_ci_significance_invariant_at_nontable_level(self):
        # the ADVICE counterexample: confidence 0.98, observed z ≈ 2.2 —
        # p ≈ 0.028 > alpha = 0.02 so NOT significant; under the old
        # 1.96 fallback the CI excluded 0 anyway, breaking the invariant
        from truthound_spark.profiler.ab_testing import MetricResult

        analyzer = StatisticalAnalyzer(
            ExperimentConfig(name="x", confidence_level=0.98)
        )
        # se = sqrt(2*0.1^2/1000) ≈ 0.004472; diff = 0.00985 → z ≈ 2.203
        c = MetricResult(MetricType.RECALL, "c", 0.500, 1000, std_dev=0.1)
        t = MetricResult(MetricType.RECALL, "t", 0.50985, 1000, std_dev=0.1)
        a = analyzer._analyze_metric(c, t, MetricType.RECALL)
        assert not a.is_significant
        assert a.confidence_interval[0] < 0 < a.confidence_interval[1]
        # nudge past the exact 0.98 critical z (≈2.3263): significant AND
        # the CI excludes 0 — the two boundaries move together
        t2 = MetricResult(MetricType.RECALL, "t", 0.5105, 1000, std_dev=0.1)
        a2 = analyzer._analyze_metric(c, t2, MetricType.RECALL)
        assert a2.is_significant
        assert a2.confidence_interval[0] > 0

    def test_runner_records_failures(self, labeled_df):
        runner = ExperimentRunner()
        ok = ABExperiment(_config())
        # two variants sharing one name crash in run_fused_variants —
        # a deterministic failure the runner must RECORD, not swallow
        bad = ABExperiment(
            ExperimentConfig(
                name="crashes",
                control=ThresholdVariant(
                    name="same",
                    variant_type=VariantType.CONTROL,
                    thresholds={"value": {"max_value": 200.0}},
                ),
                treatments=[
                    ThresholdVariant(
                        name="same",
                        thresholds={"value": {"max_value": 89.5}},
                    )
                ],
                minimum_sample_size=50,
            )
        )
        runner.add_experiment(ok)
        runner.add_experiment(bad)
        results = runner.run_all(labeled_df, label_col="is_bad")
        assert len(results) == 1
        assert len(runner.errors) == 1
        exp_id, msg = runner.errors[0]
        assert exp_id == bad.experiment_id
        assert msg  # non-empty diagnostic

    def test_file_store_distinct_ids_never_collide(self, tmp_path):
        store = FileExperimentStore(str(tmp_path))
        store.save_experiment("a/b", {"v": 1})
        store.save_experiment("ab", {"v": 2})
        assert store.load_experiment("a/b") == {"v": 1}
        assert store.load_experiment("ab") == {"v": 2}
        # an id that sanitizes to empty still gets a real, loadable file
        store.save_experiment("///", {"v": 3})
        assert store.load_experiment("///") == {"v": 3}
        assert len(store.list_experiments()) == 3

    def test_duplicate_variant_names_rejected(self, labeled_df):
        v = ThresholdVariant(name="same", thresholds={"value": {"max_value": 1.0}})
        w = ThresholdVariant(name="same", thresholds={"value": {"max_value": 2.0}})
        with pytest.raises(ValueError, match="duplicate variant names"):
            run_fused_variants(labeled_df, [v, w])

    def test_profiler_import_is_actually_lazy(self):
        import subprocess
        import sys

        code = (
            "import sys; import truthound_spark.profiler; "
            "assert 'truthound_spark.profiler.ab_testing' not in sys.modules, 'eager'; "
            "from truthound_spark.profiler import ab_testing; "
            "assert hasattr(ab_testing, 'run_fused_variants')"
        )
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            cwd="/root/repo",
        )
        assert proc.returncode == 0, proc.stderr
