"""Regression tests for the round-2 ADVICE/VERDICT fixes."""

import pytest
from pyspark.sql import functions as F

from truthound_spark import api
from truthound_spark.core.executor import BatchExpressionExecutor
from truthound_spark.types import Severity


def test_registry_names_applied(spark):
    # the registered short name must win over the inherited Validator.name
    from truthound_spark.validators.string import EmailValidator, RegexValidator
    from truthound_spark.validators.distribution import IncreasingValidator

    assert EmailValidator.name == "email"
    assert RegexValidator.name == "regex"
    assert IncreasingValidator.name == "increasing"


def test_issue_carries_registered_validator_name(spark):
    from truthound_spark.validators.string import EmailValidator

    df = spark.createDataFrame([("nope",), ("a@b.co",)], ["email"])
    issues = EmailValidator("email").validate(df)
    assert issues and issues[0].validator_name == "email"


def test_executor_isolates_bad_spec(spark):
    """One validator referencing a missing column must not poison the suite."""
    from truthound_spark.validators.completeness import NullValidator
    from truthound_spark.validators.distribution import InSetValidator

    df = spark.createDataFrame([(1, None), (2, "x")], ["a", "b"])
    good = NullValidator(columns=["b"])
    bad = InSetValidator("no_such_column", ["x"])
    issues = BatchExpressionExecutor([good, bad]).execute(df)
    null_issues = [i for i in issues if i.issue_type == "null_values"]
    errors = [i for i in issues if i.issue_type == "execution_error"]
    assert len(null_issues) == 1 and null_issues[0].count == 1
    assert len(errors) == 1 and errors[0].severity == Severity.HIGH


def test_circular_reference_long_cycle(spark):
    """A 20-node cycle must be detected (pointer doubling: 2^k reach)."""
    from truthound_spark.validators.referential import CircularReferenceValidator

    n = 20
    rows = [(i, (i + 1) % n) for i in range(n)]
    df = spark.createDataFrame(rows, ["id", "parent_id"])
    issues = CircularReferenceValidator("id", "parent_id", max_iterations=6).validate(df)
    assert issues and issues[0].issue_type == "circular_reference"
    assert issues[0].count == n


def test_circular_reference_acyclic_converges(spark):
    from truthound_spark.validators.referential import CircularReferenceValidator

    rows = [(i, i // 2 if i else None) for i in range(16)]
    df = spark.createDataFrame(rows, ["id", "parent_id"])
    issues = CircularReferenceValidator("id", "parent_id", max_iterations=6).validate(df)
    assert issues == []


def test_simhash_max_hamming_guard(spark):
    from truthound_spark.pipeline.dedup import simhash_near_duplicates

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_duplicates(df, max_hamming=4)


def test_check_unpersists_cache(spark):
    from truthound_spark.types import ResultFormat

    df = spark.createDataFrame([(1, None), (2, "x")], ["a", "b"])

    def cached_ids():
        return {
            rdd.id()
            for rdd in spark.sparkContext._jsc.sc().getRDDStorageInfo()
            if rdd.numCachedPartitions() > 0
        }

    before = cached_ids()
    api.check(df, validators=["null"], result_format=ResultFormat.BASIC)
    # check() must not leave any NEW cached RDDs behind
    assert cached_ids() - before == set()


def test_embedding_near_dup_default_is_bucketed(spark):
    """Default plan must not contain a cartesian product."""
    from truthound_spark.pipeline.dedup import embedding_near_duplicates

    rows = [(i, [float(i), 1.0, 0.5]) for i in range(8)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    plan = embedding_near_duplicates(df, threshold=0.99)._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan
    exact_plan = (
        embedding_near_duplicates(df, threshold=0.99, exact=True)
        ._jdf.queryExecution()
        .toString()
    )
    assert "CartesianProduct" in exact_plan or "BroadcastNestedLoopJoin" in exact_plan


def test_auto_suite_handles_decimal_columns(spark):
    """Decimal min/max from learn() must not crash range synthesis."""
    from pyspark.sql import functions as F

    import truthound_spark as th
    from truthound_spark.schema import learn

    df = spark.range(50).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).cast("decimal(10,2)").alias("amount"),
    )
    baseline = learn(df)
    res = th.check(df, baseline=baseline)
    assert not res.execution_issues


def test_check_preserves_caller_cache(spark):
    from pyspark.sql import functions as F

    import truthound_spark as th

    df = spark.range(100).select(F.col("id").alias("k")).cache()
    df.count()
    th.check(df, validators=["null"], result_format="basic")
    assert df.is_cached  # caller's persistence must survive check()
    df.unpersist()


def test_minhash_rejects_bad_band_config(spark):
    import pytest

    from truthound_spark.pipeline.dedup import minhash_lsh_candidates

    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    with pytest.raises(ValueError):
        minhash_lsh_candidates(docs, num_hashes=8, bands=16)
    with pytest.raises(ValueError):
        minhash_lsh_candidates(docs, num_hashes=64, bands=12)


def test_empty_docs_do_not_form_minhash_bucket(spark):
    """Contentless documents must not become candidate pairs."""
    from truthound_spark.pipeline.dedup import minhash_dedup_pairs

    docs = spark.createDataFrame(
        [
            (1, "!!!"),
            (2, "???"),
            (3, None),
            (4, ""),
            (5, "a real document about spark joins and shuffles"),
            (6, "a real document about spark joins and shuffles"),
        ],
        "doc_id long, text string",
    )
    pairs = minhash_dedup_pairs(docs, threshold=0.7, num_hashes=16, bands=8).collect()
    pair_set = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (5, 6) in pair_set
    assert all(a not in (1, 2, 3, 4) and b not in (1, 2, 3, 4) for a, b in pair_set)


def test_vector_dim_skips_null_first_row(spark):
    from truthound_spark.pipeline.similarity import _vector_dim

    df = spark.createDataFrame(
        [(1, None), (2, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    assert _vector_dim(df, "embedding") == 3


def test_streaming_sink_idempotent_per_batch(spark):
    from truthound_spark.streaming.validate import StreamingValidationSink

    fired = []
    sink = StreamingValidationSink(["null"], on_result=lambda b, r: fired.append(b))
    df = spark.createDataFrame([(1, None)], "id int, email string")
    sink(df, 7)
    sink(df, 7)  # replay of the same batch id (failure recovery)
    assert fired == [7] and len(sink.results) == 1


def test_drift_detectors_handle_empty_sides(spark):
    from pyspark.sql import functions as F

    from truthound_spark.drift.detectors import js_divergence, ks_test, psi, wasserstein

    full = spark.range(100).select((F.col("id") % 10).cast("double").alias("v"))
    empty = full.filter(F.col("v") < -1)
    for fn in (psi, js_divergence, wasserstein):
        r = fn(empty, full, "v")
        assert r.drifted is False
    assert ks_test(empty, full, "v").drifted is False
    assert ks_test(empty, full, "v", grid=8).drifted is False


def test_cvm_deterministic_and_zero_on_identical_tied_data(spark):
    from pyspark.sql import functions as F

    from truthound_spark.drift.detectors import cramer_von_mises

    tied = spark.range(400).select((F.col("id") % 5).cast("double").alias("v"))
    stats = {cramer_von_mises(tied, tied, "v").statistic for _ in range(3)}
    assert len(stats) == 1  # deterministic under heavy ties
    assert abs(next(iter(stats))) < 0.05  # identical samples → ~no drift


def test_learn_skips_map_columns(spark):
    from pyspark.sql import functions as F

    from truthound_spark.schema import learn

    df = spark.range(20).select(
        F.col("id").alias("k"),
        F.create_map(F.lit("a"), F.col("id")).alias("m"),
    )
    s = learn(df)
    assert s.columns["m"].dtype.startswith("map<")
    assert s.columns["k"].unique


def test_chi_square_column_named_n(spark):
    from pyspark.sql import functions as F

    from truthound_spark.drift.detectors import chi_square_drift

    df = spark.range(200).select((F.col("id") % 3).cast("string").alias("n"))
    r = chi_square_drift(df, df, "n")
    assert r.statistic == 0.0 and r.drifted is False
