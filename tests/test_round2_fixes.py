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
