"""Tests for drift detectors, schema learn, profiler, PII scan/mask."""

import truthound_spark as th
from truthound_spark.drift import chi_square_drift, compare, ks_test, mean_drift, psi


def _nums(spark, values, col="v"):
    return spark.createDataFrame([(float(x),) for x in values], f"{col} double")


def test_psi_no_drift(spark):
    base = _nums(spark, range(100))
    res = psi(base, _nums(spark, range(100)), "v")
    # identical distributions → PSI ~ 0
    assert abs(res.statistic) < 1e-6
    assert not res.drifted


def test_psi_detects_shift(spark):
    base = _nums(spark, range(100))
    cur = _nums(spark, [x + 60 for x in range(100)])
    res = psi(base, cur, "v")
    assert res.drifted


def test_ks_exact_and_grid(spark):
    base = _nums(spark, range(200))
    cur = _nums(spark, [x + 100 for x in range(200)])
    exact = ks_test(base, cur, "v")
    assert exact.drifted
    assert 0.45 < exact.statistic <= 0.55  # half-shifted → D ≈ 0.5
    approx = ks_test(base, cur, "v", grid=50)
    assert approx.drifted
    assert abs(approx.statistic - exact.statistic) < 0.1


def test_chi_square(spark):
    base = spark.createDataFrame([("a",)] * 50 + [("b",)] * 50, "c string")
    same = spark.createDataFrame([("a",)] * 50 + [("b",)] * 50, "c string")
    skewed = spark.createDataFrame([("a",)] * 95 + [("b",)] * 5, "c string")
    assert not chi_square_drift(base, same, "c").drifted
    assert chi_square_drift(base, skewed, "c").drifted


def test_mean_drift_and_compare(spark):
    base = _nums(spark, range(100))
    cur = _nums(spark, [x * 2 for x in range(100)])
    assert mean_drift(base, cur, "v").drifted
    out = compare(base, cur, method="mean")
    assert out["v"].drifted


def test_learn_schema(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "a", 3.5), (None, None, None)],
        "id int, cat string, val double",
    )
    schema = th.learn(df)
    assert schema.row_count == 4
    assert schema.columns["id"].nullable
    assert schema.columns["id"].unique  # 3 distinct of 3 non-null
    assert schema.columns["cat"].allowed_values == ["a", "b"]
    assert schema.columns["val"].quantiles["q50"] == 2.5


def test_schema_roundtrip_and_validate(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], "id int, name string")
    schema = th.learn(df)
    p = str(tmp_path / "schema.json")
    schema.save(p)
    loaded = th.Schema.load(p)
    from truthound_spark.schema import validate_against

    assert validate_against(df, loaded) == []
    df2 = spark.createDataFrame([(1,)], "id int")  # missing column
    problems = validate_against(df2, loaded)
    assert problems == [{"column": "name", "problem": "missing_column", "expected": "string"}]


def test_profile(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (2, "b", 20.0)], "id int, cat string, v double"
    )
    prof = th.profile(df, with_correlations=True)
    assert prof.row_count == 3
    assert prof.duplicate_row_count == 1
    assert prof.columns["cat"].top_values[0]["value"] == "b"
    assert "id|v" in prof.correlations


def test_pii_scan_and_mask(spark):
    df = spark.createDataFrame(
        [
            ("a@example.com", "555-123-4567", "hello"),
            ("b@test.org", "555-987-6543", "world"),
        ],
        "email string, phone string, note string",
    )
    report = th.scan(df)
    types = {(f.column, f.pii_type) for f in report.findings}
    assert ("email", "email") in types
    assert not any(f.column == "note" for f in report.findings)

    masked = th.mask(df, columns=["email"], strategy="redact").collect()
    assert all(r["email"] == "***" for r in masked)
    hashed = th.mask(df, columns=["email"], strategy="hash").collect()
    assert all(len(r["email"]) == 64 for r in hashed)
    faked = th.mask(df, columns=["email"], strategy="fake").collect()
    assert all("@" in r["email"] for r in faked)
    # deterministic fake
    faked2 = th.mask(df, columns=["email"], strategy="fake").collect()
    assert [r["email"] for r in faked] == [r["email"] for r in faked2]
