"""Reporters / SDK / checkpoint / stores / streaming-KS / dateutil tests."""

import json

from truthound_spark import api


def _result(spark):
    df = spark.createDataFrame([(1, None), (2, "x"), (2, "y")], ["id", "s"])
    return api.check(df, validators=["null", "unique"])


def test_reporters_render_all_formats(spark):
    from truthound_spark import reporters

    r = _result(spark)
    console = reporters.render(r, "console")
    assert "FAIL" in console and "null" in console
    md = reporters.render(r, "markdown")
    assert md.startswith("# Validation report")
    html = reporters.render(r, "html")
    assert "<table>" in html
    parsed = json.loads(reporters.render(r, "json"))
    assert parsed["success"] is False


def test_validator_decorator_and_builder(spark):
    from truthound_spark.core.registry import get_validator
    from truthound_spark.sdk import ValidatorBuilder, assert_validator, validator

    @validator("never_negative")
    def never_negative(col):
        """values must be >= 0"""
        return col < 0

    assert get_validator("never_negative") is never_negative
    assert_validator(spark, never_negative("x"), {"x": [1.0, -2.0, 3.0]}, 1)

    built = (
        ValidatorBuilder("age_window")
        .column("age")
        .must(lambda c: c >= 0)
        .must(lambda c: c <= 120)
        .build()
    )
    assert_validator(spark, built, {"age": [5, 200, -1, 80]}, 2)


def test_checkpoint_actions_and_stores(spark, tmp_path):
    from truthound_spark.checkpoint import (
        Checkpoint,
        SaveReportAction,
        StoreResultAction,
        WebhookAction,
    )
    from truthound_spark.stores import FilesystemStore, MemoryStore

    df = spark.createDataFrame([(1, None)], "id long, s string")
    mem = MemoryStore()
    fs = FilesystemStore(str(tmp_path / "runs"))
    sent = []
    cp = Checkpoint(
        "nightly",
        validators=["null"],
        actions=[
            StoreResultAction(mem),
            StoreResultAction(fs),
            SaveReportAction(str(tmp_path / "report.html")),
            WebhookAction(
                "https://hooks.example/x",
                payload_format="slack",
                sender=lambda url, body: sent.append((url, json.loads(body))),
            ),
        ],
    )
    result = cp.run(df)
    assert not result.success
    assert len(mem.list_runs()) == 1 and len(fs.list_runs()) == 1
    assert fs.load(fs.list_runs()[0])["success"] is False
    assert (tmp_path / "report.html").read_text().startswith("<!doctype html>")
    assert sent and "FAIL" in sent[0][1]["text"]


def test_webhook_skipped_on_success(spark):
    from truthound_spark.checkpoint import Checkpoint, WebhookAction

    df = spark.createDataFrame([(1, "a")], ["id", "s"])
    sent = []
    cp = Checkpoint(
        "ok",
        validators=["null"],
        actions=[WebhookAction("https://x", sender=lambda u, b: sent.append(b))],
    )
    result = cp.run(df)
    assert result.success and sent == []


def test_streaming_ks_validator(spark):
    from truthound_spark.drift.validators import StreamingKSValidator

    base = spark.createDataFrame([(float(i % 100),) for i in range(2000)], ["x"])
    same = spark.createDataFrame([(float(i % 100),) for i in range(2000)], ["x"])
    shifted = spark.createDataFrame([(float(i % 100) + 60,) for i in range(2000)], ["x"])
    assert StreamingKSValidator(base).validate(same) == []
    issues = StreamingKSValidator(base).validate(shifted)
    assert issues and issues[0].issue_type == "streaming_ks_drift"


def test_dateutil_parseable(spark):
    from truthound_spark.validators.datetime_checks import DateutilParseableValidator

    df = spark.createDataFrame(
        [("2024-01-02",), ("Jan 3, 2024",), ("not a date",), (None,)], ["d"]
    )
    issues = DateutilParseableValidator("d").validate(df)
    assert issues and issues[0].count == 1


def test_context_workspace(spark, tmp_path):
    from truthound_spark.context import Context, source_fingerprint
    from truthound_spark.schema import learn

    root = str(tmp_path / ".truthound")
    ctx = Context(root)
    df = spark.createDataFrame([(i, float(i)) for i in range(50)], ["id", "v"])

    # baseline resolution: miss → learn + persist → hit
    assert ctx.resolve_baseline(df) is None
    b = ctx.resolve_baseline(df, learn_if_missing=True)
    assert b is not None and b.row_count == 50
    again = ctx.resolve_baseline(df)
    assert again is not None and again.columns["v"].max_value == 49.0

    # run persistence + metric history
    r = api.check(df, validators=["null"])
    run_id = ctx.persist_run(r)
    assert ctx.run_store.load(run_id)["success"] is True
    hist = ctx.metric_history()
    assert len(hist) == 1 and hist[0]["run_id"] == run_id

    # fingerprints are schema-keyed
    df2 = spark.createDataFrame([(1, "x")], ["id", "s"])
    assert source_fingerprint(df) != source_fingerprint(df2)


def test_shared_metric_store(spark):
    from truthound_spark.core.metrics import MetricKey, SharedMetricStore

    df = spark.createDataFrame([(float(i), i % 5) for i in range(100)], ["v", "g"])
    store = SharedMetricStore(df)
    # batch of distinct metrics → ONE flush computes all of them
    keys = [
        MetricKey("row_count"),
        MetricKey("mean", "v"),
        MetricKey("n_unique", "g"),
        MetricKey("quantile", "v", 0.5),
    ]
    store.request(*keys)
    assert store.flush() == 4
    assert store.get(MetricKey("row_count")) == 100
    assert abs(store.get(MetricKey("mean", "v")) - 49.5) < 1e-9
    assert store.get(MetricKey("n_unique", "g")) == 5
    # repeated gets are memoized — nothing new to flush
    assert store.flush() == 0


def test_checkpoint_triggers(tmp_path):
    from truthound_spark.checkpoint import FileWatchTrigger, ScheduleTrigger

    trig = ScheduleTrigger(60)
    assert trig.due(now=1000.0) is True
    assert trig.due(now=1030.0) is False
    assert trig.due(now=1061.0) is True

    f = tmp_path / "watched.csv"
    watch = FileWatchTrigger(str(f))
    assert watch.due() is False
    f.write_text("a,b\n1,2\n")
    assert watch.due() is True
    assert watch.due() is False


def test_information_gain(spark):
    from truthound_spark.validators.profiling import InformationGainValidator

    # feature perfectly predicts target → IG == H(target) = ln 2
    rows = [("a", "x")] * 50 + [("b", "y")] * 50
    df = spark.createDataFrame(rows, ["feat", "tgt"])
    v = InformationGainValidator("feat", "tgt")
    import math

    assert abs(v.information_gain(df) - math.log(2)) < 1e-9
    # independent feature → IG ~ 0 → violates min_gain
    rows = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")] * 25
    df2 = spark.createDataFrame(rows, ["feat", "tgt"])
    issues = InformationGainValidator("feat", "tgt", min_gain=0.1).validate(df2)
    assert issues and issues[0].actual < 0.01
