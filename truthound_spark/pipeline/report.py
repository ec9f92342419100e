"""Curation-run observability: the stage funnel.

Reference surface: truthound's reporters/datadocs render VALIDATION
results; a curation pipeline additionally needs the funnel — how many
documents each stage admitted, dropped, and what survives end-to-end —
because a silent 40% drop at one stage is the most common way a
training corpus goes wrong without any check failing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def curation_funnel(stages: list[tuple[str, DataFrame]]) -> DataFrame:
    """Row-accounting funnel over ordered pipeline stages.

    ``stages`` is [(name, frame), …] in pipeline order; each frame is the
    corpus AS OF that stage (stage 0 = raw input). One ``count()`` per
    stage — each an O(1)-result aggregate over that stage's plan, the
    cheapest possible audit at any scale (no rows move to the driver).

    Returns (stage_idx, stage, rows, dropped, drop_rate, keep_rate):
    ``dropped``/``drop_rate`` are vs the PREVIOUS stage, ``keep_rate``
    is cumulative vs stage 0 — both rounded to 6dp. A negative
    ``dropped`` (stage grew — e.g. an explode snuck in) is reported
    as-is rather than clamped: it's exactly the anomaly the funnel
    exists to surface. Rates around a ZERO-count stage are NULL, not a
    fake-healthy 0.0/1.0 (review r5): growth out of an empty stage has
    no meaningful rate, and masking it would hide the very anomaly the
    signed ``dropped`` column flags."""
    if not stages:
        raise ValueError("stages must contain at least one (name, frame) pair")
    spark = stages[0][1].sparkSession
    counts = [(name, df.count()) for name, df in stages]
    base = counts[0][1]
    rows = []
    prev = None
    for i, (name, n) in enumerate(counts):
        dropped = 0 if prev is None else prev - n
        if prev is None:
            drop_rate = 0.0
        elif prev == 0:
            drop_rate = None
        else:
            drop_rate = round(dropped / prev, 6)
        keep_rate = None if base == 0 else round(n / base, 6)
        rows.append((i, name, n, dropped, drop_rate, keep_rate))
        prev = n
    return spark.createDataFrame(
        rows,
        "stage_idx int, stage string, rows long, dropped long,"
        " drop_rate double, keep_rate double",
    )
