"""Shared scalar statistics — ONE implementation per numeric kernel.

``z_for_confidence`` previously existed twice (``sampled.py`` and
``profiler/ab_testing.py:_z_for``, both Winitzki-start + Newton-on-erfc);
divergence there would make sampled-check CIs and A/B CIs disagree, so the
kernel lives here and both call sites import it. Pure math, no Spark.
"""

from __future__ import annotations

import math

__all__ = ["z_for_confidence"]


def z_for_confidence(confidence: float) -> float:
    """Exact two-sided normal critical value: the z with erfc(z/√2) = alpha.

    A Winitzki approximation of erfinv seeds Newton iterations on the SAME
    erfc form the p-value / interval code uses, so "is_significant" and
    "CI excludes 0" stay bit-consistent at any confidence level (a lookup
    table falling back to 1.96 — the reference's approach,
    ab_testing/analysis.py:243-247 — breaks that invariant off-table).
    Exact to double precision; pinned in tests/test_sampled.py and
    tests/test_ab_testing.py.
    """
    if not 0.0 < confidence < 1.0:
        raise ValueError(f"confidence must be in (0, 1), got {confidence}")
    alpha = 1.0 - confidence
    # Winitzki approximation of erfinv(confidence)
    x = confidence
    a = 0.147
    ln1mx2 = math.log(1.0 - x * x)
    t1 = 2.0 / (math.pi * a) + ln1mx2 / 2.0
    z = math.copysign(math.sqrt(math.sqrt(t1 * t1 - ln1mx2 / a) - t1), x)
    z *= math.sqrt(2.0)
    for _ in range(4):  # Newton on f(z) = erfc(z/√2) − alpha
        f = math.erfc(z / math.sqrt(2.0)) - alpha
        fp = -math.sqrt(2.0 / math.pi) * math.exp(-z * z / 2.0)
        step = f / fp
        z -= step
        if abs(step) < 1e-15 * max(1.0, abs(z)):
            break
    return z
