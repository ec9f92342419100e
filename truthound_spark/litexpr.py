"""Fast construction of large numeric literal expressions.

Driver-side expression construction is a real cost at ANY scale: every
``F.lit`` / ``F.struct`` / operator call is one py4j round trip, so an
inlined codebook of k centroids × d dims costs k·d round trips — measured
~0.6-1 ms each, i.e. ~1 s per thousand literals — before Spark ever sees
the query (optimization guide §1.2 "per-task work" applies to the driver
too: the work here is building the task). Rendering the SAME literal tree
as ONE SQL string parsed JVM-side (``F.expr``) is two orders of magnitude
faster (measured 0.96 s → 0.005 s for a 1500-element double array) and
produces the IDENTICAL Catalyst ``Literal`` nodes:

* ``repr(float)`` is Python's shortest round-trip decimal form, and both
  CPython and Java's ``Double.parseDouble`` implement correctly-rounded
  parsing, so the parsed IEEE bits equal the source double — verified
  bit-exact over extremes (±inf, NaN, -0.0, 5e-324, 1.797e308, long
  mantissas) in the r14 session; pinned by tests/test_litexpr.py.
* ints render as plain INT/BIGINT literals.

Used by the codebook/plane/centroid inlining paths (PQ, sign-LSH, IVF,
k-means) whose literal counts scale with k·dim — the tiny fixed arrays
elsewhere (quantile probes, checksum tables) are not worth the extra
code path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["sql_double", "lit_double_array", "lit_struct_array"]


def sql_double(v: float) -> str:
    """Render a Python float as a Spark SQL DOUBLE literal whose parsed
    IEEE-754 bits equal ``v`` exactly (shortest round-trip repr + the
    ``D`` suffix; non-finite values via CAST, which the parser folds to
    the same Literal)."""
    v = float(v)
    if math.isinf(v):
        return "CAST('Infinity' AS DOUBLE)" if v > 0 else "CAST('-Infinity' AS DOUBLE)"
    if math.isnan(v):
        return "CAST('NaN' AS DOUBLE)"
    return repr(v) + "D"


def lit_double_array(values) -> Column:
    """``F.array(*[F.lit(float(v)) for v in values])`` — same Literal
    nodes, one py4j call instead of len(values)."""
    return F.expr("array(" + ",".join(sql_double(v) for v in values) + ")")


def lit_struct_array(rows: list[dict]) -> Column:
    """Literal ``array<struct<...>>`` from dicts of field -> rendered SQL
    fragment (caller renders each field with :func:`sql_double` / str(int)
    so the type of every field is explicit)."""
    parts = []
    for r in rows:
        fields = ",".join(f"'{k}',{v}" for k, v in r.items())
        parts.append(f"named_struct({fields})")
    return F.expr("array(" + ",".join(parts) + ")")
