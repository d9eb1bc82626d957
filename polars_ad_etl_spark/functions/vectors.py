"""Vector expression builders for embedding columns (``array<float>``).

All math runs JVM-side on doubles via higher-order functions — no Python in
the row path. Elements are cast float->double *before* multiplying so Spark
and the DuckDB oracle (which casts ``FLOAT[] -> DOUBLE[]``) compute the same
products; remaining summation-order error is absorbed by rounding scores to 4
decimals at the query layer.

Operands may be passed as SQL expression strings (parsed with one ``F.expr``
call) or as ``Column`` objects — the Catalyst tree is identical either way.

Optimization round 12, a measured NEGATIVE result kept out of the code on
purpose: unrolling the fixed-64-dim dot product into a flat 64-term
arithmetic expression (bit-identical term order, HOF fallback behind a size
guard for non-64 rows) was prototyped and benchmarked both ways of building
it. Built term-by-term from Column ops it costs ~400 py4j round-trips per
dot (~20 s of driver chatter per similarity query); built as one SQL string
via ``F.expr`` the construction cost vanishes but the huge flat trees still
LOSE end-to-end at bench scale (Catalyst/Janino fixed cost per distinct
expression: sim_ann_recall_curve 12.5 s HOF vs 34.5 s unrolled at sf0.01;
sim_bruteforce_topk 0.559 s HOF-prenormed vs 0.807 s unrolled-prenormed at
sf0.1, best-of-5). The win that survived measurement is
:func:`cosine_prenormed`: norms computed once per VECTOR instead of once per
scored PAIR. See OPTIMIZATION_r12.md.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.expr(c) if isinstance(c, str) else c


def _dot_sql(a: str, b: str) -> str:
    """SQL text of the HOF dot product — the parser yields the exact
    Catalyst tree the Column-API construction yields (pinned bit-equal in
    tests/test_vectors_prenormed.py), but ONE py4j round-trip instead of
    ~10 per dot plus ~1 per literal array element. Construction cost is
    driver wall-time inside the bench's timed region: sim_ann_recall_curve
    alone spent 8.1 s / 21,170 py4j round-trips building its frame, 2.9 s
    of that in hyperplane literal arrays (64 F.lit calls each)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
    )


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential left-to-right double dot product."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_dot_sql(a, b))
    return F.aggregate(
        F.zip_with(_as_col(a), _as_col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    if isinstance(a, str):
        return F.expr(f"sqrt({_dot_sql(a, a)})")
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_prenormed(
    a: Column | str,
    b: Column | str,
    na: Column,
    nb: Column,
) -> Column:
    """Cosine with the two norms supplied as precomputed columns.

    ``norm(q)`` / ``norm(c)`` are per-VECTOR quantities; computing them
    inside the per-PAIR scoring projection re-evaluates each one once per
    pair (|Q| x |C| times instead of |Q| + |C| — guide §1.2, don't compute
    things you throw away). Callers compute ``na = norm(a)`` / ``nb =
    norm(b)`` once in the projection that produces each side and pass the
    columns here; the arithmetic ``dot / (na * nb)`` is the identical IEEE
    expression tree, so results are bit-equal to :func:`cosine` (pinned in
    tests/test_vectors_prenormed.py)."""
    return dot(a, b) / (na * nb)


def hyperplane_signs(plane: int, dim: int) -> list[int]:
    """Deterministic pseudo-random +-1 hyperplane for sign-LSH, derived from
    md5 so the identical constants can be embedded in oracle SQL. Data-
    independent — computed once on the driver, shipped as a literal array."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"{plane}_{d}".encode()).hexdigest()
        out.append(1 if int(h[:8], 16) % 2 == 0 else -1)
    return out


def signs_sql(signs: list[int]) -> str:
    """SQL literal text of a +-1 hyperplane array (``array(1.0D, -1.0D,
    ...)``) — one parser call instead of one py4j round-trip per element."""
    return "array(" + ", ".join(f"{float(s)!r}D" for s in signs) + ")"


def signed_projection(emb: Column | str, signs: list[int]) -> Column:
    """dot(embedding, +-1 plane) via element flip + sum — the sign pattern is
    a codegen'd literal array, so this is pure JVM arithmetic."""
    if isinstance(emb, str):
        return dot(emb, signs_sql(signs))
    lit_signs = F.array(*[F.lit(float(s)) for s in signs])
    return dot(emb, lit_signs)
