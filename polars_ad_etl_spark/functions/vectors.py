"""Vector expression builders for embedding columns (``array<float>``).

All math runs JVM-side on doubles via higher-order functions — no Python in
the row path. Elements are cast float->double *before* multiplying so Spark
and the DuckDB oracle (which casts ``FLOAT[] -> DOUBLE[]``) compute the same
products; remaining summation-order error is absorbed by rounding scores to 4
decimals at the query layer.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double dot product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplane_signs(plane: int, dim: int) -> list[int]:
    """Deterministic pseudo-random +-1 hyperplane for sign-LSH, derived from
    md5 so the identical constants can be embedded in oracle SQL. Data-
    independent — computed once on the driver, shipped as a literal array."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"{plane}_{d}".encode()).hexdigest()
        out.append(1 if int(h[:8], 16) % 2 == 0 else -1)
    return out


def signed_projection(emb: Column, signs: list[int]) -> Column:
    """dot(embedding, +-1 plane) via element flip + sum — the sign pattern is
    a codegen'd literal array, so this is pure JVM arithmetic."""
    lit_signs = F.array(*[F.lit(float(s)) for s in signs])
    return dot(emb, lit_signs)
