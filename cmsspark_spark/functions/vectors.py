"""Vector math over ``array<float>`` embedding columns.

Built on ``zip_with``/``aggregate`` higher-order functions so the dot
product, norms and cosine similarity run inside Catalyst (no Python
boundary) — the baseline path for similarity search over embeddings
(SURVEY §7.2 M8). Computation is promoted to double for stable parity
with the DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _dbl(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(_dbl(_c(a)), _dbl(_c(b)), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(_dbl(_c(a)), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
