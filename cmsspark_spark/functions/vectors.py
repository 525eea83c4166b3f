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


def sign_buckets_arrow(all_planes) -> Column:
    """Arrow fast path for sign-LSH bucketing: ONE vectorized pandas UDF
    computes every table's bucket id in a single numpy matmul per Arrow
    batch — ``bits = X @ P.T >= 0`` then a bit-pack — replacing
    ``tables × num_planes`` interpreted ``aggregate(zip_with(...))``
    trees (higher-order functions never enter whole-stage codegen, so
    the SQL form re-walks the 64-dim array per plane per row).

    ``all_planes``: list of (num_planes, dim) float arrays, one per
    table. Returns a column factory: call with the vector column name,
    yields ``array<bigint>`` of per-table bucket ids.

    Closure pickles BY VALUE (numpy arrays + ints only — no module
    globals), so executors never need cmsspark_spark importable.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    stack = np.vstack([p for p in all_planes]).astype(np.float64)  # (T*H, dim)
    tables = len(all_planes)
    planes_per = all_planes[0].shape[0]
    weights = (2 ** np.arange(planes_per, dtype=np.int64))

    def _buckets(vecs):
        import pandas as pd

        x = np.asarray(list(vecs), dtype=np.float64)  # (N, dim)
        bits = (x @ stack.T) >= 0.0  # (N, T*H)
        ids = (
            bits.reshape(len(x), tables, planes_per).astype(np.int64) @ weights
        )  # (N, T)
        return pd.Series(list(ids))

    # No type hints on purpose: `from __future__ import annotations`
    # stringifies them and PySpark's hint inference cannot resolve a
    # function-local `pd` — the explicit SCALAR eval type is equivalent.
    return pandas_udf(_buckets, "array<bigint>")


def centroid_probe_arrow(centroids, nprobe: int) -> Column:
    """Arrow fast path for IVF centroid assignment: top-``nprobe``
    centroid ids by cosine in one numpy matmul per Arrow batch (the SQL
    form builds one aggregate(zip_with) tree PER centroid). Ties break
    on centroid id DESCENDING, exactly matching the SQL form's
    ``reverse(array_sort(...))`` ordering of (score, id) structs — the
    two impls assign identical inverted lists even on exact score ties.
    Returns a column factory: call with the vector column name, yields
    ``array<int>``.

    Closure pickles by value (numpy arrays only)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cn = np.asarray(centroids, dtype=np.float64)
    cn = cn / np.maximum(np.linalg.norm(cn, axis=1, keepdims=True), 1e-12)
    k = int(nprobe)

    def _probe(vecs):
        import pandas as pd

        x = np.asarray(list(vecs), dtype=np.float64)
        scores = x @ cn.T  # (N, C); query norm is rank-invariant
        # ties → centroid id DESC (= reverse(array_sort) in the SQL
        # impl): stable-argsort the id-reversed score matrix, map back
        n_c = scores.shape[1]
        rev = np.argsort(-scores[:, ::-1], axis=1, kind="stable")
        order = (n_c - 1 - rev)[:, :k].astype(np.int32)
        return pd.Series(list(order))

    return pandas_udf(_probe, "array<int>")
