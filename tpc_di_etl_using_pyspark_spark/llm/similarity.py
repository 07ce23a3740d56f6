"""Embedding similarity search: brute-force cosine top-k (baseline) and
an IVF-style bucketed variant (scale path). Expression-only dot
products (``zip_with`` + ``aggregate`` — stays in codegen, no Python).

Scale posture: brute-force vs a single query vector is a narrow map +
top-k (fine at any scale with hierarchical top-k); pairwise kNN joins
MUST be blocked (label / IVF cell) to bound the quadratic join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(arr) -> Column:
    c = arr if isinstance(arr, Column) else F.col(arr)
    return F.transform(c, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    a = a if isinstance(a, Column) else F.col(a)
    b = b if isinstance(b, Column) else F.col(b)
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def l2_norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    # NULLIF guard: a zero-norm vector must yield NULL similarity, not
    # an ANSI DIVIDE_BY_ZERO that kills the stage (round-4 adversarial
    # probe; every oracle mirrors the same NULLIF).
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


def query_vector(dim: int = 64) -> list[float]:
    """Deterministic rational-valued query vector (exact in binary-ish,
    reproducible in SQL: ((d*37) % 19 - 9) / 9)."""
    return [((d * 37) % 19 - 9) / 9 for d in range(dim)]


def ivf_centroids(n_cells: int = 8, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-centroids: ((c*7 + d*13) % 11 - 5) / 5."""
    return [[((c * 7 + d * 13) % 11 - 5) / 5 for d in range(dim)] for c in range(n_cells)]


def brute_force_topk(
    df: DataFrame, qvec: list[float], k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Global top-k by cosine vs a fixed query vector.

    The ranking value is rounded to 6 decimals (cross-engine float
    safety) with the id as tiebreak. At cluster scale Spark computes
    this as per-partition top-k then a single-reducer merge (sort +
    limit → TakeOrderedAndProject), so no global shuffle of the data.
    """
    q = F.array(*[F.lit(x) for x in qvec])
    cos = cosine(as_double(vec_col), q)
    scored = df.select(
        F.col(id_col),
        F.round(cos.cast("decimal(25,6)"), 6).cast("double").alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def knn_join_blocked(
    df: DataFrame,
    block_col: str = "label",
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k nearest neighbors per vector within its block (equi-join on the
    block key bounds the pair count; the block is the unit of scale)."""
    from pyspark.sql import Window

    a = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_a"),
        as_double(vec_col).alias("va"),
    )
    b = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_b"),
        as_double(vec_col).alias("vb"),
    )
    pairs = a.join(b, "blk").filter(F.col("id_a") != F.col("id_b"))
    scored = pairs.select(
        "blk",
        "id_a",
        "id_b",
        F.round(cosine(F.col("va"), F.col("vb")).cast("decimal(25,6)"), 6)
        .cast("double")
        .alias("cos_sim"),
    )
    w = Window.partitionBy("id_a").orderBy(F.col("cos_sim").desc(), F.col("id_b"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def ivf_topk(
    df: DataFrame,
    qvec: list[float],
    k: int = 10,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest pseudo-centroid
    (build side); probe only the query's nearest cell(s).

    At scale the cell assignment is a narrow map; the probe reads one
    cell's partition (partition pruning if the index is written
    partitioned by cell). Recall < 1 by construction — tested against
    brute force in tests/test_llm.py, rows-only for the driver.
    """
    cents = ivf_centroids(n_cells, len(qvec))
    cent_arr = F.array(*[F.array(*[F.lit(x) for x in c]) for c in cents])
    v = as_double(vec_col)

    # cell = argmax_c dot(v, centroid_c): fold over cell indices.
    def best_cell(vec):
        idx = F.sequence(F.lit(0), F.lit(n_cells - 1))
        return F.aggregate(
            idx,
            F.struct(F.lit(-1).alias("cell"), F.lit(float("-inf")).alias("score")),
            lambda acc, i: F.when(
                dot(F.element_at(cent_arr, i + 1), vec) > acc["score"],
                F.struct(
                    i.cast("int").alias("cell"),
                    dot(F.element_at(cent_arr, i + 1), vec).alias("score"),
                ),
            ).otherwise(acc),
        )["cell"]

    assigned = df.select(F.col(id_col), v.alias("v"), best_cell(v).alias("cell"))
    qcell = max(range(n_cells), key=lambda c: sum(x * y for x, y in zip(cents[c], qvec)))
    q = F.array(*[F.lit(x) for x in qvec])
    probe = assigned.filter(F.col("cell") == qcell)
    scored = probe.select(
        F.col(id_col),
        F.col("cell"),
        F.round(cosine(F.col("v"), q).cast("decimal(25,6)"), 6).cast("double").alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def ivf_multiprobe_topk(
    df: DataFrame,
    qvec: list[float],
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN probing the query's ``n_probe`` nearest cells — the
    standard recall/cost knob (n_probe=1 ≡ ivf_topk; n_probe=n_cells ≡
    brute force). The probe-cell list is driver-side constant folding
    of the deterministic centroids against the fixed query vector, so
    the filter is still a static IN over the cell column — partition
    pruning applies when the index is laid out cell-partitioned."""
    cents = ivf_centroids(n_cells, len(qvec))
    v = as_double(vec_col)
    cent_arr = F.array(*[F.array(*[F.lit(x) for x in c]) for c in cents])

    def best_cell(vec):
        idx = F.sequence(F.lit(0), F.lit(n_cells - 1))
        return F.aggregate(
            idx,
            F.struct(F.lit(-1).alias("cell"), F.lit(float("-inf")).alias("score")),
            lambda acc, i: F.when(
                dot(F.element_at(cent_arr, i + 1), vec) > acc["score"],
                F.struct(
                    i.cast("int").alias("cell"),
                    dot(F.element_at(cent_arr, i + 1), vec).alias("score"),
                ),
            ).otherwise(acc),
        )["cell"]

    qcells = sorted(
        range(n_cells),
        key=lambda c: (-sum(x * y for x, y in zip(cents[c], qvec)), c),
    )[:n_probe]
    q = F.array(*[F.lit(x) for x in qvec])
    assigned = df.select(F.col(id_col), v.alias("v"), best_cell(v).alias("cell"))
    probe = assigned.filter(F.col("cell").isin(qcells))
    scored = probe.select(
        F.col(id_col),
        F.col("cell"),
        F.round(cosine(F.col("v"), q).cast("decimal(25,6)"), 6).cast("double").alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)
