"""Distributed linear algebra over embedding columns: Gram matrix + PCA.

The MLlib architecture (RowMatrix.computePrincipalComponents): the only
corpus-scale work is accumulating the d×d Gram matrix XᵀX — every Arrow
batch contributes a local numpy ``X.T @ X`` partial, partials sum by
(i, j) cell, and the eigensolve runs on the resulting d×d table (tiny,
driver-side — the same "small metadata to the driver" contract as the IVF
centroid collect). d is the embedding width (64 here); nothing dependent
on the row count ever leaves the executors.

Determinism: per-batch float partials are not associative, so the partials
quantize to DECIMAL(28,9) BEFORE the cross-partition sum — bounded inputs
(|x|≤~10, batches ≤10k rows) keep the per-batch float error ≪ the quantum,
and the decimal sum is partition-order-exact. The oracle replays the trace
(Σ‖v‖²) through the same decimal path and asserts the eigenpair invariants
(residual, bounds) the Spark side certifies.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def complete_cases(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Rows with a usable vector: non-NULL and no NULL elements.

    The whole family (Gram, PCA, Mahalanobis) uses COMPLETE-CASE
    semantics — a NULL vector would crash the numpy batch conversion and
    a NULL element would silently poison every Gram cell it touches with
    NaN, so incomplete rows are excluded up front, and every count/mean
    in the family is taken over the SAME filtered set (a sum that skips
    NULLs divided by a count that doesn't would bias the mean low)."""
    return emb.filter(
        F.col(vec_col).isNotNull()
        & ~F.exists(F.col(vec_col), lambda x: x.isNull())
    )


def gram_matrix(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    as_decimal: bool = False,
) -> DataFrame:
    """(i, j, v): the upper triangle of XᵀX, decimal-exact.

    One mapInPandas pass (numpy matmul per Arrow batch → d·(d+1)/2 partial
    cells) + one sum by cell. Batch-local accumulation is float64; the
    cross-batch sum is decimal, so the result is independent of
    partitioning and execution order. Incomplete rows (NULL vector or
    NULL element) are excluded — see ``complete_cases``.
    """
    emb = complete_cases(emb, vec_col)
    iu = np.triu_indices(dim)

    def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            g = x.T @ x
            yield pd.DataFrame(
                {
                    "i": iu[0].astype("int32"),
                    "j": iu[1].astype("int32"),
                    "v": g[iu],
                }
            )

    partials = emb.select(vec_col).mapInPandas(
        _partials, "i int, j int, v double"
    )
    summed = partials.groupBy("i", "j").agg(
        F.sum(F.col("v").cast("decimal(28,9)")).alias("v")
    )
    if as_decimal:
        return summed  # exact cells — the mergeable form (streaming folds)
    return summed.withColumn("v", F.col("v").cast("double"))


def pca_top_component(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    iterations: int = 1000,
) -> tuple[np.ndarray, float, dict]:
    """Top principal direction of the (uncentered) Gram matrix by power
    iteration on the collected d×d table.

    A d×d matvec costs microseconds, so the default iteration budget is
    generous — random-ish spectra have clustered top eigenvalues and the
    convergence rate is (λ₂/λ₁)ᵏ (measured here: residual 8e-3 at 50
    iterations, 5e-10 at 1000).

    Returns (eigenvector, eigenvalue, info) where info carries the
    certificates a caller (or the oracle-gated query) checks:
    ``trace`` (decimal-exact, oracle-replayable), ``residual`` =
    ‖Gv − λv‖ / λ, and ``n_vectors``.
    """
    cells = gram_matrix(emb, vec_col, dim).collect()  # d(d+1)/2 rows — tiny
    g = np.zeros((dim, dim))
    for r in cells:
        g[r.i, r.j] = r.v
        g[r.j, r.i] = r.v
    n_vectors = complete_cases(emb, vec_col).count()
    v = np.ones(dim) / np.sqrt(dim)  # deterministic start
    lam = 0.0
    for _ in range(iterations):
        w = g @ v
        lam = float(np.linalg.norm(w))
        if lam == 0.0:
            break  # zero Gram (empty/all-zero input): v is a unit vector
            # in the null space — a valid eigenvector with eigenvalue 0
        v = w / lam
    residual = (
        float(np.linalg.norm(g @ v - lam * v) / lam) if lam else 0.0
    )
    return v, lam, {
        "trace": float(np.trace(g)),
        "residual": residual,
        "n_vectors": int(n_vectors),
    }


def project_embeddings(
    emb: DataFrame,
    components: "np.ndarray",
    vec_col: str = "embedding",
    out_col: str = "projected",
) -> DataFrame:
    """Project vectors onto ``components`` (a k×d numpy matrix — e.g. the
    top-k principal directions from repeated deflated
    ``pca_top_component`` runs, or any fixed basis): the dimensionality
    reduction that turns a 64-dim ANN problem into a k-dim one.

    The matrix enters the plan as LITERALS (k·d constants — a few KB),
    and each output coordinate is a JVM-side zip_with/aggregate fold —
    whole-stage codegen, no Python in the row path, no join. Appends
    ``out_col`` (array<double>, length k).
    """
    comps = [
        F.array(*[F.lit(float(x)) for x in row]) for row in components
    ]

    def dot(c):
        return F.aggregate(
            F.zip_with(F.col(vec_col), c, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return emb.withColumn(out_col, F.array(*[dot(c) for c in comps]))


def mean_vector(
    emb: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> "np.ndarray":
    """Per-dimension mean as a numpy vector: one posexplode aggregation
    (decimal-exact sums), collected as d rows. Complete cases only, so
    the per-dimension sum and the row count cover the same rows."""
    long = complete_cases(emb, vec_col).select(
        F.posexplode(vec_col).alias("pos", "val")
    )
    rows = (
        long.groupBy("pos")
        .agg(
            (
                F.sum(F.col("val").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        .collect()
    )
    mu = np.zeros(dim)
    for r in rows:
        mu[r.pos] = r.m
    return mu


def pca_components(
    emb: DataFrame,
    k: int,
    vec_col: str = "embedding",
    dim: int = 64,
    center: bool = True,
    iterations: int = 1000,
) -> tuple["np.ndarray", "np.ndarray", dict]:
    """Top-k principal components by power iteration with deflation.

    ``center=True`` computes TRUE PCA (eigenvectors of the covariance):
    the centering never rescans the data — the uncentered Gram gets the
    rank-1 update ``G − n·μμᵀ`` on the driver-side d×d matrix, with μ from
    one aggregation. Deflation subtracts ``λ·vvᵀ`` after each extracted
    component; vectors re-orthogonalize against prior components every
    iteration, so clustered eigenvalues don't bleed between components.

    Returns (components k×d, eigenvalues k, info) with
    ``explained_ratio`` = Σλ / trace.
    """
    cells = gram_matrix(emb, vec_col, dim).collect()
    g = np.zeros((dim, dim))
    for r in cells:
        g[r.i, r.j] = r.v
        g[r.j, r.i] = r.v
    n = complete_cases(emb, vec_col).count()
    if center:
        mu = mean_vector(emb, vec_col, dim)
        g = g - n * np.outer(mu, mu)
    trace = float(np.trace(g))
    # numerical rank tolerance: below this, ||Gv|| is deflation/rounding
    # noise whose DIRECTION is garbage (it can land parallel to an
    # extracted component) — stop iterating and keep the orthonormal
    # pre-iteration vector as an eigenvalue-0 component instead
    tol = 1e-12 * max(abs(trace), 1.0)
    comps, lams = [], []
    for _ in range(k):
        v = np.ones(dim) / np.sqrt(dim)
        for c in comps:  # start orthogonal to what's already extracted
            v -= (v @ c) * c
        nv = float(np.linalg.norm(v))
        if nv < 1e-9:  # start vector lies in span(comps): pick any
            v = np.zeros(dim)  # orthonormal completion deterministically
            v[len(comps) % dim] = 1.0
            for c in comps:
                v -= (v @ c) * c
            nv = float(np.linalg.norm(v))
        v /= nv
        lam = 0.0
        for _ in range(iterations):
            w = g @ v
            for c in comps:
                w -= (w @ c) * c
            lam = float(np.linalg.norm(w))
            if lam <= tol:
                lam = 0.0  # rank exhausted: keep v — orthonormal to
                break  # prior comps and in the numerical null space
            v = w / lam
        comps.append(v)
        lams.append(lam)
        g = g - lam * np.outer(v, v)
    comps_a, lams_a = np.array(comps), np.array(lams)
    return comps_a, lams_a, {
        "trace": trace,
        "n_vectors": int(n),
        "explained_ratio": float(lams_a.sum() / trace) if trace else 0.0,
    }


def mahalanobis_scores(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    ridge: float = 1e-9,
) -> DataFrame:
    """Squared Mahalanobis distance of every vector from the corpus
    distribution — the MULTIVARIATE outlier score (catches off-manifold
    points whose per-coordinate z-scores all look normal, because it
    whitens by the full covariance).

    Composition of the family's pieces: covariance from the Gram + rank-1
    centering (one data pass), inverse square root on the driver-side d×d
    (eigh; ``ridge`` regularizes near-singular directions), then
    ``m² = ‖W(x−μ)‖²`` where the whitening rows enter the plan as
    literals — the same JVM-side fold as ``project_embeddings``, so the
    scoring pass has no Python in the row path. Two data passes total.
    """
    emb = complete_cases(emb, vec_col)  # incomplete rows can't be scored
    cells = gram_matrix(emb, vec_col, dim).collect()
    g = np.zeros((dim, dim))
    for r in cells:
        g[r.i, r.j] = r.v
        g[r.j, r.i] = r.v
    n = emb.count()
    mu = mean_vector(emb, vec_col, dim)
    cov = (g - n * np.outer(mu, mu)) / max(n - 1, 1)
    w_eig, v_eig = np.linalg.eigh(cov)
    w_eig = np.maximum(w_eig, ridge)
    whiten = (v_eig / np.sqrt(w_eig)) @ v_eig.T  # Cov^{-1/2}, symmetric
    centered = emb.withColumn(
        "__c",
        F.zip_with(
            F.col(vec_col),
            F.array(*[F.lit(float(m)) for m in mu]),
            lambda a, b: a.cast("double") - b,
        ),
    )
    projected = project_embeddings(centered, whiten, vec_col="__c", out_col="__w")
    m2 = F.aggregate(
        F.transform(F.col("__w"), lambda x: x * x),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return projected.withColumn("m2", m2).drop("__c", "__w", vec_col)
