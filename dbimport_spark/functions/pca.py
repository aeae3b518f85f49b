"""Distributed PCA over an embedding column.

Dimensionality reduction is the embedding-side sibling of the ANN/SemDeDup
family: compress vectors before clustering / similarity search, or audit
how much of the corpus's variance a k-dim projection keeps. The classic
two-job shape used here is how every distributed PCA works at scale
(Spark MLlib's RowMatrix.computePrincipalComponents does the same moment
aggregation):

1. ONE pass over the data computes the sufficient statistics
   ``(n, Σv, Σ v vᵀ)`` as per-partition numpy partials (mapInPandas —
   Arrow-batched, no Python row loop), combined on the driver. The
   statistics are d×d ≈ 64×64 floats — KBs, independent of corpus size.
2. The tiny d×d eigenproblem is solved on the driver (numpy ``eigh``;
   deterministic for a fixed input, sign-fixed so components are unique),
   and the top-k component matrix is BROADCAST back for a map-only
   distributed projection.

Nothing shuffles: pass 1 is a scan + tiny collect, pass 2 is a scan with
a broadcast matmul. At 100 TB both passes stay embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def covariance_stats(df: DataFrame, vec_col: str, dim: int):
    """One distributed pass → (n, mean[d], cov[d,d]) on the driver.

    Per-partition partials are (count, Σv, Σ v vᵀ) — the mergeable
    sufficient statistics of the Gaussian moment estimate; the driver
    combine is exact float addition over ~num_partitions tiny arrays,
    summed in sorted partition order for run-to-run stability."""
    import pandas as pd

    def partials(iterator):
        n = 0
        s = np.zeros(dim)
        ss = np.zeros((dim, dim))
        for pdf in iterator:
            m = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if len(m):
                n += m.shape[0]
                s += m.sum(axis=0)
                ss += m.T @ m
        yield pd.DataFrame(
            {
                "n": [n],
                "s": [s.tolist()],
                "ss": [ss.reshape(-1).tolist()],
            }
        )

    rows = (
        df.select(F.col(vec_col).alias(vec_col))
        .mapInPandas(partials, f"n long, s array<double>, ss array<double>")
        .collect()
    )
    rows = sorted(rows, key=lambda r: (r["n"], r["s"][:4]))
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.asarray(r["ss"]).reshape(dim, dim) for r in rows], axis=0)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    return n, mean, cov


def pca_fit(df: DataFrame, vec_col: str, dim: int, k: int):
    """Fit top-k principal components; returns (mean, components[k,d],
    explained[k], total_var) with deterministic component signs (largest
    |entry| positive)."""
    _, mean, cov = covariance_stats(df, vec_col, dim)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    for i in range(comps.shape[0]):  # sign convention → unique basis
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order], float(evals.sum())


def pca_project(df: DataFrame, vec_col: str, id_col: str, mean, comps) -> DataFrame:
    """Map-only distributed projection: z = C (v - μ). The (k×d) component
    matrix and mean ride into the task as numpy broadcast constants."""
    import pandas as pd

    mean_b = np.asarray(mean)
    comps_b = np.asarray(comps)

    def proj(iterator):
        for pdf in iterator:
            m = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            z = (m - mean_b) @ comps_b.T if len(m) else np.zeros((0, comps_b.shape[0]))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "z": [row.tolist() for row in z]}
            )

    return df.select(id_col, vec_col).mapInPandas(
        proj, f"{id_col} long, z array<double>"
    )
