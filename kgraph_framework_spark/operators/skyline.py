"""Pareto skyline (domination filter) — the reference's S8 operator.

Reference: getSkyline / dominate (/root/reference/include/commom/util.h:
40-50,64-72) — the reference keeps a (recall, time) frontier of prior
runs and discards new results dominated in both dimensions. Here it is
a general DataFrame operator: keep the rows not strictly dominated on a
set of maximize/minimize columns.

Scale shape: two-phase. Phase 1 computes a LOCAL skyline per Arrow
batch (a point dominated within any subset is dominated globally, so
batch-local filtering is a sound reduction — the classic distributed
skyline trick); phase 2 resolves the survivors (small by construction)
in one grouped-pandas pass. Both kernels are numpy; no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pareto_mask(X: np.ndarray) -> np.ndarray:
    """Boolean keep-mask: True where no other row strictly dominates.

    Dominance: >= on every objective and > on at least one (objectives
    pre-negated so 'larger is better' everywhere).
    """
    n = len(X)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        if not keep[i]:
            continue
        ge = (X >= X[i]).all(axis=1)
        gt = (X > X[i]).any(axis=1)
        dominators = ge & gt
        if dominators.any():
            keep[i] = False
        else:
            # i survives; everything i dominates can be dropped early
            le = (X <= X[i]).all(axis=1)
            lt = (X < X[i]).any(axis=1)
            keep &= ~(le & lt)
            keep[i] = True
    return keep


def _objective_matrix(pdf: pd.DataFrame, maximize, minimize) -> np.ndarray:
    cols = [pdf[c].to_numpy(np.float64) for c in maximize]
    cols += [-pdf[c].to_numpy(np.float64) for c in minimize]
    return np.column_stack(cols)


def skyline(
    df: DataFrame,
    maximize: list[str],
    minimize: list[str],
    fanin: int = 16,
    rounds: int = 2,
) -> DataFrame:
    """Rows of ``df`` not strictly dominated on the given objectives.

    Phase 2 is a TREE-REDUCE, not a single group: local survivors hash
    into ``fanin``-way groups per round (each group's skyline is again a
    sound reduction), halting at one group only for the final pass — so
    with many objectives (frontier ~O(n)) no single task ever takes the
    whole survivor set at once.
    """
    schema = df.schema

    def batch_skyline(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            yield pdf[_pareto_mask(_objective_matrix(pdf, maximize, minimize))]

    def group_skyline(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf[_pareto_mask(_objective_matrix(pdf, maximize, minimize))]

    cur = df.mapInPandas(batch_skyline, schema=schema)
    groups = fanin ** max(rounds - 1, 0)
    while True:
        cur = (
            cur.withColumn(
                "_g",
                F.pmod(F.hash(*[F.col(c) for c in maximize + minimize]),
                       F.lit(groups)) if groups > 1 else F.lit(0),
            )
            .groupBy("_g")
            .applyInPandas(
                lambda key, pdf: group_skyline(key, pdf.drop(columns=["_g"])),
                schema=schema,
            )
        )
        if groups == 1:
            return cur
        groups = max(groups // fanin, 1)


def doc_quality_skyline(docs: DataFrame) -> DataFrame:
    """Length-vs-cleanliness Pareto frontier of the documents table.

    The (recall, time) frontier of the reference's results DB
    (util.h:40-50) transposed to the corpus domain: documents for which
    no other document is simultaneously LONGER (n_tokens) and CLEANER
    (alpha_ppm — alphabetic-character ratio). Both objectives maximize,
    and they trade off in real corpora, so the frontier is
    non-degenerate. Output: (doc_id, n_tokens, alpha_ppm).
    """
    toks = F.split(F.col("text"), " ")
    # empty documents would yield null/NaN alpha_ppm, which neither
    # dominates nor is dominated (always survives) while the SQL twin's
    # division errors — exclude them identically on both sides
    docs = docs.where(F.length("text") > 0)
    m = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.floor(
            F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", ""))
            / F.length(F.col("text"))
            * 1_000_000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("alpha_ppm"),
    )
    out = skyline(m, maximize=["n_tokens", "alpha_ppm"], minimize=[])
    return out.select("doc_id", "n_tokens", "alpha_ppm")
