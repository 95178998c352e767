"""Single-process numpy reference implementations — the correctness oracles.

The analog of the reference's brute-force ground truth
(/root/reference/tests/bruteforce.cpp:67-91): an independent, trivially
auditable implementation that the distributed engine must match
(PageRank: allclose 1e-6; CC / LP / triangles: exact — north rule).

All functions take an edge list as (src, dst, weight) numpy arrays or a
list of tuples, with arbitrary int64 vertex ids.
"""

from __future__ import annotations

import numpy as np


def _normalize_edges(edges):
    e = np.asarray([(s, d, w) for s, d, w in edges], dtype=np.float64)
    if e.size == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0), np.empty(0, np.int64))
    src = e[:, 0].astype(np.int64)
    dst = e[:, 1].astype(np.int64)
    w = e[:, 2]
    verts = np.unique(np.concatenate([src, dst]))
    return src, dst, w, verts


def pagerank_ref(
    edges,
    damping: float = 0.85,
    num_iters: int | None = None,
    tol: float = 1e-12,
    max_iters: int = 200,
) -> dict[int, float]:
    """Power iteration with per-step dangling-mass redistribution.

    Matches plans/pagerank.py semantics exactly (same update rule, same
    initialization, same iteration count when num_iters is given).
    """
    src, dst, w, verts = _normalize_edges(edges)
    n = len(verts)
    if n == 0:
        return {}
    ix = {v: i for i, v in enumerate(verts)}
    si = np.array([ix[v] for v in src], dtype=np.int64)
    di = np.array([ix[v] for v in dst], dtype=np.int64)
    wsum = np.zeros(n)
    np.add.at(wsum, si, w)
    wnorm = w / wsum[si]
    dangling = wsum == 0.0

    p = np.full(n, 1.0 / n)
    iters = num_iters if num_iters is not None else max_iters
    for _ in range(iters):
        dm = p[dangling].sum()
        contrib = np.zeros(n)
        np.add.at(contrib, di, p[si] * wnorm)
        new = (1.0 - damping) / n + damping * (contrib + dm / n)
        if num_iters is None and np.max(np.abs(new - p)) < tol:
            p = new
            break
        p = new
    return {int(v): float(p[ix[v]]) for v in verts}


def components_ref(edges) -> dict[int, int]:
    """Exact connected components (undirected); label = min vertex id."""
    src, dst, _, verts = _normalize_edges(edges)
    parent = {int(v): int(v) for v in verts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in zip(src, dst):
        rs, rd = find(int(s)), find(int(d))
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return {v: find(v) for v in parent}


def hashmin_rounds_ref(edges, num_iters: int) -> dict[int, int]:
    """EXACTLY k rounds of synchronous hash-min label exchange (directed
    edges as given; symmetrize before calling if undirected semantics are
    wanted). Matches plans/components.py with num_iters set."""
    src, dst, _, verts = _normalize_edges(edges)
    label = {int(v): int(v) for v in verts}
    for _ in range(num_iters):
        new = dict(label)
        incoming: dict[int, int] = {}
        for s, d in zip(src, dst):
            cand = label[int(s)]
            di = int(d)
            if di not in incoming or cand < incoming[di]:
                incoming[di] = cand
        for v, m in incoming.items():
            if m < new[v]:
                new[v] = m
        label = new
    return label


def label_propagation_ref(edges, num_iters: int) -> dict[int, int]:
    """Synchronous LP, weight-sum votes, ties to smallest label.

    Matches plans/labelprop.py (symmetrize there first, or pass a
    symmetric edge list here)."""
    src, dst, w, verts = _normalize_edges(edges)
    label = {int(v): int(v) for v in verts}
    for _ in range(num_iters):
        votes: dict[int, dict[int, float]] = {}
        for s, d, wt in zip(src, dst, w):
            votes.setdefault(int(d), {}).setdefault(label[int(s)], 0.0)
            votes[int(d)][label[int(s)]] += float(wt)
        new = dict(label)
        for v, lab_w in votes.items():
            best = sorted(lab_w.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[v] = best
        label = new
    return label


def triangles_ref(edges) -> tuple[int, dict[int, int]]:
    """Exact (global_count, per-vertex counts) on the undirected simple graph."""
    adj: dict[int, set[int]] = {}
    for s, d, *_ in edges:
        s, d = int(s), int(d)
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    per: dict[int, int] = {}
    total = 0
    for u in adj:
        for v in adj[u]:
            if v <= u:
                continue
            common = adj[u] & adj[v]
            for c in common:
                if c > v:
                    total += 1
                    for x in (u, v, c):
                        per[x] = per.get(x, 0) + 1
    return total, per
