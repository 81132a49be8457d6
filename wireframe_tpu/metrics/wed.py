"""Wireframe edit distance (WED) and edge-indexing helpers.

Semantics match eval/ap_calculator.py:39-105 (graph_edit_distance,
computer_edges, remove_corners), re-written as documented, vectorized
numpy.  The WED recipe: snap predicted vertices to their nearest GT
vertex (accumulating snap distances into the vertex term), merge
duplicates, re-index predicted edges; every predicted edge that does not
exist in the GT edge set adds its length to the edge term, as does every
GT edge never produced; normalize by total GT edge length.
"""

from __future__ import annotations

import numpy as np


def setdiff_rows(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Rows of `a` not present in `b` — SORTED UNIQUE rows, matching the
    structured-dtype np.setdiff1d behavior of ap_calculator.py:101-105."""
    a = np.asarray(a).reshape(-1, a.shape[-1] if a.ndim > 1 else 3)
    b = np.asarray(b).reshape(-1, a.shape[1])
    if len(a) == 0:
        return a.copy()
    ua = np.unique(a, axis=0)
    if len(b) == 0:
        return ua
    # membership test via void view
    av = np.ascontiguousarray(ua).view([("", ua.dtype)] * ua.shape[1]).ravel()
    bv = np.ascontiguousarray(np.unique(b, axis=0)).view(
        [("", b.dtype)] * b.shape[1]).ravel()
    keep = ~np.isin(av, bv)
    return ua[keep]


def compute_edge_indices(edges_vertices: np.ndarray,
                         vertices: np.ndarray) -> np.ndarray:
    """Map (n, 2, 3) edge endpoint coords to sorted (n, 2) vertex indices.

    Endpoint coords absent from `vertices` map to -1
    (eval/ap_calculator.py:84-98).
    """
    out = np.full((len(edges_vertices), 2), -1, dtype=np.int64)
    for k, edge in enumerate(edges_vertices):
        for side in range(2):
            hits = np.where((vertices == edge[side]).all(axis=1))[0]
            if len(hits) > 0:
                out[k, side] = hits[0]
    return np.sort(out, axis=-1)


def graph_edit_distance(pd_vertices: np.ndarray, pd_edges: np.ndarray,
                        gt_vertices: np.ndarray, gt_edges: np.ndarray,
                        wed_v: float) -> float:
    """Normalized wireframe edit distance (ap_calculator.py:39-81).

    Args:
      pd_vertices: (P, 3) predicted corners (will be snapped; copied here).
      pd_edges: (Q, 2) predicted edge index pairs into pd_vertices.
      gt_vertices / gt_edges: ground truth.
      wed_v: pre-accumulated corner-offset distance (the caller's positive
        corner offsets seed the vertex term).
    """
    pd_vertices = np.array(pd_vertices, copy=True)
    gt_edges_left = np.array(gt_edges, copy=True)
    wed_e = 0.0

    if len(pd_vertices) > 0:
        # Snap every predicted vertex to its nearest GT vertex.
        diff = pd_vertices[:, None, :] - gt_vertices[None, :, :]
        dist = np.sqrt(np.sum(diff * diff, axis=-1))
        wed_v += float(np.sum(np.min(dist, axis=1)))
        nearest = np.argmin(dist, axis=1)
        pd_vertices = gt_vertices[nearest].copy()

        # Merge duplicates and re-index the predicted edges.
        uniq, inverse = np.unique(pd_vertices, axis=0, return_inverse=True)
        renew = inverse[np.asarray(pd_edges, dtype=np.int64)]
        renew = np.unique(renew, axis=0)

        for edge in renew:
            # GT indices of the two (snapped) endpoints.
            e1 = np.where((gt_vertices == uniq[edge[0]]).all(axis=1))[0]
            e2 = np.where((gt_vertices == uniq[edge[1]]).all(axis=1))[0]
            pair = np.array(sorted([e1[0], e2[0]]))
            exists = np.where((gt_edges == pair).all(axis=1))[0]
            if len(exists):
                keep = np.any(gt_edges_left != pair, axis=1)
                gt_edges_left = gt_edges_left[keep]
            else:
                wed_e += float(np.linalg.norm(uniq[edge[0]] - uniq[edge[1]]))
    else:
        wed_v = 0.0

    # Every GT edge never matched costs its length.
    for edge in gt_edges_left:
        wed_e += float(np.linalg.norm(gt_vertices[edge[0]] - gt_vertices[edge[1]]))

    total = sum(
        float(np.linalg.norm(gt_vertices[e[0]] - gt_vertices[e[1]]))
        for e in gt_edges)
    return (wed_e + wed_v) / total
