"""Absolute free energies per node from a graph of relative (edge) estimates.

Capability target: reference `timemachine/fe/mle.py` (DiffNet; Xu 2019,
doi:10.1021/acs.jcim.9b00528): maximum-likelihood node values under
independent Gaussian edge errors, bootstrapped uncertainties, and a networkx
front-end that annotates the input graph.

Redesigned rather than ported: for Gaussian edge likelihoods the MLE is a
weighted linear least-squares problem, so instead of running L-BFGS on a
log-likelihood we solve the graph's normal equations

    L x = Aᵀ W d,   L = Aᵀ W A  (weighted graph Laplacian)

in closed form. The pseudo-inverse of L is computed once and reused for
every bootstrap replicate (the bootstrap only perturbs the right-hand side),
turning the reference's n_bootstrap optimizer runs into one matrix-matrix
multiply.
"""

from __future__ import annotations

from typing import Union

import networkx as nx
import numpy as np

NxDiGraph = Union[nx.DiGraph, nx.MultiDiGraph]

MIN_EDGE_STDDEV = 1e-3


def _edge_arrays(edge_idxs, edge_diffs, edge_stddevs):
    edge_idxs = np.asarray(edge_idxs, dtype=int)
    edge_diffs = np.asarray(edge_diffs, dtype=float)
    stddevs = np.maximum(np.asarray(edge_stddevs, dtype=float), MIN_EDGE_STDDEV)
    if not (len(edge_idxs) == len(edge_diffs) == len(stddevs)):
        raise ValueError("edge_idxs, edge_diffs, edge_stddevs must have equal length")
    return edge_idxs, edge_diffs, stddevs


def _validate_graph(edge_idxs) -> int:
    """Every node 0..K-1 appears and the graph is one connected component."""
    n_nodes = int(edge_idxs.max()) + 1
    present = np.zeros(n_nodes, dtype=bool)
    present[edge_idxs.reshape(-1)] = True
    if not present.all():
        raise ValueError(f"nodes {np.flatnonzero(~present).tolist()} have no edges")

    from timemachine_tpu.graph_utils import adjacency_from_bonds, connected_component

    reachable = connected_component(adjacency_from_bonds(n_nodes, edge_idxs), 0)
    if len(reachable) != n_nodes:
        raise ValueError("edge graph is not connected")
    return n_nodes


def _laplacian_pinv_and_projector(edge_idxs, stddevs, n_nodes):
    """Pseudo-inverse of the weighted Laplacian plus the weighted incidence
    operator Aᵀ W, so node solutions are x = L⁺ (Aᵀ W) d for any d."""
    src, dst = edge_idxs.T
    w = 1.0 / stddevs**2

    # incidence: row e has -1 at src(e), +1 at dst(e)
    n_edges = len(src)
    A = np.zeros((n_edges, n_nodes))
    A[np.arange(n_edges), src] = -1.0
    A[np.arange(n_edges), dst] = 1.0

    AtW = A.T * w  # (n_nodes, n_edges)
    L = AtW @ A
    return np.linalg.pinv(L, hermitian=True), AtW


def _anchor(x, ref_node_idxs, ref_node_vals):
    """Shift the gauge so the mean residual at the reference nodes vanishes.
    x may be (K,) or (B, K); broadcasting handles both."""
    ref_node_idxs = np.asarray(ref_node_idxs, dtype=int)
    ref_node_vals = np.asarray(ref_node_vals, dtype=float)
    offset = np.mean(ref_node_vals - x[..., ref_node_idxs], axis=-1, keepdims=True)
    return x + offset


def _default_refs(ref_node_idxs, ref_node_vals, with_stddevs=False):
    if len(ref_node_idxs) == 0:
        print("no reference node values: picking node 0 as arbitrary reference")
        if with_stddevs:
            return [0], [0.0], [0.0]
        return [0], [0.0]
    if with_stddevs:
        return ref_node_idxs, ref_node_vals, None
    return ref_node_idxs, ref_node_vals


def infer_node_vals(edge_idxs, edge_diffs, edge_stddevs, ref_node_idxs=tuple(), ref_node_vals=tuple()):
    """ML node values given Gaussian edge differences; the free additive
    constant is fixed by averaging over the reference nodes."""
    edge_idxs, edge_diffs, stddevs = _edge_arrays(edge_idxs, edge_diffs, edge_stddevs)
    n_nodes = _validate_graph(edge_idxs)
    ref_node_idxs, ref_node_vals = _default_refs(ref_node_idxs, ref_node_vals)
    assert len(ref_node_idxs) == len(ref_node_vals), "ref idxs/vals length mismatch"

    L_pinv, AtW = _laplacian_pinv_and_projector(edge_idxs, stddevs, n_nodes)
    x = L_pinv @ (AtW @ edge_diffs)
    return _anchor(x, ref_node_idxs, ref_node_vals)


def infer_node_vals_and_errs(
    edge_idxs,
    edge_diffs,
    edge_stddevs,
    ref_node_idxs=tuple(),
    ref_node_vals=tuple(),
    ref_node_stddevs=tuple(),
    n_bootstrap=100,
    seed=0,
):
    """(node values, bootstrap stddevs). Each bootstrap replicate perturbs
    edge diffs and reference values by their claimed stddevs; all replicates
    share one Laplacian pseudo-inverse (vectorized solve)."""
    edge_idxs, edge_diffs, stddevs = _edge_arrays(edge_idxs, edge_diffs, edge_stddevs)
    n_nodes = _validate_graph(edge_idxs)

    refs = _default_refs(ref_node_idxs, ref_node_vals, with_stddevs=True)
    if refs[2] is not None:
        ref_node_idxs, ref_node_vals, ref_node_stddevs = refs
    else:
        ref_node_idxs, ref_node_vals = refs[0], refs[1]
    ref_node_idxs = np.asarray(ref_node_idxs, dtype=int)
    ref_node_vals = np.asarray(ref_node_vals, dtype=float)
    ref_node_stddevs = np.asarray(ref_node_stddevs, dtype=float)
    assert len(ref_node_idxs) == len(ref_node_vals) == len(ref_node_stddevs), "ref arrays length mismatch"

    L_pinv, AtW = _laplacian_pinv_and_projector(edge_idxs, stddevs, n_nodes)
    solve = lambda d: (L_pinv @ (AtW @ d.T)).T  # d: (..., n_edges) -> (..., n_nodes)

    point = _anchor(solve(edge_diffs), ref_node_idxs, ref_node_vals)

    rng = np.random.default_rng(seed)
    noisy_d = edge_diffs + rng.standard_normal((n_bootstrap, len(edge_diffs))) * stddevs
    noisy_refs = ref_node_vals + rng.standard_normal((n_bootstrap, len(ref_node_vals))) * ref_node_stddevs
    replicates = solve(noisy_d)  # (n_bootstrap, n_nodes)
    offsets = np.mean(noisy_refs - replicates[:, ref_node_idxs], axis=1, keepdims=True)
    return point, (replicates + offsets).std(axis=0)


def infer_node_vals_and_errs_networkx(
    graph: NxDiGraph,
    edge_diff_prop: str,
    edge_stddev_prop: str,
    ref_node_val_prop: str,
    ref_node_stddev_prop: str,
    node_val_prop: str = "inferred_dg",
    node_stddev_prop: str = "inferred_dg_stddev",
    edge_skip_prop: str = "skip_for_mle",
    n_bootstrap: int = 100,
    seed: int = 0,
) -> NxDiGraph:
    """networkx front-end: run the inference on the largest usable connected
    component and write values/stddevs back onto the (copied) graph nodes."""
    if not isinstance(graph, (nx.DiGraph, nx.MultiDiGraph)):
        raise TypeError("graph must be a DiGraph or MultiDiGraph")

    usable = [
        e
        for e in graph.edges
        if graph.edges[e].get(edge_diff_prop) is not None
        and graph.edges[e].get(edge_stddev_prop) is not None
        and graph.edges[e].get(edge_skip_prop) is not True
    ]
    sub = graph.edge_subgraph(usable).copy()
    if not sub.nodes:
        raise ValueError("Empty graph after removing edges without predictions")

    def component_rank(component):
        n_refs = sum(sub.nodes[n].get(ref_node_val_prop) is not None for n in component)
        return (len(component), n_refs, max(component))

    best = max(nx.connected_components(sub.to_undirected()), key=component_rank)
    sub = sub.subgraph(best)

    ordered_nodes = sorted(sub.nodes)
    index_of = {n: i for i, n in enumerate(ordered_nodes)}

    edge_list = list(sub.edges)
    edge_idxs = np.array([(index_of[e[0]], index_of[e[1]]) for e in edge_list])
    diffs = np.array([sub.edges[e][edge_diff_prop] for e in edge_list])
    errs = np.array([sub.edges[e][edge_stddev_prop] for e in edge_list])

    ref_idxs, ref_vals, ref_errs = [], [], []
    for n in ordered_nodes:
        data = sub.nodes[n]
        if ref_node_val_prop in data:
            ref_idxs.append(index_of[n])
            ref_vals.append(data[ref_node_val_prop])
            ref_errs.append(data.get(ref_node_stddev_prop, 0.0))

    vals, stddevs = infer_node_vals_and_errs(
        edge_idxs, diffs, errs, ref_idxs, ref_vals, ref_errs, n_bootstrap=n_bootstrap, seed=seed
    )

    annotated = sub.copy()
    for n in ordered_nodes:
        annotated.nodes[n][node_val_prop] = vals[index_of[n]]
        annotated.nodes[n][node_stddev_prop] = stddevs[index_of[n]]
    return annotated
