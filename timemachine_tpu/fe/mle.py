"""Maximum-likelihood inference of per-node absolute free energies from a
graph of pairwise (edge) differences, with bootstrapped uncertainties.

Parity target: reference `timemachine/fe/mle.py` — Gaussian edge likelihood
(:18-48, DiffNet / Xu 2019 doi:10.1021/acs.jcim.9b00528), infer_node_vals
(:77-125), bootstrap (:128-160), infer_node_vals_and_errs (:161-218),
networkx front-end (:221-324).

The likelihood is jitted JAX (L-BFGS-B drives value_and_grad), so swapping in
other edge models keeps gradients free.
"""

from typing import Union

import networkx as nx
import numpy as np
from jax import jit, value_and_grad
from jax import numpy as jnp
from jax.scipy.stats import norm
from scipy.optimize import minimize

NxDiGraph = Union[nx.DiGraph, nx.MultiDiGraph]


def make_stddevs_finite(stddevs, min_stddev=1e-3):
    """Clamp unrealistically small stddev claims (ref mle.py:13-15)."""
    return jnp.maximum(stddevs, min_stddev)


def gaussian_log_likelihood(node_vals, edge_idxs, edge_diffs, edge_stddevs):
    """log P(edge_diffs | node_vals) under independent Gaussians
    (ref mle.py:18-48)."""
    src_idxs, dst_idxs = edge_idxs.T
    implied_diffs = node_vals[dst_idxs] - node_vals[src_idxs]
    sanitized = make_stddevs_finite(edge_stddevs)
    return jnp.sum(norm.logpdf(x=edge_diffs, loc=implied_diffs, scale=sanitized))


def _assert_edges_complete(edge_idxs):
    K = np.max(edge_idxs) + 1
    assert set(range(K)) == set(np.asarray(edge_idxs).flatten())


def _assert_edges_connected(edge_idxs):
    g = nx.Graph(list(map(tuple, np.asarray(edge_idxs))))
    assert nx.number_connected_components(g) == 1


def _assert_edges_valid(edge_idxs):
    _assert_edges_complete(edge_idxs)
    _assert_edges_connected(edge_idxs)


def wrap_for_scipy_optimize(f):
    """(ref mle.py:66-74)"""
    vg = jit(value_and_grad(f))

    def wrapped(x):
        v, g = vg(x)
        return float(v), np.array(g, dtype=np.float64)

    return wrapped


def infer_node_vals(edge_idxs, edge_diffs, edge_stddevs, ref_node_idxs=tuple(), ref_node_vals=tuple()):
    """ML node values from edge differences, up to an offset fixed by the
    reference nodes (ref mle.py:77-125)."""
    edge_idxs = np.asarray(edge_idxs)
    assert len(edge_diffs) == len(edge_idxs), f"{len(edge_diffs)} != {len(edge_idxs)}"
    _assert_edges_valid(edge_idxs)

    if len(ref_node_idxs) == 0:
        print("no reference node values: picking node 0 as arbitrary reference")
        ref_node_idxs = np.array([0], dtype=int)
        ref_node_vals = np.array([0], dtype=float)
    assert len(ref_node_idxs) == len(ref_node_vals), "Ref node idxs and ref node values must be of same length"

    edge_diffs = jnp.asarray(edge_diffs)
    edge_stddevs = jnp.asarray(edge_stddevs)

    @wrap_for_scipy_optimize
    def loss(x):
        return -gaussian_log_likelihood(x, edge_idxs, edge_diffs, edge_stddevs)

    K = np.max(edge_idxs) + 1
    x0 = np.zeros(K)
    result = minimize(loss, x0, jac=True, tol=0, method="L-BFGS-B").x

    centered = result - result[0]
    offset = np.mean(np.asarray(ref_node_vals) - centered[np.asarray(ref_node_idxs)])
    return centered + offset


def _bootstrap_node_vals(
    edge_idxs,
    edge_diffs,
    edge_stddevs,
    ref_node_idxs,
    ref_node_vals,
    ref_node_stddevs,
    n_bootstrap=100,
    seed=0,
):
    """(ref mle.py:128-160)"""
    n_edges = len(edge_idxs)
    n_nodes = len(set(np.asarray(edge_idxs).flatten()))
    n_refs = len(ref_node_idxs)
    rng = np.random.default_rng(seed)

    bootstrap_estimates = np.zeros((n_bootstrap, n_nodes))
    for i in range(n_bootstrap):
        noisy_edge_diffs = edge_diffs + rng.standard_normal(n_edges) * edge_stddevs
        noisy_node_refs = np.asarray(ref_node_vals) + rng.standard_normal(n_refs) * np.asarray(ref_node_stddevs)
        bootstrap_estimates[i] = infer_node_vals(
            edge_idxs, noisy_edge_diffs, edge_stddevs, ref_node_idxs, noisy_node_refs
        )
    return bootstrap_estimates


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
    """(dG, dG_err) per node; errors are bootstrap empirical stddevs
    (ref mle.py:161-218)."""
    if len(ref_node_idxs) == 0:
        print("no reference node values: picking node 0 as arbitrary reference")
        ref_node_idxs = np.array([0], dtype=int)
        ref_node_vals = np.array([0], dtype=float)
        ref_node_stddevs = np.array([0], dtype=float)
    assert len(ref_node_idxs) == len(ref_node_vals) == len(ref_node_stddevs), (
        "Ref node idxs, ref node values and ref std devs must be of same length"
    )

    dg = infer_node_vals(edge_idxs, edge_diffs, edge_stddevs, ref_node_idxs, ref_node_vals)
    bootstrap_estimates = _bootstrap_node_vals(
        edge_idxs, edge_diffs, edge_stddevs, ref_node_idxs, ref_node_vals, ref_node_stddevs, n_bootstrap, seed
    )
    return dg, bootstrap_estimates.std(0)


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
    """networkx front-end: infer on the largest usable connected component and
    write results back as node properties (ref mle.py:221-324)."""
    assert isinstance(graph, (nx.DiGraph, nx.MultiDiGraph)), "Graph must be a DiGraph or MultiDiGraph"

    def keep_edge(e):
        d = graph.edges[e]
        has_edge_diff = d.get(edge_diff_prop) is not None
        has_edge_err = d.get(edge_stddev_prop) is not None
        has_skip_marker = d.get(edge_skip_prop) is True
        return (has_edge_diff and has_edge_err) and (not has_skip_marker)

    sg = graph.edge_subgraph([e for e in graph.edges if keep_edge(e)]).copy()
    if not sg.nodes:
        raise ValueError("Empty graph after removing edges without predictions")

    connected_components = list(nx.connected_components(sg.to_undirected()))

    def _sort_key(component):
        size = len(component)
        num_expt_refs = sum(sg.nodes[c].get(ref_node_val_prop) is not None for c in component)
        name = max(component)
        return (size, num_expt_refs, name)

    sg = sg.subgraph(max(connected_components, key=_sort_key))

    node_to_idx = {n: idx for idx, n in enumerate(sorted(sg.nodes))}
    idx_to_node = {idx: n for n, idx in node_to_idx.items()}
    sg_relabeled = nx.relabel_nodes(sg, node_to_idx)

    ref_node_idxs, ref_node_vals, ref_node_stddevs = [], [], []
    for n, d in sg_relabeled.nodes.items():
        if ref_node_val_prop in d:
            ref_node_idxs.append(n)
            ref_node_vals.append(d[ref_node_val_prop])
            ref_node_stddevs.append(d.get(ref_node_stddev_prop, 0.0))

    edges = np.array(sg_relabeled.edges)
    edge_idxs = edges[:, :2]
    dgs, dg_errs = infer_node_vals_and_errs(
        edge_idxs,
        np.array([sg_relabeled.edges[tuple(e)][edge_diff_prop] for e in edges]),
        np.array([sg_relabeled.edges[tuple(e)][edge_stddev_prop] for e in edges]),
        ref_node_idxs,
        ref_node_vals,
        ref_node_stddevs,
        n_bootstrap,
        seed,
    )

    for n, (dg, dg_err) in enumerate(zip(dgs, dg_errs)):
        sg_relabeled.nodes[n][node_val_prop] = dg
        sg_relabeled.nodes[n][node_stddev_prop] = dg_err

    return nx.relabel_nodes(sg_relabeled, idx_to_node)
