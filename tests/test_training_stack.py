"""Loss functions, MLE graph inference, terminal-bond maps, geometry,
graph utils (mirrors reference tests/test_mle.py, tests/test_maps.py
strategies at small scale)."""

import jax.numpy as jnp
import networkx as nx
import numpy as np
import pytest

from timemachine_tpu.fe.loss import flat_bottom_loss, l1_loss, pseudo_huber_loss, truncated_residuals


def test_truncated_residuals_doc_example():
    labels = jnp.array([0.5, 0.5, 0.5, -6, -6, -6])
    predictions = jnp.array([-10.0, 0, 10, -10, 0, 10])
    out = truncated_residuals(predictions, labels, (-5, 1))
    np.testing.assert_allclose(np.asarray(out), [-10.5, -0.5, 9.5, 0.0, 5.0, 15.0])


def test_loss_shapes_and_limits():
    r = jnp.linspace(-20, 20, 41)
    assert np.all(np.asarray(l1_loss(r)) >= 0)
    ph = np.asarray(pseudo_huber_loss(r))
    assert np.all(ph >= 0)
    # asymptotic slope 1 (not threshold)
    assert (ph[-1] - ph[-2]) == pytest.approx(1.0, abs=0.05)
    fb = np.asarray(flat_bottom_loss(r, threshold=5.0))
    assert fb[20] == 0.0  # residual 0
    assert fb[-1] == pytest.approx(15.0)


def test_mle_recovers_truth():
    from timemachine_tpu.fe.mle import infer_node_vals_and_errs

    rng = np.random.default_rng(0)
    truth = np.array([0.0, 2.0, -1.0, 5.0, 3.0])
    edges = np.array([[0, 1], [1, 2], [2, 3], [3, 4], [4, 0], [1, 3]])
    stddevs = np.full(len(edges), 0.2)
    diffs = truth[edges[:, 1]] - truth[edges[:, 0]] + rng.normal(0, 0.2, len(edges))
    dg, dg_err = infer_node_vals_and_errs(edges, diffs, stddevs, n_bootstrap=50, seed=1)
    np.testing.assert_allclose(dg - dg[0], truth - truth[0], atol=0.5)
    assert np.all(dg_err[1:] > 0)
    assert dg_err[0] == pytest.approx(0.0, abs=1e-10)  # node 0 is the reference


def test_mle_disconnected_graph_rejected():
    from timemachine_tpu.fe.mle import infer_node_vals

    edges = np.array([[0, 1], [2, 3]])
    with pytest.raises(ValueError):
        infer_node_vals(edges, np.zeros(2), np.ones(2))


def test_mle_networkx_front_end():
    from timemachine_tpu.fe.mle import infer_node_vals_and_errs_networkx

    g = nx.DiGraph()
    truth = {"a": 0.0, "b": 1.5, "c": -0.5}
    for (u, v) in [("a", "b"), ("b", "c"), ("a", "c")]:
        g.add_edge(u, v, pred=truth[v] - truth[u], err=0.1)
    g.nodes["a"]["exp_dg"] = 0.0
    out = infer_node_vals_and_errs_networkx(
        g, "pred", "err", "exp_dg", "exp_dg_err", n_bootstrap=20, seed=2
    )
    for n, val in truth.items():
        assert out.nodes[n]["inferred_dg"] == pytest.approx(val, abs=0.05)


def test_terminal_bond_map_roundtrip():
    from timemachine_tpu.maps.terminal_bonds import TerminalBondMap, TerminalMappableState

    bond_idxs = np.array([[0, 1], [1, 2]])
    src = TerminalMappableState.from_harmonic_bond_params(bond_idxs, np.array([[1e6, 0.10], [1e6, 0.11]]))
    dst = TerminalMappableState.from_harmonic_bond_params(bond_idxs, np.array([[2e6, 0.12], [1e6, 0.11]]))
    fwd = TerminalBondMap.from_states(src, dst)
    rev = TerminalBondMap.from_states(dst, src)

    xs = np.array([[[0.0, 0, 0], [0.10, 0, 0], [0.10, 0.11, 0]]] * 3)
    mapped, ldj_fwd = fwd(xs)
    r_new = np.linalg.norm(np.asarray(mapped)[0, 1] - np.asarray(mapped)[0, 0])
    assert r_new == pytest.approx(0.12, abs=1e-6)

    # inverse map recovers the original coordinates; logdetjacs cancel
    back, ldj_rev = rev(np.asarray(mapped))
    np.testing.assert_allclose(np.asarray(back), xs, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ldj_fwd) + np.asarray(ldj_rev), 0.0, atol=1e-10)


def test_mapped_u_kn_identity_maps():
    from timemachine_tpu.maps.estimators import compute_mapped_u_kn

    rng = np.random.default_rng(3)
    samples = [rng.normal(size=(6, 2)), rng.normal(size=(6, 2))]
    fns = [lambda xs: (np.asarray(xs) ** 2).sum(1), lambda xs: 2 * (np.asarray(xs) ** 2).sum(1)]
    ident = lambda xs: (xs, np.zeros(len(xs)))
    maps = {(i, j): ident for i in range(2) for j in range(2)}
    u_kn = compute_mapped_u_kn(samples, fns, maps)
    assert u_kn.shape == (2, 12)
    np.testing.assert_allclose(u_kn[1], 2 * u_kn[0])


def test_classify_geometry():
    from timemachine_tpu.chem import mol_from_smiles
    from timemachine_tpu.fe.geometry import LocalGeometry, classify_geometry

    mol = mol_from_smiles("CC#N")
    assert classify_geometry(mol) == [
        LocalGeometry.G1_TERMINAL,
        LocalGeometry.G2_LINEAR,
        LocalGeometry.G1_TERMINAL,
    ]
    benzene = mol_from_smiles("c1ccccc1")
    geos = classify_geometry(benzene)
    assert all(g == LocalGeometry.G2_KINK for g in geos)  # no explicit Hs: ring C with 2 nbrs


def test_enumerate_simple_paths():
    from timemachine_tpu.chem import mol_from_smiles
    from timemachine_tpu.graph_utils import mol_adjacency, simple_paths

    mol = mol_from_smiles("CCC")
    paths = simple_paths(mol_adjacency(mol), 3)
    assert sorted(paths) == [(0, 1, 2), (2, 1, 0)]


def test_local_resampling_move_gaussian():
    """Exactness check: local resampling on iid Gaussians preserves marginals."""
    from timemachine_tpu.md.local_resampling import local_resampling_move

    rng = np.random.default_rng(4)
    n = 50

    def target_logpdf(x):
        return -0.5 * jnp.sum(x**2)

    def selection_log_prob(x):
        # select particles with prob 0.5 independent of state (state-free: correction is constant)
        return jnp.log(0.5) * jnp.ones(len(x))

    def mcmc_move(x_sub, logpdf):
        # exact independence sampler for the standard normal subproblem
        return jnp.asarray(rng.normal(size=x_sub.shape)), None

    np.random.seed(5)
    x = jnp.asarray(rng.normal(size=(n, 3)))
    samples = []
    for _ in range(200):
        x, _ = local_resampling_move(x, target_logpdf, selection_log_prob, mcmc_move)
        samples.append(np.asarray(x))
    pooled = np.concatenate(samples).ravel()
    assert np.mean(pooled) == pytest.approx(0.0, abs=0.05)
    assert np.std(pooled) == pytest.approx(1.0, abs=0.05)
