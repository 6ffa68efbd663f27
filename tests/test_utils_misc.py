"""Small-module coverage: utils, parallel/testsystems/exchange helpers,
fe/tree_search, fe/loss, and the interaction-group trajectory store."""

import numpy as np
import pytest


def test_batches_and_not_ragged():
    from timemachine_tpu.utils import batches, not_ragged, pairwise_transform_and_combine

    assert list(batches(10, 3)) == [3, 3, 3, 1]
    assert list(batches(9, 3)) == [3, 3, 3]
    assert list(batches(0, 5)) == []
    assert not_ragged([[1, 2], [3, 4]])
    assert not not_ragged([[1], [2, 3]])
    assert pairwise_transform_and_combine([1, 2, 3], lambda x: 10 * x, lambda a, b: a + b) == 51


def test_batch_list_round_robin():
    from timemachine_tpu.parallel.utils import batch_list

    assert batch_list([1, 2, 3, 4, 5], 2) == [[1, 3, 5], [2, 4]]
    assert batch_list([1, 2], None) == [[1], [2]]
    assert batch_list([1, 2], 5) == [[1], [2]]  # no empty batches
    assert batch_list([], None) == []


def test_get_radius_of_mol_pair():
    from timemachine_tpu.chem import mol_from_smiles
    from timemachine_tpu.chem.embed import embed_mol
    from timemachine_tpu.md.exchange.utils import get_radius_of_mol_pair

    a = mol_from_smiles("CCO", add_hs=True)
    b = mol_from_smiles("CCC", add_hs=True)
    embed_mol(a, seed=3)
    embed_mol(b, seed=3)
    r = get_radius_of_mol_pair(a, b)
    assert 0.05 < r < 2.0


def test_best_first_orders_by_priority():
    from timemachine_tpu.fe.tree_search import best_first

    # expand n -> children {2n, 2n+1} while < 8; stateless
    def expand(n, s):
        kids = [2 * n, 2 * n + 1] if n < 8 else []
        return kids, s

    seen = []
    for node in best_first(expand, 1, None):
        seen.append(node)
        if len(seen) >= 10:
            break
    assert seen == sorted(seen)  # min-heap yields ascending

    # key= variant: nodes need not be comparable
    def expand_t(node, s):
        (tag, val) = node
        kids = [(object(), val + 3), (object(), val + 5)] if val < 10 else []
        return kids, s

    vals = [v for (_, v) in best_first(expand_t, (object(), 0), None, key=lambda n: n[1])]
    assert vals[:5] == sorted(vals[:5])


def test_loss_functions():
    import jax.numpy as jnp

    from timemachine_tpu.fe.loss import flat_bottom_loss, l1_loss, pseudo_huber_loss, truncated_residuals

    labels = jnp.array([0.5, 0.5, 0.5, -6, -6, -6])
    predictions = jnp.array([-10.0, 0, +10, -10, 0, +10])
    np.testing.assert_allclose(
        np.asarray(truncated_residuals(predictions, labels, (-5, +1))),
        [-10.5, -0.5, 9.5, 0.0, 5.0, 15.0],
    )
    assert float(l1_loss(-3.0)) == 3.0
    # pseudo-Huber: ~L2 inside, slope-1 outside, zero at zero
    assert float(pseudo_huber_loss(0.0)) == 0.0
    big = 1e4
    assert float(pseudo_huber_loss(big, threshold=4.184)) == pytest.approx(big, rel=1e-3)
    assert float(flat_bottom_loss(1.0, threshold=4.184)) == 0.0
    assert float(flat_bottom_loss(10.0, threshold=4.184)) == pytest.approx(10 - 4.184)


def test_interaction_group_traj_roundtrip_and_U(tmp_path):
    from timemachine_tpu.fe.interaction_group_traj import InteractionGroupTraj, nb_pair_fxn

    rng = np.random.default_rng(5)
    n_frames, n_lig, n_env = 3, 4, 60
    box_diags = np.full((n_frames, 3), 4.0)
    xs = np.concatenate(
        [
            2.0 + 0.3 * rng.standard_normal((n_frames, n_lig, 3)),  # ligand near box center
            rng.uniform(0, 4.0, (n_frames, n_env, 3)),
        ],
        axis=1,
    )
    lig_idxs = np.arange(n_lig)
    env_idxs = np.arange(n_lig, n_lig + n_env)
    params = np.stack(
        [rng.uniform(-1, 1, n_lig + n_env), rng.uniform(0.1, 0.3, n_lig + n_env),
         rng.uniform(0.1, 0.5, n_lig + n_env), np.zeros(n_lig + n_env)], axis=1
    )

    traj = InteractionGroupTraj(xs, box_diags, lig_idxs, env_idxs, cutoff=1.2, verbose=False)
    Us = traj.make_U_fxn(nb_pair_fxn)(params)
    assert Us.shape == (n_frames,)

    # brute force over ALL env atoms must agree (padding is energy-neutral)
    full = InteractionGroupTraj(xs, box_diags, lig_idxs, env_idxs, cutoff=100.0, verbose=False)
    Us_full = full.make_U_fxn(nb_pair_fxn)(params)
    np.testing.assert_allclose(np.asarray(Us), np.asarray(Us_full), rtol=1e-6)

    # npz round trip preserves evaluation
    f = tmp_path / "traj.npz"
    traj.to_npz(f)
    traj2 = InteractionGroupTraj.from_npz(f)
    np.testing.assert_allclose(np.asarray(traj2.make_U_fxn(nb_pair_fxn)(params)), np.asarray(Us))
