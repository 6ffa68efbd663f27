"""API-parity utility surface (timemachine_tpu/lib.py) vs brute force.

Parity targets: reference custom_ops classes HilbertSort, Neighborlist,
SegmentedSumExp, SegmentedWeightedRandomSampler (custom_ops.pyi:140-358) and
their tests (tests/test_neighborlist.py, tests/test_segmented_sumexp.py,
tests/test_sampler.py strategies)."""

import numpy as np
import pytest
from scipy.special import logsumexp as scipy_logsumexp

from timemachine_tpu.lib import (
    HilbertSort,
    Neighborlist,
    SegmentedSumExp,
    SegmentedWeightedRandomSampler,
)


def test_hilbert_sort_is_permutation_and_local():
    rng = np.random.default_rng(0)
    n, bw = 600, 3.0
    coords = rng.uniform(0, bw, (n, 3))
    box = np.eye(3) * bw
    perm = HilbertSort(n).sort(coords, box)
    assert sorted(perm.tolist()) == list(range(n))
    # locality: mean distance between curve-consecutive atoms beats random order
    d_sorted = np.linalg.norm(np.diff(coords[perm], axis=0), axis=1).mean()
    d_rand = np.linalg.norm(np.diff(coords, axis=0), axis=1).mean()
    assert d_sorted < 0.5 * d_rand


def test_neighborlist_covers_all_pairs():
    rng = np.random.default_rng(1)
    n, bw, cutoff = 333, 3.0, 1.0
    coords = rng.uniform(0, bw, (n, 3))
    box = np.eye(3) * bw
    nblist = Neighborlist(n).get_nblist(coords, box, cutoff)

    covered = set()
    for b, ids in enumerate(nblist):
        for j in ids:
            for i in range(b * 32, min((b + 1) * 32, n)):
                if i < j:
                    covered.add((i, j))
    # brute force pairs within cutoff must all be covered (lists may contain extras)
    d = coords[:, None, :] - coords[None, :, :]
    d -= bw * np.round(d / bw)
    dist = np.sqrt((d**2).sum(-1))
    ii, jj = np.nonzero(np.triu(dist < cutoff, k=1))
    for i, j in zip(ii, jj):
        assert (i, j) in covered, (i, j)


def test_neighborlist_row_idxs_mode():
    rng = np.random.default_rng(2)
    n, bw, cutoff = 200, 3.0, 1.0
    coords = rng.uniform(0, bw, (n, 3))
    box = np.eye(3) * bw
    nb = Neighborlist(n)
    rows = np.arange(40, dtype=np.uint32)
    nb.set_row_idxs(rows)
    assert nb.get_num_row_idxs() == 40
    nblist = nb.get_nblist(coords, box, cutoff)
    col_set = set(range(40, n))
    listed = set()
    for ids in nblist:
        assert set(ids) <= col_set  # columns exclude the row atoms
        listed |= set(ids)
    # every true row-col pair covered
    d = coords[:40, None, :] - coords[None, 40:, :]
    d -= bw * np.round(d / bw)
    hit_cols = np.nonzero((np.sqrt((d**2).sum(-1)) < cutoff).any(axis=0))[0] + 40
    assert set(hit_cols.tolist()) <= listed
    nb.reset_row_idxs()
    assert nb.get_num_row_idxs() == n


def test_segmented_sumexp_matches_scipy():
    rng = np.random.default_rng(3)
    segs = [rng.normal(0, 10, size=k).tolist() for k in (1, 5, 17, 100)]
    out = SegmentedSumExp(128, 8).logsumexp(segs)
    for o, seg in zip(out, segs):
        assert o == pytest.approx(float(scipy_logsumexp(seg)), rel=1e-12)
    assert SegmentedSumExp(4, 1).logsumexp([[]]) == [-np.inf]


def test_segmented_sampler_distribution():
    sampler = SegmentedWeightedRandomSampler(8, 2, seed=5)
    counts = np.zeros(3)
    for _ in range(600):
        idx = sampler.sample([[1.0, 2.0, 7.0], [5.0, 5.0]])
        counts[idx[0]] += 1
        assert idx[1] in (0, 1)
    freqs = counts / counts.sum()
    np.testing.assert_allclose(freqs, [0.1, 0.2, 0.7], atol=0.06)


def test_segmented_sampler_rejects_bad_weights():
    sampler = SegmentedWeightedRandomSampler(8, 1, seed=0)
    for bad in ([[-1.0, 2.0]], [[np.inf, 1.0]], [[0.0, 0.0]]):
        with pytest.raises(RuntimeError):
            sampler.sample(bad)


def test_nonbonded_mol_energy():
    """Per-mol interaction energies vs the system match a brute-force sum
    (ref custom_ops.NonbondedMolEnergy semantics)."""
    import jax.numpy as jnp

    from timemachine_tpu.lib import NonbondedMolEnergy
    from timemachine_tpu.ops.nonbonded import nonbonded_block_unsummed

    rng = np.random.default_rng(3)
    n = 60
    conf = rng.uniform(0, 2.4, (n, 3))
    box = np.eye(3) * 2.4
    params = np.stack(
        [rng.uniform(-1, 1, n), rng.uniform(0.05, 0.15, n), rng.uniform(0.1, 0.6, n), np.zeros(n)], 1
    )
    mols = [[0, 1, 2], [3, 4, 5], [9, 10, 11]]
    me = NonbondedMolEnergy(n, mols, beta=2.0, cutoff=1.2)
    out = me.execute(conf, params, box)
    assert out.shape == (3,)

    for mol_idx, m in enumerate(mols):
        other = np.setdiff1d(np.arange(n), m)
        u_ref = float(
            jnp.sum(
                nonbonded_block_unsummed(
                    jnp.asarray(conf[m]), jnp.asarray(conf[other]), jnp.asarray(box),
                    jnp.asarray(params[m]), jnp.asarray(params[other]), 2.0, 1.2,
                )
            )
        )
        assert out[mol_idx] == pytest.approx(u_ref, rel=1e-10)

    # ragged groups take the per-mol path, same semantics
    ragged = NonbondedMolEnergy(n, [[0, 1, 2], [7, 8]], beta=2.0, cutoff=1.2)
    out2 = ragged.execute(conf, params, box)
    assert out2[0] == pytest.approx(out[0], rel=1e-12)
