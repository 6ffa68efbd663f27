"""Forcefield handler assignment tests (mirrors reference tests/test_handlers.py
strategy: structural invariants + known-molecule spot checks, minus the
RDKit/OpenEye oracles)."""

import numpy as np
import pytest

from timemachine_tpu import constants
from timemachine_tpu.chem import mol_from_smiles
from timemachine_tpu.ff import Forcefield
from timemachine_tpu.ff.handlers import (
    apply_bond_charge_corrections,
    generate_exclusion_idxs,
    generate_nonbonded_idxs,
)
from timemachine_tpu.ff.serialize import deserialize_handlers


@pytest.fixture(scope="module")
def ff():
    return Forcefield.load_default()


def test_load_all_builtins():
    from timemachine_tpu.ff.serialize import builtin_params_dir

    for f in sorted(builtin_params_dir().glob("*.json")):
        ff = Forcefield.load_from_file(f.stem)
        assert ff.hb_handle is not None or f.stem == "placeholder_ff"


def test_load_by_reference_name():
    ff = Forcefield.load_from_file("smirnoff_2_0_0_ccc.py")
    assert len(ff.hb_handle.smirks) > 50


def test_harmonic_bond_covers_all_bonds(ff):
    mol = mol_from_smiles("CC(=O)Nc1ccc(O)cc1", add_hs=True, name="acetaminophen")
    params, idxs = ff.hb_handle.parameterize(mol)
    mol_bonds = {tuple(sorted((b.src, b.dst))) for b in mol.bonds}
    ff_bonds = {tuple(sorted(map(int, row))) for row in idxs}
    assert mol_bonds == ff_bonds
    assert np.all(np.asarray(params)[:, 0] > 0)
    assert np.all(np.asarray(params)[:, 1] > 0.05)


def test_angle_and_torsion_counts(ff):
    mol = mol_from_smiles("CCO", add_hs=True)
    _, angle_idxs = ff.ha_handle.parameterize(mol)
    # CCO with H: angles = sum over atoms of C(deg, 2)
    expected_angles = sum(
        len(mol.neighbors(i)) * (len(mol.neighbors(i)) - 1) // 2 for i in range(mol.num_atoms)
    )
    assert len(angle_idxs) == expected_angles
    _, proper_idxs = ff.pt_handle.parameterize(mol)
    assert len(proper_idxs) > 0
    # every proper torsion's middle bond is a real bond
    bonds = {tuple(sorted((b.src, b.dst))) for b in mol.bonds}
    for i, j, k, l in proper_idxs:
        assert tuple(sorted((int(j), int(k)))) in bonds


def test_ethane_bond_param_spot_check(ff):
    """[#6X4:1]-[#6X4:2] params land on the ethane C-C bond."""
    mol = mol_from_smiles("CC", add_hs=True)
    params, idxs = ff.hb_handle.parameterize(mol)
    expected = ff.hb_handle.lookup_smirks("[#6X4:1]-[#6X4:2]")
    cc_rows = [r for r, (i, j) in enumerate(idxs) if mol.atoms[i].atomic_num == 6 and mol.atoms[j].atomic_num == 6]
    assert len(cc_rows) == 1
    np.testing.assert_allclose(np.asarray(params)[cc_rows[0]], expected)


def test_lj_params_positive(ff):
    mol = mol_from_smiles("c1ccc2ccccc2c1", add_hs=True)
    lj = np.asarray(ff.lj_handle.parameterize(mol))
    assert lj.shape == (mol.num_atoms, 2)
    assert np.all(lj > 0)


def test_exclusions_ethane():
    mol = mol_from_smiles("CC", add_hs=True)
    idxs, scales = generate_exclusion_idxs(mol, 1.0, 1.0, 0.5, 0.5)
    # ethane: 7 bonds (1-2), 12 angles pairs (1-3), 9 torsion pairs (1-4)
    by_scale = {}
    g = mol.to_nx()
    import networkx as nx

    for (i, j), (sq, slj) in zip(idxs, scales):
        d = nx.shortest_path_length(g, int(i), int(j))
        by_scale.setdefault(d, []).append((sq, slj))
    assert len(by_scale[1]) == 7
    assert len(by_scale[2]) == 12
    assert len(by_scale[3]) == 9
    assert all(s == (1.0, 1.0) for s in by_scale[1])
    assert all(s == (0.5, 0.5) for s in by_scale[3])


def test_charges_net_conserved(ff):
    # native AM1 base charges (no fallback warning expected)
    import warnings as _w

    for smi, total in [("CCO", 0), ("CC(=O)[O-]", -1), ("C[NH3+]", 1)]:
        mol = mol_from_smiles(smi, add_hs=True)
        with _w.catch_warnings():
            _w.simplefilter("error")
            q = np.asarray(ff.q_handle.parameterize(mol))
        net = q.sum() / np.sqrt(constants.ONE_4PI_EPS0)
        np.testing.assert_allclose(net, total, atol=1e-8)


def test_charge_cache_roundtrip(ff):
    import warnings as _w

    mol = mol_from_smiles("CCO", add_hs=True)
    with _w.catch_warnings():
        _w.simplefilter("error")
        q1 = np.asarray(ff.q_handle.parameterize(mol))
        # second call reads from cache, identical values
        q2 = np.asarray(ff.q_handle.parameterize(mol))
    np.testing.assert_array_equal(q1, q2)


def test_bcc_differentiability(ff):
    """du/d(bcc params) is exact — the charge-training contract."""
    import jax

    mol = mol_from_smiles("CCO", add_hs=True)
    ff.q_handle.parameterize(mol)  # populate caches

    def net_abs_charge(params):
        q = ff.q_handle.partial_parameterize(params, mol)
        return (q**2).sum()

    g = jax.grad(net_abs_charge)(ff.q_handle.params)
    assert np.asarray(g).shape == ff.q_handle.params.shape
    assert np.any(np.asarray(g) != 0)


def test_apply_bond_charge_corrections_invariance(rng):
    q0 = rng.normal(size=10)
    bond_idxs = np.array([[0, 1], [2, 3], [1, 5]])
    deltas = np.asarray(rng.normal(size=3))
    q1 = np.asarray(apply_bond_charge_corrections(q0, bond_idxs, deltas))
    np.testing.assert_allclose(q1.sum(), q0.sum(), atol=1e-12)
    np.testing.assert_allclose(q1[0], q0[0] + deltas[0])
    np.testing.assert_allclose(q1[1], q0[1] - deltas[0] + deltas[2])


def test_serialize_roundtrip(ff):
    text = ff.serialize(fmt="python")
    handlers, protein_ff, water_ff = deserialize_handlers(text)
    assert protein_ff == ff.protein_ff
    ff2 = Forcefield.from_handlers(handlers, protein_ff, water_ff)
    np.testing.assert_allclose(ff2.hb_handle.params, ff.hb_handle.params)
    np.testing.assert_allclose(ff2.q_handle.params, ff.q_handle.params)
    assert ff2.hb_handle.smirks == list(ff.hb_handle.smirks)

    text_json = ff.serialize(fmt="json")
    handlers3, _, _ = deserialize_handlers(text_json)
    ff3 = Forcefield.from_handlers(handlers3, protein_ff, water_ff)
    np.testing.assert_allclose(ff3.pt_handle.params, ff.pt_handle.params)


def test_improper_trefoil(ff):
    mol = mol_from_smiles("CC(=O)N", add_hs=True)  # acetamide: sp2 C and N centers
    params, idxs = ff.it_handle.parameterize(mol)
    assert len(idxs) % 3 == 0
    assert len(idxs) > 0
    # center atom (index 1 position) is repeated 3x per improper
    centers = [int(r[1]) for r in idxs]
    from collections import Counter

    assert all(v % 3 == 0 for v in Counter(centers).values())


def test_proper_torsion_multiplicity(ff):
    mol = mol_from_smiles("CCCC", add_hs=True)
    params, idxs = ff.pt_handle.parameterize(mol)
    # the C-C-C-C torsion should expand to 3 periodicity terms under openff-2.0
    cccc = [
        r
        for r, (i, j, k, l) in enumerate(idxs)
        if all(mol.atoms[int(a)].atomic_num == 6 for a in (i, j, k, l))
    ]
    assert len(cccc) == 3
    periods = sorted(np.asarray(params)[cccc][:, 2])
    assert periods == [1.0, 2.0, 3.0]


def test_native_am1_base_charges_through_handler(monkeypatch):
    """Default path: base charges come from the native AM1 SCF (no QM
    backend, no fallback warning), are cached under the AM1-family cache
    key, and symmetry-equivalent atoms get identical charges."""
    import warnings as _warnings

    import numpy as _np

    from timemachine_tpu import constants as _c
    from timemachine_tpu.chem import mol_from_smiles
    from timemachine_tpu.ff.handlers import (
        AM1ELF10_CHARGE_CACHE,
        GASTEIGER_CHARGE_CACHE,
        compute_or_load_base_charges,
    )

    mol = mol_from_smiles("CC(C)=O", add_hs=True)  # acetone: two equivalent methyls
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        q = _np.asarray(compute_or_load_base_charges(mol, mode="AM1ELF10"))
    assert AM1ELF10_CHARGE_CACHE in mol.props
    assert GASTEIGER_CHARGE_CACHE not in mol.props
    qe = q / _np.sqrt(_c.ONE_4PI_EPS0)
    assert abs(qe.sum()) < 1e-9
    # methyl carbons (atoms 0, 2) are topologically equivalent
    assert abs(qe[0] - qe[2]) < 1e-12
    # carbonyl O strongly negative under AM1
    assert qe[3] < -0.2
    # strict mode is satisfied by the native backend (no error, no warning)
    monkeypatch.setenv("TM_STRICT_CHARGES", "1")
    mol2 = mol_from_smiles("CCO", add_hs=True)
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        q2 = compute_or_load_base_charges(mol2, mode="AM1ELF10")
    assert _np.isfinite(_np.asarray(q2)).all()


def test_gasteiger_fallback_is_loud_and_strict_mode_errors(monkeypatch):
    """Charge-model honesty: uncached mols warn loudly by default and ERROR
    under TM_STRICT_CHARGES=1; mols carrying charges never hit the fallback."""
    import warnings as _warnings

    import numpy as _np
    import pytest as _pytest

    from timemachine_tpu.chem import mol_from_smiles
    from timemachine_tpu.ff.handlers import (
        GasteigerFallbackWarning,
        MissingBaseChargesError,
        compute_or_load_base_charges,
    )

    monkeypatch.setenv("TM_NATIVE_AM1", "0")  # force the fallback path
    mol = mol_from_smiles("CCO", add_hs=True)
    with _pytest.warns(GasteigerFallbackWarning):
        q = compute_or_load_base_charges(mol.copy())
    assert _np.isfinite(q).all()

    monkeypatch.setenv("TM_STRICT_CHARGES", "1")
    with _pytest.raises(MissingBaseChargesError):
        compute_or_load_base_charges(mol.copy())
    monkeypatch.delenv("TM_STRICT_CHARGES")

    # a mol with supplied charges is exempt in both modes
    charged = mol.copy()
    charged.props["PartialCharges"] = " ".join("0.01" for _ in range(charged.num_atoms))
    monkeypatch.setenv("TM_STRICT_CHARGES", "1")
    with _warnings.catch_warnings():
        _warnings.simplefilter("error", GasteigerFallbackWarning)
        q2 = compute_or_load_base_charges(charged)
    assert q2.shape == (charged.num_atoms,)


def test_gasteiger_fallback_never_masquerades_as_am1(monkeypatch):
    """Degraded (Gasteiger) charges are cached under their own GasteigerCache
    key — never under the AM1-family cache property — and a second call loads
    them silently without re-warning."""
    import warnings as _warnings

    import numpy as _np
    import pytest as _pytest

    from timemachine_tpu.chem import mol_from_smiles
    from timemachine_tpu.ff.handlers import (
        AM1ELF10_CHARGE_CACHE,
        GASTEIGER_CHARGE_CACHE,
        GasteigerFallbackWarning,
        compute_or_load_base_charges,
    )

    monkeypatch.setenv("TM_NATIVE_AM1", "0")  # force the fallback path
    mol = mol_from_smiles("c1ccccc1O", add_hs=True)
    with _pytest.warns(GasteigerFallbackWarning):
        q1 = compute_or_load_base_charges(mol)
    assert AM1ELF10_CHARGE_CACHE not in mol.props
    assert GASTEIGER_CHARGE_CACHE in mol.props

    with _warnings.catch_warnings():
        _warnings.simplefilter("error", GasteigerFallbackWarning)
        q2 = compute_or_load_base_charges(mol)
    _np.testing.assert_array_equal(_np.asarray(q1), _np.asarray(q2))


def test_nn_charge_handler_applies_mlp_bond_deltas():
    """NNHandler: silu-MLP bond charge corrections over precomputed features
    (ref handlers/nonbonded.py:526-577), with explicit layer shapes instead
    of the reference's pickled unflatten closure. Net charge is conserved
    (corrections are antisymmetric per bond)."""
    import base64
    import pickle

    import numpy as np

    from timemachine_tpu import constants
    from timemachine_tpu.chem import mol_from_smiles
    from timemachine_tpu.ff.handlers import (
        NN_FEATURES_PROPNAME,
        NNHandler,
        compute_or_load_base_charges,
    )

    mol = mol_from_smiles("CCO", add_hs=True)
    rng = np.random.default_rng(11)
    n, fa, fb = mol.num_atoms, 4, 3
    bond_idxs = mol.bond_list()
    features = {
        "atom_features": rng.standard_normal((n, fa)),
        "bond_idxs": np.asarray(bond_idxs),
        "bond_src_features": rng.standard_normal((len(bond_idxs), fb // 1))[:, :fb],
        "bond_dst_features": rng.standard_normal((len(bond_idxs), fb)),
    }
    mol.props[NN_FEATURES_PROPNAME] = base64.b64encode(pickle.dumps(features))

    in_dim = 2 * fa + 2 * fb
    shapes = [(8, in_dim), (1, 8)]
    flat = rng.standard_normal(sum(o * i for o, i in shapes)) * 0.1
    h = NNHandler([], flat, {"layer_shapes": shapes})

    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        q = np.asarray(h.parameterize(mol))
        base = np.asarray(compute_or_load_base_charges(mol, mode=h.base_mode))
    assert q.shape == (n,)
    assert not np.allclose(q, base)  # the MLP moved charge
    np.testing.assert_allclose(q.sum(), base.sum(), atol=1e-9)  # conserved

    # differentiability w.r.t. the flat parameter vector (training surface)
    import jax

    g = jax.grad(lambda p: (h.partial_parameterize(p, mol) ** 2).sum())(flat)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_strict_mode_rejects_cached_gasteiger(monkeypatch):
    """TM_STRICT_CHARGES=1 must reject previously cached Gasteiger fallback
    charges too — a non-strict run's degraded cache may persist on the mol
    (e.g. through SDF prop round-trips) into a later strict production run."""
    import pytest as _pytest

    from timemachine_tpu.chem import mol_from_smiles
    from timemachine_tpu.ff.handlers import (
        GASTEIGER_CHARGE_CACHE,
        GasteigerFallbackWarning,
        MissingBaseChargesError,
        compute_or_load_base_charges,
    )

    monkeypatch.setenv("TM_NATIVE_AM1", "0")  # force the fallback path
    mol = mol_from_smiles("CCN", add_hs=True)
    with _pytest.warns(GasteigerFallbackWarning):
        compute_or_load_base_charges(mol)
    assert GASTEIGER_CHARGE_CACHE in mol.props

    monkeypatch.setenv("TM_STRICT_CHARGES", "1")
    with _pytest.raises(MissingBaseChargesError):
        compute_or_load_base_charges(mol)


def test_nn_handler_serialize_round_trips_params():
    """NNHandler has no smirks patterns, so the generic mixin serialization
    would drop the weight vector (regression); the handler carries it in
    props['flat_params'] and deserialize reconstructs it."""
    import numpy as np

    from timemachine_tpu.ff.handlers import NNHandler
    from timemachine_tpu.ff.serialize import deserialize_handlers, serialize_handlers

    shapes = [(4, 6), (1, 4)]
    rng = np.random.default_rng(3)
    flat = rng.standard_normal(sum(o * i for o, i in shapes))
    h = NNHandler([], flat, {"layer_shapes": shapes})

    text = serialize_handlers([h], "amber99", "tip3p")
    handlers, _, _ = deserialize_handlers(text)
    (h2,) = handlers
    assert isinstance(h2, NNHandler)
    np.testing.assert_allclose(h2.params, flat)
    assert [tuple(s) for s in h2.props["layer_shapes"]] == shapes

    # json format round-trips too
    text_j = serialize_handlers([h], "amber99", "tip3p", fmt="json")
    handlers_j, _, _ = deserialize_handlers(text_j)
    np.testing.assert_allclose(handlers_j[0].params, flat)
