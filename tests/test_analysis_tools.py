"""Analysis/tooling coverage: lambda schedules, protocol refinement, energy
decomposition, plots, CIF writer, chiral utils, Barker proposal, parallel
clients.

Parity targets: reference tests/test_lambda_schedule.py,
test_protocol_refinement.py, test_plotting.py, test_cif_writer.py,
test_chiral_utils.py, test_barker.py, test_parallel.py.
"""

import numpy as np
import pytest

from timemachine_tpu.chem import mol_from_smiles
from timemachine_tpu.chem.embed import embed_mol

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _embedded(smiles, seed=7):
    mol = mol_from_smiles(smiles, add_hs=True)
    embed_mol(mol, seed=seed)
    return mol


# -- fe/lambda_schedule -------------------------------------------------------


def test_validate_lambda_schedule():
    from timemachine_tpu.fe.lambda_schedule import validate_lambda_schedule

    good = np.linspace(0.0, 1.0, 10)
    validate_lambda_schedule(good, 10)

    with pytest.raises(AssertionError):
        validate_lambda_schedule(good, 11)  # wrong count
    with pytest.raises(AssertionError):
        validate_lambda_schedule(np.linspace(0.1, 1.0, 10), 10)  # doesn't start at 0
    with pytest.raises(AssertionError):
        validate_lambda_schedule(good[::-1], 10)  # not increasing


@pytest.mark.parametrize("num_windows", [8, 48, 128, 300])
def test_interpolated_pre_optimized_solvent_schedule(num_windows):
    from timemachine_tpu.fe.lambda_schedule import (
        construct_pre_optimized_absolute_lambda_schedule_solvent,
    )

    sched = construct_pre_optimized_absolute_lambda_schedule_solvent(num_windows)
    assert sched[0] == 0.0 and sched[-1] == 1.0
    assert len(sched) == num_windows
    assert (np.diff(sched) > 0).all()
    # the calibrated protocol front-loads resolution at small lambda: more
    # than half of all windows sit below lambda=0.25
    assert (sched < 0.25).sum() > num_windows // 2


def test_pre_optimized_relative_schedule():
    from timemachine_tpu.fe.lambda_schedule import construct_pre_optimized_relative_lambda_schedule

    default = construct_pre_optimized_relative_lambda_schedule(None)
    assert default[0] == 0.0 and default[-1] == 1.0
    resampled = construct_pre_optimized_relative_lambda_schedule(24)
    assert len(resampled) == 24
    assert (np.diff(resampled) > 0).all()


@pytest.mark.parametrize("requested,expected", [(2, 3), (16, 17), (48, 33), (63, 33), (64, 65)])
def test_bisection_lambda_schedule_visits_power_of_two_grid(requested, expected):
    from timemachine_tpu.fe.lambda_schedule import bisection_lambda_schedule

    sched = bisection_lambda_schedule(requested)
    assert len(sched) == expected  # 2^floor(log2(n)) + 1
    assert sched[0] == 0.0 and sched[-1] == 1.0
    np.testing.assert_allclose(np.diff(sched), np.diff(sched)[0])


# -- fe/protocol_refinement ---------------------------------------------------


def test_greedy_bisection_step_inserts_at_worst_pair():
    from timemachine_tpu.fe.protocol_refinement import copy_and_insert, greedy_bisection_step

    protocol = [0.0, 0.4, 0.5, 1.0]

    def local_cost(left, right):
        return right - left  # worst pair = widest gap = (0.5, 1.0)

    def make_intermediate(left, right):
        return 0.5 * (left + right)

    refined, (costs, left_idx, new_state) = greedy_bisection_step(protocol, local_cost, make_intermediate)
    assert left_idx == 2
    assert new_state == 0.75
    assert refined == [0.0, 0.4, 0.5, 0.75, 1.0]
    assert costs == [0.4, pytest.approx(0.1), 0.5]
    assert protocol == [0.0, 0.4, 0.5, 1.0]  # input untouched

    base = [1, 2, 3]
    out = copy_and_insert(base, 1, 99)
    assert out == [1, 99, 2, 3] and base == [1, 2, 3]


def test_greedy_bisection_converges_uniform():
    """Repeated bisection with gap-width cost must equalize window widths."""
    from timemachine_tpu.fe.protocol_refinement import greedy_bisection_step

    protocol = [0.0, 1.0]
    for _ in range(15):
        protocol, _ = greedy_bisection_step(protocol, lambda a, b: b - a, lambda a, b: 0.5 * (a + b))
    widths = np.diff(protocol)
    assert widths.max() / widths.min() <= 2.0 + 1e-12


# -- fe/energy_decomposition --------------------------------------------------


def _harmonic_states(n_states=3, n_frames=7, n_atoms=4, seed=0):
    from timemachine_tpu.fe.energy_decomposition import EnergyDecomposedState, get_batch_u_fns
    from timemachine_tpu.potentials import HarmonicAngle, HarmonicBond

    rng = np.random.default_rng(seed)
    box = np.eye(3) * 10.0
    bond = HarmonicBond(idxs=np.array([[0, 1], [2, 3]], dtype=np.int32))
    angle = HarmonicAngle(idxs=np.array([[0, 1, 2]], dtype=np.int32))

    states = []
    for k in range(n_states):
        frames = rng.normal(0, 0.05, size=(n_frames, n_atoms, 3)) + rng.normal(0, 1, size=(1, n_atoms, 3))
        boxes = [box] * n_frames
        bond_p = np.array([[1000.0 + 100 * k, 0.1], [800.0, 0.12]])
        angle_p = np.array([[100.0, 1.9 + 0.05 * k, 0.0]])
        batch_u_fns = get_batch_u_fns([bond, angle], [bond_p, angle_p], temperature=300.0)
        states.append(EnergyDecomposedState(frames, boxes, batch_u_fns))
    return states, (bond, angle), box


def test_compute_energy_decomposed_u_kln_matches_direct():
    from timemachine_tpu.constants import BOLTZ
    from timemachine_tpu.fe.energy_decomposition import compute_energy_decomposed_u_kln

    states, pots, box = _harmonic_states()
    u_kln = compute_energy_decomposed_u_kln(states)
    n_components, K, _, N = u_kln.shape
    assert n_components == 2 and K == 3 and N == 7

    # spot-check: frame n of state k under state l's bond params, by direct call
    kBT = 300.0 * BOLTZ
    bond, _ = pots
    bond_p_l1 = np.array([[1100.0, 0.1], [800.0, 0.12]])
    x = np.array(states[0].frames[4])
    expected = float(bond(x, bond_p_l1, box)) / kBT
    np.testing.assert_allclose(u_kln[0, 0, 1, 4], expected, rtol=1e-6)


def test_batch_u_fn_chunk_padding_and_nan_passthrough():
    """Frame counts not divisible by chunk_size share one compiled shape; NaN
    energies (overflow semantics) must survive the batch path un-masked."""
    from timemachine_tpu.fe.energy_decomposition import make_batch_u_fn
    from timemachine_tpu.potentials import HarmonicBond

    bond = HarmonicBond(idxs=np.array([[0, 1]], dtype=np.int32))
    params = np.array([[1000.0, 0.1]])
    box = np.eye(3) * 10.0
    fn = make_batch_u_fn(bond, params, kBT=1.0, chunk_size=5)

    rng = np.random.default_rng(1)
    xs = rng.normal(0, 0.2, size=(12, 2, 3))  # 12 = 2 full chunks + ragged 2
    xs[3, 0, 0] = np.nan
    us = fn(xs, np.repeat(box[None], 12, axis=0))
    assert us.shape == (12,)
    assert np.isnan(us[3])
    finite = np.delete(us, 3)
    assert np.isfinite(finite).all()

    # direct comparison on a clean frame
    expected = float(bond(xs[7], params, box))
    np.testing.assert_allclose(us[7], expected, rtol=1e-6)

    # a corrupt BOX must poison its frame too (ADVICE r4): the kernels'
    # where-guards could otherwise fold a NaN box into a finite energy
    xs2 = rng.normal(0, 0.2, size=(7, 2, 3))
    boxes2 = np.repeat(box[None], 7, axis=0)
    boxes2[2, 0, 0] = np.nan
    boxes2[5] = np.inf
    us2 = fn(xs2, boxes2)
    assert np.isnan(us2[2]) and np.isnan(us2[5])
    assert np.isfinite(np.delete(us2, [2, 5])).all()


# -- fe/plots -----------------------------------------------------------------


def test_plot_functions_render_png():
    from timemachine_tpu.fe import plots

    rng = np.random.default_rng(0)

    png = plots.plot_as_png_fxn(
        plots.plot_fwd_reverse_predictions,
        rng.normal(size=6),
        np.abs(rng.normal(size=6)),
        rng.normal(size=6),
        np.abs(rng.normal(size=6)),
    )
    assert png.startswith(PNG_MAGIC)

    tm = np.full((4, 4), 0.05)
    np.fill_diagonal(tm, 0.85)
    png = plots.plot_as_png_fxn(plots.plot_hrex_transition_matrix, tm, prefix="test")
    assert png.startswith(PNG_MAGIC)

    rates = np.clip(rng.uniform(0.2, 0.6, size=(10, 3)), 0, 1)
    png = plots.plot_as_png_fxn(plots.plot_hrex_swap_acceptance_rates_convergence, rates)
    assert png.startswith(PNG_MAGIC)

    counts = rng.integers(0, 50, size=(5, 4, 4)).cumsum(axis=0)
    png = plots.plot_as_png_fxn(
        plots.plot_hrex_replica_state_distribution_heatmap, counts, [0.0, 0.3, 0.7, 1.0]
    )
    assert png.startswith(PNG_MAGIC)

    proposals = np.stack([rng.integers(10, 50, size=6), np.full(6, 100)], axis=1)
    png = plots.plot_as_png_fxn(plots.plot_water_proposals_by_state, np.linspace(0, 1, 6), proposals)
    assert png.startswith(PNG_MAGIC)

    png = plots.plot_as_png_fxn(plots.plot_chiral_restraint_energies, rng.uniform(0, 5, size=(3, 20)))
    assert png.startswith(PNG_MAGIC)


def test_plot_forward_and_reverse_dg_on_gaussian_ukln():
    from timemachine_tpu.fe import plots
    from timemachine_tpu.testsystems.gaussian1d import make_gaussian_ukln

    pair_ukln, _ = make_gaussian_ukln(np.linspace(0.0, 1.0, 4), n_samples=200, seed=5)
    png = plots.plot_as_png_fxn(plots.plot_forward_and_reverse_dg, pair_ukln, frames_per_step=50)
    assert png.startswith(PNG_MAGIC)


# -- fe/cif_writer ------------------------------------------------------------


def test_cif_writer_ligand_frames(tmp_path):
    from timemachine_tpu.fe.cif_writer import CIFWriter

    mol = _embedded("c1ccccc1O")
    out = tmp_path / "lig.cif"
    with CIFWriter([mol], str(out)) as writer:
        conf_angstrom = mol.get_conf() * 10.0
        writer.write_frame(conf_angstrom)
        writer.write_frame(conf_angstrom + 1.0)

    text = out.read_text()
    body = [ln for ln in text.splitlines() if ln.startswith(("ATOM", "HETATM"))]
    assert len(body) == 2 * mol.num_atoms
    # model numbers distinguish the frames
    assert {ln.split()[-1] for ln in body} == {"1", "2"}
    assert "LIG" in body[0]

    with pytest.raises(AssertionError):
        with CIFWriter([mol], str(tmp_path / "bad.cif")) as writer:
            writer.write_frame(np.zeros((mol.num_atoms + 1, 3)))


def test_convert_single_topology_mols_splits_frame():
    from timemachine_tpu.constants import DEFAULT_ATOM_MAPPING_KWARGS
    from timemachine_tpu.fe.atom_mapping import get_cores
    from timemachine_tpu.fe.cif_writer import convert_single_topology_mols
    from timemachine_tpu.fe.single_topology import AtomMapMixin

    mol_a = _embedded("c1ccccc1C")
    mol_b = _embedded("c1ccccc1CC", seed=11)
    core = get_cores(mol_a, mol_b, **DEFAULT_ATOM_MAPPING_KWARGS)[0]
    amm = AtomMapMixin(mol_a, mol_b, core)

    n_combined = amm.get_num_atoms()
    frame = np.arange(n_combined * 3, dtype=np.float64).reshape(n_combined, 3)
    out = convert_single_topology_mols(frame, amm)
    assert out.shape == (mol_a.num_atoms + mol_b.num_atoms, 3)
    # mol_a's block is the combined frame gathered through a_to_c
    np.testing.assert_array_equal(out[: mol_a.num_atoms], frame[amm.a_to_c])
    np.testing.assert_array_equal(out[mol_a.num_atoms :], frame[amm.b_to_c])


# -- fe/chiral_utils ----------------------------------------------------------


def test_find_chiral_atoms_and_restraints():
    from timemachine_tpu.fe.chiral_utils import (
        find_chiral_atoms,
        pyramidal_volume,
        setup_all_chiral_atom_restr_idxs,
        setup_chiral_atom_restraints,
    )

    # bromochlorofluoromethane: one tetrahedral center (plus H) — the carbon
    # is X4 and therefore chiral-restrainable
    mol = _embedded("C(F)(Cl)Br")
    chiral_atoms = find_chiral_atoms(mol)
    carbon = next(i for i, a in enumerate(mol.atoms) if a.atomic_num == 6)
    assert carbon in chiral_atoms

    conf = mol.get_conf()
    restr = setup_chiral_atom_restraints(mol, conf, carbon)
    # C has 4 neighbors -> C(4,3) = 4 restraint tuples
    assert len(restr) == 4
    # orientation contract: every tuple has negative pyramidal volume as built
    for c, i, j, k in restr:
        assert pyramidal_volume(conf[c], conf[i], conf[j], conf[k]) < 0

    all_idxs = setup_all_chiral_atom_restr_idxs(mol, conf)
    assert set(restr).issubset(set(all_idxs))


def test_planar_sp2_not_chiral():
    from timemachine_tpu.fe.chiral_utils import find_chiral_atoms

    mol = _embedded("c1ccccc1")  # benzene: all sp2, no X4 centers
    heavy_chiral = {i for i in find_chiral_atoms(mol) if mol.atoms[i].atomic_num != 1}
    assert heavy_chiral == set()


def test_has_chiral_atom_flips_detects_inversion():
    from timemachine_tpu.fe.chiral_utils import ChiralRestrIdxSet, has_chiral_atom_flips

    mol = _embedded("C(F)(Cl)Br")
    conf = mol.get_conf()
    # mirror through z=0: inverts every signed volume
    conf_mirror = conf * np.array([1.0, 1.0, -1.0])

    set_a = ChiralRestrIdxSet.from_mol(mol, conf)
    set_b_same = ChiralRestrIdxSet.from_mol(mol, conf)
    set_b_flip = ChiralRestrIdxSet.from_mol(mol, conf_mirror)

    core = np.arange(mol.num_atoms)  # dense a->b identity map
    assert not has_chiral_atom_flips(core, set_a, set_b_same)
    assert has_chiral_atom_flips(core, set_a, set_b_flip)


# -- md/barker ----------------------------------------------------------------


def test_barker_proposal_shapes_and_determinism():
    import jax

    from timemachine_tpu.md.barker import barker_log_density, barker_propose

    key = jax.random.PRNGKey(0)
    for shape in [(1,), (10,), (10, 3)]:
        x = np.ones(shape)
        g = np.ones(shape)
        y = barker_propose(key, x, g, sigma=0.1)
        assert y.shape == shape
        logpdf = barker_log_density(x, y, g, sigma=0.1)
        assert np.ndim(logpdf) == 0
        # same key -> same draw (threefry determinism)
        np.testing.assert_array_equal(y, barker_propose(key, x, g, sigma=0.1))


@pytest.mark.parametrize("x0", [-1.0, 0.0, 1.0])
@pytest.mark.parametrize("sigma", [0.1, 1.0])
def test_barker_proposal_normalization(x0, sigma):
    r"""\int dy p_sigma(y | x0) == 1 for a quartic target (ref test_barker.py)."""
    from timemachine_tpu.md.barker import barker_log_density

    def grad_log_q(x):
        return -4.0 * x**3

    y_grid = np.linspace(x0 - 10 * sigma, x0 + 10 * sigma, 4001)
    logpdf = np.array(
        [barker_log_density(np.array([x0]), np.array([y]), np.array([grad_log_q(x0)]), sigma) for y in y_grid]
    )
    Z = np.trapezoid(np.exp(logpdf), y_grid)
    assert Z == pytest.approx(1.0, abs=1e-3)


def test_barker_chain_equilibrates_gaussian():
    """Un-Metropolized Barker chain at small sigma approximately samples
    N(mu, 1): the equilibration use-case (md/minimizer Barker stage)."""
    import jax

    from timemachine_tpu.md.barker import barker_chain

    mu = 3.0

    def grad_log_q(x):
        return -(x - mu)

    x0 = np.full(2000, -5.0)  # start far from the mode, all walkers
    xs = np.asarray(barker_chain(jax.random.PRNGKey(3), x0, grad_log_q, sigma=0.25, n_steps=800))
    assert abs(xs.mean() - mu) < 0.15
    assert abs(xs.std() - 1.0) < 0.15


# -- parallel/client ----------------------------------------------------------


def _square(x):
    return x * x


def _kwargs_task(x, scale=1):
    return x * scale


def _boom():
    raise RuntimeError("task failed")


class TestSerialClient:
    def test_submit(self):
        from timemachine_tpu.parallel.client import SerialClient

        client = SerialClient()
        client.verify()
        fut = client.submit(_square, 4)
        assert fut.done()
        assert fut.result() == 16

    def test_submit_kwargs(self):
        from timemachine_tpu.parallel.client import SerialClient

        assert SerialClient().submit(_kwargs_task, 3, scale=5).result() == 15

    def test_exception_raised_at_result(self):
        from timemachine_tpu.parallel.client import SerialClient

        fut = SerialClient().submit(_boom)  # must not raise here
        with pytest.raises(RuntimeError, match="task failed"):
            fut.result()


class TestProcessPoolClient:
    def test_submit(self):
        from timemachine_tpu.parallel.client import ProcessPoolClient

        client = ProcessPoolClient(max_workers=2)
        client.verify()
        futures = [client.submit(_square, i) for i in range(5)]
        assert [f.result() for f in futures] == [0, 1, 4, 9, 16]
        client.executor.shutdown()

    def test_results_picklable(self):
        import pickle

        from timemachine_tpu.parallel.client import ProcessPoolClient

        client = ProcessPoolClient(max_workers=1)
        out = client.submit(_square, 7).result()
        assert pickle.loads(pickle.dumps(out)) == 49
        client.executor.shutdown()


def test_file_client(tmp_path):
    from timemachine_tpu.parallel.client import FileClient

    fc = FileClient(tmp_path / "store")
    assert not fc.exists("a/b.bin")
    fc.store("a/b.bin", b"hello")
    assert fc.exists("a/b.bin")
    assert fc.load("a/b.bin") == b"hello"
    assert fc.full_path("a/b.bin").endswith("store/a/b.bin")

    import io

    fc.store_stream("c.bin", io.BytesIO(b"x" * 3000), batch_size=1024)
    assert fc.load("c.bin") == b"x" * 3000


def test_save_results(tmp_path):
    import pickle

    from timemachine_tpu.parallel.client import FileClient, save_results

    fc = FileClient(tmp_path)
    save_results({"results.pkl": {"dg": 1.5}, "traj.pkl": [1, 2]}, fc, prefix="edge_0")
    assert pickle.loads(fc.load("edge_0/results.pkl")) == {"dg": 1.5}
    assert pickle.loads(fc.load("edge_0/traj.pkl")) == [1, 2]


def test_device_pool_client_round_robin():
    from timemachine_tpu.parallel.client import DevicePoolClient

    client = DevicePoolClient(max_workers=2, platform="cpu")
    futures = [client.submit(_square, i) for i in range(4)]
    assert [f.result() for f in futures] == [0, 1, 4, 9]
    client.executor.shutdown()
