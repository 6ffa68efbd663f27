"""Free-energy orchestration: MD sampling protocols, pair-BAR analysis,
bisection and HREX drivers.

Parity target: reference `timemachine/fe/free_energy.py` (MDParams/HREXParams/
InitialState dataclasses :59-263, get_context :610-660, sample* :660-820,
estimate_free_energy_bar :824-884, run_sims_sequential :949-1000,
run_sims_bisection :1006-1148, compute_potential_matrix :1148-1203,
compute_u_kn :1300-1317, generate_pair_bar_ulkns :1317-1383,
run_sims_hrex :1383-1643).

TPU design notes:
* Potentials are pure JAX; the reference's `execute_batch` /
  `execute_batch_sparse` GPU entry points become jit+vmap over frames with
  chunking (see `fe/energy_decomposition.py`) — XLA batches the whole
  u_kln sweep onto the MXU rather than looping CUDA kernel launches.
* run_sims_hrex drives the replica-parallel engine
  (`parallel/replica_exchange.py`): each HREX iteration — every replica's MD
  segment, the banded U_kl, and the swap batch — is one device program,
  sharded over the available devices. The reference-style time-multiplexed
  single-Context loop survives only as the local-MD fallback.
* Water sampling / local MD hooks are parameterised here and dispatched to
  `md.exchange` / `md.local_md` implementations.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, replace
from functools import cache
from typing import Callable, Iterator, Optional, Sequence
from warnings import warn

import jax
import jax.numpy as jnp
import numpy as np
from numpy.typing import NDArray

from timemachine_tpu.constants import BOLTZ
from timemachine_tpu.fe import model_utils
from timemachine_tpu.fe.bar import (
    bar_with_pessimistic_uncertainty,
    df_and_err_from_u_kln,
    pair_overlap_from_ukln,
    works_from_ukln,
)
from timemachine_tpu.fe.energy_decomposition import (
    EnergyDecomposedState,
    compute_energy_decomposed_u_kln,
    get_batch_u_fns,
)
from timemachine_tpu.fe.protocol_refinement import greedy_bisection_step
from timemachine_tpu.fe.stored_arrays import StoredArrays
from timemachine_tpu.integrators import LangevinIntegrator
from timemachine_tpu.md.barostat import MonteCarloBarostat
from timemachine_tpu.md.context import Context
from timemachine_tpu.md.hrex import (
    HREX,
    HREXDiagnostics,
    get_swap_attempts_per_iter_heuristic,
)
from timemachine_tpu.md.states import CoordsVelBox
from timemachine_tpu.md.utils import get_bond_list, get_group_indices
from timemachine_tpu.potentials import (
    BoundPotential,
    HarmonicBond,
    Nonbonded,
    NonbondedInteractionGroup,
    get_bound_potential_by_type,
    make_summed_potential,
)
from timemachine_tpu.utils import batches

InterpolationFxnName = str

# canonical HostConfig lives next to the builders (md/builders.py); re-export
# here to match the reference's `fe.free_energy.HostConfig` import surface
from timemachine_tpu.md.builders import HostConfig  # noqa: E402  (re-export)


@dataclass(frozen=True)
class RESTParams:
    """REST(2)-style effective-temperature scaling of a region (ref :70-74)."""

    max_temperature_scale: float
    temperature_scale_interpolation: InterpolationFxnName = "exponential"


@dataclass(frozen=True)
class HREXParams:
    """(ref free_energy.py:76-108)"""

    n_frames_bisection: int = 100
    n_frames_per_iter: int = 1
    max_delta_states: Optional[int] = 4
    optimize_target_overlap: Optional[float] = None
    rest_params: Optional[RESTParams] = None

    def __post_init__(self):
        assert self.n_frames_bisection > 0
        assert self.n_frames_per_iter == 1, "n_frames_per_iter must be 1"
        assert self.max_delta_states is None or self.max_delta_states > 0
        assert self.optimize_target_overlap is None or 0.0 < self.optimize_target_overlap < 1.0


@dataclass(frozen=True)
class WaterSamplingParams:
    """Targeted-insertion water exchange parameters (ref :111-140)."""

    interval: int = 400
    n_proposals: int = 1000
    batch_size: int = 250
    radius: float = 1.0

    def __post_init__(self):
        assert self.interval > 0
        assert self.n_proposals > 0
        assert self.radius > 0.0
        assert 0 < self.batch_size <= self.n_proposals


@dataclass(frozen=True)
class LocalMDParams:
    """(ref free_energy.py:143-154)"""

    local_steps: int
    k: float = 1_000.0  # kJ/mol/nm^4
    min_radius: float = 1.0  # nm
    max_radius: float = 3.0  # nm
    freeze_reference: bool = True

    def __post_init__(self):
        assert 0.1 <= self.min_radius <= self.max_radius
        assert self.local_steps > 0
        assert 1.0 <= self.k <= 1.0e6


@dataclass(frozen=True)
class MDParams:
    """(ref free_energy.py:157-175)"""

    n_frames: int
    n_eq_steps: int
    steps_per_frame: int
    seed: int
    local_md_params: Optional[LocalMDParams] = None
    hrex_params: Optional[HREXParams] = None
    water_sampling_params: Optional[WaterSamplingParams] = None

    def __post_init__(self):
        assert self.steps_per_frame > 0
        assert self.n_frames > 0
        assert self.n_eq_steps >= 0
        if self.local_md_params is not None:
            assert self.local_md_params.local_steps <= self.steps_per_frame


@dataclass
class InitialState:
    """Everything needed to bitwise-reproduce a trajectory given MDParams
    (ref free_energy.py:178-204)."""

    potentials: list[BoundPotential]
    integrator: LangevinIntegrator
    barostat: Optional[MonteCarloBarostat]
    x0: NDArray
    v0: NDArray
    box0: NDArray
    lamb: float
    ligand_idxs: NDArray
    protein_idxs: NDArray
    interacting_atoms: Optional[NDArray] = None

    def __post_init__(self):
        assert self.ligand_idxs.dtype in (np.int32, np.int64)
        assert self.protein_idxs.dtype in (np.int32, np.int64)

    def total_energy_fn(self) -> Callable:
        """U(x, box) with this state's parameters bound (the analog of
        `to_bound_impl`; pure JAX, jittable)."""
        bps = self.potentials

        def U(x, box):
            return sum(bp(x, box) for bp in bps)

        return U


@dataclass
class BarResult:
    """(ref free_energy.py:206-214)"""

    dG: float
    dG_err: float
    dG_err_by_component: NDArray  # (n_components,)
    overlap: float
    overlap_by_component: NDArray  # (n_components,)
    u_kln_by_component: NDArray  # (n_components, 2, 2, N)


@dataclass
class PairBarPlots:
    dG_errs_png: bytes
    overlap_summary_png: bytes
    overlap_detail_png: bytes


@dataclass
class HREXPlots:
    transition_matrix_png: bytes
    swap_acceptance_rates_convergence_png: bytes
    replica_state_distribution_heatmap_png: bytes


@dataclass
class WaterSamplingDiagnostics:
    """(n_iters, n_states, 2) (acceptances, proposals) counts."""

    proposals_by_state_by_iter: NDArray

    def cumulative_proposals_by_state(self) -> NDArray:
        return np.sum(self.proposals_by_state_by_iter, axis=0)


@dataclass
class PairBarResult:
    """Results of BAR analysis on L-1 adjacent pairs of states (ref :231-262).

    The per-pair accessors all project one field out of `bar_results`."""

    initial_states: list[InitialState]  # length L
    bar_results: list[BarResult]  # length L-1

    def __post_init__(self):
        if len(self.bar_results) != len(self.initial_states) - 1:
            raise ValueError("expected one BAR result per adjacent pair of states")

    def _per_pair(self, field: str) -> list:
        return [getattr(r, field) for r in self.bar_results]

    @property
    def dGs(self) -> list[float]:
        return self._per_pair("dG")

    @property
    def dG_errs(self) -> list[float]:
        return self._per_pair("dG_err")

    @property
    def dG_err_by_component_by_lambda(self) -> NDArray:
        return np.array(self._per_pair("dG_err_by_component"))

    @property
    def overlaps(self) -> list[float]:
        return self._per_pair("overlap")

    @property
    def overlap_by_component_by_lambda(self) -> NDArray:
        return np.array(self._per_pair("overlap_by_component"))

    @property
    def u_kln_by_component_by_lambda(self) -> NDArray:
        return np.array(self._per_pair("u_kln_by_component"))


@dataclass
class Trajectory:
    """Frames + boxes + the terminal MD state needed to continue a run
    (ref free_energy.py:265-291)."""

    frames: StoredArrays  # (frame, atom, dim)
    boxes: list  # (frame, dim, dim)
    final_velocities: Optional[NDArray]
    final_barostat_volume_scale_factor: Optional[float] = None

    def __post_init__(self):
        if len(self.boxes) != len(self.frames):
            raise ValueError("frames and boxes must have equal length")
        if len(self.frames):
            n_atoms, n_dims = self.frames[0].shape
            assert self.boxes[0].shape == (n_dims, n_dims)
            if self.final_velocities is not None:
                assert self.final_velocities.shape == (n_atoms, n_dims)

    def extend(self, other: "Trajectory"):
        """Append other's frames; other's terminal state wins."""
        self.frames.extend(other.frames)
        self.boxes.extend(other.boxes)
        self.final_velocities = other.final_velocities
        self.final_barostat_volume_scale_factor = other.final_barostat_volume_scale_factor

    @classmethod
    def empty(cls):
        return Trajectory(StoredArrays(), [], None, None)


@dataclass
class SimulationResult:
    """(ref free_energy.py:294-314)"""

    final_result: PairBarResult
    plots: Optional[PairBarPlots]
    trajectories: list[Trajectory]
    md_params: MDParams
    intermediate_results: list[PairBarResult]

    @property
    def frames(self) -> list[StoredArrays]:
        return [traj.frames for traj in self.trajectories]

    @property
    def boxes(self) -> list[NDArray]:
        return [np.array(traj.boxes) for traj in self.trajectories]

    def compute_u_kn(self) -> tuple[NDArray, NDArray]:
        return compute_u_kn(self.trajectories, self.final_result.initial_states)


@dataclass
class HREXSimulationResult(SimulationResult):
    """(ref free_energy.py:316-356)"""

    hrex_diagnostics: HREXDiagnostics = None  # type: ignore[assignment]
    hrex_plots: Optional[HREXPlots] = None
    water_sampling_diagnostics: Optional[WaterSamplingDiagnostics] = None

    def extract_trajectories_by_replica(self, atom_idxs: NDArray) -> NDArray:
        """(n_replicas, n_frames, len(atom_idxs), 3) trajectories per replica."""
        trajs_by_state = np.array(
            [
                np.concatenate([chunk[:, atom_idxs] for chunk in traj.frames._chunks()], axis=0)
                for traj in self.trajectories
            ]
        )
        replica_idx_by_iter_by_state = np.asarray(self.hrex_diagnostics.replica_idx_by_state_by_iter).T
        state_idx_by_iter_by_replica = np.argsort(replica_idx_by_iter_by_state, axis=0)
        return np.take_along_axis(trajs_by_state, state_idx_by_iter_by_replica[:, :, None, None], axis=0)

    def extract_ligand_trajectories_by_replica(self):
        ligand_idxs = self.final_result.initial_states[0].ligand_idxs
        assert all(np.all(s.ligand_idxs == ligand_idxs) for s in self.final_result.initial_states)
        return self.extract_trajectories_by_replica(ligand_idxs)


def trajectories_by_replica_to_by_state(
    trajectory_by_iter_by_replica: NDArray,
    replica_idx_by_state_by_iter,
) -> NDArray:
    """Convert (replica, iters, ...) to (state, iters, ...) (ref :359-375)."""
    assert len(trajectory_by_iter_by_replica.shape) == 4
    replica_idx_by_iter_by_state = np.asarray(replica_idx_by_state_by_iter).T
    assert replica_idx_by_iter_by_state.shape == trajectory_by_iter_by_replica.shape[:2]
    return np.take_along_axis(
        trajectory_by_iter_by_replica, replica_idx_by_iter_by_state[:, :, None, None], axis=0
    )


def image_frames(initial_state: InitialState, frames, boxes) -> np.ndarray:
    """Image frames into the periodic box, recentered on the ligand centroid
    (visualisation only; ref free_energy.py:377-416)."""
    assert np.array(boxes).shape[1:] == (3, 3), "Boxes are not 3x3"
    assert len(frames) == len(boxes), "Number of frames and boxes don't match"

    hb_potential = get_bound_potential_by_type(initial_state.potentials, HarmonicBond).potential
    group_indices = get_group_indices(get_bond_list(hb_potential), len(initial_state.integrator.masses))

    def image_one(frame, box):
        assert frame.ndim == 2 and frame.shape[-1] == 3, "frames must have shape (N, 3)"
        # shift so the ligand centroid sits at the box center, then wrap groups
        shift = np.mean(frame[initial_state.ligand_idxs], axis=0) + np.diagonal(box) / 2
        return model_utils.image_frame(group_indices, frame - shift, box)

    return np.array([image_one(frame, box) for frame, box in zip(frames, boxes)])


class BaseFreeEnergy:
    """(ref free_energy.py:418-437)"""

    @staticmethod
    def _get_system_params_and_potentials(ff_params, topology, lamb: float):
        params_potential_pairs = [
            topology.parameterize_harmonic_bond(ff_params.hb_params),
            topology.parameterize_harmonic_angle(ff_params.ha_params),
            topology.parameterize_proper_torsion(ff_params.pt_params),
            topology.parameterize_improper_torsion(ff_params.it_params),
            topology.parameterize_nonbonded(
                ff_params.q_params,
                ff_params.q_params_intra,
                ff_params.lj_params,
                ff_params.lj_params_intra,
                lamb,
            ),
        ]
        params, potentials = zip(*params_potential_pairs)
        return params, potentials


class AbsoluteFreeEnergy(BaseFreeEnergy):
    """Absolute free energy of a molecule via 4D decoupling
    (ref free_energy.py:440-559). Serializable."""

    def __init__(self, mol, top):
        self.mol = mol
        self.top = top

    def prepare_host_edge(self, ff, host_config, lamb: float):
        """Returns (unbound_potentials, system_params, combined_masses)."""
        from timemachine_tpu.fe import topology as topology_mod
        from timemachine_tpu.fe.utils import get_mol_masses
        from timemachine_tpu.potentials import SummedPotential

        ligand_masses = get_mol_masses(self.mol)
        ff_params = ff.get_params()
        hgt = topology_mod.HostGuestTopology(
            host_config.host_system.get_U_fns(), self.top, host_config.num_water_atoms, ff, host_config.host_topology
        )

        final_params: list = []
        final_potentials: list = []
        combined_params, combined_potentials = self._get_system_params_and_potentials(ff_params, hgt, lamb)
        for params, pot in zip(combined_params, combined_potentials):
            # flatten SummedPotentials so downstream type-based dispatch works
            if isinstance(pot, SummedPotential):
                for partial_params, sub_pot in zip(pot.params_init, pot.potentials):
                    assert not isinstance(sub_pot, SummedPotential), "nested SummedPotential"
                    final_params.append(partial_params)
                    final_potentials.append(sub_pot)
            else:
                final_params.append(params)
                final_potentials.append(pot)
        combined_masses = self._combine(ligand_masses, np.array(host_config.masses))
        return tuple(final_potentials), tuple(final_params), combined_masses

    def prepare_vacuum_edge(self, ff):
        from timemachine_tpu.fe.utils import get_mol_masses

        ff_params = ff.get_params()
        ligand_masses = get_mol_masses(self.mol)
        final_params, final_potentials = self._get_system_params_and_potentials(ff_params, self.top, 0.0)
        return final_potentials, final_params, ligand_masses

    def prepare_combined_coords(self, host_coords=None):
        from timemachine_tpu.fe.utils import get_romol_conf

        return self._combine(get_romol_conf(self.mol), host_coords)

    def _combine(self, ligand_values, host_values=None):
        if host_values is None:
            return ligand_values
        return np.concatenate([host_values, ligand_values])


def get_water_sampler_params(initial_state: InitialState) -> NDArray:
    """Nonbonded parameters of the full system as seen by the water sampler
    (ref free_energy.py:561-608): ligand params from NonbondedInteractionGroup,
    host params from the all-pairs Nonbonded when a host is present."""
    nb_ixn_pot = get_bound_potential_by_type(initial_state.potentials, NonbondedInteractionGroup)
    water_sampler_params = np.array(nb_ixn_pot.params)

    if initial_state.barostat is not None:
        host_idxs = np.delete(np.arange(initial_state.x0.shape[0]), initial_state.ligand_idxs)
        water_idxs = np.delete(host_idxs, initial_state.protein_idxs)
        nb_all_pairs_params = np.asarray(get_bound_potential_by_type(initial_state.potentials, Nonbonded).params)
        assert (nb_all_pairs_params[water_idxs] == water_sampler_params[water_idxs]).all()
        water_sampler_params[host_idxs] = nb_all_pairs_params[host_idxs]

    assert water_sampler_params.shape[1] == 4
    return water_sampler_params


def get_context(initial_state: InitialState, md_params: Optional[MDParams] = None) -> Context:
    """Build a Context from an InitialState (ref free_energy.py:610-658).

    TPU note: there is no SummedPotential/GPU-impl split — the Context jits
    the sum of the state's potentials directly, and `set_params` takes the
    per-potential params list (flat concatenation also accepted via
    `set_flat_params`)."""
    # large condensed-phase hosts: route the all-pairs term through the fused
    # Pallas tile kernel (dense N^2 is fine for small/vacuum systems and on CPU)
    try:
        nb_bp = get_bound_potential_by_type(initial_state.potentials, Nonbonded)
    except ValueError:
        nb_bp = None
    if (
        nb_bp is not None
        and nb_bp.potential.impl == "dense"
        and nb_bp.potential.num_atoms >= 4096
        and jax.default_backend() != "cpu"
    ):
        nb_bp.potential.configure_pallas(initial_state.box0, initial_state.x0)

    movers = []
    if initial_state.barostat:
        movers.append(initial_state.barostat)
    if md_params is not None and md_params.water_sampling_params is not None:
        from timemachine_tpu.md.exchange.targeted_insertion import TIBDExchangeMove

        hb_potential = get_bound_potential_by_type(initial_state.potentials, HarmonicBond).potential
        group_indices = get_group_indices(get_bond_list(hb_potential), len(initial_state.integrator.masses))
        water_idxs = get_water_idxs(group_indices, ligand_idxs=initial_state.ligand_idxs)
        nb = get_bound_potential_by_type(initial_state.potentials, NonbondedInteractionGroup).potential
        water_params = get_water_sampler_params(initial_state)
        rng = np.random.default_rng(initial_state.integrator.seed)
        water_sampler_seed = int(rng.integers(np.iinfo(np.int32).max))
        wsp = md_params.water_sampling_params
        movers.append(
            TIBDExchangeMove(
                n_atoms=initial_state.x0.shape[0],
                ligand_idxs=np.asarray(initial_state.ligand_idxs),
                water_idxs=water_idxs,
                params=water_params,
                temperature=initial_state.integrator.temperature,
                beta=nb.beta,
                cutoff=nb.cutoff,
                radius=wsp.radius,
                seed=water_sampler_seed,
                n_proposals=wsp.n_proposals,
                interval=wsp.interval,
                batch_size=wsp.batch_size,
            )
        )
    return Context(
        initial_state.x0,
        initial_state.v0,
        initial_state.box0,
        initial_state.integrator,
        initial_state.potentials,
        movers=movers,
    )


def get_water_idxs(group_idxs: Sequence[NDArray], ligand_idxs: Optional[NDArray] = None) -> list[NDArray]:
    """Groups of exactly 3 atoms that aren't the ligand ⇒ waters
    (ref md/utils.py water selection)."""
    ligand_set = set(np.asarray(ligand_idxs).tolist()) if ligand_idxs is not None else set()
    return [g for g in group_idxs if len(g) == 3 and not (set(g.tolist()) & ligand_set)]


def sample_with_context_iter(
    ctxt: Context, md_params: MDParams, temperature: float, ligand_idxs: NDArray, batch_size: int
) -> Iterator[tuple[NDArray, NDArray, NDArray]]:
    """Yield batches of (frames, boxes, final_velocities) up to batch_size
    frames at a time (ref free_energy.py:660-763)."""
    if md_params.n_eq_steps:
        # equilibrate with a faster barostat, then restore (ref :700-710)
        original = ctxt.set_barostat_interval(15)
        ctxt.multiple_steps(n_steps=md_params.n_eq_steps, store_x_interval=0)
        if original is not None:
            ctxt.set_barostat_interval(original)
    assert np.all(np.isfinite(ctxt.get_x_t())), "Equilibration resulted in a nan"

    local = md_params.local_md_params
    rng = np.random.default_rng(md_params.seed)

    def produce_global(n_steps: int):
        coords, boxes = ctxt.multiple_steps(n_steps=n_steps, store_x_interval=md_params.steps_per_frame)
        return coords, boxes, ctxt.get_v_t()

    def produce_one_local_frame(steps: int):
        """One frame = (steps - local_steps) global steps then local_steps of
        local MD around a freshly-drawn sphere."""
        if steps < md_params.steps_per_frame:
            warn(
                f"Batch of sample has {steps} steps, less than batch size "
                f"{md_params.steps_per_frame}. Setting to {md_params.steps_per_frame}"
            )
            steps = md_params.steps_per_frame
        if steps > local.local_steps:
            ctxt.multiple_steps(n_steps=steps - local.local_steps)
        return ctxt.multiple_steps_local(
            local.local_steps,
            np.asarray(ligand_idxs, dtype=np.int32),
            k=local.k,
            radius=float(rng.uniform(local.min_radius, local.max_radius)),
            seed=int(rng.integers(np.iinfo(np.int32).max)),
            temperature=temperature,
            freeze_reference=local.freeze_reference,
        )

    def produce_local(n_steps: int):
        frames = [produce_one_local_frame(steps) for steps in batches(n_steps, md_params.steps_per_frame)]
        coords = np.concatenate([x for x, _ in frames])
        boxes = np.concatenate([b for _, b in frames])
        return coords, boxes, ctxt.get_v_t()

    produce = produce_global if local is None else produce_local
    for n_frames in batches(md_params.n_frames, batch_size):
        yield produce(n_frames * md_params.steps_per_frame)


def sample_with_context(
    ctxt: Context, md_params: MDParams, temperature: float, ligand_idxs: NDArray, max_buffer_frames: int
) -> Trajectory:
    """(ref free_energy.py:763-790)"""
    all_coords = StoredArrays()
    all_boxes: list[NDArray] = []
    final_velocities: Optional[NDArray] = None
    for batch_coords, batch_boxes, final_velocities in sample_with_context_iter(
        ctxt, md_params, temperature, ligand_idxs, max_buffer_frames
    ):
        all_coords.extend(batch_coords)
        all_boxes.extend(batch_boxes)

    assert len(all_coords) == md_params.n_frames
    assert len(all_boxes) == md_params.n_frames
    assert np.all(np.isfinite(all_coords[-1])), "Production resulted in a nan"

    barostat = ctxt.get_barostat()
    final_scale = float(barostat[1].volume_scale) if barostat is not None else None
    return Trajectory(all_coords, all_boxes, final_velocities, final_scale)


def sample(initial_state: InitialState, md_params: MDParams, max_buffer_frames: int) -> Trajectory:
    """(ref free_energy.py:790-818)"""
    ctxt = get_context(initial_state, md_params)
    return sample_with_context(
        ctxt, md_params, initial_state.integrator.temperature, initial_state.ligand_idxs, max_buffer_frames
    )


class IndeterminateEnergyWarning(UserWarning):
    pass


class MinOverlapWarning(UserWarning):
    pass


def estimate_free_energy_bar(u_kln_by_component: NDArray, temperature: float) -> BarResult:
    """Pair-BAR free energy estimate with per-component error decomposition
    (ref free_energy.py:824-882)."""
    if np.any(np.isnan(u_kln_by_component)):
        warn(
            "Encountered NaNs in u_kln matrix. Replacing each instance with inf prior to MBAR calculation",
            IndeterminateEnergyWarning,
        )
        u_kln_by_component = np.where(np.isnan(u_kln_by_component), np.inf, u_kln_by_component)

    kBT = BOLTZ * temperature
    u_kln = u_kln_by_component.sum(0)
    df, df_err = bar_with_pessimistic_uncertainty(u_kln)

    def component_err(comp) -> float:
        # a component whose fwd AND rev works are identically zero is
        # lambda-independent: its error is 0 by convention
        w_fwd, w_rev = works_from_ukln(comp)
        if np.all(np.isclose(w_fwd, 0.0)) and np.all(np.isclose(w_rev, 0.0)):
            return 0.0
        return df_and_err_from_u_kln(comp)[1] * kBT

    return BarResult(
        dG=df * kBT,
        dG_err=df_err * kBT,
        dG_err_by_component=np.array([component_err(comp) for comp in u_kln_by_component]),
        overlap=pair_overlap_from_ukln(u_kln),
        overlap_by_component=np.array([pair_overlap_from_ukln(comp) for comp in u_kln_by_component]),
        u_kln_by_component=u_kln_by_component,
    )


def make_pair_bar_plots(res: PairBarResult, temperature: float, prefix: str) -> PairBarPlots:
    from timemachine_tpu.fe import plots

    U_names = [type(p.potential).__name__ for p in res.initial_states[0].potentials]
    lambdas = [s.lamb for s in res.initial_states]
    overlap_detail_png = plots.plot_as_png_fxn(
        plots.plot_overlap_detail_figure,
        U_names,
        res.dGs,
        res.dG_errs,
        res.u_kln_by_component_by_lambda,
        temperature,
        prefix,
    )
    dG_errs_png = plots.plot_as_png_fxn(
        plots.plot_dG_errs_figure, U_names, lambdas, res.dG_errs, res.dG_err_by_component_by_lambda
    )
    overlap_summary_png = plots.plot_as_png_fxn(
        plots.plot_overlap_summary_figure, U_names, lambdas, res.overlaps, res.overlap_by_component_by_lambda
    )
    return PairBarPlots(dG_errs_png, overlap_summary_png, overlap_detail_png)


# -- compatibility assertions (ref free_energy.py:901-948, 1264-1298) --------


def assert_deep_eq(obj1, obj2, custom_assertion=lambda path, x1, x2: False):
    import dataclasses

    def is_dataclass_instance(obj):
        return dataclasses.is_dataclass(obj) and not isinstance(obj, type)

    def go(x1, x2, path=("$",)):
        if custom_assertion(path, x1, x2):
            pass
        elif is_dataclass_instance(x1) and is_dataclass_instance(x2):
            assert type(x1) is type(x2), f"types differ at {path}"
            for f in dataclasses.fields(x1):
                go(getattr(x1, f.name), getattr(x2, f.name), (*path, f.name))
        elif isinstance(x1, (np.ndarray, jnp.ndarray)) or isinstance(x2, (np.ndarray, jnp.ndarray)):
            assert np.array_equal(np.asarray(x1), np.asarray(x2)), f"arrays differ at {path}"
        elif isinstance(x1, (list, tuple)) and isinstance(x2, (list, tuple)):
            assert len(x1) == len(x2), f"lengths differ at {path}"
            for i, (y1, y2) in enumerate(zip(x1, x2)):
                go(y1, y2, (*path, i))
        else:
            assert x1 == x2, f"values differ at {path}: {x1} != {x2}"

    go(obj1, obj2)


def assert_potentials_compatible(bps1: Sequence[BoundPotential], bps2: Sequence[BoundPotential]):
    """States must differ ONLY in parameters for recompile-free set_params
    (ref free_energy.py:931-946)."""
    assert len(bps1) == len(bps2)

    for bp1, bp2 in zip(bps1, bps2):
        assert type(bp1.potential) is type(bp2.potential)
        root = bp1.potential

        def custom_assertion(path, x1, x2):
            # ignore `params` values, and execution-configuration fields that
            # get_context mutates on sampled states (dense->pallas impl switch,
            # tile sizing) — they select a kernel, not physics, and set_params
            # compatibility is governed by the context's own compiled program.
            # Exec-config fields are exempted only where their own class
            # declares them (_EXEC_CONFIG_FIELDS), so a future potential with
            # a physics-meaningful field of the same name still gets checked.
            if len(path) < 1 or not isinstance(path[-1], str):
                return False
            if path[-1] == "params":
                return True
            parent = root
            for p in path[1:-1]:  # path[0] is the "$" sentinel
                parent = parent[p] if isinstance(p, int) else getattr(parent, p)
            return path[-1] in getattr(type(parent), "_EXEC_CONFIG_FIELDS", frozenset())

        assert_deep_eq(bp1.potential, bp2.potential, custom_assertion)


def assert_ensembles_compatible(state_a: InitialState, state_b: InitialState):
    """xvb swap between a and b must be valid (ref free_energy.py:1264-1298)."""
    intg_a, intg_b = state_a.integrator, state_b.integrator
    assert (np.asarray(intg_a.masses) == np.asarray(intg_b.masses)).all()
    assert intg_a.temperature == intg_b.temperature

    assert (state_a.barostat is None) == (state_b.barostat is None), "should both be NVT or both be NPT"

    if state_a.barostat and state_b.barostat:
        baro_a, baro_b = state_a.barostat, state_b.barostat
        assert baro_a.pressure == baro_b.pressure
        assert baro_a.temperature == baro_b.temperature
        assert intg_a.temperature == baro_a.temperature
        water_sampler_params_a = get_water_sampler_params(state_a)
        water_sampler_params_b = get_water_sampler_params(state_b)
        assert (state_a.ligand_idxs == state_b.ligand_idxs).all()
        non_ligand_idxs = np.delete(np.arange(state_a.x0.shape[0]), state_a.ligand_idxs)
        assert (water_sampler_params_a[non_ligand_idxs] == water_sampler_params_b[non_ligand_idxs]).all()
    else:
        assert (state_a.box0 == state_b.box0).all()


# -- u_kln generation (ref free_energy.py:1148-1383) -------------------------


def make_u_kl_fxn(trajs: Sequence[Trajectory], initial_states: Sequence[InitialState]):
    """fxn(k, l) = u of trajs[k] frames evaluated in state l's ensemble,
    in reduced units (ref free_energy.py:1220-1262). Batched via jit+vmap
    with chunking instead of execute_batch_sparse."""
    kBTs = [BOLTZ * state.integrator.temperature for state in initial_states]
    assert len(set(kBTs)) == 1

    s_0 = initial_states[0]
    sp = make_summed_potential(s_0.potentials)
    all_params = [np.asarray(sp.params)]
    for s in initial_states[1:]:
        assert_ensembles_compatible(s_0, s)
        assert_potentials_compatible(s_0.potentials, s.potentials)
        all_params.append(np.asarray(make_summed_potential(s.potentials).params))
    all_params = np.array(all_params)

    @jax.jit
    def batch_U(xs, boxes, params):
        return jax.vmap(lambda x, b: sp.potential(x, params, b))(xs, boxes)

    def u_kl(k: int, l: int):
        coords = np.array(trajs[k].frames)
        boxes = np.array(trajs[k].boxes)
        Us = np.concatenate(
            [np.asarray(batch_U(coords[i : i + 100], boxes[i : i + 100], all_params[l])) for i in range(0, len(coords), 100)]
        )
        Us = np.nan_to_num(Us, nan=+np.inf)
        return Us / kBTs[l]

    return u_kl


def compute_u_kn(trajs: Sequence[Trajectory], initial_states: Sequence[InitialState]) -> tuple[NDArray, NDArray]:
    """MBAR input (u_kn, N_k) over all states (ref free_energy.py:1300-1315)."""
    from timemachine_tpu.fe.mbar import kln_to_kn

    u_kl = make_u_kl_fxn(trajs, initial_states)
    N_k = [len(traj.frames) for traj in trajs]
    K = len(N_k)
    assert len(initial_states) == K

    u_kln = np.nan * np.zeros((K, K, max(N_k)))
    for k in range(K):
        for l in range(K):
            u_kln[k, l, : N_k[k]] = u_kl(k, l)
    return kln_to_kn(u_kln, np.array(N_k)), np.array(N_k)


def generate_pair_bar_ulkns(
    initial_states: Sequence[InitialState],
    samples_by_state: Sequence[Trajectory],
    temperature: float,
    unbound_impls=None,
) -> NDArray:
    """u_klns for each adjacent pair, per component: shape
    (n_states-1, n_components, 2, 2, n_frames). Each state's frames are
    loaded once and evaluated under its neighbors' parameters
    (ref free_energy.py:1317-1381)."""
    assert len(initial_states) > 0
    assert len(initial_states) == len(samples_by_state)
    pots = [bp.potential for bp in initial_states[0].potentials]
    n_comp = len(pots)
    kBT = temperature * BOLTZ

    def batch_u_comp(j: int):
        # per-POTENTIAL shared jit (see energy_decomposition._batched_u_for):
        # fresh jits per call would accumulate compile caches over a campaign
        from timemachine_tpu.fe.energy_decomposition import _batched_u_cache

        pot = pots[j]
        key = (pot, "vmap")
        if key not in _batched_u_cache:

            @jax.jit
            def batched(xs, boxes, params):
                return jax.vmap(lambda x, b: pot(x, params, b))(xs, boxes)

            _batched_u_cache[key] = batched
        return _batched_u_cache[key]

    n_states = len(initial_states)
    energies = np.zeros((n_states, n_states, n_comp), dtype=object)
    for i, state in enumerate(initial_states):
        frames = np.array(samples_by_state[i].frames)
        boxes = np.asarray(samples_by_state[i].boxes)
        state_idxs = [idx for idx in (i - 1, i, i + 1) if 0 <= idx < n_states]
        for j in range(n_comp):
            fn = batch_u_comp(j)
            for p_idx in state_idxs:
                params = jnp.asarray(np.asarray(initial_states[p_idx].potentials[j].params))
                us = np.asarray(fn(frames, boxes, params)) / kBT
                energies[i, p_idx, j] = us

    n_frames = len(energies[0][0][0])
    u_kln_by_component_by_lambda = np.empty((n_states - 1, n_comp, 2, 2, n_frames))
    for i in range(n_states - 1):
        states = (i, i + 1)
        for j in range(n_comp):
            for l in range(2):
                for k in range(2):
                    u_kln_by_component_by_lambda[i, j, k, l] = energies[states[k]][states[l]][j]
    return u_kln_by_component_by_lambda


def run_sims_sequential(
    initial_states: Sequence[InitialState],
    md_params: MDParams,
    temperature: float,
) -> tuple[PairBarResult, list[Trajectory]]:
    """Simulate each state independently, then pair-BAR
    (ref free_energy.py:949-1000)."""
    for s in initial_states[1:]:
        assert_potentials_compatible(initial_states[0].potentials, s.potentials)

    # ONE Context reused across windows: per-window Contexts each recompile
    # their scan runners (compile-cache discipline, ARCHITECTURE.md)
    ctxt = get_context(initial_states[0], md_params)
    stored_trajectories = []
    for initial_state in initial_states:
        ctxt.reset_for_state(initial_state)
        traj = sample_with_context(
            ctxt, md_params, initial_state.integrator.temperature, initial_state.ligand_idxs, max_buffer_frames=100
        )
        print(f"completed simulation at lambda={initial_state.lamb}!")
        stored_trajectories.append(traj)

    neighbor_ulkns = generate_pair_bar_ulkns(initial_states, stored_trajectories, temperature)
    pair_bar_results = [estimate_free_energy_bar(u, temperature) for u in neighbor_ulkns]
    return PairBarResult(list(initial_states), pair_bar_results), stored_trajectories


def run_sims_bisection(
    initial_lambdas: Sequence[float],
    make_initial_state: Callable[[float], InitialState],
    md_params: MDParams,
    n_bisections: int,
    temperature: float,
    min_overlap: Optional[float] = None,
    verbose: bool = True,
) -> tuple[list[PairBarResult], list[Trajectory]]:
    """Greedy bisection of the lambda interval with the lowest BAR overlap
    (ref free_energy.py:1006-1146)."""
    assert len(initial_lambdas) >= 2
    assert np.all(np.diff(initial_lambdas) > 0), "initial lambda schedule must be monotonically increasing"

    lambdas = list(initial_lambdas)
    get_initial_state = cache(make_initial_state)

    # ONE Context reused across bisection states (see run_sims_sequential)
    _ctxt_holder: list = []

    @cache
    def get_samples(lamb: float) -> Trajectory:
        initial_state = get_initial_state(lamb)
        if not _ctxt_holder:
            _ctxt_holder.append(get_context(initial_state, md_params))
        ctxt = _ctxt_holder[0]
        ctxt.reset_for_state(initial_state)
        return sample_with_context(
            ctxt, md_params, initial_state.integrator.temperature, initial_state.ligand_idxs, max_buffer_frames=100
        )

    potentials_0 = get_initial_state(lambdas[0]).potentials
    pots = [bp.potential for bp in potentials_0]

    def get_state(lamb: float) -> EnergyDecomposedState:
        initial_state = get_initial_state(lamb)
        assert_potentials_compatible(initial_state.potentials, potentials_0)
        traj = get_samples(lamb)
        batch_u_fns = get_batch_u_fns(pots, [p.params for p in initial_state.potentials], temperature)
        return EnergyDecomposedState(traj.frames, traj.boxes, batch_u_fns)

    @cache
    def get_bar_result(lamb1: float, lamb2: float) -> BarResult:
        u_kln_by_component = compute_energy_decomposed_u_kln([get_state(lamb1), get_state(lamb2)])
        return estimate_free_energy_bar(u_kln_by_component, temperature)

    # the greedy step splits the pair with the highest cost = -log(overlap)
    def cost_fn(lamb1: float, lamb2: float) -> float:
        overlap = get_bar_result(lamb1, lamb2).overlap
        return -np.log(overlap) if overlap != 0.0 else float("inf")

    def schedule_result(schedule: Sequence[float]) -> PairBarResult:
        return PairBarResult(
            [get_initial_state(lamb) for lamb in schedule],
            [get_bar_result(l1, l2) for l1, l2 in zip(schedule, schedule[1:])],
        )

    def narrate(schedule, iteration, costs, left_idx, lamb_new):
        lo, hi = schedule[left_idx], schedule[left_idx + 1]
        threshold = f" <= {min_overlap:.3g} " if min_overlap is not None else " (min_overlap == None) "
        print(
            f"Bisection iteration {iteration} (of {n_bisections}): "
            f"Current minimum BAR overlap {np.exp(-max(costs)):.3g}{threshold}"
            f"between states at λ={lo:.3g} and λ={hi:.3g}. Sampling new state at λ={lamb_new:.3g}…"
        )

    results = [schedule_result(lambdas)]
    converged = False
    for iteration in range(n_bisections):
        if min_overlap is not None and min(results[-1].overlaps) > min_overlap:
            converged = True
            if verbose:
                print(f"All BAR overlaps exceed min_overlap={min_overlap}. Returning after {iteration} iterations.")
            break

        prev_schedule = lambdas
        lambdas, info = greedy_bisection_step(lambdas, cost_fn, lambda a, b: (a + b) / 2.0)
        if verbose:
            narrate(prev_schedule, iteration, *info)
        results.append(schedule_result(lambdas))

    if not converged and min_overlap is not None and min(results[-1].overlaps) < min_overlap:
        warn(
            f"Reached n_bisections={n_bisections} iterations without achieving min_overlap={min_overlap}. "
            f"The minimum BAR overlap was {np.min(results[-1].overlaps)}.",
            MinOverlapWarning,
        )

    trajectories = [get_samples(lamb) for lamb in lambdas]
    return results, trajectories


def compute_potential_matrix(
    potential,
    hrex: HREX,
    params_by_state: NDArray,
    max_delta_states: Optional[int] = None,
) -> NDArray:
    """(n_replicas, n_states) energy matrix; entries further than
    max_delta_states from a replica's current state are +inf
    (ref free_energy.py:1148-1201). One jit+vmap sweep on device replaces
    execute_batch_sparse."""
    coords = np.array([xvb.coords for xvb in hrex.replicas])
    boxes = np.array([xvb.box for xvb in hrex.replicas])
    n_states = len(hrex.replicas)

    @jax.jit
    def sweep(xs, bs, ps):
        return jax.vmap(lambda x, b, p: potential(x, p, b))(xs, bs, ps)

    if max_delta_states is not None:
        k = max_delta_states
        state_idx = np.argsort(hrex.replica_idx_by_state)
        neighbor_state_idxs = state_idx[:, None] + np.arange(-k, k + 1)[None, :]
        valid = np.nonzero((0 <= neighbor_state_idxs) & (neighbor_state_idxs < n_states))
        coords_batch_idxs = valid[0]
        params_batch_idxs = neighbor_state_idxs[valid]
        U = np.asarray(
            sweep(
                coords[coords_batch_idxs],
                boxes[coords_batch_idxs],
                jnp.asarray(params_by_state)[params_batch_idxs],
            )
        )
        U_kl = np.full((n_states, n_states), np.inf)
        U_kl[coords_batch_idxs, params_batch_idxs] = U
    else:
        xs = np.repeat(coords, n_states, axis=0)
        bs = np.repeat(boxes, n_states, axis=0)
        ps = jnp.asarray(params_by_state)[np.tile(np.arange(n_states), n_states)]
        U_kl = np.asarray(sweep(xs, bs, ps)).reshape(n_states, n_states)
    return U_kl


def verify_and_sanitize_potential_matrix(
    U_kl: NDArray, replica_idx_by_state, abs_energy_threshold: float = 1e9
) -> NDArray:
    """(ref free_energy.py:1203-1218)"""
    replica_energies = np.diagonal(U_kl[np.asarray(replica_idx_by_state)])
    assert np.all(np.isfinite(replica_energies)), "Replicas have non-finite energies"
    assert np.all(np.abs(replica_energies) < abs_energy_threshold), "Energies larger in magnitude than tolerated"
    if np.any(np.isnan(U_kl)):
        warn("Encountered NaNs in potential matrix. Replacing each instance with inf", IndeterminateEnergyWarning)
        U_kl = np.where(np.isnan(U_kl), np.inf, U_kl)
    return U_kl


def run_sims_hrex(
    initial_states: Sequence[InitialState],
    md_params: MDParams,
    n_swap_attempts_per_iter: Optional[int] = None,
    print_diagnostics_interval: Optional[int] = 10,
) -> tuple[PairBarResult, list[Trajectory], HREXDiagnostics, Optional[WaterSamplingDiagnostics]]:
    """Nearest-neighbor HREX over a ladder of states — replica-parallel.

    Replaces the reference's time-multiplexed inner loop
    (ref free_energy.py:1383-1643: one Context, set_params/set_x_t per
    replica per frame, a host round-trip each) with the sharded runner
    (parallel/replica_exchange.py): every HREX iteration — all K MD segments,
    the banded U_kl matrix, and the swap batch — is ONE device program,
    vmapped over replicas and partitioned over the available devices.

    Local MD inside HREX segments still runs through the single-replica
    fallback (_run_sims_hrex_time_multiplexed).
    """
    assert md_params.hrex_params is not None

    for s in initial_states[1:]:
        assert_ensembles_compatible(initial_states[0], s)
        assert_potentials_compatible(initial_states[0].potentials, s.potentials)

    if md_params.local_md_params is not None:
        return _run_sims_hrex_time_multiplexed(
            initial_states, md_params, n_swap_attempts_per_iter, print_diagnostics_interval
        )

    import math

    from timemachine_tpu.md.barostat import MonteCarloBarostat as _MCBarostat
    from timemachine_tpu.md.exchange.targeted_insertion import TIBDExchangeMove as _TIBD
    from timemachine_tpu.parallel.replica_exchange import ReplicaExchangeRunner, make_replica_mesh

    n_states = len(initial_states)
    if n_swap_attempts_per_iter is None:
        n_swap_attempts_per_iter = get_swap_attempts_per_iter_heuristic(n_states)

    context = get_context(initial_states[0], md_params=md_params)
    temperature = initial_states[0].integrator.temperature

    params_list_by_state = [[np.asarray(bp.params) for bp in s.potentials] for s in initial_states]
    water_params_by_state = (
        [get_water_sampler_params(s) for s in initial_states]
        if md_params.water_sampling_params is not None
        else None
    )

    state_idxs = list(range(n_states))
    neighbor_pairs = list(zip(state_idxs, state_idxs[1:]))
    strip_identity_pair = False
    if n_states == 2:
        # identity move keeps the 2-state chain aperiodic (ref :1455-1457)
        neighbor_pairs = [(0, 0), *neighbor_pairs]
        strip_identity_pair = True

    # shard the replica axis over as many devices as divide K evenly
    n_shards = math.gcd(n_states, len(jax.devices()))
    mesh = make_replica_mesh(jax.devices()[:n_shards]) if n_shards > 1 else None

    runner = ReplicaExchangeRunner(
        context,
        params_list_by_state,
        temperature=temperature,
        neighbor_pairs=neighbor_pairs,
        n_swap_attempts_per_iter=n_swap_attempts_per_iter,
        max_delta_states=md_params.hrex_params.max_delta_states,
        seed=md_params.seed,
        water_params_by_state=water_params_by_state,
        mesh=mesh,
    )
    runner.initialize(
        [s.x0 for s in initial_states],
        [s.v0 for s in initial_states],
        [s.box0 for s in initial_states],
    )
    runner.equilibrate(md_params.n_eq_steps)

    tibd_idx = [i for i, m in enumerate(context.movers) if isinstance(m, _TIBD)]
    barostat_idx = [i for i, m in enumerate(context.movers) if isinstance(m, _MCBarostat)]

    def water_counters_by_replica():
        if not tibd_idx:
            return None
        i = tibd_idx[0]
        return (
            np.asarray(runner.mover_states[i].n_accepted).copy(),
            np.asarray(runner.mover_states[i].n_proposed).copy(),
        )

    samples_by_state: list[Trajectory] = [Trajectory.empty() for _ in initial_states]
    replica_idx_by_state_by_iter: list[list[int]] = []
    fraction_accepted_by_pair_by_iter: list[list[tuple[int, int]]] = []
    water_counts_by_state_by_iter: list[list[tuple[int, int]]] = []

    begin_loop_time = time.perf_counter()
    last_update_time = begin_loop_time

    for current_frame in range(md_params.n_frames):
        counters_before = water_counters_by_replica()
        res = runner.advance_frame(md_params.steps_per_frame)
        perm = res.replica_idx_by_state

        for s, samples in enumerate(samples_by_state):
            samples.frames.extend(res.frames_by_state[s][None])
            samples.boxes.extend(res.boxes_by_state[s][None])

        pair_stats = list(zip(res.accepted_by_pair.tolist(), res.proposed_by_pair.tolist()))
        if strip_identity_pair:
            pair_stats = pair_stats[1:]

        replica_idx_by_state_by_iter.append(perm.tolist())
        fraction_accepted_by_pair_by_iter.append(pair_stats)

        if counters_before is not None:
            acc_now, prop_now = water_counters_by_replica()
            d_acc = acc_now - counters_before[0]
            d_prop = prop_now - counters_before[1]
            water_counts_by_state_by_iter.append(
                [(int(d_acc[perm[s]]), int(d_prop[perm[s]])) for s in range(n_states)]
            )

        if print_diagnostics_interval and (current_frame + 1) % print_diagnostics_interval == 0:
            current_time = time.perf_counter()

            def get_swap_acceptance_rates(pair_stats):
                return [acc / prop if prop else np.nan for acc, prop in pair_stats]

            instantaneous_rates = get_swap_acceptance_rates(pair_stats)
            average_rates = get_swap_acceptance_rates(np.sum(fraction_accepted_by_pair_by_iter, axis=0))
            wall_time_per_frame_average = (current_time - begin_loop_time) / (current_frame + 1)
            wall_time_per_frame_current = (current_time - last_update_time) / print_diagnostics_interval
            remaining = wall_time_per_frame_average * (md_params.n_frames - (current_frame + 1))

            def format_rates(rs):
                return " |".join(f"{r * 100.0:5.1f}%" for r in rs)

            print("Frame", current_frame + 1)
            print(
                f"{remaining:.1f} s remaining at {wall_time_per_frame_average:.2f} s/frame "
                f"({wall_time_per_frame_current:.2f} s/frame since last message)"
            )
            print("HREX acceptance rates, current:", format_rates(instantaneous_rates))
            print("HREX acceptance rates, average:", format_rates(average_rates))
            print("HREX replica permutation      :", perm.tolist())
            print()
            last_update_time = current_time

    final_x, final_v, final_boxes = runner.final_state_arrays()
    final_scales = (
        runner.mover_state_field_by_state(barostat_idx[0], "volume_scale") if barostat_idx else None
    )
    for s, samples in enumerate(samples_by_state):
        samples.final_velocities = final_v[s]
        samples.final_barostat_volume_scale_factor = (
            float(final_scales[s]) if final_scales is not None else None
        )

    neighbor_ulkns_by_component = generate_pair_bar_ulkns(initial_states, samples_by_state, temperature)
    pair_bar_results = [estimate_free_energy_bar(u, temperature) for u in neighbor_ulkns_by_component]

    hrex_diagnostics = HREXDiagnostics(replica_idx_by_state_by_iter, fraction_accepted_by_pair_by_iter)
    water_diagnostics = (
        WaterSamplingDiagnostics(np.array(water_counts_by_state_by_iter))
        if md_params.water_sampling_params is not None
        else None
    )
    return PairBarResult(list(initial_states), pair_bar_results), samples_by_state, hrex_diagnostics, water_diagnostics


def _print_hrex_progress(
    current_frame,
    n_frames,
    begin_loop_time,
    last_update_time,
    interval,
    accepted_proposed_by_pair,
    accepted_proposed_by_pair_by_iter,
    replica_idx_by_state,
):
    """Periodic wall-clock + swap-rate report for the time-multiplexed HREX
    loop; returns the new last-update timestamp."""
    now = time.perf_counter()
    done = current_frame + 1

    def rates(pairs):
        return " |".join(f"{(acc / prop if prop else np.nan) * 100.0:5.1f}%" for acc, prop in pairs)

    s_per_frame = (now - begin_loop_time) / done
    print("Frame", done)
    print(
        f"{s_per_frame * (n_frames - done):.1f} s remaining at {s_per_frame:.2f} s/frame "
        f"({(now - last_update_time) / interval:.2f} s/frame since last message)"
    )
    print("HREX acceptance rates, current:", rates(accepted_proposed_by_pair))
    print("HREX acceptance rates, average:", rates(np.sum(accepted_proposed_by_pair_by_iter, axis=0)))
    print("HREX replica permutation      :", replica_idx_by_state)
    print()
    return now


def _run_sims_hrex_time_multiplexed(
    initial_states: Sequence[InitialState],
    md_params: MDParams,
    n_swap_attempts_per_iter: Optional[int] = None,
    print_diagnostics_interval: Optional[int] = 10,
) -> tuple[PairBarResult, list[Trajectory], HREXDiagnostics, Optional[WaterSamplingDiagnostics]]:
    """Single-replica-at-a-time HREX fallback (reference-style driver,
    ref free_energy.py:1383-1643): one Context, recompile-free set_params per
    replica segment. Used only when segments need machinery the sharded
    runner lacks (currently: local MD)."""
    assert md_params.hrex_params is not None

    if n_swap_attempts_per_iter is None:
        n_swap_attempts_per_iter = get_swap_attempts_per_iter_heuristic(len(initial_states))

    context = get_context(initial_states[0], md_params=md_params)
    temperature = initial_states[0].integrator.temperature
    ligand_idxs = initial_states[0].ligand_idxs
    summed = make_summed_potential(initial_states[0].potentials)

    params_by_state = np.array(
        [np.asarray(make_summed_potential(s.potentials).params) for s in initial_states]
    )
    params_list_by_state = [[np.asarray(bp.params) for bp in s.potentials] for s in initial_states]

    state_idxs = list(range(len(initial_states)))
    neighbor_pairs = list(zip(state_idxs, state_idxs[1:]))
    if len(initial_states) == 2:
        # identity move for aperiodicity (ref :1455-1457)
        neighbor_pairs = [(0, 0), *neighbor_pairs]

    hrex = HREX.from_replicas([CoordsVelBox(s.x0, s.v0, s.box0) for s in initial_states])

    samples_by_state: list[Trajectory] = [Trajectory.empty() for _ in initial_states]
    replica_idx_by_state_by_iter: list[list[int]] = []
    fraction_accepted_by_pair_by_iter: list[list[tuple[int, int]]] = []
    water_counts_by_state_by_iter: list[list[tuple[int, int]]] = []

    from timemachine_tpu.md.exchange.targeted_insertion import TIBDExchangeMove as _TIBD

    # per-state water-sampler params: ligand rows differ across lambda windows
    # (ref free_energy.py:1502-1519 swaps them into the mover per segment)
    water_params_by_state = (
        [get_water_sampler_params(s) for s in initial_states]
        if md_params.water_sampling_params is not None
        else None
    )

    def _set_water_params(state_idx: int) -> None:
        if water_params_by_state is None:
            return
        context.set_water_sampler_params(water_params_by_state[state_idx])

    def _water_counts() -> tuple[int, int]:
        acc = prop = 0
        for m, st in zip(context.movers, context._mover_states):
            if isinstance(m, _TIBD):
                acc += int(st.n_accepted)
                prop += int(st.n_proposed)
        return acc, prop

    begin_loop_time = time.perf_counter()
    last_update_time = begin_loop_time

    for current_frame in range(md_params.n_frames):
        water_counts_iter: list[tuple[int, int]] = [(0, 0)] * len(initial_states)

        def sample_replica(xvb: CoordsVelBox, state_idx: int):
            context.set_x_t(xvb.coords)
            context.set_v_t(xvb.velocities)
            context.set_box(xvb.box)
            context.set_params(params_list_by_state[state_idx])
            _set_water_params(state_idx)
            acc0, prop0 = _water_counts()

            # collision-free per-(replica, frame) noise seed: the reference's
            # state_idx + current_frame gives replica k at frame f+1 the same
            # seed as replica k+1 at frame f, and drops the user seed
            md_params_replica = replace(
                md_params,
                n_frames=1,
                n_eq_steps=md_params.n_eq_steps if current_frame == 0 else 0,
                seed=md_params.seed + state_idx * md_params.n_frames + current_frame,
            )
            frame, box, final_velos = next(
                sample_with_context_iter(context, md_params_replica, temperature, ligand_idxs, batch_size=1)
            )
            assert frame.shape[0] == 1
            barostat = context.get_barostat()
            scale = float(barostat[1].volume_scale) if barostat is not None else None
            acc1, prop1 = _water_counts()
            water_counts_iter[state_idx] = (acc1 - acc0, prop1 - prop0)
            return frame[-1], box[-1], final_velos, scale

        def replica_from_samples(last_sample) -> CoordsVelBox:
            frame, box, velos, _ = last_sample
            return CoordsVelBox(frame, velos, box)

        hrex, samples_by_state_iter = hrex.sample_replicas(sample_replica, replica_from_samples)

        U_kl_raw = compute_potential_matrix(
            summed.potential, hrex, params_by_state, md_params.hrex_params.max_delta_states
        )
        U_kl = verify_and_sanitize_potential_matrix(U_kl_raw, hrex.replica_idx_by_state)
        log_q_kl = -U_kl / (BOLTZ * temperature)

        replica_idx_by_state_by_iter.append(list(hrex.replica_idx_by_state))

        hrex, fraction_accepted_by_pair = hrex.attempt_neighbor_swaps_fast(
            neighbor_pairs,
            log_q_kl,
            n_swap_attempts_per_iter,
            md_params.seed + current_frame + 1,
        )

        if len(initial_states) == 2:
            fraction_accepted_by_pair = fraction_accepted_by_pair[1:]

        for samples, (xs, boxes, velos, scale) in zip(samples_by_state, samples_by_state_iter):
            samples.frames.extend([xs])
            samples.boxes.extend([boxes])
            samples.final_velocities = velos
            samples.final_barostat_volume_scale_factor = scale

        fraction_accepted_by_pair_by_iter.append(fraction_accepted_by_pair)
        water_counts_by_state_by_iter.append(water_counts_iter)

        if print_diagnostics_interval and (current_frame + 1) % print_diagnostics_interval == 0:
            last_update_time = _print_hrex_progress(
                current_frame,
                md_params.n_frames,
                begin_loop_time,
                last_update_time,
                print_diagnostics_interval,
                fraction_accepted_by_pair,
                fraction_accepted_by_pair_by_iter,
                hrex.replica_idx_by_state,
            )

    neighbor_ulkns_by_component = generate_pair_bar_ulkns(initial_states, samples_by_state, temperature)
    pair_bar_results = [estimate_free_energy_bar(u, temperature) for u in neighbor_ulkns_by_component]

    hrex_diagnostics = HREXDiagnostics(replica_idx_by_state_by_iter, fraction_accepted_by_pair_by_iter)
    water_diagnostics = (
        WaterSamplingDiagnostics(np.array(water_counts_by_state_by_iter))
        if md_params.water_sampling_params is not None
        else None
    )
    return PairBarResult(list(initial_states), pair_bar_results), samples_by_state, hrex_diagnostics, water_diagnostics
