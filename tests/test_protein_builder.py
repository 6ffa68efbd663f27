"""Native (OpenMM-free) protein host path: PDB chemistry perception
(chem/pdb.py) and the SMIRNOFF-host build (md/builders.py
_build_protein_system_native), through to a complex-leg RBFE (nightly).

Reference behavior being covered: md/builders.py:197-313 build_protein_system
and the complex leg of fe/rbfe.py run_complex."""

import warnings

import numpy as np
import pytest

DATA = "/root/reference/timemachine/testsystems/data"


def _perceive(pdb_name):
    from timemachine_tpu.chem.pdb import parse_pdb, protein_mol_from_pdb

    return protein_mol_from_pdb(parse_pdb(f"{DATA}/{pdb_name}"))


def test_pdb_perception_capped_peptides():
    # capped_hhh: ACE-HIS3-NME with one protonated histidine -> net +1
    m = _perceive("capped_hhh.pdb")
    assert m.num_atoms == 64
    assert m.total_charge() == 1
    # imidazole rings perceived aromatic (under the AM1BCC model; the MDL
    # model excludes pyrrole-type 5-rings by design)
    arom = m.aromatic_atoms(model="am1bcc")
    ring_atoms = [i for i in range(m.num_atoms) if m.atom_in_ring(i)]
    assert len(ring_atoms) == 15  # 3 His rings x 5 atoms
    assert set(ring_atoms) <= set(arom)

    m2 = _perceive("capped_kkmi.pdb")
    assert m2.total_charge() == 2  # two lysines

    m3 = _perceive("capped_phenyl_tyro.pdb")
    assert m3.total_charge() == 0


def test_pdb_perception_hif2a_protein():
    # the full HIF2A PAS-B domain: net charge must equal the residue-count
    # prediction (9 GLU + 5 ASP - 5 LYS - 4 ARG = -5)
    from timemachine_tpu.chem.pdb import parse_pdb, protein_mol_from_pdb

    s = parse_pdb(f"{DATA}/hif2a_nowater_min.pdb")
    m = protein_mol_from_pdb(s)
    assert m.num_atoms == 1758
    n = {"GLU": 0, "ASP": 0, "LYS": 0, "ARG": 0}
    for r in s.residues:
        if r.name in n:
            n[r.name] += 1
    assert m.total_charge() == -(n["GLU"] + n["ASP"]) + n["LYS"] + n["ARG"]
    # every residue's heavy atoms were consumed by a template (no leftovers
    # is already enforced); bond count: atoms - 1 + rings
    assert m.num_bonds == 1778


def test_pdb_perception_rejects_broken_valence():
    from timemachine_tpu.chem.pdb import PDBChemistryError, parse_pdb, protein_mol_from_pdb

    # serine missing its hydroxyl hydrogen -> O valence 1, must be rejected
    pdb = "\n".join(
        [
            "ATOM      1  N   GLY A   1       0.000   0.000   0.000  1.00  0.00           N",
            "ATOM      2  CA  GLY A   1       1.450   0.000   0.000  1.00  0.00           C",
            "ATOM      3  C   GLY A   1       2.000   1.400   0.000  1.00  0.00           C",
            "ATOM      4  O   GLY A   1       1.300   2.400   0.000  1.00  0.00           O",
        ]
    )
    with pytest.raises(PDBChemistryError):
        protein_mol_from_pdb(parse_pdb(pdb))


def test_native_protein_host_build():
    import jax

    from timemachine_tpu.constants import ONE_4PI_EPS0
    from timemachine_tpu.md.builders import build_protein_system

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = build_protein_system(f"{DATA}/capped_hhh.pdb", "amber99sbildn", "tip3p", box_margin=0.2)
        # Amber host physics is native default: no SMIRNOFF-fallback warning,
        # only the ILDN-corrections caveat for the "ildn" spelling.
        assert not any("NATIVE SMIRNOFF-host" in str(x.message) for x in w)
        assert any("ILDN side-chain chi corrections" in str(x.message) for x in w)

    n_p = cfg.conf.shape[0] - cfg.num_water_atoms
    assert n_p == 64
    assert cfg.num_water_atoms % 3 == 0
    assert cfg.masses.shape[0] == cfg.conf.shape[0]

    # net charge preserved through parameterization: protein +1, waters 0
    q = np.asarray(cfg.host_system.nonbonded_all_pairs.params)[:, 0] / np.sqrt(ONE_4PI_EPS0)
    assert abs(q.sum() - 1.0) < 1e-6
    assert abs(q[n_p:].sum()) < 1e-6

    # energies and forces finite at the built conformation
    hs = cfg.host_system

    def total_u(x):
        return sum(
            getattr(hs, nm).potential(x, getattr(hs, nm).params, cfg.box)
            for nm in ("bond", "angle", "proper", "improper", "nonbonded_all_pairs")
        )

    u, g = jax.value_and_grad(total_u)(cfg.conf)
    assert np.isfinite(float(u))
    assert np.all(np.isfinite(np.asarray(g)))

    # topology record: one HostResidue per protein residue + per water
    res_names = [r.name for r in cfg.host_topology.residues]
    assert res_names[0] == "ACE" and res_names[4] in ("NMA", "NME")
    assert res_names[5:] == ["HOH"] * (cfg.num_water_atoms // 3)
    # groups: protein is one connected component, waters 3-atom groups
    sizes = sorted(len(g) for g in cfg.host_topology.group_idxs)
    assert sizes[-1] == n_p and set(sizes[:-1]) == {3}


@pytest.mark.nightly
def test_complex_leg_end_to_end():
    """run_complex with a capped-peptide host at toy frame counts: the full
    complex-leg pipeline (native protein build -> combined host-guest states
    -> bisection -> replica-parallel HREX -> pair BAR)."""
    from timemachine_tpu.chem import mol_from_smiles
    from timemachine_tpu.chem.embed import embed_mol
    from timemachine_tpu.constants import DEFAULT_ATOM_MAPPING_KWARGS
    from timemachine_tpu.fe.atom_mapping import get_cores
    from timemachine_tpu.fe.free_energy import HREXParams, MDParams
    from timemachine_tpu.fe.rbfe import run_complex
    from timemachine_tpu.ff import Forcefield

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        mol_a = mol_from_smiles("CCO", add_hs=True, name="ethanol")
        mol_b = mol_from_smiles("CCC", add_hs=True, name="propane")
        embed_mol(mol_a, seed=7)
        embed_mol(mol_b, seed=7)
        core = get_cores(mol_a, mol_b, **DEFAULT_ATOM_MAPPING_KWARGS)[0]

        md_params = MDParams(
            n_frames=4,
            n_eq_steps=50,
            steps_per_frame=20,
            seed=2026,
            hrex_params=HREXParams(n_frames_bisection=2),
        )
        result, host_config = run_complex(
            mol_a,
            mol_b,
            core,
            Forcefield.load_default(),
            f"{DATA}/capped_hhh.pdb",
            md_params=md_params,
            n_windows=3,
            min_cutoff=None,
        )

    assert np.all(np.isfinite(result.final_result.dGs))
    for traj in result.trajectories:
        assert np.all(np.isfinite(traj.frames[-1]))


def test_dhfr_native_cached():
    """The shipped DHFR cache loads instantly and matches the reference
    system's composition (23,558 atoms = 2489 protein + 7023 waters,
    6.223 nm box from the PDB's CRYST1)."""
    from timemachine_tpu.testsystems.dhfr import setup_dhfr_native

    cfg = setup_dhfr_native()
    assert cfg.conf.shape == (23558, 3)
    assert cfg.num_water_atoms == 21069
    assert abs(cfg.box[0, 0] - 6.223) < 1e-6

    # waters-first permutation preserves bonded energies
    cfg2 = setup_dhfr_native(waters_first=True)
    for nm in ("bond", "proper", "improper"):
        bp1, bp2 = getattr(cfg.host_system, nm), getattr(cfg2.host_system, nm)
        u1 = float(bp1.potential(cfg.conf, bp1.params, cfg.box))
        u2 = float(bp2.potential(cfg2.conf, bp2.params, cfg2.box))
        assert abs(u1 - u2) < 1e-2 + 1e-6 * abs(u1)
    # leading-water fast path fires in the permuted layout
    from timemachine_tpu.ops import bonded

    # >= because the pattern scan may coincidentally absorb the first protein
    # residue's N-H1/N-H2 pair right after the 7023 true waters (the strided
    # energy computes the identical bond pairs/params either way)
    assert bonded._leading_water_bonds(np.asarray(cfg2.host_system.bond.potential.idxs)) >= 7023
