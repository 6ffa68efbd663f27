"""Bond queries for REST region selection (ref timemachine/fe/rest/queries.py)."""

from timemachine_tpu.md.enhanced import ROTATABLE_BOND_SMARTS

from .bond import CanonicalBond, mkbond


def get_aliphatic_ring_bonds(mol) -> set:
    """Bonds of rings that are not fully aromatic (ref queries.py:6-16)."""
    out: set[CanonicalBond] = set()
    for ring in mol.ring_info():
        ring_set = set(ring)
        # a minimal cycle has no chords: every bond within the atom set is a ring bond
        pairs = [(b.src, b.dst) for b in mol.bonds if b.src in ring_set and b.dst in ring_set]
        is_aromatic = all(mol.is_aromatic_bond(i, j) for i, j in pairs)
        if not is_aromatic:
            out |= {mkbond(i, j) for i, j in pairs}
    return out


def get_rotatable_bonds(mol) -> set:
    """RDKit Lipinski-style (non-strict) rotatable bonds (ref queries.py:19-39)."""
    from timemachine_tpu.chem.smarts import match_smarts

    matches = match_smarts(mol, ROTATABLE_BOND_SMARTS, uniquify=True)
    return {mkbond(i, j) for i, j in matches}
