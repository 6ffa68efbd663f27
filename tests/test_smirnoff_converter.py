"""SMIRNOFF XML converter + thermostat/NVT move coverage.

Parity targets: reference timemachine/ff/smirnoff_converter.py (+ its usage
to generate ff/params), tests/test_md_moves.py (UnadjustedLangevinMove).
"""

import json
from pathlib import Path

import numpy as np
import pytest

REFERENCE_XML = "/root/reference/timemachine/ff/smirnoff_2.0.0.xml"
SHIPPED_JSON = Path(__file__).parent.parent / "timemachine_tpu/ff/params/smirnoff_2_0_0_ccc.json"


# -- unit expression parsing ----------------------------------------------------


def test_string_to_unit_expressions():
    from timemachine_tpu.ff.smirnoff_converter import string_to_unit

    assert string_to_unit("kilocalories_per_mole") == pytest.approx(4.184)
    assert string_to_unit("angstrom") == pytest.approx(0.1)
    assert string_to_unit("kilocalories_per_mole / angstrom ** 2") == pytest.approx(418.4)
    assert string_to_unit("degree") == pytest.approx(np.pi / 180.0)
    assert string_to_unit("nanometer * nanometer") == pytest.approx(1.0)


def test_parse_quantity():
    from timemachine_tpu.ff.smirnoff_converter import parse_quantity

    assert parse_quantity("1.5") == 1.5
    assert parse_quantity("2.0 * angstrom") == pytest.approx(0.2)
    assert parse_quantity("1.0 * kilocalories_per_mole / angstrom ** 2") == pytest.approx(418.4)


# -- converter vs the shipped serialized FF ------------------------------------


@pytest.mark.skipif(not Path(REFERENCE_XML).exists(), reason="reference XML not mounted")
def test_convert_smirnoff_xml_reproduces_shipped_ff():
    """Re-converting the upstream openforcefield 2.0.0 XML must reproduce the
    shipped serialized FF exactly (pattern-for-pattern, value-for-value) —
    pins the converter against external source data."""
    from timemachine_tpu.ff.smirnoff_converter import convert_smirnoff_xml

    converted = convert_smirnoff_xml(REFERENCE_XML, charge_type="CCC")
    shipped = json.loads(SHIPPED_JSON.read_text())

    for handler in ["HarmonicBond", "HarmonicAngle", "ProperTorsion", "ImproperTorsion", "LennardJones"]:
        conv_p = converted[handler]["patterns"]
        ship_p = shipped[handler]["patterns"]
        assert len(conv_p) == len(ship_p), handler
        assert conv_p == ship_p, f"{handler} diverges from shipped parameters"

    # spot physics: the generic [#6X4:1]-[#6X4:2] bond is ~carbon-carbon
    bond_table = {row[0]: row[1:] for row in converted["HarmonicBond"]["patterns"]}
    k, b0 = bond_table["[#6X4:1]-[#6X4:2]"]
    assert 0.14 < b0 < 0.16  # nm, sp3 C-C
    assert 200_000 < k < 300_000  # kJ/mol/nm^2


@pytest.mark.skipif(not Path(REFERENCE_XML).exists(), reason="reference XML not mounted")
def test_converted_ff_loads_as_forcefield(tmp_path):
    """Converter output round-trips through Forcefield.load_from_file."""
    from timemachine_tpu.ff import Forcefield
    from timemachine_tpu.ff.smirnoff_converter import convert_smirnoff_xml

    converted = convert_smirnoff_xml(REFERENCE_XML, charge_type="CCC")
    out = tmp_path / "roundtrip.json"
    out.write_text(json.dumps(converted))
    ff = Forcefield.load_from_file(str(out))
    assert ff.hb_handle is not None and len(ff.hb_handle.smirks) == 88
    assert ff.lj_handle is not None and len(ff.lj_handle.smirks) == 37


# -- md/thermostat NVT segment move --------------------------------------------


def test_unadjusted_langevin_move_roundtrip():
    """UnadjustedLangevinMove: state-in/state-out NVT segments preserve shape,
    change coordinates, and keep the box fixed (ref thermostat/moves.py)."""
    from timemachine_tpu.integrators import LangevinIntegrator
    from timemachine_tpu.md.states import CoordsVelBox
    from timemachine_tpu.md.thermostat.moves import UnadjustedLangevinMove
    from timemachine_tpu.md.thermostat.utils import sample_velocities
    from timemachine_tpu.potentials import BoundPotential, HarmonicBond

    rng = np.random.default_rng(0)
    n = 6
    x0 = rng.normal(0, 0.05, (n, 3))
    box = np.eye(3) * 3.0
    masses = np.full(n, 12.0)
    idxs = np.array([[i, i + 1] for i in range(n - 1)], dtype=np.int32)
    params = np.tile([10_000.0, 0.12], (n - 1, 1))
    bp = BoundPotential(HarmonicBond(idxs=idxs), params)

    intg = LangevinIntegrator(temperature=300.0, dt=1e-3, friction=1.0, masses=masses, seed=2026)
    v0 = sample_velocities(masses, 300.0, seed=1)
    move = UnadjustedLangevinMove(intg, [bp], n_steps=10)

    state = CoordsVelBox(x0, v0, box)
    out = move.move(state)
    assert out.coords.shape == x0.shape and out.velocities.shape == v0.shape
    assert not np.allclose(out.coords, x0)
    np.testing.assert_array_equal(out.box, box)
    assert np.isfinite(out.coords).all() and np.isfinite(out.velocities).all()

    # chaining: a second move from the first's output also works (context reuse)
    out2 = move.move(out)
    assert not np.allclose(out2.coords, out.coords)


def test_sample_velocities_maxwell_boltzmann():
    from timemachine_tpu.constants import BOLTZ
    from timemachine_tpu.md.thermostat.utils import sample_velocities

    masses = np.full(3000, 18.0)
    v = np.asarray(sample_velocities(masses, 300.0, seed=3))
    assert v.shape == (3000, 3)
    sigma_expected = np.sqrt(BOLTZ * 300.0 / 18.0)
    assert v.std() == pytest.approx(sigma_expected, rel=0.05)
    assert abs(v.mean()) < sigma_expected * 0.1
