"""Convert SMIRNOFF (openforcefield) XML forcefields to this framework's FF
dict format.

Parity target: reference `timemachine/ff/smirnoff_converter.py` — quantity
parsing (:16-85, done there via openmm.unit; here via a static MD-unit
factor table, no OpenMM dependency), tag extraction (:87-190), charge-table
attachment (:191-198).

Usage:
    python -m timemachine_tpu.ff.smirnoff_converter input.offxml \
        --charge_type CCC --output_path my_ff.py
"""

import ast
import json
import operator as op
import pprint
from argparse import ArgumentParser
from typing import Any
from xml.dom import minidom

import numpy as np

# MD unit system: kJ/mol, nm, radian, elementary charge, ps
_UNIT_FACTORS = {
    "kilocalorie_per_mole": 4.184,
    "kilocalories_per_mole": 4.184,
    "kilocalorie": 4.184,
    "kilocalories": 4.184,
    "kilojoule_per_mole": 1.0,
    "kilojoules_per_mole": 1.0,
    "kilojoule": 1.0,
    "kilojoules": 1.0,
    "angstrom": 0.1,
    "angstroms": 0.1,
    "nanometer": 1.0,
    "nanometers": 1.0,
    "picosecond": 1.0,
    "picoseconds": 1.0,
    "degree": np.pi / 180.0,
    "degrees": np.pi / 180.0,
    "radian": 1.0,
    "radians": 1.0,
    "elementary_charge": 1.0,
    "mole": 1.0,
}

_OPERATORS = {
    ast.Add: op.add,
    ast.Sub: op.sub,
    ast.Mult: op.mul,
    ast.Div: op.truediv,
    ast.Pow: op.pow,
    ast.USub: op.neg,
}


def _ast_eval(node):
    """Evaluate a unit expression AST against the MD-unit factor table
    (ref smirnoff_converter.py:16-48)."""
    if isinstance(node, ast.Constant):
        return node.value
    if isinstance(node, ast.BinOp):
        return _OPERATORS[type(node.op)](_ast_eval(node.left), _ast_eval(node.right))
    if isinstance(node, ast.UnaryOp):
        return _OPERATORS[type(node.op)](_ast_eval(node.operand))
    if isinstance(node, ast.Name):
        return _UNIT_FACTORS[node.id]
    if isinstance(node, ast.List):
        return ast.literal_eval(node)
    raise TypeError(node)


def string_to_unit(unit_string: str) -> float:
    """Unit expression (e.g. 'kilocalories_per_mole / angstrom ** 2') to an
    MD-unit conversion factor (ref smirnoff_converter.py:55-72)."""
    return _ast_eval(ast.parse(unit_string, mode="eval").body)


def parse_quantity(number_string: str) -> float:
    """'<number> * <unit expr>' -> value in MD units (ref :75-85)."""
    pos = number_string.find("*")
    if pos < 0:
        return float(number_string)
    number = float(number_string[:pos])
    return number * string_to_unit(number_string[pos + 2 :])


BOND_TAG = "Bond"
ANGLE_TAG = "Angle"
PROPER_TAG = "Proper"
IMPROPER_TAG = "Improper"
VDW_TAG = "Atom"

tags = [BOND_TAG, ANGLE_TAG, PROPER_TAG, IMPROPER_TAG, VDW_TAG]


def _builtin_charge_table(kind: str) -> dict:
    """Pull a charge handler block from the builtin converted forcefields
    (the reference embeds these tables in ff/charges.py)."""
    from timemachine_tpu.ff.serialize import builtin_params_dir

    source = {
        "CCC": ("smirnoff_2_0_0_ccc.json", "AM1CCC"),
        "BCC": ("smirnoff_2_0_0_am1bcc.json", "AM1BCC"),
        "SC": ("smirnoff_1_1_0_sc.json", "SimpleCharge"),
    }[kind]
    fname, key = source
    with open(builtin_params_dir() / fname) as fh:
        return {key: json.load(fh)[key]}


def convert_smirnoff_xml(xml_path: str, charge_type: str = "CCC") -> dict:
    """SMIRNOFF XML -> FF dict (ref smirnoff_converter.py:96-198)."""
    xmldoc = minidom.parse(xml_path)
    forcefield: dict[str, Any] = {}

    for tag in tags:
        itemlist = xmldoc.getElementsByTagName(tag)
        if tag == BOND_TAG:
            params = []
            for s in itemlist:
                patt = s.attributes["smirks"].value
                b0 = parse_quantity(s.attributes["length"].value)
                kb = parse_quantity(s.attributes["k"].value)
                params.append([patt, kb, b0])
            forcefield["HarmonicBond"] = {"patterns": params}
        elif tag == ANGLE_TAG:
            params = []
            for s in itemlist:
                patt = s.attributes["smirks"].value
                a0 = parse_quantity(s.attributes["angle"].value)
                ka = parse_quantity(s.attributes["k"].value)
                params.append([patt, ka, a0])
            forcefield["HarmonicAngle"] = {"patterns": params}
        elif tag == PROPER_TAG:
            params = []
            for s in itemlist:
                patt = s.attributes["smirks"].value
                counter = 1
                components = []
                while True:
                    try:
                        k = parse_quantity(s.attributes["k" + str(counter)].value)
                        phase = parse_quantity(s.attributes["phase" + str(counter)].value)
                        period = float(s.attributes["periodicity" + str(counter)].value)
                        idivf = float(s.attributes["idivf" + str(counter)].value)
                        components.append([k / idivf, phase, period])
                        counter += 1
                    except KeyError:
                        break
                params.append([patt, components])
            forcefield["ProperTorsion"] = {"patterns": params}
        elif tag == IMPROPER_TAG:
            params = []
            for s in itemlist:
                patt = s.attributes["smirks"].value
                impdivf = 3  # trefoil convention
                k = parse_quantity(s.attributes["k1"].value) / impdivf
                phase = parse_quantity(s.attributes["phase1"].value)
                period = float(s.attributes["periodicity1"].value)
                params.append([patt, k, phase, period])
            forcefield["ImproperTorsion"] = {"patterns": params}
        elif tag == VDW_TAG:
            params = []
            for s in itemlist:
                patt = s.attributes["smirks"].value
                epsilon = parse_quantity(s.attributes["epsilon"].value)
                if "rmin_half" in s.attributes:
                    rmin_half = parse_quantity(s.attributes["rmin_half"].value)
                    sigma = 2.0 * rmin_half / (2.0 ** (1.0 / 6.0))
                else:
                    sigma = parse_quantity(s.attributes["sigma"].value)
                # sqrt(eps) stored to keep the combining rule singularity-free
                params.append([patt, sigma, float(np.sqrt(epsilon))])
            props: dict[str, Any] = {}
            vdw_nodes = xmldoc.getElementsByTagName("vdW")
            if vdw_nodes:
                for key, val in vdw_nodes[0].attributes.items():
                    if key in ("cutoff", "switch_width", "version"):
                        continue
                    if "scale" in key:
                        val = float(val)
                    props[key] = val
            forcefield["LennardJones"] = {"patterns": params, "props": props}

    forcefield.update(_builtin_charge_table(charge_type))
    return forcefield


def main():
    parser = ArgumentParser(description="Convert an openforcefield XML FF to a timemachine_tpu FF")
    parser.add_argument("input_path", help="Path to XML ff")
    parser.add_argument("--charge_type", default="SC", choices=["SC", "CCC", "BCC"])
    parser.add_argument("--output_path", help="Path to write FF file", default=None)
    args = parser.parse_args()

    forcefield = convert_smirnoff_xml(args.input_path, args.charge_type)
    stream = open(args.output_path, "w") if args.output_path is not None else None
    pp = pprint.PrettyPrinter(width=500, compact=False, stream=stream, indent=2)
    pp.pprint(forcefield)
    if stream is not None:
        stream.close()


if __name__ == "__main__":
    main()
