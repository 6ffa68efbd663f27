"""Molecule-as-graph helpers (ref timemachine/graph_utils.py)."""

from typing import TypeVar

import networkx as nx


def convert_to_nx(mol) -> nx.Graph:
    """Mol -> networkx graph of atom indices (ref graph_utils.py:6-18)."""
    g = nx.Graph()
    for i in range(mol.num_atoms):
        g.add_node(i)
    for bond in mol.bonds:
        g.add_edge(bond.src, bond.dst)
    return g


_Node = TypeVar("_Node")


def enumerate_simple_paths_from(graph: nx.Graph, start_node, length: int):
    """All simple paths of a given length starting at start_node
    (ref graph_utils.py:24-57)."""

    def go(node, cutoff, visited):
        if cutoff == 1:
            return [[node]]
        return [
            [node, *path]
            for neighbor in nx.neighbors(graph, node)
            if neighbor not in visited
            for path in go(neighbor, cutoff - 1, visited | {node})
        ]

    return go(start_node, length, set())


def enumerate_simple_paths(graph: nx.Graph, length: int):
    """(ref graph_utils.py:60-76)"""
    return [path for start_node in graph for path in enumerate_simple_paths_from(graph, start_node, length)]
