"""Free-energy layer: topologies, atom mapping, single topology, interpolation,
simulation drivers (bisection/HREX), estimators (BAR/MBAR), training."""
