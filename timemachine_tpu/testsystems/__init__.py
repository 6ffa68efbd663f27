"""Canned test systems: analytic estimator fakes, water boxes, ligand pairs."""
