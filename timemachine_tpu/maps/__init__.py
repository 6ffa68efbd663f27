"""Invertible configuration maps for precision-boosted estimators."""
