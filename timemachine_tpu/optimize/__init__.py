"""Protocol and forcefield optimization utilities."""
