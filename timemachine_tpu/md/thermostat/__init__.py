"""Thermostat subpackage (reference layout parity: timemachine/md/thermostat/)."""
