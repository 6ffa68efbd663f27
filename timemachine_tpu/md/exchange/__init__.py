"""Grand-canonical-style water exchange moves (biased deletion, targeted insertion)."""
