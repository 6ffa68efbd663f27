"""REST2-style enhanced sampling of intermediate states (ref timemachine/fe/rest/)."""
