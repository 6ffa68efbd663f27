"""Parallel execution: job fan-out clients, artifact store, and the
multi-device (sharded) HREX driver."""
