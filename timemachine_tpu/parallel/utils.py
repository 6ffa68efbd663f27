"""Parallel helpers (ref timemachine/parallel/utils.py)."""

from collections import defaultdict
from typing import Optional

from timemachine_tpu.parallel.client import get_device_count

# reference name for device discovery (there: nvidia-smi; here: jax devices)
get_gpu_count = get_device_count


def batch_list(values: list, num_workers: Optional[int] = None) -> list:
    """Round-robin split into num_workers batches (ref utils.py:23-32)."""
    batched_values = defaultdict(list)
    num_workers = num_workers or len(values)
    for i, value in enumerate(values):
        batched_values[i % num_workers].append(value)
    return list(batched_values.values())
