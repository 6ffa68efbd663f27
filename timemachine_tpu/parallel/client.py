"""Job fan-out clients + artifact store.

Parity target: reference timemachine/parallel/client.py — futures-based
`AbstractClient.submit() -> Future`, `SerialClient`, `ProcessPoolClient`
(spawn), a device-pool client (the reference's CUDAPoolClient pins one
process per GPU via CUDA_VISIBLE_DEVICES; here DevicePoolClient pins one
process per accelerator via JAX device selection), and a `FileClient`
artifact store.

On TPU pods the natural fan-out unit is one *host process per slice* with
`jax.distributed`; independent legs/edges are embarrassingly parallel exactly
as in the reference (SURVEY §2.3 item 6).
"""

from __future__ import annotations

import os
import pickle
from abc import ABC, abstractmethod
from concurrent import futures
from pathlib import Path
from typing import Any, Optional


class AbstractClient(ABC):
    @abstractmethod
    def submit(self, task_fn, *args, **kwargs):
        """Returns a Future with .result() / .done()"""

    def verify(self):
        """Check the client is able to run jobs (ref client.py:59-66)."""
        return


class _ImmediateFuture:
    def __init__(self, value=None, exception=None):
        self._value = value
        self._exception = exception

    def result(self, timeout=None):
        if self._exception is not None:
            raise self._exception
        return self._value

    def done(self):
        return True


class SerialClient(AbstractClient):
    """Run tasks inline (ref client.py:135-142)."""

    def submit(self, task_fn, *args, **kwargs):
        try:
            return _ImmediateFuture(task_fn(*args, **kwargs))
        except Exception as e:  # match future semantics: raise at .result()
            return _ImmediateFuture(exception=e)


class ProcessPoolClient(AbstractClient):
    """Spawned process pool, one task per worker round-robin
    (ref client.py:143-187)."""

    def __init__(self, max_workers: int):
        import multiprocessing

        ctx = multiprocessing.get_context("spawn")
        self.max_workers = max_workers
        self.executor = futures.ProcessPoolExecutor(max_workers=max_workers, mp_context=ctx)
        self._idx = 0

    def submit(self, task_fn, *args, **kwargs):
        future = self.executor.submit(task_fn, *args, **kwargs)
        self._idx = (self._idx + 1) % self.max_workers
        return future

    def verify(self):
        assert self.max_workers > 0


def _device_worker_init(device_ordinal: int, platform: str):
    # restrict this worker process to one accelerator before jax import
    if platform == "tpu":
        os.environ["TPU_VISIBLE_DEVICES"] = str(device_ordinal)
    else:
        os.environ["CUDA_VISIBLE_DEVICES"] = str(device_ordinal)


class DevicePoolClient(ProcessPoolClient):
    """One process per accelerator (ref CUDAPoolClient, client.py:188-229).

    Tasks are free to use the full single device; independent legs/edges
    scale linearly across devices."""

    def __init__(self, max_workers: Optional[int] = None, platform: str = "tpu"):
        n = max_workers or get_device_count()
        super().__init__(n)
        self.platform = platform

    @staticmethod
    def wrap_task(task_fn, device_ordinal, platform, *args, **kwargs):
        _device_worker_init(device_ordinal, platform)
        return task_fn(*args, **kwargs)

    def submit(self, task_fn, *args, **kwargs):
        future = self.executor.submit(self.wrap_task, task_fn, self._idx, self.platform, *args, **kwargs)
        self._idx = (self._idx + 1) % self.max_workers
        return future

    def verify(self):
        assert get_device_count() >= self.max_workers


# alias matching the reference's name for easy migration
CUDAPoolClient = DevicePoolClient
TPUPoolClient = DevicePoolClient


def get_device_count() -> int:
    """(ref parallel/utils.py:7 get_gpu_count)"""
    try:
        import jax

        return len(jax.devices())
    except Exception:
        return int(os.environ.get("DEVICE_COUNT", "1"))


class AbstractFileClient(ABC):
    @abstractmethod
    def store(self, path: str, data: bytes): ...

    @abstractmethod
    def load(self, path: str) -> bytes: ...

    @abstractmethod
    def exists(self, path: str) -> bool: ...

    @abstractmethod
    def full_path(self, path: str) -> str: ...


class FileClient(AbstractFileClient):
    """Local filesystem artifact store (ref client.py:341-394)."""

    def __init__(self, base: Optional[Path] = None):
        self.base = Path(base or ".")
        self.base.mkdir(parents=True, exist_ok=True)

    def store(self, path, data: bytes):
        full = self.full_path(path)
        Path(full).parent.mkdir(parents=True, exist_ok=True)
        Path(full).write_bytes(data)

    def store_stream(self, path, fileobj, batch_size: int = 1024 * 1024):
        full = Path(self.full_path(path))
        full.parent.mkdir(parents=True, exist_ok=True)
        with open(full, "wb") as out:
            while chunk := fileobj.read(batch_size):
                out.write(chunk)

    def load(self, path) -> bytes:
        return Path(self.full_path(path)).read_bytes()

    def exists(self, path) -> bool:
        return Path(self.full_path(path)).exists()

    def full_path(self, path) -> str:
        return str(self.base / path)


def save_results(results: dict[str, Any], file_client: AbstractFileClient, prefix: str = ""):
    """Pickle a result bundle into the artifact store
    (matching the reference workflow's artifact contract, run_rbfe_legs.py:53-63)."""
    for name, obj in results.items():
        file_client.store(os.path.join(prefix, name), pickle.dumps(obj))
