"""Disk-backed array sequence for trajectory frames.

Capability target: reference timemachine/fe/stored_arrays.py — bounded
memory via chunked .npy spill files, picklable, round-trips through a
FileClient artifact store.

Differences from the reference: chunk boundaries are kept as a cumulative-
offset array so random access locates its chunk with one searchsorted
(instead of walking chunk sizes), the most recently loaded chunk is cached
(sequential frame reads during u_kln generation hit the same chunk
repeatedly), and slices are supported.
"""

from __future__ import annotations

import io
import tempfile
from itertools import count
from pathlib import Path
from typing import Collection, Iterable, Iterator, Sequence

import numpy as np


def serialize_array(array) -> bytes:
    buf = io.BytesIO()
    np.save(buf, array)
    return buf.getvalue()


def deserialize_array(bs: bytes) -> np.ndarray:
    return np.load(io.BytesIO(bs))


class StoredArrays(Sequence):
    """Append-only sequence of equally-shaped arrays, spilled to disk in the
    chunks they arrived in."""

    def __init__(self) -> None:
        self._offsets = np.zeros(1, dtype=np.int64)  # cumulative chunk ends
        self._dir = tempfile.TemporaryDirectory()
        self._cache: tuple[int, np.ndarray] | None = None  # (chunk idx, data)

    # -- construction ---------------------------------------------------------

    @classmethod
    def from_chunks(cls, chunks: Iterable[Collection]) -> "StoredArrays":
        out = cls()
        for chunk in chunks:
            out.extend(chunk)
        return out

    def extend(self, xs: Collection):
        chunk = np.asarray(xs)
        n_chunks = len(self._offsets) - 1
        np.save(self.get_chunk_path(Path(self._dir.name), n_chunks), chunk)
        self._offsets = np.append(self._offsets, self._offsets[-1] + len(chunk))

    # -- access ---------------------------------------------------------------

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def _load_chunk(self, idx: int) -> np.ndarray:
        if self._cache is not None and self._cache[0] == idx:
            return self._cache[1]
        data = np.load(self.get_chunk_path(Path(self._dir.name), idx))
        self._cache = (idx, data)
        return data

    def _n_chunks(self) -> int:
        return len(self._offsets) - 1

    def __getitem__(self, key):
        if isinstance(key, slice):
            items = [self[i] for i in range(*key.indices(len(self)))]
            if not items:
                # np.stack rejects empty lists; preserve the item shape when
                # the store has one
                item_shape = self._load_chunk(0).shape[1:] if self._n_chunks() else ()
                return np.zeros((0,) + item_shape)
            return np.stack(items)
        if not isinstance(key, (int, np.integer)):
            raise NotImplementedError("only integer and slice indexing is supported")
        n = len(self)
        if key < 0:
            key += n
        if not 0 <= key < n:
            raise IndexError(key)
        chunk_idx = int(np.searchsorted(self._offsets, key, side="right")) - 1
        return self._load_chunk(chunk_idx)[key - int(self._offsets[chunk_idx])]

    def __iter__(self) -> Iterator[np.ndarray]:
        for idx in range(self._n_chunks()):
            yield from self._load_chunk(idx)

    def __array__(self, dtype=None, copy=None):
        chunks = [self._load_chunk(i) for i in range(self._n_chunks())]
        out = np.concatenate(chunks) if chunks else np.zeros((0,))
        return out.astype(dtype) if dtype is not None else out

    def __eq__(self, other) -> bool:
        return np.array_equal(self._offsets, other._offsets) and all(
            np.array_equal(a, b, equal_nan=True) for a, b in zip(self, other)
        )

    # -- persistence ----------------------------------------------------------

    @staticmethod
    def get_chunk_path(path: Path, idx: int) -> Path:
        return (path / str(idx)).with_suffix(".npy")

    def __reduce__(self):
        return self.from_chunks, ([self._load_chunk(i) for i in range(self._n_chunks())],)

    def store(self, client, prefix: Path = Path(".")):
        """Upload every chunk through a FileClient-like object."""
        for idx in range(self._n_chunks()):
            dest = self.get_chunk_path(prefix, idx)
            if client.exists(str(dest)):
                raise FileExistsError(f"file already exists: {dest}")
            with open(self.get_chunk_path(Path(self._dir.name), idx), "rb") as ifs:
                client.store_stream(str(dest), ifs)

    @classmethod
    def load(cls, client, prefix: Path = Path(".")) -> "StoredArrays":
        out = cls()
        for idx in count():
            path = cls.get_chunk_path(prefix, idx)
            if not client.exists(str(path)):
                break
            out.extend(list(deserialize_array(client.load(str(path)))))
        return out
