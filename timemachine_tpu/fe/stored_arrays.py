"""Disk-backed array sequence for trajectory storage
(parity: reference timemachine/fe/stored_arrays.py — O(1) memory, chunked
.npy files in a temp dir, picklable, persistable through a FileClient)."""

from __future__ import annotations

import io
import tempfile
from itertools import count
from pathlib import Path
from typing import Collection, Iterable, Iterator, Sequence

import numpy as np


class StoredArrays(Sequence):
    def __init__(self) -> None:
        self._chunk_sizes: list[int] = []
        self._dir = tempfile.TemporaryDirectory()

    @classmethod
    def from_chunks(cls, chunks: Iterable[Collection]) -> "StoredArrays":
        sa = cls()
        for chunk in chunks:
            sa.extend(chunk)
        return sa

    def __iter__(self) -> Iterator[np.ndarray]:
        for chunk in self._chunks():
            yield from chunk

    def __len__(self) -> int:
        return sum(self._chunk_sizes)

    def __getitem__(self, key):
        if isinstance(key, (int, np.integer)):
            key = range(len(self))[key]
            for idx, size in enumerate(self._chunk_sizes):
                if key < size:
                    return np.load(self._get_chunk_path(idx))[key]
                key -= size
            raise AssertionError("internal error")
        raise NotImplementedError("only integer indexing is supported")

    def __eq__(self, other) -> bool:
        return self._chunk_sizes == other._chunk_sizes and all(
            np.array_equal(a, b, equal_nan=True) for a, b in zip(self, other)
        )

    def __array__(self, dtype=None, copy=None):
        chunks = list(self._chunks())
        out = np.concatenate(chunks) if chunks else np.zeros((0,))
        return out.astype(dtype) if dtype is not None else out

    def _chunks(self) -> Iterator[np.ndarray]:
        for idx in range(len(self._chunk_sizes)):
            yield np.load(self._get_chunk_path(idx))

    def _get_chunk_path(self, idx: int) -> Path:
        return self.get_chunk_path(Path(self._dir.name), idx)

    def extend(self, xs: Collection):
        np.save(self._get_chunk_path(len(self._chunk_sizes)), np.asarray(xs))
        self._chunk_sizes.append(len(xs))

    @staticmethod
    def get_chunk_path(path: Path, idx: int) -> Path:
        return (path / str(idx)).with_suffix(".npy")

    def __reduce__(self):
        return self.from_chunks, (list(self._chunks()),)

    def store(self, client, prefix: Path = Path(".")):
        for idx in range(len(self._chunk_sizes)):
            dest = self.get_chunk_path(prefix, idx)
            if client.exists(str(dest)):
                raise FileExistsError(f"file already exists: {dest}")
            with open(self._get_chunk_path(idx), "rb") as ifs:
                client.store_stream(str(dest), ifs)

    @classmethod
    def load(cls, client, prefix: Path = Path(".")) -> "StoredArrays":
        sa = cls()
        for idx in count():
            path = cls.get_chunk_path(prefix, idx)
            if not client.exists(str(path)):
                break
            sa.extend(list(deserialize_array(client.load(str(path)))))
        return sa


def serialize_array(array) -> bytes:
    fp = io.BytesIO()
    np.save(fp, array)
    fp.seek(0)
    return fp.read()


def deserialize_array(bs: bytes) -> np.ndarray:
    return np.load(io.BytesIO(bs))
