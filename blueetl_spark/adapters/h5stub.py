"""Importable h5py-compatible test double backed by a numpy ``.npz`` file.

The distributed SONATA ingest (:meth:`SonataAdapter.events_distributed`)
ships an *opener* callable to executors; in production that is
``h5py.File``, pickled by reference. This runtime image has no h5py, so
tests need an opener that (a) exposes the minimal h5py surface the
adapter touches — context manager, group ``keys()``, ``__getitem__`` by
slash path, length and range-slicing of datasets — and (b) lives in the
installed package so Spark workers can unpickle it by reference (a
test-module fake cannot cross the worker boundary).

An ``.npz`` archive stores flat arrays under slash-separated keys
(``spikes/popA/timestamps``); groups are materialized from key prefixes.
Range reads (``ds[start:stop]``) load the archive member lazily — the
same access pattern h5py serves from chunked HDF5 storage.
"""

from __future__ import annotations

import numpy as np


class Dataset:
    """Lazy array member: len + slicing, like an h5py dataset."""

    def __init__(self, npz, key: str) -> None:
        self._npz = npz
        self._key = key

    def _arr(self):
        return self._npz[self._key]

    def __len__(self) -> int:
        return len(self._arr())

    def __getitem__(self, item):
        return self._arr()[item]

    def __array__(self, dtype=None):
        a = self._arr()
        return a if dtype is None else a.astype(dtype)

    @property
    def shape(self):
        return self._arr().shape


class Group:
    """Prefix view over the archive's slash-separated keys."""

    def __init__(self, npz, prefix: str = "") -> None:
        self._npz = npz
        self._prefix = prefix

    def keys(self):
        seen = []
        for k in self._npz.files:
            if not k.startswith(self._prefix):
                continue
            head = k[len(self._prefix):].split("/", 1)[0]
            if head and head not in seen:
                seen.append(head)
        return seen

    def __contains__(self, name: str) -> bool:
        return name in self.keys()

    def __getitem__(self, path: str):
        full = self._prefix + path.strip("/")
        if full in self._npz.files:
            return Dataset(self._npz, full)
        if any(k.startswith(full + "/") for k in self._npz.files):
            return Group(self._npz, full + "/")
        raise KeyError(path)


class File(Group):
    """h5py.File-shaped opener over an ``.npz`` path. Usable directly as
    the ``h5_open`` argument of ``SonataAdapter.events_distributed`` and
    as the ``File`` attribute of a module-shaped fake."""

    def __init__(self, path: str, mode: str = "r") -> None:
        super().__init__(np.load(str(path), allow_pickle=False))

    def __enter__(self) -> "File":
        return self

    def __exit__(self, *exc) -> bool:
        self._npz.close()
        return False

    def close(self) -> None:
        self._npz.close()
