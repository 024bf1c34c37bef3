"""HDF5 dataset IO with the reference-compatible ragged schema.

Schema identical to ``/root/reference/data/generate_dataset.py:49-62`` so
datasets are interchangeable between the two frameworks for cross-checking:
ragged vlen datasets keyed ``C`` (row-major flattened), ``u``, ``v``,
``rows``, ``cols``, plus scalar columns ``cost``, ``n``, ``family``,
``noise_std``, ``tag``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Iterator, Optional, Union

import numpy as np

try:
    import h5py

    _H5 = True
except ImportError:  # pragma: no cover
    _H5 = False

from .synthetic import SyntheticInstance

__all__ = ["H5Writer", "H5Reader"]

_VLEN_F64 = ("C", "u", "v")
_VLEN_I32 = ("rows", "cols")


def _require_h5():
    if not _H5:
        raise RuntimeError("h5py is required for HDF5 dataset IO")


class H5Writer:
    """Append-only ragged writer (generate_dataset.py:49-88)."""

    def __init__(self, path: Union[str, Path]):
        _require_h5()
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = h5py.File(self.path, "w")
        vf = h5py.special_dtype(vlen=np.float64)
        vi = h5py.special_dtype(vlen=np.int32)
        vs = h5py.string_dtype()
        for key in _VLEN_F64:
            self._f.create_dataset(key, (0,), maxshape=(None,), dtype=vf)
        for key in _VLEN_I32:
            self._f.create_dataset(key, (0,), maxshape=(None,), dtype=vi)
        self._f.create_dataset("cost", (0,), maxshape=(None,), dtype=np.float64)
        self._f.create_dataset("n", (0,), maxshape=(None,), dtype=np.int64)
        self._f.create_dataset("noise_std", (0,), maxshape=(None,), dtype=np.float64)
        self._f.create_dataset("family", (0,), maxshape=(None,), dtype=vs)
        self._f.create_dataset("tag", (0,), maxshape=(None,), dtype=vs)
        self._count = 0

    def append(self, inst: SyntheticInstance) -> None:
        i = self._count
        for key in self._f:
            self._f[key].resize((i + 1,))
        self._f["C"][i] = inst.cost.reshape(-1)
        self._f["u"][i] = inst.u
        self._f["v"][i] = inst.v
        self._f["rows"][i] = inst.rows
        self._f["cols"][i] = inst.cols
        self._f["cost"][i] = float(inst.cost[inst.rows, inst.cols].sum())
        self._f["n"][i] = inst.size
        self._f["noise_std"][i] = inst.noise_std
        self._f["family"][i] = inst.family
        self._f["tag"][i] = inst.tag or ""
        self._count += 1
        if self._count % 8 == 0:
            self._f.flush()  # bound data loss if the process is killed

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class H5Reader:
    """Lazy random-access reader (mirrors LapDataset, train_one_gnn.py:46-63)."""

    def __init__(self, path: Union[str, Path]):
        _require_h5()
        self.path = Path(path)
        self._f = h5py.File(self.path, "r")

    def __len__(self) -> int:
        return self._f["n"].shape[0]

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        n = int(self._f["n"][idx])
        fam = self._f["family"][idx]
        return {
            "cost": np.asarray(self._f["C"][idx], np.float64).reshape(n, n),
            "u": np.asarray(self._f["u"][idx], np.float64),
            "v": np.asarray(self._f["v"][idx], np.float64),
            "rows": np.asarray(self._f["rows"][idx], np.int32),
            "cols": np.asarray(self._f["cols"][idx], np.int32),
            "opt_cost": float(self._f["cost"][idx]),
            "n": n,
            "family": fam.decode() if isinstance(fam, bytes) else str(fam),
        }

    def iter(self) -> Iterator[Dict[str, np.ndarray]]:
        for i in range(len(self)):
            yield self[i]

    def sizes(self) -> np.ndarray:
        return np.asarray(self._f["n"][:], np.int64)

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
