"""Scientific I/O conveniences.

Parity with the reference's data-access helpers
(/root/reference/experiments/utils.py): MatFileHandler (l.15-94, a
recursive MATLAB-struct-to-dict reader) and SeismicParameters
(l.449-540, dot-access over the preprocessed HDF5's datasets).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def load_mat(path: str | Path) -> dict:
    """Read a MATLAB .mat file into nested plain dicts/arrays
    (MatFileHandler equivalent; supports v7 via scipy and v7.3 via h5py)."""
    path = Path(path)
    try:
        from scipy.io import loadmat

        raw = loadmat(str(path), squeeze_me=True, struct_as_record=False)
    except NotImplementedError:  # v7.3 = HDF5
        import h5py

        with h5py.File(path, "r") as f:
            return {k: _h5_to_dict(f[k]) for k in f.keys()}

    def convert(obj):
        if hasattr(obj, "_fieldnames"):  # mat_struct
            return {name: convert(getattr(obj, name)) for name in obj._fieldnames}
        if isinstance(obj, np.ndarray) and obj.dtype == object:
            return [convert(o) for o in obj.ravel()]
        return obj

    return {k: convert(v) for k, v in raw.items() if not k.startswith("__")}


def _h5_to_dict(node):
    import h5py

    if isinstance(node, h5py.Dataset):
        return node[()]
    return {k: _h5_to_dict(node[k]) for k in node.keys()}


class SeismicParameters:
    """Dot-access reader over an HDF5 dataset file (utils.py:449-540):
    ``p = SeismicParameters("preprocessed_waveforms.h5"); p.magnitude``.

    Datasets load lazily on first attribute access and are cached; small
    arrays come back as numpy, `waveforms` stays an h5py dataset until
    sliced.
    """

    _EAGER_LIMIT = 64 * 1024 * 1024  # bytes

    def __init__(self, file_path: str | Path):
        import h5py

        self._file = h5py.File(file_path, "r", locking=False)
        self._cache: dict = {}

    def keys(self):
        return list(self._file.keys())

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)
        if name in self._cache:
            return self._cache[name]
        if name not in self._file:
            # the reference stores "vs30s" in generated files and "vs30" in
            # preprocessed ones; accept either spelling
            alt = name.rstrip("s") if name.endswith("s") else name + "s"
            if alt in self._file:
                name_in_file = alt
            else:
                raise AttributeError(f"{name} not in {list(self._file.keys())}")
        else:
            name_in_file = name
        ds = self._file[name_in_file]
        value = ds[()] if ds.size * ds.dtype.itemsize <= self._EAGER_LIMIT else ds
        self._cache[name] = value
        return value

    def get_data_info(self) -> dict:
        return {k: (self._file[k].shape, str(self._file[k].dtype)) for k in self._file}

    def close(self):
        self._file.close()

    def __repr__(self):
        return f"SeismicParameters({self.get_data_info()})"
