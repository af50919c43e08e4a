"""Zero-copy feature-table snapshot (writer + reader).

Companion to ``native/feature_snapshot.cpp``: the snapshot keeps the user
and item feature tables as sorted-id arrays + row-major float32 matrices
in one binary file. Opening is a single mmap — no per-row deserialization
— so serving starts instantly regardless of table size, and concurrent
serving processes share the page cache. The reference instead bulk-writes
one msgpack blob per entity into Redis at startup
(``src/features/feature_store.py:156-228``).

The reader prefers the C++ library (binary search + gather in native
code, built via ``make native``) and falls back to a pure-numpy
``np.memmap`` + ``searchsorted`` implementation with identical semantics.

Column names (the store-dict contract) live in a JSON sidecar so
:meth:`FeatureSnapshot.user_dict` / :meth:`item_dict` reconstruct exactly
what ``FeatureStore.load_all_features`` would have stored (minus item
titles, which are strings — serving keeps those in its metadata map).
"""
from __future__ import annotations

import ctypes
import json
import logging
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

MAGIC = b"FSNAP001"
USER_SECTION = 0
ITEM_SECTION = 1

_LIB_PATH = (
    Path(__file__).resolve().parents[2] / "native" / "libfeaturesnapshot.so"
)
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.fsnap_open.restype = ctypes.c_void_p
        lib.fsnap_open.argtypes = [ctypes.c_char_p]
        for fn in ("fsnap_n_sections",):
            getattr(lib, fn).restype = ctypes.c_int64
            getattr(lib, fn).argtypes = [ctypes.c_void_p]
        for fn in ("fsnap_rows", "fsnap_cols"):
            getattr(lib, fn).restype = ctypes.c_int64
            getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.fsnap_lookup.restype = ctypes.POINTER(ctypes.c_float)
        lib.fsnap_lookup.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.fsnap_gather.restype = ctypes.c_int64
        lib.fsnap_gather.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_float,
        ]
        lib.fsnap_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        logger.info("Loaded native feature snapshot lib from %s", _LIB_PATH)
    except OSError as exc:  # pragma: no cover
        logger.warning("Failed to load %s: %s", _LIB_PATH, exc)
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


# ---------------------------------------------------------------------- #
# Writer                                                                   #
# ---------------------------------------------------------------------- #

def write_snapshot(
    path: str,
    user_ids: np.ndarray,
    user_matrix: np.ndarray,
    item_ids: np.ndarray,
    item_matrix: np.ndarray,
    user_cols: Sequence[str],
    item_cols: Sequence[str],
) -> Path:
    """Write the binary snapshot + the column-name sidecar.

    Rows are sorted by id (the reader binary-searches). ``*_cols`` name
    the matrix columns; genre blocks use ``genre_pref``/``genre_vector``
    pseudo-columns expanded positionally (see ``user_dict``).
    """
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)

    sections = []
    for ids, mat, cols in (
        (user_ids, user_matrix, user_cols),
        (item_ids, item_matrix, item_cols),
    ):
        ids = np.asarray(ids, np.int64)
        mat = np.ascontiguousarray(mat, np.float32)
        if mat.ndim != 2 or len(ids) != len(mat):
            raise ValueError(
                f"matrix {mat.shape} does not match {len(ids)} ids"
            )
        order = np.argsort(ids, kind="stable")
        sections.append((ids[order], mat[order]))

    header_size = 16 + 32 * len(sections)
    offset = header_size
    spans = []
    for ids, mat in sections:
        ids_off = offset
        offset += ids.nbytes
        data_off = offset
        offset += mat.nbytes
        spans.append((len(ids), mat.shape[1], ids_off, data_off))

    with open(p, "wb") as f:
        f.write(MAGIC)
        f.write(np.int64(len(sections)).tobytes())
        for span in spans:
            f.write(np.asarray(span, np.int64).tobytes())
        for ids, mat in sections:
            f.write(ids.tobytes())
            f.write(mat.tobytes())

    Path(str(p) + ".meta.json").write_text(json.dumps({
        "user_cols": list(user_cols),
        "item_cols": list(item_cols),
    }))
    logger.info(
        "Wrote feature snapshot %s (%d users, %d items, %.1f MB)",
        p, spans[0][0], spans[1][0], offset / 1e6,
    )
    return p


# ---------------------------------------------------------------------- #
# Reader                                                                   #
# ---------------------------------------------------------------------- #

class _NumpyBackend:
    """Pure-numpy reader (np.memmap + searchsorted) — identical semantics
    to the C++ library for toolchain-free environments."""

    def __init__(self, path: Path):
        raw = np.memmap(path, dtype=np.uint8, mode="r")
        if bytes(raw[:8]) != MAGIC:
            raise ValueError(f"bad snapshot magic in {path}")
        n_sections = int(np.frombuffer(raw[8:16], np.int64)[0])
        self.sections = []
        for i in range(n_sections):
            hdr = np.frombuffer(raw[16 + 32 * i: 48 + 32 * i], np.int64)
            n_rows, n_cols, ids_off, data_off = (int(v) for v in hdr)
            ids = np.frombuffer(raw, np.int64, n_rows, ids_off)
            data = np.frombuffer(
                raw, np.float32, n_rows * n_cols, data_off
            ).reshape(n_rows, n_cols)
            self.sections.append((ids, data))

    def rows(self, section: int) -> int:
        return len(self.sections[section][0])

    def cols(self, section: int) -> int:
        return self.sections[section][1].shape[1]

    def lookup(self, section: int, id_: int) -> Optional[np.ndarray]:
        ids, data = self.sections[section]
        pos = int(np.searchsorted(ids, id_))
        if pos >= len(ids) or ids[pos] != id_:
            return None
        return np.array(data[pos])

    def gather(self, section, ids, fill=0.0):
        tbl_ids, data = self.sections[section]
        ids = np.asarray(ids, np.int64)
        pos = np.searchsorted(tbl_ids, ids)
        pos_c = np.minimum(pos, len(tbl_ids) - 1)
        found = (pos < len(tbl_ids)) & (tbl_ids[pos_c] == ids)
        out = np.where(
            found[:, None], data[pos_c], np.float32(fill)
        ).astype(np.float32)
        return out, found

    def close(self) -> None:
        pass


class _NativeBackend:
    def __init__(self, path: Path, lib: ctypes.CDLL):
        self.lib = lib
        self.handle = lib.fsnap_open(str(path).encode())
        if not self.handle:
            raise ValueError(f"native open failed for {path}")

    def rows(self, section: int) -> int:
        return self.lib.fsnap_rows(self.handle, section)

    def cols(self, section: int) -> int:
        return self.lib.fsnap_cols(self.handle, section)

    def lookup(self, section: int, id_: int) -> Optional[np.ndarray]:
        ptr = self.lib.fsnap_lookup(self.handle, section, id_)
        if not ptr:
            return None
        n = self.cols(section)
        return np.ctypeslib.as_array(ptr, shape=(n,)).copy()

    def gather(self, section, ids, fill=0.0):
        ids = np.ascontiguousarray(ids, np.int64)
        n = len(ids)
        c = self.cols(section)
        out = np.empty((n, c), np.float32)
        found = np.empty(n, np.uint8)
        self.lib.fsnap_gather(
            self.handle, section,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            found.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_float(fill),
        )
        return out, found.astype(bool)

    def close(self) -> None:
        if self.handle:
            self.lib.fsnap_close(self.handle)
            self.handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class FeatureSnapshot:
    """mmap'd read-only view over the user/item feature tables."""

    def __init__(self, path: str, prefer_native: bool = True):
        self.path = Path(path)
        if not self.path.exists():
            raise FileNotFoundError(f"snapshot not found: {path}")
        meta = json.loads(Path(str(path) + ".meta.json").read_text())
        self.user_cols: List[str] = meta["user_cols"]
        self.item_cols: List[str] = meta["item_cols"]
        lib = _load_lib() if prefer_native else None
        self.backend = (
            _NativeBackend(self.path, lib) if lib is not None
            else _NumpyBackend(self.path)
        )
        self.native = isinstance(self.backend, _NativeBackend)

    # raw access ------------------------------------------------------- #

    def n_users(self) -> int:
        return self.backend.rows(USER_SECTION)

    def n_items(self) -> int:
        return self.backend.rows(ITEM_SECTION)

    def user_row(self, user_id: int) -> Optional[np.ndarray]:
        return self.backend.lookup(USER_SECTION, user_id)

    def item_row(self, item_id: int) -> Optional[np.ndarray]:
        return self.backend.lookup(ITEM_SECTION, item_id)

    def gather_items(self, item_ids, fill=0.0) -> Tuple[np.ndarray, np.ndarray]:
        """Batch item rows → ((n, C) matrix, (n,) found mask)."""
        return self.backend.gather(ITEM_SECTION, item_ids, fill)

    # store-contract dicts ---------------------------------------------- #

    @staticmethod
    def _row_to_dict(row: np.ndarray, cols: List[str],
                     genre_key: str) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        genre_vals: List[float] = []
        for c, v in zip(cols, row.tolist()):
            if c == genre_key:
                genre_vals.append(float(v))
            else:
                out[c] = float(v)
        if genre_vals:
            out[genre_key] = genre_vals
        return out

    def user_dict(self, user_id: int) -> Optional[Dict[str, Any]]:
        row = self.user_row(user_id)
        if row is None:
            return None
        return self._row_to_dict(row, self.user_cols, "genre_pref")

    def item_dict(self, item_id: int) -> Optional[Dict[str, Any]]:
        row = self.item_row(item_id)
        if row is None:
            return None
        return self._row_to_dict(row, self.item_cols, "genre_vector")

    def close(self) -> None:
        self.backend.close()


def write_snapshot_from_frames(
    path: str,
    user_features_df,
    item_features_df,
) -> Path:
    """Build a snapshot from the flattened feature frames (the same inputs
    as ``FeatureStore.load_all_features``)."""
    ug = [c for c in user_features_df.columns if c.startswith("genre_pref_")]
    u_scal = [c for c in user_features_df.columns
              if c != "user_id" and c not in ug]
    ig = [c for c in item_features_df.columns if c.startswith("genre_vec_")]
    i_scal = [c for c in item_features_df.columns
              if c not in ("item_id", "title") and c not in ig]

    user_cols = u_scal + ["genre_pref"] * len(ug)
    item_cols = i_scal + ["genre_vector"] * len(ig)
    return write_snapshot(
        path,
        user_features_df["user_id"].values,
        user_features_df[u_scal + ug].values,
        item_features_df["item_id"].values,
        item_features_df[i_scal + ig].values,
        user_cols,
        item_cols,
    )
