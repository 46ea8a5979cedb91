"""ctypes bindings for the native mesh-preprocessing library.

Loads libmeshops.so if present (build with `python -m meshvae_tpu.native.build`);
falls back transparently to the pure-numpy implementations otherwise.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "libmeshops.so")
_lib = None


def available() -> bool:
    return _load() is not None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.meshops_qslim.restype = ctypes.c_int64
    lib.meshops_qslim.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.meshops_transfer.restype = None
    lib.meshops_transfer.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
    ]
    if hasattr(lib, "meshops_obj_parse"):  # absent in pre-round-4 builds
        lib.meshops_obj_parse.restype = ctypes.c_int64
        lib.meshops_obj_parse.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
    _lib = lib
    return lib


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def qslim_decimate_native(vertices: np.ndarray, faces: np.ndarray,
                          target_vertices: int):
    """Native QSlim; returns (new_faces, kept_parent_ids) or None if the
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    v = np.ascontiguousarray(vertices, dtype=np.float64)
    f = np.ascontiguousarray(faces, dtype=np.int64)
    out_faces = np.empty_like(f)
    out_num_faces = np.zeros(1, dtype=np.int64)
    out_kept = np.empty(v.shape[0], dtype=np.int64)
    n_kept = lib.meshops_qslim(_dptr(v), v.shape[0], _iptr(f), f.shape[0],
                               int(target_vertices), _iptr(out_faces),
                               _iptr(out_num_faces), _iptr(out_kept))
    if n_kept < 0:
        raise RuntimeError("meshops_qslim failed")
    return (out_faces[: int(out_num_faces[0])].copy(),
            out_kept[: int(n_kept)].copy())


def barycentric_transfer_native(src_v: np.ndarray, src_f: np.ndarray,
                                tgt_v: np.ndarray):
    """Native closest-point transfer; returns (cols [T,3], weights [T,3])
    with col = -1 marking absent entries, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    sv = np.ascontiguousarray(src_v, dtype=np.float64)
    sf = np.ascontiguousarray(src_f, dtype=np.int64)
    tv = np.ascontiguousarray(tgt_v, dtype=np.float64)
    cols = np.empty((tv.shape[0], 3), dtype=np.int64)
    weights = np.empty((tv.shape[0], 3), dtype=np.float64)
    lib.meshops_transfer(_dptr(sv), sv.shape[0], _iptr(sf), sf.shape[0],
                         _dptr(tv), tv.shape[0], _iptr(cols), _dptr(weights))
    return cols, weights


def obj_parse_native(path: str):
    """Native single-pass parse of the plain-triangle OBJ dialect; returns
    (verts [N,3] f64, faces [F,3] i64 0-based) or None when the library is
    unavailable, the build predates the symbol, or the file uses a
    construct outside the dialect (the caller falls back to the Python
    parser)."""
    lib = _load()
    if lib is None or not hasattr(lib, "meshops_obj_parse"):
        return None
    try:
        size = os.path.getsize(path)
    except OSError:
        return None
    # a v/f line is >= 8 bytes, so size // 8 + 1 bounds both counts
    cap = size // 8 + 1
    verts = np.empty((cap, 3), dtype=np.float64)
    faces = np.empty((cap, 3), dtype=np.int64)
    nv = np.zeros(1, dtype=np.int64)
    nf = np.zeros(1, dtype=np.int64)
    rc = lib.meshops_obj_parse(path.encode(), _dptr(verts), cap,
                               _iptr(faces), cap, _iptr(nv), _iptr(nf))
    if rc != 0:
        return None
    return verts[: int(nv[0])].copy(), faces[: int(nf[0])].copy()
