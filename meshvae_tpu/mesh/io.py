"""Pure-python triangle-mesh OBJ I/O.

Replaces the reference's native mesh loaders (psbody-mesh / open3d, see
/root/reference/data.py:140, /root/reference/model.py:36) with a dependency-
free parser; the OBJ subset used by the reference is trivial (`v` and `f`
lines only, /root/reference/data.py:20-26).
"""
from __future__ import annotations

import dataclasses
import numpy as np


@dataclasses.dataclass
class TriMesh:
    """A triangle mesh: vertices [N, 3] float64, faces [F, 3] int64 (0-based)."""

    v: np.ndarray
    f: np.ndarray

    def __post_init__(self):
        self.v = np.asarray(self.v, dtype=np.float64).reshape(-1, 3)
        self.f = np.asarray(self.f, dtype=np.int64).reshape(-1, 3)

    @property
    def num_vertices(self) -> int:
        return self.v.shape[0]

    @property
    def num_faces(self) -> int:
        return self.f.shape[0]


def load_obj(path: str) -> TriMesh:
    """Parse a Wavefront OBJ file (v/f lines; polygonal faces are fan-triangulated)."""
    verts: list[tuple[float, float, float]] = []
    faces: list[tuple[int, int, int]] = []
    with open(path, "r") as fp:
        for line in fp:
            if line.startswith("v "):
                parts = line.split()
                verts.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif line.startswith("f "):
                # face entries may be "i", "i/t", "i/t/n", or "i//n"; 1-based,
                # negative indices are relative to the end of the vertex list.
                idx = []
                for tok in line.split()[1:]:
                    i = int(tok.split("/")[0])
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for k in range(1, len(idx) - 1):
                    faces.append((idx[0], idx[k], idx[k + 1]))
    return TriMesh(np.array(verts, dtype=np.float64),
                   np.array(faces, dtype=np.int64).reshape(-1, 3))


def save_obj(path: str, vertices: np.ndarray, faces: np.ndarray,
             comment: str | None = None) -> None:
    """Write an OBJ with the same `v %f` / `f %d` layout the reference emits
    (/root/reference/data.py:20-26), so downstream tooling is interchangeable.
    `comment` (no newlines) is emitted as a leading `# ` line — used by the
    scaled-template generator as a version marker; all loaders skip it."""
    vertices = np.asarray(vertices, dtype=np.float64).reshape(-1, 3)
    faces = np.asarray(faces, dtype=np.int64).reshape(-1, 3)
    lines = []
    if comment:
        lines.append("# " + comment)
    for v in vertices:
        lines.append("v %f %f %f" % (v[0], v[1], v[2]))
    for f in faces + 1:
        lines.append("f %d %d %d" % (f[0], f[1], f[2]))
    with open(path, "w") as fp:
        fp.write("\n".join(lines) + "\n")
