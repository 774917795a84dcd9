"""Triangle-mesh I/O and submesh extraction — no trimesh dependency.

Native OBJ and PLY (ascii + binary_little_endian) readers/writers
sufficient for the VOCASET/BlendVOCA assets (vertex positions + faces;
``process=False, maintain_order=True`` semantics, i.e. no vertex
merging or reordering — reference ``said/util/mesh.py:17-31``).
"""

from __future__ import annotations

import dataclasses
import struct
from typing import List, Sequence

import numpy as np


@dataclasses.dataclass
class Mesh:
    vertices: np.ndarray  # (|V|, 3) float
    faces: np.ndarray  # (|F|, 3) int


def load_mesh(mesh_path: str) -> Mesh:
    p = str(mesh_path)
    if p.lower().endswith(".obj"):
        return _load_obj(p)
    if p.lower().endswith(".ply"):
        return _load_ply(p)
    raise ValueError(f"unsupported mesh format: {p}")


def save_mesh(mesh: Mesh, out_path: str) -> None:
    p = str(out_path)
    if p.lower().endswith(".obj"):
        _save_obj(mesh, p)
    elif p.lower().endswith(".ply"):
        _save_ply(mesh, p)
    else:
        raise ValueError(f"unsupported mesh format: {p}")


def create_mesh(vertices: np.ndarray, faces: np.ndarray) -> Mesh:
    return Mesh(vertices=np.asarray(vertices, dtype=np.float64), faces=np.asarray(faces))


def get_submesh(
    vertices: np.ndarray, faces: np.ndarray, subindices: Sequence[int]
) -> Mesh:
    """Submesh by vertex-index list; keeps faces fully inside the subset.

    Vectorized (the reference's O(F·V) ``list.index`` loop,
    ``said/util/mesh.py:34-64``, becomes an O(V+F) lookup-table remap).
    """
    subindices = np.asarray(subindices)
    sub_vertices = np.asarray(vertices)[subindices]

    remap = -np.ones(int(np.asarray(vertices).shape[0]), dtype=np.int64)
    remap[subindices] = np.arange(len(subindices))

    faces = np.asarray(faces)
    mapped = remap[faces]
    keep = (mapped >= 0).all(axis=1)
    return Mesh(vertices=sub_vertices, faces=mapped[keep])


# ------------------------------------------------------------------------ OBJ


def _load_obj(path: str) -> Mesh:
    vertices: List[List[float]] = []
    faces: List[List[int]] = []
    with open(path, "r") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                vertices.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:]]
                # fan-triangulate polygons
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return Mesh(
        vertices=np.asarray(vertices, dtype=np.float64),
        faces=np.asarray(faces, dtype=np.int64).reshape(-1, 3),
    )


def _save_obj(mesh: Mesh, path: str) -> None:
    with open(path, "w") as f:
        for v in np.asarray(mesh.vertices):
            f.write(f"v {v[0]:.8f} {v[1]:.8f} {v[2]:.8f}\n")
        for face in np.asarray(mesh.faces):
            f.write(f"f {face[0] + 1} {face[1] + 1} {face[2] + 1}\n")


# ------------------------------------------------------------------------ PLY

_PLY_DTYPES = {
    "char": "i1", "uchar": "u1", "int8": "i1", "uint8": "u1",
    "short": "i2", "ushort": "u2", "int16": "i2", "uint16": "u2",
    "int": "i4", "uint": "u4", "int32": "i4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def _load_ply(path: str) -> Mesh:
    with open(path, "rb") as f:
        header_lines = []
        while True:
            line = f.readline().decode("ascii").strip()
            header_lines.append(line)
            if line == "end_header":
                break

        fmt = "ascii"
        elements = []  # (name, count, [(prop_dtype, prop_name) or ('list', idx_t, cnt_t, name)])
        for line in header_lines:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                elements.append({"name": parts[1], "count": int(parts[2]), "props": []})
            elif parts[0] == "property":
                if parts[1] == "list":
                    elements[-1]["props"].append(("list", parts[2], parts[3], parts[4]))
                else:
                    elements[-1]["props"].append((parts[1], parts[2]))

        vertices = None
        faces = None

        if fmt == "ascii":
            tokens = f.read().decode("ascii").split("\n")
            ti = 0
            for el in elements:
                rows = []
                for _ in range(el["count"]):
                    while not tokens[ti].strip():
                        ti += 1
                    rows.append(tokens[ti].split())
                    ti += 1
                if el["name"] == "vertex":
                    names = [p[1] for p in el["props"]]
                    xi, yi, zi = names.index("x"), names.index("y"), names.index("z")
                    vertices = np.array(
                        [[float(r[xi]), float(r[yi]), float(r[zi])] for r in rows]
                    )
                elif el["name"] == "face":
                    faces = np.array([[int(v) for v in r[1:4]] for r in rows])
        elif fmt == "binary_little_endian":
            for el in elements:
                if el["name"] == "vertex":
                    dt = np.dtype([(p[1], "<" + _PLY_DTYPES[p[0]]) for p in el["props"]])
                    data = np.frombuffer(f.read(dt.itemsize * el["count"]), dtype=dt)
                    vertices = np.stack(
                        [data["x"], data["y"], data["z"]], axis=1
                    ).astype(np.float64)
                elif el["name"] == "face":
                    (tag, cnt_t, idx_t, _name) = el["props"][0]
                    assert tag == "list"
                    cnt_dt = np.dtype("<" + _PLY_DTYPES[cnt_t])
                    idx_dt = np.dtype("<" + _PLY_DTYPES[idx_t])
                    out = []
                    for _ in range(el["count"]):
                        n = int(np.frombuffer(f.read(cnt_dt.itemsize), cnt_dt)[0])
                        idx = np.frombuffer(f.read(idx_dt.itemsize * n), idx_dt)
                        for k in range(1, n - 1):
                            out.append([idx[0], idx[k], idx[k + 1]])
                    faces = np.asarray(out, dtype=np.int64)
                else:  # skip unknown fixed-size elements
                    dt = np.dtype([(p[1], "<" + _PLY_DTYPES[p[0]]) for p in el["props"]])
                    f.read(dt.itemsize * el["count"])
        else:
            raise ValueError(f"unsupported PLY format: {fmt}")

    if vertices is None:
        raise ValueError(f"no vertex element in {path}")
    if faces is None:
        faces = np.zeros((0, 3), dtype=np.int64)
    return Mesh(vertices=vertices, faces=faces.astype(np.int64))


def _save_ply(mesh: Mesh, path: str) -> None:
    v = np.asarray(mesh.vertices, dtype=np.float32)
    fc = np.asarray(mesh.faces, dtype=np.int32)
    with open(path, "wb") as f:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(v)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(fc)}\n"
            "property list uchar int vertex_indices\n"
            "end_header\n"
        )
        f.write(header.encode("ascii"))
        f.write(v.astype("<f4").tobytes())
        for face in fc:
            f.write(struct.pack("<B3i", 3, *face))
