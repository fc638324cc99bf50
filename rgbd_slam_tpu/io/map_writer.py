"""Streaming map export: .xyz, .pcd, .obj writers.

Parity with reference src/outputs/map_writer.{hpp,cpp}: features are appended when
they die or at shutdown; the OBJ writer is what the local map uses (out.obj,
local_map.hpp:25).  Host-side (file IO), fed from the device map arrays.
"""

from __future__ import annotations

import os

import numpy as np


class MapWriter:
    """Interface parity: add_point / add_line / add_polygon
    (map_writer.hpp:12-33)."""

    def __init__(self, filename: str):
        self._file = open(filename, "w")
        self._write_header()

    def _write_header(self):
        pass

    def add_point(self, point):
        raise NotImplementedError

    def add_line(self, points):
        raise NotImplementedError

    def add_polygon(self, points, normal):
        raise NotImplementedError

    def close(self):
        if not self._file.closed:
            self._file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class XYZWriter(MapWriter):
    """Points only (XYZ_Map_Writer, map_writer.cpp)."""

    def add_point(self, point):
        p = np.asarray(point)
        self._file.write(f"{p[0]} {p[1]} {p[2]}\n")

    def add_line(self, points):
        for p in points:
            self.add_point(p)

    def add_polygon(self, points, normal):
        for p in points:
            self.add_point(p)


class PCDWriter(MapWriter):
    """Point Cloud Data format with a patched-up header on close
    (PCD_Map_Writer)."""

    def _write_header(self):
        self._count = 0
        self._points = []

    def add_point(self, point):
        p = np.asarray(point)
        self._points.append(p)
        self._count += 1

    def add_line(self, points):
        for p in points:
            self.add_point(p)

    def add_polygon(self, points, normal):
        for p in points:
            self.add_point(p)

    def close(self):
        if self._file.closed:
            return
        n = self._count
        self._file.write(
            "# .PCD v.7 - Point Cloud Data file format\nVERSION .7\n"
            "FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
            f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
            f"POINTS {n}\nDATA ascii\n")
        for p in self._points:
            self._file.write(f"{p[0]} {p[1]} {p[2]}\n")
        self._file.close()


class OBJWriter(MapWriter):
    """Wavefront OBJ with points, polylines and polygons with normals
    (OBJ_Map_Writer, map_writer.cpp — what Local_Map exports as out.obj)."""

    def _write_header(self):
        self._vertex_index = 1
        self._normal_index = 1

    def add_point(self, point):
        p = np.asarray(point)
        self._file.write(f"v {p[0]} {p[1]} {p[2]}\n")
        self._file.write(f"p {self._vertex_index}\n")
        self._vertex_index += 1

    def add_line(self, points):
        start = self._vertex_index
        for p in points:
            self._file.write(f"v {p[0]} {p[1]} {p[2]}\n")
            self._vertex_index += 1
        idxs = " ".join(str(i) for i in range(start, self._vertex_index))
        self._file.write(f"l {idxs}\n")

    def add_polygon(self, points, normal):
        n = np.asarray(normal)
        self._file.write(f"vn {n[0]} {n[1]} {n[2]}\n")
        start = self._vertex_index
        for p in points:
            self._file.write(f"v {p[0]} {p[1]} {p[2]}\n")
            self._vertex_index += 1
        idxs = " ".join(f"{i}//{self._normal_index}"
                        for i in range(start, self._vertex_index))
        self._file.write(f"f {idxs}\n")
        self._normal_index += 1


def append_dying_features(writer: MapWriter, out) -> int:
    """Append one frame's dying LOCAL features to an open writer (streaming
    parity with feature_map.hpp:748-758: every lost local feature reaches the
    map file at death, so the final export is the union of everything ever
    mapped).  ``out`` is an :class:`engine.StepOutput`; returns the number of
    features written."""
    n = 0
    pm = np.asarray(out.point_evicted)
    if pm.any():
        for p in np.asarray(out.point_evict_pos)[pm]:
            writer.add_point(p)
            n += 1
    qm = np.asarray(out.point2d_evicted)
    if qm.any():
        for p in np.asarray(out.point2d_evict_pos)[qm]:
            writer.add_point(p)
            n += 1
    km = np.asarray(out.plane_evicted)
    if km.any():
        verts = np.asarray(out.plane_evict_verts)
        counts = np.asarray(out.plane_evict_count)
        centers = np.asarray(out.plane_evict_center)
        us = np.asarray(out.plane_evict_u)
        vs = np.asarray(out.plane_evict_v)
        params = np.asarray(out.plane_evict_params)
        for i in np.nonzero(km)[0]:
            cnt = int(counts[i])
            if cnt < 3:
                continue
            v2 = verts[i][:cnt]
            v3 = centers[i] + v2[:, 0:1] * us[i] + v2[:, 1:2] * vs[i]
            writer.add_polygon(v3, params[i][:3])
            n += 1
    lm = np.asarray(out.line_evicted)
    if lm.any():
        eps = np.asarray(out.line_evict_eps)
        for i in np.nonzero(lm)[0]:
            writer.add_line(np.stack([eps[i, :3], eps[i, 3:]]))
            n += 1
    return n


def append_alive_features(writer: MapWriter, state, only_local: bool = True):
    """Append the currently-alive map features to an open writer — the shutdown
    half of the streaming export (Feature_Map::destroy writes the surviving
    LOCAL map, feature_map.hpp:288-298)."""
    from ..geometry import inverse_depth as idp
    from ..mapping import maps as maps_mod

    def sel(m):
        alive = maps_mod.alive(m)
        return np.asarray(alive & m.is_local if only_local else alive)

    pts = state.points
    for p in np.asarray(pts.pos)[sel(pts)]:
        writer.add_point(p)
    p2 = state.points2d
    alive2 = sel(p2)
    if alive2.any():
        cart = np.asarray(idp.to_world(p2.state))
        for p in cart[alive2]:
            writer.add_point(p)
    ln = getattr(state, "lines", None)
    if ln is not None:
        eps = np.asarray(ln.endpoints)
        for i in np.nonzero(sel(ln))[0]:
            writer.add_line(np.stack([eps[i, :3], eps[i, 3:]]))
    pl = state.planes
    for i in np.nonzero(sel(pl))[0]:
        cnt = int(pl.poly_count[i])
        if cnt < 3:
            continue
        verts2 = np.asarray(pl.poly_verts[i][:cnt])
        center = np.asarray(pl.basis_center[i])
        u = np.asarray(pl.basis_u[i])
        v = np.asarray(pl.basis_v[i])
        verts3 = center + verts2[:, 0:1] * u + verts2[:, 1:2] * v
        writer.add_polygon(verts3, np.asarray(pl.params[i][:3]))


def export_slam_map(state, path: str):
    """Write the current map state (alive features) to an OBJ file, mirroring the
    shutdown export (local_map.hpp:35-40)."""
    from ..geometry import inverse_depth as idp
    from ..mapping import maps as maps_mod

    with OBJWriter(path) as w:
        pts = state.points
        alive = np.asarray(maps_mod.alive(pts))
        for p in np.asarray(pts.pos)[alive]:
            w.add_point(p)
        p2 = state.points2d
        alive2 = np.asarray(maps_mod.alive(p2))
        if alive2.any():
            cart = np.asarray(idp.to_world(p2.state))
            for p in cart[alive2]:
                w.add_point(p)
        ln = getattr(state, "lines", None)
        if ln is not None:
            alivel = np.asarray(maps_mod.alive(ln))
            eps = np.asarray(ln.endpoints)
            for i in np.nonzero(alivel)[0]:
                w.add_line(np.stack([eps[i, :3], eps[i, 3:]]))
        pl = state.planes
        alivep = np.asarray(maps_mod.alive(pl))
        for i in np.nonzero(alivep)[0]:
            cnt = int(pl.poly_count[i])
            if cnt < 3:
                continue
            verts2 = np.asarray(pl.poly_verts[i][:cnt])
            center = np.asarray(pl.basis_center[i])
            u = np.asarray(pl.basis_u[i])
            v = np.asarray(pl.basis_v[i])
            verts3 = center + verts2[:, 0:1] * u + verts2[:, 1:2] * v
            w.add_polygon(verts3, np.asarray(pl.params[i][:3]))
