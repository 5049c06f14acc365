"""Legacy-ASCII VTK output/input for ParaView, plus wall-clock reporting.

Rebuild of ``/root/reference/include/vtk.cuh``: ``Vtk_output`` writes
``<dir>/<base_name>_<step>.vtk`` POLYDATA time series (positions +
VERTICES, LINES for links, SCALARS fields/properties, NORMALS polarity,
optional bool mask); ``Vtk_input`` restores positions, polarity, fields,
and properties -- VTK files double as checkpoints
(cf. ``examples/intercalation_w_gradient.cu:179-205``).

Formatting is vectorized through numpy; writing happens on the host, off
the device hot path (JAX dispatch is async, so compute for the next steps
overlaps the write, replacing the reference's explicit I/O thread,
``examples/branching.cu:263-281``).
"""
from __future__ import annotations

import io
import os
import time

import numpy as np

from .polarity import DEFAULT_AXIS

__all__ = ["Vtk_output", "Vtk_input"]


def _fmt_rows(arr):
    """ASCII rows for an [n, k] float array; native C++ serializer when
    available (an order of magnitude faster than Python formatting at
    500k-point frames), numpy fallback otherwise."""
    from . import _native
    text = _native.format_rows(np.asarray(arr, np.float32))
    if text is not None:
        return text
    out = io.StringIO()
    np.savetxt(out, arr, fmt="%.6g", delimiter=" ")
    return out.getvalue()


class Vtk_output:
    """Write one .vtk file per step (ref vtk.cuh:29-214)."""

    def __init__(self, base_name, output_path="output/", verbose=True):
        self.base_name = base_name
        self.output_dir = output_path if output_path.endswith("/") \
            else output_path + "/"
        os.makedirs(self.output_dir, exist_ok=True)
        self.verbose = verbose
        self.time_step = 0
        self.n_points = 0
        self._mask = None
        self._current_path = None
        self._point_data_started = False
        self._t0 = time.time()

    # -- positions (must be written first, ref vtk.cuh:93-135) --------------
    def write_positions(self, points, mask=None):
        h = points.copy_to_host()
        n = points.h_n
        self.n_points = n
        self._mask = None if mask is None else np.asarray(mask[:n], bool)
        sel = slice(None) if self._mask is None else self._mask
        xyz = np.stack([h.x[:n], h.y[:n], h.z[:n]], axis=1)[sel]
        n_write = xyz.shape[0]

        self._current_path = (f"{self.output_dir}{self.base_name}_"
                              f"{self.time_step}.vtk")
        with open(self._current_path, "w") as f:
            f.write("# vtk DataFile Version 3.0\n")
            f.write(f"{self.base_name}\n")
            f.write("ASCII\nDATASET POLYDATA\n")
            f.write(f"\nPOINTS {n_write} float\n")
            f.write(_fmt_rows(xyz))
            f.write(f"\nVERTICES {n_write} {2 * n_write}\n")
            from . import _native
            verts = _native.format_vertices(n_write)
            f.write(verts if verts is not None
                    else "".join(f"1 {i}\n" for i in range(n_write)))
        self._point_data_started = False
        self.time_step += 1
        if self.verbose:
            print(f"Integrating {self.base_name}, {self.time_step} steps "
                  f"done ({n} points)        ", end="\r", flush=True)

    def _n_written(self):
        return self.n_points if self._mask is None else int(self._mask.sum())

    def _start_point_data(self, f):
        if not self._point_data_started:
            f.write(f"\nPOINT_DATA {self._n_written()}\n")
            self._point_data_started = True

    # -- links (if written, second; ref vtk.cuh:137-145) --------------------
    def write_links(self, links):
        links.copy_to_host()
        m = links.h_n
        with open(self._current_path, "a") as f:
            f.write(f"\nLINES {m} {3 * m}\n")
            from . import _native
            lines = _native.format_lines(links.h_a[:m], links.h_b[:m])
            if lines is not None:
                f.write(lines)
            else:
                ab = np.stack([np.full(m, 2), links.h_a[:m], links.h_b[:m]],
                              axis=1)
                np.savetxt(f, ab, fmt="%d", delimiter=" ")

    # -- extra Pt fields (ref vtk.cuh:147-166) -------------------------------
    def write_field(self, points, data_name="w", field=None):
        field = field or data_name
        vals = np.asarray(getattr(points.h_X, field))[:self.n_points]
        if self._mask is not None:
            vals = vals[self._mask]
        with open(self._current_path, "a") as f:
            self._start_point_data(f)
            f.write(f"SCALARS {data_name} float\nLOOKUP_TABLE default\n")
            f.write(_fmt_rows(vals[:, None]))

    # -- polarity as NORMALS (ref vtk.cuh:168-187) ---------------------------
    def write_polarity(self, points, data_name="polarity", axis=DEFAULT_AXIS):
        h = points.h_X
        th = np.asarray(getattr(h, axis[0]))[:self.n_points]
        ph = np.asarray(getattr(h, axis[1]))[:self.n_points]
        nx = np.sin(th) * np.cos(ph)
        ny = np.sin(th) * np.sin(ph)
        nz = np.where((th == 0) & (ph == 0), 0.0, np.cos(th))
        normals = np.stack([nx, ny, nz], axis=1)
        if self._mask is not None:
            normals = normals[self._mask]
        with open(self._current_path, "a") as f:
            self._start_point_data(f)
            f.write(f"NORMALS {data_name} float\n")
            f.write(_fmt_rows(normals))

    # -- properties (ref vtk.cuh:189-214) -------------------------------------
    def write_property(self, prop):
        vals = prop.copy_to_host()[:self.n_points]
        if self._mask is not None:
            vals = vals[self._mask]
        ptype = "float" if np.issubdtype(prop.dtype, np.floating) else "int"
        with open(self._current_path, "a") as f:
            self._start_point_data(f)
            f.write(f"SCALARS {prop.name} {ptype}\nLOOKUP_TABLE default\n")
            if ptype == "int":
                from . import _native
                text = _native.format_ints(np.asarray(vals, np.int32))
                f.write(text if text is not None
                        else "".join(f"{int(v)}\n" for v in vals))
            else:
                f.write(_fmt_rows(np.asarray(vals, float)[:, None]))

    # -- wall-clock report (ref vtk.cuh:75-91) --------------------------------
    def close(self):
        if not self.verbose:
            return
        self.verbose = False  # report once
        duration = int(time.time() - self._t0)
        if duration < 60:
            t = f"{duration} seconds"
        elif duration < 3600:
            t = f"{duration // 60}m {duration % 60}s"
        else:
            t = f"{duration // 3600}h {duration % 3600}m"
        print(f"Integrating {self.base_name}, {t} taken "
              f"({self.n_points} points).        ")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __del__(self):
        # Mirror the reference's destructor report; safe if already closed.
        try:
            if self.verbose and self.time_step > 0:
                self.close()
                self.verbose = False
        except Exception:
            pass


class Vtk_input:
    """Read back positions/polarity/fields/properties
    (ref vtk.cuh:217-378)."""

    def __init__(self, file_name):
        self.file_name = file_name
        with open(file_name) as f:
            self._lines = f.read().splitlines()
        self.n_points = None
        for line in self._lines[:10]:
            items = line.split()
            if items and items[0] == "POINTS":
                self.n_points = int(items[1])
                break
        assert self.n_points is not None, "POINTS header not found"

    def _find_entry(self, kw1, kw2):
        """Line index right after the '<kw1> <kw2>' header
        (ref vtk.cuh:259-286; skips the 4 header lines)."""
        for idx in range(4, len(self._lines)):
            items = self._lines[idx].split()
            if len(items) > 1 and items[0] == kw1 and items[1] == kw2:
                return idx + 1
        raise KeyError(f"{kw1} {kw2} not found in {self.file_name}")

    def _read_floats(self, start, n, width):
        # float64: must hold int32 properties exactly (f32 would round >2^24)
        from . import _native
        text = "\n".join(self._lines[start:start + n])
        vals = _native.parse_doubles(text, n * width)
        if vals is not None and len(vals) == n * width:
            return vals.reshape(n, width)
        vals = []
        idx = start
        while len(vals) < n * width:
            vals.extend(float(v) for v in self._lines[idx].split())
            idx += 1
        return np.asarray(vals, np.float64).reshape(n, width)

    def read_positions(self, points):
        start = self._find_entry("POINTS", str(self.n_points))
        xyz = self._read_floats(start, self.n_points, 3)
        n = self.n_points
        points.h_X.x[:n] = xyz[:, 0]
        points.h_X.y[:n] = xyz[:, 1]
        points.h_X.z[:n] = xyz[:, 2]

    def read_polarity(self, points, data_name="polarity", axis=DEFAULT_AXIS):
        """Normals -> (theta, phi).  The reference has a latent bug here
        (clears the parsed line before converting, vtk.cuh:325-328); this
        implements the intended parse-then-convert behaviour."""
        start = self._find_entry("NORMALS", data_name)
        nrm = self._read_floats(start, self.n_points, 3)
        d = np.sqrt((nrm ** 2).sum(axis=1))
        theta = np.where(d == 0, 0.0, np.arccos(np.clip(nrm[:, 2], -1, 1)))
        phi = np.where(d == 0, 0.0, np.arctan2(nrm[:, 1], nrm[:, 0]))
        n = self.n_points
        getattr(points.h_X, axis[0])[:n] = theta
        getattr(points.h_X, axis[1])[:n] = phi

    def read_field(self, points, data_name="w", field=None):
        field = field or data_name
        start = self._find_entry("SCALARS", data_name) + 1  # skip LOOKUP_TABLE
        vals = self._read_floats(start, self.n_points, 1)[:, 0]
        getattr(points.h_X, field)[:self.n_points] = vals

    def read_property(self, prop, prop_name=None):
        prop_name = prop_name or prop.name
        start = self._find_entry("SCALARS", prop_name) + 1
        assert self.n_points <= prop.n_max
        vals = self._read_floats(start, self.n_points, 1)[:, 0]
        prop.h_prop[:self.n_points] = vals.astype(prop.dtype)
