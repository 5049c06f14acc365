"""Native array checkpoints.

VTK files remain the ParaView-compatible checkpoint format (``Vtk_input``
restores positions/polarity/fields/properties exactly like the reference's
restart path, ``examples/intercalation_w_gradient.cu:179-205``).  This
module adds a lossless binary checkpoint that also captures what the
reference never saved: previous velocities, the active count, and link
tables.
"""
from __future__ import annotations

import numpy as np

__all__ = ["save_solution", "load_solution"]


def save_solution(path, points, links=None, properties=(), extra=None):
    """Write a .npz checkpoint of a Solution (+ optional Links/Property)."""
    points.copy_to_host()
    data = {"__n__": np.int64(points.h_n),
            "__fields__": np.array(points.pt_type._fields),
            "__type_name__": np.array(type(points.h_X).__name__)}
    for f in points.pt_type._fields:
        data[f"X.{f}"] = getattr(points.h_X, f)
    data["old_v.x"] = np.asarray(points.d_old_v.x)
    data["old_v.y"] = np.asarray(points.d_old_v.y)
    data["old_v.z"] = np.asarray(points.d_old_v.z)
    if links is not None:
        links.copy_to_host()
        data["links.a"] = links.h_a
        data["links.b"] = links.h_b
        data["links.n"] = np.int64(links.h_n)
        data["links.strength"] = np.float64(links.strength)
    for prop in properties:
        data[f"prop.{prop.name}"] = prop.copy_to_host()
    if extra:
        for k, v in extra.items():
            data[f"extra.{k}"] = np.asarray(v)
    np.savez_compressed(path, **data)


def load_solution(path, points, links=None, properties=()):
    """Restore a Solution (+ optional Links/Property) from ``save_solution``.

    Returns the dict of ``extra`` arrays (empty if none were saved).
    """
    import jax.numpy as jnp

    from ..dtypes import Float3

    with np.load(path, allow_pickle=False) as data:
        n = int(data["__n__"])
        assert n <= points.n_max, "checkpoint larger than capacity"
        for f in points.pt_type._fields:
            arr = data[f"X.{f}"]
            m = min(len(arr), points.n_pad)
            getattr(points.h_X, f)[:m] = arr[:m]
        points.h_n = n
        points.copy_to_device()
        ov = [data[f"old_v.{c}"] for c in "xyz"]
        m = min(len(ov[0]), points.n_pad)
        full = [np.zeros(points.n_pad, np.float32) for _ in range(3)]
        for dst, src in zip(full, ov):
            dst[:m] = src[:m]
        points.d_old_v = Float3(*[jnp.asarray(a) for a in full])
        if links is not None and "links.a" in data:
            m = min(len(data["links.a"]), links.n_pad)
            links.h_a[:m] = data["links.a"][:m]
            links.h_b[:m] = data["links.b"][:m]
            links.h_n = int(data["links.n"])
            links.strength = float(data["links.strength"])
            links.copy_to_device()
        for prop in properties:
            key = f"prop.{prop.name}"
            if key in data:
                m = min(len(data[key]), prop.n_max)
                prop.h_prop[:m] = data[key][:m]
                prop.copy_to_device()
        return {k[6:]: data[k] for k in data.files if k.startswith("extra.")}
