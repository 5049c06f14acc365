"""Tests for checkpointing, the native I/O layer, and profiling utils."""
import numpy as np

from helpers import isclose
from yalla_tpu import Property, Solution, make_pt
from yalla_tpu.links import Links
from yalla_tpu.utils import StepTimer, load_solution, save_solution

Cell = make_pt("CkptCell", "w", "theta", "phi")
rng = np.random.default_rng(99)


def test_checkpoint_roundtrip(tmp_path):
    n = 70
    pts = Solution(Cell, n, solver="tile")
    for f in pts.pt_type._fields:
        getattr(pts.h_X, f)[:n] = rng.random(n)
    pts.copy_to_device()
    import jax.numpy as jnp
    from yalla_tpu.dtypes import Float3
    pts.d_old_v = Float3(jnp.full(pts.n_pad, 0.25), jnp.zeros(pts.n_pad),
                         jnp.zeros(pts.n_pad))
    links = Links(5, strength=0.7)
    links.h_a[:5] = np.arange(5)
    links.h_b[:5] = np.arange(5) + 1
    links.copy_to_device()
    prop = Property(pts.n_pad, "lineage")
    prop.h_prop[:n] = rng.integers(0, 1000, n)

    path = str(tmp_path / "ckpt.npz")
    save_solution(path, pts, links=links, properties=(prop,),
                  extra={"step": np.int64(42)})

    pts2 = Solution(Cell, n, solver="tile")
    links2 = Links(5)
    prop2 = Property(pts2.n_pad, "lineage")
    extra = load_solution(path, pts2, links=links2, properties=(prop2,))

    for f in pts.pt_type._fields:
        assert isclose(getattr(pts2.h_X, f)[:n], getattr(pts.h_X, f)[:n])
    assert pts2.h_n == n
    assert float(np.asarray(pts2.d_old_v.x)[0]) == 0.25
    assert np.array_equal(links2.h_a[:5], links.h_a[:5])
    assert links2.strength == 0.7
    assert np.array_equal(prop2.h_prop[:n], prop.h_prop[:n])
    assert int(extra["step"]) == 42


def test_checkpoint_reload_into_same_property(tmp_path):
    """Round trip into the SAME objects: after copy_to_host the host mirrors
    must remain writable (regression: np.asarray gave a read-only view of
    the JAX buffer and reload crashed with 'assignment destination is
    read-only')."""
    n = 40
    pts = Solution(Cell, n, solver="tile")
    pts.h_X.x[:n] = rng.random(n)
    pts.copy_to_device()
    prop = Property(pts.n_pad, "cell_type")
    prop.h_prop[:n] = rng.integers(0, 3, n)
    prop.copy_to_device()
    prop.copy_to_host()  # would poison h_prop with a read-only view

    path = str(tmp_path / "ckpt2.npz")
    save_solution(path, pts, properties=(prop,))
    before = prop.h_prop[:n].copy()
    prop.h_prop[:n] = -1  # diverge, then restore into the same object
    load_solution(path, pts, properties=(prop,))
    assert np.array_equal(prop.h_prop[:n], before)


def test_native_io_layer():
    """The C++ serializer matches the Python fallback (skip if no g++)."""
    import pytest

    from yalla_tpu import _native
    if _native.get_lib() is None:
        pytest.skip("native toolchain unavailable")

    arr = rng.random((100, 3)).astype(np.float32) * 100 - 50
    text = _native.format_rows(arr)
    back = np.fromstring(text, sep=" ").reshape(100, 3) \
        if hasattr(np, "fromstring") else None
    parsed = _native.parse_floats(text, 300).reshape(100, 3)
    assert np.allclose(parsed, arr, rtol=1e-6)

    ints = rng.integers(0, 2 ** 30, 50).astype(np.int32)
    text = _native.format_ints(ints)
    assert [int(v) for v in text.split()] == list(ints)

    assert _native.format_vertices(3) == "1 0\n1 1\n1 2\n"
    assert _native.format_lines([0, 2], [1, 3]) == "2 0 1\n2 2 3\n"

    d = _native.parse_doubles("1073741824 7\n", 2)
    assert d[0] == 1073741824.0  # > 2^24: exactness matters for int props


def test_step_timer():
    t = StepTimer(n_cells=100)
    t.tick(10)
    assert t.steps == 10
    assert "steps" in t.report()
