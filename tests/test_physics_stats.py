"""Trajectory-statistics parity tests (BASELINE.md): the rebuild must
reproduce the reference models' emergent behaviour, not just unit forces.

These pin the statistics the reference papers care about: differential-
adhesion sorting (sticky cells end up in the core), Turing patterning
(activator contrast emerges), and flagship-model invariants across
engines.
"""
import jax
import jax.numpy as jnp
import numpy as np

from yalla_tpu import Float3, Solution
from yalla_tpu.inits import random_sphere

r_max = 1.0
r_min = 0.5
n_cells = 100


def differential_adhesion(Xi, r, dist, i, j):
    """ref examples/sorting.cu:17-29 (type = index < n/2)."""
    valid = (i != j) & (dist <= r_max)
    strength = (1 + 2 * (j < n_cells // 2)) * (1 + 2 * (i < n_cells // 2))
    F = 2 * (r_min - dist) * (r_max - dist) + (r_max - dist) ** 2
    safe = jnp.where(dist > 0, dist, 1.0)
    w = jnp.where(valid, strength * F / safe, 0.0)
    return Float3(x=r.x * w, y=r.y * w, z=r.z * w)


def _radii(h, n):
    com = np.array([h.x[:n].mean(), h.y[:n].mean(), h.z[:n].mean()])
    return np.sqrt((h.x[:n] - com[0]) ** 2 + (h.y[:n] - com[1]) ** 2
                   + (h.z[:n] - com[2]) ** 2)


def test_sorting_statistics():
    """After 300 steps the sticky half sits significantly closer to the
    centre of mass than the loose half (cell sorting)."""
    cells = Solution(Float3, n_cells, solver="grid")
    random_sphere(r_min, cells, rng=np.random.default_rng(2718))
    h0 = cells.copy_to_host()
    r0 = _radii(h0, n_cells)
    sep0 = r0[n_cells // 2:].mean() - r0[:n_cells // 2].mean()

    cells.take_steps(300, 0.05, differential_adhesion)
    h = cells.copy_to_host()
    r = _radii(h, n_cells)
    sticky = r[:n_cells // 2].mean()
    loose = r[n_cells // 2:].mean()
    sep = loose - sticky
    assert sep > 0.15 and sep > sep0 + 0.05, \
        f"no sorting: sticky {sticky:.2f} vs loose {loose:.2f} (t0 {sep0:.2f})"


def test_turing_pattern_emerges():
    """Meinhardt kinetics amplify noise into high-contrast u spots
    (ref examples/turing.cu)."""
    import importlib
    import os
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples"))
    t = importlib.import_module("turing")
    importlib.reload(t)

    import numpy as np
    rng = np.random.default_rng(5)
    cells = Solution(t.Epi_cell, 200, solver="grid")
    cells.h_X.theta[:200] = np.pi / 2
    cells.h_X.u[:200] = rng.random(200) / 5 - 0.1
    cells.h_X.v[:200] = rng.random(200) / 5 - 0.1
    from yalla_tpu.inits import random_disk
    random_disk(0.5, cells, rng=np.random.default_rng(2719))

    u0 = np.asarray(cells.d_X.u)[:200]
    cells.take_steps(2000, t.dt, t.epithelium_w_turing)
    h = cells.copy_to_host()
    u = h.u[:200]
    assert np.isfinite(u).all()
    assert u.max() > 1.0, f"no activator peaks: max u = {u.max():.3f}"
    assert u.std() > 10 * max(u0.std(), 1e-3), "no contrast amplification"


def test_branching_engines_agree():
    """Flagship force: gather-grid vs dense-lattice engines produce the
    same short trajectory (incl. aux counters)."""
    from yalla_tpu.models import branching as B
    from yalla_tpu.ops.common import friction_w_neighbour
    from yalla_tpu.ops.lattice_xla import lattice_heun_steps
    from yalla_tpu.polarity import polarity_precompute
    from yalla_tpu.solvers import GridEngine, heun_steps

    p = B.Params()
    state, cells, engine = B.init_state(
        100, 120, p, engine=B.GridEngine(grid_size=16, row_cap=64), seed=8)
    force = B.make_force(p)
    X0, ov0, n = state.X, state.old_v, state.n

    Xg, ovg, auxg = heun_steps(
        3, GridEngine(grid_size=16, row_cap=64), force,
        friction_w_neighbour, None, "com", X0, ov0, n,
        jnp.float32(p.dt), jnp.float32(p.r_max), jnp.int32(0), None,
        polarity_precompute)
    Xl, ovl, auxl = lattice_heun_steps(
        3, 1, force, friction_w_neighbour, "com", 16, 16, 4,
        X0, ov0, n, jnp.float32(p.dt), jnp.float32(p.r_max), jnp.int32(0),
        polarity_precompute)

    nn = int(n)
    for f in ("x", "u", "v", "theta"):
        a = np.asarray(getattr(Xg, f))[:nn]
        b = np.asarray(getattr(Xl, f))[:nn]
        assert np.allclose(a, b, atol=1e-4, rtol=1e-3), \
            f"engines disagree in {f}: {np.abs(a - b).max()}"
    assert np.allclose(np.asarray(auxg["epi_nbs"])[:nn],
                       np.asarray(auxl["epi_nbs"])[:nn]), "aux disagrees"


def test_epithelium_polarity_statistics():
    """ref examples/epithelium.cu: on a relaxed ball with noisy radial
    polarity, bending stiffness (a) relaxes every polarity to the local
    layer normal (radially outward) and (b) sharpens the ball into a
    shell -- the mesenchyme-to-epithelium transition statistic."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples"))
    import epithelium as E

    from yalla_tpu import Po_cell, friction_on_background
    from yalla_tpu.inits import relaxed_sphere

    rng = np.random.default_rng(2)
    # literal reference config (epithelium.cu:10-12); the module constants
    # may have been overridden by the example smoke tests' reloads
    cells = Solution(Po_cell, 250, solver="grid")
    relaxed_sphere(0.8, cells, rng=rng)
    h = cells.h_X
    d = np.sqrt(h.x ** 2 + h.y ** 2 + h.z ** 2)
    d = np.where(d > 0, d, 1.0)
    n = cells.h_n
    h.theta[:n] = (np.arccos(np.clip(h.z / d, -1, 1))
                   + rng.random(cells.n_pad) * 0.5)[:n]
    h.phi[:n] = (np.arctan2(h.y, h.x) + rng.random(cells.n_pad) * 0.5)[:n]
    cells.copy_to_device()

    def stats(c):
        hh = c.copy_to_host()
        m = c.h_n
        px = np.sin(hh.theta[:m]) * np.cos(hh.phi[:m])
        py = np.sin(hh.theta[:m]) * np.sin(hh.phi[:m])
        pz = np.cos(hh.theta[:m])
        r = np.stack([hh.x[:m], hh.y[:m], hh.z[:m]])
        r = r - r.mean(1, keepdims=True)
        rn = np.linalg.norm(r, axis=0)
        rn = np.where(rn > 0, rn, 1)
        radial_align = np.mean((px * r[0] + py * r[1] + pz * r[2]) / rn)
        return radial_align, rn.max() - rn.mean()

    align0, spread0 = stats(cells)
    # literal reference schedule (epithelium.cu:11-12) -- the module-level
    # constants may have been overridden by the example smoke tests
    cells.take_steps(100, 0.05, E.layer_force,
                     pw_friction=friction_on_background)
    align1, spread1 = stats(cells)
    assert align1 > 0.98, f"polarity not radial: {align1:.3f}"
    assert align1 > align0 + 0.02, "noise did not relax"
    assert spread1 < spread0, "ball did not sharpen into a shell"


def test_intercalation_elongation_statistics():
    """ref examples/intercalation.cu: protrusion links constrained nearly
    perpendicular to x (|r_x / dist| < 0.2) drive convergent extension --
    the tissue elongates along x (the named BASELINE statistic)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples"))
    import intercalation as I

    from yalla_tpu.links import Links, link_forces

    cells = Solution(Float3, I.n_cells, solver="grid", row_cap=64)
    random_sphere(I.r_min, cells, rng=np.random.default_rng(4))
    prot = Links(I.n_cells, seed=11)

    def aspect(c):
        hh = c.copy_to_host()
        m = c.h_n
        return hh.x[:m].std() / ((hh.y[:m].std() + hh.z[:m].std()) / 2)

    a0 = aspect(cells)
    assert a0 < 1.3, "initial ball not isotropic"
    for _ in range(60):
        prot.update(I.update_protrusions, cells)
        cells.take_step(I.dt, I.clipped_cubic, gen_forces=link_forces(prot))
    a1 = aspect(cells)
    assert a1 > 3.0, f"no convergent extension: aspect {a0:.2f} -> {a1:.2f}"
