"""Benchmark: cell-steps/sec at 500k cells (branching-class physics).

Headline metric from BASELINE.md: Heun steps of the flagship
branching-class physics (type-dependent ReLU mechanics + Turing
reaction/diffusion + epithelial bending + neighbour counters) at 500,000
cells on one TPU chip, using the dense cube-lattice engine with the
Pallas pair kernel and the Cartesian polarity fast path.

The tissue is *relaxed to mechanical equilibrium* before timing (every
reference model benches in this regime -- branching starts from
``relaxed_sphere``, branching.cu:178), then the lattice capacity ``C`` is
chosen from the measured max cube occupancy (+1 headroom; the kernel cost
scales ~C^2 through slots x shifts).  The in-loop failure flags certify
that no cube overflowed during the timed run.

``REBUILD_EVERY = 4``: the spatial binning is refreshed every 4 steps with
state lattice-resident in between.  The reference rebuilds per pass, but
all its potentials vanish at the cutoff, so the brief staleness has
negligible force error (tests/test_fastpath.py quantifies it); set 1 for
reference-exact rebuild cadence.

The CUDA reference publishes no numbers (BASELINE.md); ``vs_baseline`` is
reported against an assumed 1e8 cell-steps/s for the reference's
single-GPU grid solver at this size -- the BASELINE.json target of
>= 10x CUDA corresponds to vs_baseline >= 10.  Because that constant is
an admitted fiction (BASELINE.md estimates the real reference at 1-3e7
from its arithmetic), the JSON "extra" carries BOTH ratios:
``vs_assumed_1e8`` and ``vs_estimated_cuda`` (the [vs 3e7, vs 1e7]
range).  It also carries the 5k-cell metric (BASELINE.json asks for
both sizes).

Driver-clock discipline (the round-4 lesson: three rounds of rc=124
with zero parsed output):

* **Emit-first**: the JSON line prints the moment the FIRST rung
  certifies and again after every better rung -- the driver parses the
  last JSON line, so a later timeout can never erase a measured result.
* **Budget-aware**: ``BENCH_BUDGET_S`` (env, default 2100 s) is a
  wall-clock budget checked before every probe; when exhausted, racing
  stops and the best certified rung stands.
* **Winner-first**: the last certified winner per metric is persisted in
  ``bench_state.json`` (committed) and raced FIRST on re-runs; the
  settled tissue states are cached in ``.bench_cache/*.npz`` (committed)
  so re-runs skip the ~12 settle phases entirely
  (``BENCH_REFRESH=1`` forces a re-settle).

Usage: python bench.py [n_cells] [n_steps]
Prints JSON lines: {"metric", "value", "unit", "vs_baseline", "extra"};
the LAST line is the final (superset) result.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CUDA_BASELINE_CELL_STEPS_PER_SEC = 1e8  # assumed; see module docstring
CUDA_ESTIMATED_RANGE = (1e7, 3e7)       # BASELINE.md arithmetic estimate
REBUILD_EVERY = 4
RELAX_STEPS = 48

_REPO = os.path.dirname(os.path.abspath(__file__))
CACHE_DIR = os.path.join(_REPO, ".bench_cache")
BENCH_STATE_PATH = os.path.join(_REPO, "bench_state.json")
# bump when the settle recipe / IC / force physics changes: a cached
# settled state is only valid for the regime it was settled under
SETTLE_VER = 1
_REFRESH = os.environ.get("BENCH_REFRESH", "") not in ("", "0")

_DEADLINE = None  # monotonic deadline set by main(); None = no budget
# extra seconds measure()'s probes must leave on the clock -- main() sets
# this during the headline 500k phase so the exploration ladder cannot
# starve the 5k races of their budget
_RESERVE_S = 0.0


def _expired(reserve=None):
    """True when the wall-clock budget is exhausted (minus ``reserve``
    seconds the caller wants to keep for later phases; defaults to the
    module phase reserve)."""
    if reserve is None:
        reserve = _RESERVE_S
    return _DEADLINE is not None and time.monotonic() > _DEADLINE - reserve


def _time_left():
    return float("inf") if _DEADLINE is None \
        else _DEADLINE - time.monotonic()


def _settled_path(tag, n_cells, seed):
    return os.path.join(
        CACHE_DIR, f"settled_{tag}_{n_cells}_s{seed}_v{SETTLE_VER}.npz")


def _save_settled(tag, n_cells, seed, X, old_v):
    """Persist a settled (X, old_v) pytree so re-runs (and the driver's
    end-of-round run) skip the settle phases -- the single biggest cost
    of a cold bench run (~12 x 48 tunnel-dispatched steps at 500k)."""
    os.makedirs(CACHE_DIR, exist_ok=True)
    data = {"__cell_fields": np.array(list(type(X)._fields))}
    for fld in type(X)._fields:
        data["X_" + fld] = np.asarray(getattr(X, fld))
    for fld in type(old_v)._fields:
        data["V_" + fld] = np.asarray(getattr(old_v, fld))
    path = _settled_path(tag, n_cells, seed)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **data)
    os.replace(tmp, path)
    print(f"# settled state cached: {os.path.relpath(path, _REPO)} "
          f"({os.path.getsize(path) // 1024} KiB)", file=sys.stderr)


def _load_settled(tag, n_cells, seed, cell_cls):
    """Restore a cached settled state, or None.  The pytree layout must
    match the caller's Cell class exactly (field-name check)."""
    from yalla_tpu.dtypes import Float3
    path = _settled_path(tag, n_cells, seed)
    if _REFRESH or not os.path.exists(path):
        return None
    try:
        with np.load(path) as d:
            if list(d["__cell_fields"]) != list(cell_cls._fields):
                print(f"# settled cache {path}: field mismatch, ignoring",
                      file=sys.stderr)
                return None
            X = cell_cls(**{f: jnp.asarray(d["X_" + f])
                            for f in cell_cls._fields})
            old_v = Float3(**{f: jnp.asarray(d["V_" + f])
                              for f in Float3._fields})
    except Exception as e:  # corrupt cache must never kill the bench
        print(f"# settled cache unreadable ({e}); re-settling",
              file=sys.stderr)
        return None
    print(f"# settled state loaded from cache: "
          f"{os.path.relpath(path, _REPO)}", file=sys.stderr)
    return X, old_v


def _load_bench_state():
    try:
        with open(BENCH_STATE_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def _save_bench_state(state):
    tmp = BENCH_STATE_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)
        f.write("\n")
    os.replace(tmp, BENCH_STATE_PATH)


def _ic(n_cells, n_pad, seed=0):
    from yalla_tpu.models import branching as B

    rng = np.random.default_rng(seed)
    # Jittered lattice at relaxed-tissue spacing 0.75 carved to a BALL,
    # epithelial shell on the boundary: the flagship's grown-tissue
    # composition and shape (branching.cu grows a spheroid from
    # relaxed_sphere; a ball also exercises the kernel's empty-block
    # skip the way real tissues do -- a cube IC would fill the whole
    # bounding lattice)
    side = int(np.ceil((n_cells * 6 / np.pi) ** (1 / 3))) + 2
    g = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"),
                 -1).reshape(-1, 3)
    pos = (g - side / 2) * 0.75 + rng.uniform(-0.2, 0.2, (len(g), 3))
    rr0 = np.linalg.norm(pos, axis=1)
    pos = pos[np.argsort(rr0)][:n_pad]
    pos[n_cells:] = 0.0
    rr = np.linalg.norm(pos, axis=1)
    surface = rr > (rr[:n_cells].max() - 1.0)
    surface[n_cells:] = False
    rr = np.maximum(rr, 1e-6)
    return B.Cell(
        x=jnp.asarray(pos[:, 0], jnp.float32),
        y=jnp.asarray(pos[:, 1], jnp.float32),
        z=jnp.asarray(pos[:, 2], jnp.float32),
        theta=jnp.asarray(np.where(surface, np.arccos(
            np.clip(pos[:, 2] / rr, -1, 1)), 0), jnp.float32),
        phi=jnp.asarray(np.where(surface, np.arctan2(pos[:, 1], pos[:, 0]),
                                 0), jnp.float32),
        u=jnp.asarray(rng.random(n_pad) * 0.1, jnp.float32),
        v=jnp.asarray(rng.random(n_pad) * 0.1, jnp.float32),
        ctype=jnp.asarray(surface.astype(np.float32)),
    )


def _max_occ(X, n_cells, gs, cube):
    q = [np.asarray(X.x)[:n_cells], np.asarray(X.y)[:n_cells],
         np.asarray(X.z)[:n_cells]]
    cid = 0
    for a in q:
        cid = cid * gs + np.clip(np.floor(a / cube).astype(np.int64)
                                 + gs // 2, 0, gs - 1)
    return int(np.bincount(cid).max()), max(float(np.abs(a).max())
                                            for a in q)


def _extents(X, n_cells):
    """Per-axis max |coord| of the active cells (x, y, z)."""
    return tuple(float(np.abs(np.asarray(a)[:n_cells]).max())
                 for a in (X.x, X.y, X.z))


def _occ_cubes(X, n_cells, gs, cube):
    """(z, y, x) cube coords + per-cube counts of the active points."""
    q = [np.clip(np.floor(np.asarray(a)[:n_cells] / cube).astype(np.int64)
                 + gs // 2, 0, gs - 1)
         for a in (X.z, X.y, X.x)]
    cid = (q[0] * gs + q[1]) * gs + q[2]
    uniq, counts = np.unique(cid, return_counts=True)
    return uniq, counts


def _extras_plan(X, n_cells, dims, cube, C, zb=2, yb=8, x_split=1):
    """(n_extras_total, per_block_cap_needed) if the lattice ran at
    capacity ``C`` with overflow extras: mirrors the kernel's sidecar
    table assignment (an extra lands in every block overlapping its
    +-1-cube z/y neighbourhood, <= 4 blocks).  ``dims`` = (gx, gy, gz)
    or an int for a cubic grid.  ``x_split`` bins x at ``cube/x_split``
    (thin x-cubes, see LatticeEngine.x_split)."""
    gx, gy, gz = (dims, dims, dims) if isinstance(dims, int) else dims
    q = [np.clip(np.floor(np.asarray(a)[:n_cells] / cs).astype(np.int64)
                 + g // 2, 0, g - 1)
         for a, g, cs in ((X.z, gz, cube), (X.y, gy, cube),
                          (X.x, gx, cube / x_split))]
    cid = (q[0] * gy + q[1]) * gx + q[2]
    uniq, counts = np.unique(cid, return_counts=True)
    over = counts - C
    sel = over > 0
    if not sel.any():
        return 0, 0
    cz, rem = np.divmod(uniq[sel], gx * gy)
    cy = rem // gx
    k = over[sel]
    ny = gy // yb
    per_block = np.zeros(((gz // zb) * ny,), np.int64)
    for z0, y0, kk in zip(cz, cy, k):
        blocks = {(int(np.clip(zi, 0, gz // zb - 1)),
                   int(np.clip(yi, 0, ny - 1)))
                  for zi in ((z0 - 1) // zb, (z0 + 1) // zb)
                  for yi in ((y0 - 1) // yb, (y0 + 1) // yb)}
        for zi, yi in blocks:
            per_block[zi * ny + yi] += kk
    return int(over[sel].sum()), int(per_block.max())


# extras sizing shared by every lattice builder: E_CAP is a static shape
# (the extras-extras pair block costs E_CAP^2 lanes per pass whether or
# not extras are live); E_B_MAX bounds the per-block sidecar table
E_B_MAX, E_CAP = 64, 2048


def _settle_sorting(X, old_v, n_cells, adhesion, dt, r_max):
    """Relu pre-relaxation + full-force settling until the compact
    adhesive tissue's density profile stops drifting (same convergence
    gate as the 500k builder: the sticky potential compacts for many
    hundreds of steps, and a bench timed mid-transient outruns both its
    capacity plan and its staleness margin)."""
    from yalla_tpu.inits import relu_force
    from yalla_tpu.ops.common import friction_w_neighbour
    from yalla_tpu.ops.lattice_xla import lattice_heun_steps, \
        lattice_grid_for

    n = jnp.int32(n_cells)
    _, extent0 = _max_occ(X, n_cells, 64, r_max)
    gs0 = lattice_grid_for(extent0 * 1.1 + 1.0, r_max, 8)

    def phase(pw, dt_, X, old_v):
        X, old_v, aux = lattice_heun_steps(
            RELAX_STEPS, REBUILD_EVERY, pw, friction_w_neighbour,
            "com", gs0, 24, 2, X, old_v, n, jnp.float32(dt_),
            jnp.float32(r_max), jnp.int32(0), None, False)
        assert int(aux["__err_out_of_grid"]) == 0
        return X, old_v

    X, old_v = phase(relu_force, 0.1, X, old_v)
    prev_e = None
    for phase_i in range(20):
        X, old_v = phase(adhesion, dt, X, old_v)
        n_e, _ = _extras_plan(X, n_cells, 64, r_max, 16)
        if prev_e is not None and abs(n_e - prev_e) <= max(5, prev_e // 20):
            break
        prev_e = n_e
    print(f"# settle (sorting 5k-class): {phase_i + 1} full-force phases, "
          f"probe extras {n_e}", file=sys.stderr)
    return X, jax.tree.map(jnp.zeros_like, old_v)


def _settle_sorting_cached(X, old_v, n_cells, adhesion, dt, r_max, seed):
    """Cache wrapper around ``_settle_sorting``: the three 5k builders
    (lattice / tile / MXU) share the IC recipe but pad to different
    shapes, so the cache key carries n_pad."""
    cell_cls, n_pad = type(X), int(X.x.shape[0])
    tag = f"sorting_p{n_pad}"
    cached = _load_settled(tag, n_cells, seed, cell_cls)
    if cached is not None:
        return cached
    X, old_v = _settle_sorting(X, old_v, n_cells, adhesion, dt, r_max)
    _save_settled(tag, n_cells, seed, X, old_v)
    return X, old_v


def _plan_lattice(X, n_cells, r_max, ms, pallas, zb=2, yb=16, e_scale=1,
                  min_C=0, x_split=1):
    """Cost-optimal (cube multiple, (gx, gy, gz), C, extras) over
    candidate cube margins ``ms`` -- the kernel's lane work is
    ``gx*gy*gz * C * (9(4C-1) + 2.2 * extras_block_cap)``.  Only gx pays
    the 128-lane row rule; gy and gz are ceil-to-8 of the tissue's
    actual per-axis extent (a cubic rule costs ~25% spurious lanes for
    a ball at C = 12).  With overflow extras the capacity tracks the
    TYPICAL cube occupancy instead of the worst cube's.

    No plan ships without drift protection: a candidate C within 2 of
    the measured max occupancy (or any C at ``e_scale > 1``, the
    escalated re-plan after a flagged probe) gets the overflow-extras
    sidecar even when it is nominally overflow-free TODAY -- density
    drift during the timed window is exactly what killed round 3's 5k
    rung (C=16 at occ 15, extras off, 2-4 cells dropped mid-run).
    ``min_C`` lets a flagged caller escalate CAPACITY: only candidates
    with ``C >= min_C`` are considered."""
    from yalla_tpu.ops.lattice_xla import lattice_grid_for

    ex, ey, ez = _extents(X, n_cells)

    def lat_dim(e, cube_m):
        need = int(np.ceil(2.0 * (e + 0.75) / cube_m))
        return max(-(-need // 8) * 8, 16)

    best = None
    for m in ms:
        cube_m = r_max * m
        if x_split == 1:
            occ_m, _ = _max_occ(X, n_cells, 96, cube_m)
        else:
            # occupancy of the THIN x-cubes: roughly 1/x_split of the
            # isotropic one -- the whole point of the split
            qx = np.floor(np.asarray(X.x)[:n_cells]
                          / (cube_m / x_split)).astype(np.int64)
            qy = np.floor(np.asarray(X.y)[:n_cells] / cube_m).astype(
                np.int64)
            qz = np.floor(np.asarray(X.z)[:n_cells] / cube_m).astype(
                np.int64)
            cid = ((qz + 128) * 256 + (qy + 128)) * 256 + (qx + 128)
            occ_m = int(np.unique(cid, return_counts=True)[1].max())
        gy_m, gz_m = lat_dim(ey, cube_m), lat_dim(ez, cube_m)
        for C_m in (2, 3, 4, 6, 8, 10, 12, 16, 24):
            if C_m < min_C or (x_split == 1 and C_m < 4):
                continue
            gx_m = lattice_grid_for(ex, cube_m / x_split, C_m)
            dims = (gx_m, gy_m, gz_m)
            if (gx_m * C_m) % 128:
                continue
            if C_m >= occ_m + 2 and e_scale == 1:
                n_e, e_b = 0, 0   # comfortable static headroom
            elif not pallas:
                # the XLA path has no extras sidecar; require headroom
                if C_m >= occ_m + 2:
                    n_e, e_b = 0, 0
                else:
                    continue
            else:
                n_e, e_blk = _extras_plan(X, n_cells, dims, cube_m,
                                          C_m, zb, yb, x_split)
                # headroom: 2x the measured per-block spill or +6, floor 8
                # (times the caller's escalation on a flagged probe); the
                # kernel sidecar costs ~2.2 force evals per table slot
                e_b = -(-max(e_blk * 2, e_blk + 6, 8) * e_scale // 8) * 8
                if (n_e + 64) * e_scale > E_CAP // 2 or e_b > E_B_MAX:
                    continue
            # shift count 2(x_split + 1)C - 1 per (dz, dy) window
            cost = gx_m * gy_m * gz_m * C_m * (
                9 * (2 * (x_split + 1) * C_m - 1) + 2.2 * e_b)
            if best is None or cost < best[0]:
                best = (cost, m, dims, C_m, occ_m, max(ex, ey, ez),
                        n_e, e_b)
    return best


def _prepare_branching(n_cells, seed=0):
    """Settled 500k-class branching state: IC, relu relaxation, full-force
    settling to density convergence.  Shared by ``build`` and the kernel
    ablation diagnostics (benchmarks/diag_ablate500k.py) so both time the
    exact regime the bench certifies."""
    from yalla_tpu.models import branching as B
    from yalla_tpu.dtypes import Float3
    from yalla_tpu.ops.common import friction_w_neighbour
    from yalla_tpu.ops.lattice_xla import (lattice_grid_for,
                                           lattice_heun_steps)
    from yalla_tpu.polarity import polarity_precompute3 as polarity_precompute

    n_pad = -(-n_cells // 4096) * 4096 if n_cells > 4096 else \
        max(64, -(-n_cells // 64) * 64)
    p = B.Params()
    force = B.make_force(p)
    n = jnp.int32(n_cells)
    pallas = jax.default_backend() == "tpu"
    cached = _load_settled("branching", n_cells, seed, B.Cell)
    if cached is not None and int(cached[0].x.shape[0]) == n_pad:
        return cached[0], cached[1], p, force, n, pallas
    X = _ic(n_cells, n_pad, seed)
    old_v = Float3.zeros(n_pad)

    # relax to mechanical equilibrium with the plain relu band (exactly the
    # reference's relaxed-IC recipe, inits.cuh:95-155), then pick the
    # cheapest (grid, capacity) for the measured occupancy
    from yalla_tpu.inits import relu_force
    _, extent0 = _max_occ(X, n_cells, 64, p.r_max)
    # generous transient headroom: the jittered IC compresses locally and
    # expands toward its ~0.8 rest spacing while settling (C = 16 is
    # always lane-aligned; margin covers the expansion)
    gs0 = lattice_grid_for(extent0 * 1.04 + 1.0, p.r_max, 8)
    # two phases at the well-proven Pallas C=8 shapes: geometric
    # relaxation with the relu band, then settling under the *full*
    # force -- the full force's tighter rest bands re-compress the
    # tissue, and capacity must be sized for the regime actually timed
    # (measured: settled max occupancy is 8+ at 500k, so the timed run
    # gets C = 10; a handful of transiently dropped cells during IC
    # preparation are reported but acceptable -- they freeze for at most
    # one rebuild interval of the prep phase)
    def _phase(pw, pre, X, old_v, C_s=8):
        X, old_v, aux = lattice_heun_steps(
            RELAX_STEPS, REBUILD_EVERY, pw, friction_w_neighbour, "com",
            gs0, C_s, 2, X, old_v, n, jnp.float32(p.dt),
            jnp.float32(p.r_max), jnp.int32(0), pre, pallas)
        assert int(aux["__err_out_of_grid"]) == 0, "settling left the grid"
        dropped = int(aux["__err_lattice_dropped"])
        if dropped:
            print(f"# bench IC prep: {dropped} cells transiently dropped",
                  file=sys.stderr)
        return X, old_v

    X, old_v = _phase(relu_force, None, X, old_v)
    # settle under the FULL force until the density profile stops
    # drifting: the adhesive tail re-compresses the relu-relaxed ball for
    # hundreds of steps (measured: extras at a fixed probe binning grow
    # 348 -> 8.9k across 48 unsettled steps, benchmarks/diag_drift.py),
    # and a bench timed mid-transient outruns any capacity plan sized at
    # its start.  Convergence gate: the overflow count a fixed
    # (cube, C) probe binning would see changes < 5% per 48-step phase.
    prev_e = None
    for phase_i in range(20):
        X, old_v = _phase(force, polarity_precompute, X, old_v, C_s=16)
        n_e, _ = _extras_plan(X, n_cells, 96, 1.2 * p.r_max, 10)
        print(f"# settle phase {phase_i}: probe extras {n_e}",
              file=sys.stderr)
        if prev_e is not None and abs(n_e - prev_e) <= max(20, prev_e // 20):
            break
        prev_e = n_e
    _save_settled("branching", n_cells, seed, X, old_v)
    return X, old_v, p, force, n, pallas


def build(n_cells, seed=0):
    from yalla_tpu.ops.common import friction_w_neighbour
    from yalla_tpu.ops.lattice_xla import lattice_heun_steps
    from yalla_tpu.polarity import polarity_precompute3 as polarity_precompute

    X, old_v, p, force, n, pallas = _prepare_branching(n_cells, seed)

    # joint (cube_size, gs, C, extras) choice: the engine cutoff may exceed
    # the force's r_max (forces gate themselves; extra candidates are
    # masked, physics exact -- the reference likewise allows cube_size >
    # cutoff).  With overflow extras the capacity tracks the TYPICAL cube
    # occupancy instead of the worst cube's: cells past C spill into the
    # kernel's exactly-handled side list, and the cost model weighs the
    # C^2 lane saving against the per-block sidecar work.
    zb, yb = 2, 16

    def make_run(ms, e_scale=1, min_C=0, x_split=1, e_b_cap=0):
        """Cost-optimal run over candidate cube margins ``ms``; callable
        again with a measured-closure-sized margin (see measure()'s
        certification ladder), an escalated extras headroom (``e_scale``,
        when a probe overflows the sidecar), or a raised capacity floor
        (``min_C``, when a probe drops cells even with extras).
        ``x_split=2`` plans thin x-cubes (half the capacity, ~1.35x fewer
        kernel shifts) -- per-pass cadences only.  ``e_b_cap`` clamps the
        planner's per-block sidecar table (its default is 2x the measured
        spill; the kernel charges ~2.2 force evals per slot, so at the
        settled 500k plan e_b 32 -> 16 is ~10% of the modelled lane
        work) -- the probe's extras flags certify the tighter table."""
        best = _plan_lattice(X, n_cells, p.r_max, ms, pallas, zb, yb,
                             e_scale, min_C, x_split)
        if best is None:
            return None
        _, m, gs, C, max_occ, extent, n_e, e_b = best
        if e_b_cap and e_b > e_b_cap:
            e_b = max(8, -(-int(e_b_cap) // 8) * 8)
        cube = p.r_max * m
        extras_cap = E_CAP if e_b else 0
        print(f"# bench config: n={n_cells} extent={extent:.1f} "
              f"max_occ={max_occ} (cube x{m}, x_split={x_split}) -> "
              f"gs={gs} C={C} extras={n_e} (block cap {e_b})",
              file=sys.stderr)

        def run(n_steps, rebuild=REBUILD_EVERY, cube_mult=1.0,
                rebin=False, rebin_scale=1):
            k = 1 if rebin == "pass" else rebuild
            k = max(d for d in range(1, k + 1) if n_steps % d == 0)
            if k != (1 if rebin == "pass" else rebuild):
                print(f"# cadence: rebuild_every={rebuild} does not "
                      f"divide n_steps={n_steps}; timing k={k}",
                      file=sys.stderr)
            # rebin: lattice-resident across chunks (slot-space rebinning
            # instead of unbuild+sort+pour); mover capacity sized to ~12%
            # of the population per chunk (measure() escalates
            # ``rebin_scale`` on an __err_rebin_overflow probe -- settled
            # tissue jitter crosses cube faces at ~15%/pass at 500k).
            # rebin="pass" re-derives the binning before EVERY pairwise
            # pass (reference-exact, no staleness certificate needed).
            m_cap = -(-n_cells * rebin_scale // 8 // 4096) * 4096 \
                if rebin else 0
            # resident cadence: route old_v-predicted fast movers into
            # the per-pass-exact extras list (safety 2x) so the
            # staleness certificate only has to bound the slow bulk
            route = 2.0 if (k > 1 and not rebin and extras_cap) else 0.0
            return lattice_heun_steps(
                n_steps, k, force, friction_w_neighbour, "com", gs, C, zb,
                X, old_v, n, jnp.float32(p.dt),
                jnp.float32(cube * cube_mult), jnp.int32(0),
                polarity_precompute, pallas, None, None,
                jnp.float32(p.r_max), extras_cap, max(e_b, 8), m_cap,
                rebin == "pass", route, x_split)

        run.config = {"gs": list(gs), "C": int(C),
                      "max_occ": int(max_occ), "cube": float(cube),
                      "extras": int(n_e), "extras_block_cap": int(e_b)}
        if x_split > 1:
            run.config["x_split"] = int(x_split)
        run.remake = make_run
        run.remake_extras = lambda s, m=m, xs=x_split: make_run(
            (m,), e_scale=s, x_split=xs)
        run.remake_cap = lambda m=m, C=C, xs=x_split: make_run(
            (m,), e_scale=2, min_C=C + 1, x_split=xs)
        run.r_max = float(p.r_max)
        run.supports_rebin = True
        run.x_split = x_split
        run.plan_cost = float(best[0])
        run.spec = {"ms": [float(m)], "e_scale": int(e_scale),
                    "min_C": int(min_C), "x_split": int(x_split)}
        if e_b_cap:
            run.spec["e_b_cap"] = int(e_b_cap)
        return run

    return make_run((1.1, 1.2, 1.3) if REBUILD_EVERY > 1
                    else (1.0, 1.1, 1.2))


def build_sorting(n_cells, seed=0):
    """5k-class configuration per BASELINE.json: "sorting/epithelium-class
    models" -- differential-adhesion cubic mechanics
    (ref examples/sorting.cu:16-28) on a relaxed ball.  Unlike the
    branching force, the adhesive potential keeps the tissue compact, so
    this is the representative small-model regime."""
    import jax.numpy as jnp
    from yalla_tpu.dtypes import Float3, make_pt
    from yalla_tpu.inits import relu_force
    from yalla_tpu.ops.common import friction_w_neighbour
    from yalla_tpu.ops.lattice_xla import lattice_heun_steps, \
        lattice_grid_for

    Cell = make_pt("SortCell", "ctype")
    rng = np.random.default_rng(seed)
    n_pad = max(64, -(-n_cells // 64) * 64)
    side = int(np.ceil(n_cells ** (1 / 3)))
    g = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"),
                 -1).reshape(-1, 3)[:n_pad]
    pos = (g - side / 2) * 0.75 + rng.uniform(-0.2, 0.2, (len(g), 3))
    pos = np.concatenate(
        [pos, np.zeros((max(0, n_pad - len(pos)), 3))])[:n_pad]
    X = Cell(x=jnp.asarray(pos[:, 0], jnp.float32),
             y=jnp.asarray(pos[:, 1], jnp.float32),
             z=jnp.asarray(pos[:, 2], jnp.float32),
             ctype=jnp.asarray((rng.random(n_pad) < 0.5)
                               .astype(np.float32)))
    old_v = Float3.zeros(n_pad)
    n = jnp.int32(n_cells)
    pallas = jax.default_backend() == "tpu"
    r_max, r_min, dt = 1.0, 0.5, 0.05

    def adhesion(Xi, r, dist, i, j):
        # ref sorting.cu:16-28: strength by type pair
        near = (i != j) & (dist < r_max)
        same = r.ctype == 0.0
        strength = jnp.where(same, jnp.where(Xi.ctype > 0.5, 9.0, 1.0),
                             3.0)
        F = 2 * (r_min - dist) * (r_max - dist) + (r_max - dist) ** 2
        pos_ = dist > 0
        inv = jnp.where(pos_, jax.lax.rsqrt(
            jnp.where(pos_, dist * dist, 1.0)), 0.0)
        w = jnp.where(near, strength * F * inv, 0.0)
        zero = jnp.zeros_like(dist)
        return Cell(x=r.x * w, y=r.y * w, z=r.z * w, ctype=zero)

    X, old_v = _settle_sorting_cached(X, old_v, n_cells, adhesion, dt,
                                      r_max, seed)
    zb, yb = 2, 16

    def make_run(ms, e_scale=1, min_C=0, e_b_cap=0):
        # same cost-model planner as the 500k builder: the compact
        # adhesive tissue's occupancy histogram is long-tailed (typical
        # ~10, max ~20), so overflow extras cut C from the worst cube's
        # occupancy to the typical one (C=16 spills ~10 cells)
        best = _plan_lattice(X, n_cells, r_max, ms, pallas, zb, yb,
                             e_scale, min_C)
        if best is None:
            return None
        _, m, gs, C, max_occ, extent, n_e, e_b = best
        if e_b_cap and e_b > e_b_cap:
            e_b = max(8, -(-int(e_b_cap) // 8) * 8)
        cube = r_max * m
        extras_cap = E_CAP if e_b else 0
        print(f"# bench config (sorting 5k-class): n={n_cells} "
              f"extent={extent:.1f} max_occ={max_occ} (cube x{m}) -> "
              f"gs={gs} C={C} extras={n_e} (block cap {e_b})",
              file=sys.stderr)

        def run(n_steps, rebuild=1, cube_mult=1.0, rebin=False,
                rebin_scale=1):
            k = 1 if rebin == "pass" else rebuild
            k = max(d for d in range(1, k + 1) if n_steps % d == 0)
            if k != (1 if rebin == "pass" else rebuild):
                print(f"# cadence: rebuild_every={rebuild} does not "
                      f"divide n_steps={n_steps}; timing k={k}",
                      file=sys.stderr)
            m_cap = max(4096, -(-n_cells * rebin_scale // 8 // 64) * 64) \
                if rebin else 0
            return lattice_heun_steps(
                n_steps, k, adhesion, friction_w_neighbour, "com", gs, C,
                zb, X, old_v, n, jnp.float32(dt),
                jnp.float32(cube * cube_mult), jnp.int32(0), None, pallas,
                None, None, jnp.float32(r_max), extras_cap, max(e_b, 8),
                m_cap, rebin == "pass")

        run.config = {"gs": list(gs), "C": int(C),
                      "max_occ": int(max_occ), "cube": float(cube),
                      "extras": int(n_e), "extras_block_cap": int(e_b)}
        run.remake = make_run
        run.remake_extras = lambda s, m=m: make_run((m,), e_scale=s)
        run.remake_cap = lambda m=m, C=C: make_run((m,), e_scale=2,
                                                   min_C=C + 1)
        run.r_max = float(r_max)
        run.supports_rebin = True
        run.plan_cost = float(best[0])
        run.spec = {"ms": [float(m)], "e_scale": int(e_scale),
                    "min_C": int(min_C)}
        if e_b_cap:
            run.spec["e_b_cap"] = int(e_b_cap)
        return run

    # cube 1.0 stays in the candidate set even at rebuild_every > 1: the
    # certification ladder falls back to rebuild-per-pass on the
    # cost-optimal config, and for this compact tissue that IS cube 1.0
    # (bigger cubes push occupancy/C up faster than they buy margin)
    return make_run((1.0, 1.1, 1.2))


def build_sorting_tile(n_cells, seed=0):
    """5k-class contender: the fused all-pairs Pallas tile kernel
    (``TileEngine(pallas=True)``, ops/tile_pallas.py).  Compact adhesive
    tissues pack ~20 cells/cube, which drives the lattice capacity (cost
    ~C^2) through the roof at small n while n^2 is only 26M pairs at 5k;
    the bench races both engines and reports the better (the crossover
    is recorded in BASELINE.md)."""
    from yalla_tpu.dtypes import Float3, make_pt
    from yalla_tpu.inits import relu_force
    from yalla_tpu.ops.common import friction_w_neighbour
    from yalla_tpu.ops.lattice_xla import lattice_heun_steps, \
        lattice_grid_for
    from yalla_tpu.solvers import TileEngine, heun_steps

    Cell = make_pt("SortCell", "ctype")
    rng = np.random.default_rng(seed)
    n_pad = max(128, -(-n_cells // 128) * 128)  # tile kernel: n_pad % 128
    side = int(np.ceil(n_cells ** (1 / 3)))
    g = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"),
                 -1).reshape(-1, 3)[:n_pad]
    pos = (g - side / 2) * 0.75 + rng.uniform(-0.2, 0.2, (len(g), 3))
    pos = np.concatenate(
        [pos, np.zeros((max(0, n_pad - len(pos)), 3))])[:n_pad]
    X = Cell(x=jnp.asarray(pos[:, 0], jnp.float32),
             y=jnp.asarray(pos[:, 1], jnp.float32),
             z=jnp.asarray(pos[:, 2], jnp.float32),
             ctype=jnp.asarray((rng.random(n_pad) < 0.5)
                               .astype(np.float32)))
    old_v = Float3.zeros(n_pad)
    n = jnp.int32(n_cells)
    r_max, r_min, dt = 1.0, 0.5, 0.05

    def adhesion(Xi, r, dist, i, j):
        near = (i != j) & (dist < r_max)
        same = r.ctype == 0.0
        strength = jnp.where(same, jnp.where(Xi.ctype > 0.5, 9.0, 1.0),
                             3.0)
        F = 2 * (r_min - dist) * (r_max - dist) + (r_max - dist) ** 2
        pos_ = dist > 0
        inv = jnp.where(pos_, jax.lax.rsqrt(
            jnp.where(pos_, dist * dist, 1.0)), 0.0)
        w = jnp.where(near, strength * F * inv, 0.0)
        zero = jnp.zeros_like(dist)
        return Cell(x=r.x * w, y=r.y * w, z=r.z * w, ctype=zero)

    X, old_v = _settle_sorting_cached(X, old_v, n_cells, adhesion, dt,
                                      r_max, seed)

    engine = TileEngine(pallas=jax.default_backend() == "tpu")
    print(f"# bench config (sorting 5k-class, N^2 tile kernel): "
          f"n={n_cells} n_pad={n_pad}", file=sys.stderr)

    def run(n_steps, rebuild=1, cube_mult=1.0):
        del rebuild, cube_mult  # no binning in the all-pairs engine
        return heun_steps(n_steps, engine, adhesion, friction_w_neighbour,
                          None, "com", X, old_v, n, jnp.float32(dt),
                          jnp.float32(r_max), jnp.int32(0), None)

    run.start_rebuild = 1
    run.config = {"engine": "tile_pallas", "n_pad": int(n_pad)}
    return run


def build_sorting_mxu(n_cells, seed=0):
    """5k-class contender: the MXU central-force all-pairs engine
    (``ops/central_mxu.py``).  The sorting force is central (dF = w * r
    with a bilinear type-pair strength), so pair distances and the
    force/friction reductions ride the MXU and only the ~10-op radial
    coefficient costs VPU time -- tests/test_central.py pins the physics
    to the handwritten functor used by the other builders."""
    from yalla_tpu.dtypes import Float3, make_pt
    from yalla_tpu.inits import relu_force
    from yalla_tpu.ops.central_mxu import central_force
    from yalla_tpu.ops.common import friction_w_neighbour
    from yalla_tpu.ops.lattice_xla import lattice_heun_steps, \
        lattice_grid_for
    from yalla_tpu.solvers import TileEngine, heun_steps

    Cell = make_pt("SortCell", "ctype")
    rng = np.random.default_rng(seed)
    n_pad = max(128, -(-n_cells // 128) * 128)
    side = int(np.ceil(n_cells ** (1 / 3)))
    g = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"),
                 -1).reshape(-1, 3)[:n_pad]
    pos = (g - side / 2) * 0.75 + rng.uniform(-0.2, 0.2, (len(g), 3))
    pos = np.concatenate(
        [pos, np.zeros((max(0, n_pad - len(pos)), 3))])[:n_pad]
    X = Cell(x=jnp.asarray(pos[:, 0], jnp.float32),
             y=jnp.asarray(pos[:, 1], jnp.float32),
             z=jnp.asarray(pos[:, 2], jnp.float32),
             ctype=jnp.asarray((rng.random(n_pad) < 0.5)
                               .astype(np.float32)))
    old_v = Float3.zeros(n_pad)
    n = jnp.int32(n_cells)
    r_max, r_min, dt = 1.0, 0.5, 0.05

    # the same differential-adhesion physics as build_sorting's
    # handwritten functor (ref sorting.cu:16-28), in central form:
    # strength{same 0: 1, same 1: 9, mixed: 3} = 1 + 2ti + 2tj + 4titj
    def coef(dist, Si, Sj, strength):
        a = jnp.maximum(r_max - dist, 0.0)      # 0 past the cutoff
        b = a + 2.0 * (r_min - dist)
        rs = jax.lax.rsqrt(jnp.maximum(dist * dist, 1e-12))
        return strength * (a * b) * rs

    adhesion = central_force(
        Cell, coef,
        bilinear={"strength": (
            lambda X: (jnp.ones_like(X.ctype), 2.0 * X.ctype),
            lambda X: (1.0 + 2.0 * X.ctype, 1.0 + 2.0 * X.ctype))},
        name="sorting_adhesion_central")

    X, old_v = _settle_sorting_cached(X, old_v, n_cells, adhesion, dt,
                                      r_max, seed)

    engine = TileEngine(mxu=True)
    print(f"# bench config (sorting 5k-class, MXU central kernel): "
          f"n={n_cells} n_pad={n_pad}", file=sys.stderr)

    def run(n_steps, rebuild=1, cube_mult=1.0):
        del rebuild, cube_mult  # no binning in the all-pairs engine
        return heun_steps(n_steps, engine, adhesion, friction_w_neighbour,
                          None, "com", X, old_v, n, jnp.float32(dt),
                          jnp.float32(r_max), jnp.int32(0), None)

    run.start_rebuild = 1
    run.config = {"engine": "tile_central_mxu", "n_pad": int(n_pad)}
    return run


def _probe_clean(aux):
    return not (bool(aux.get("__err_stale", False))
                or int(aux.get("__err_lattice_dropped", 0)) != 0
                or int(aux.get("__err_out_of_grid", 0)) != 0
                or bool(aux.get("__err_extras_block", False)))


def _extras_only_flags(aux):
    """Did a flagged probe fail ONLY on overflow-extras capacity (sidecar
    block table or extras list) -- i.e. fixable by re-planning with a
    bigger headroom at the same binning?"""
    fired = {k for k, v in aux.items()
             if k.startswith("__err") and float(np.max(np.asarray(v)))}
    return bool(fired) and fired <= {"__err_extras_block",
                                     "__err_lattice_dropped"}


def measure(n_cells, n_steps, seed=0, builder=None, on_certify=None,
            winner_spec=None, winner_rate=None):
    """Race certified rungs; return (best_rate, best_cfg, best_spec).

    ``on_certify(rate, cfg, spec)`` fires every time a rung certifies
    that beats the current best -- the caller emits the provisional JSON
    line there, so a later rung's crash or the driver's clock can never
    erase a measured result.  ``winner_spec`` (from bench_state.json)
    re-builds and races the last certified winner FIRST.  Every probe
    respects the module wall-clock budget (``_expired``).

    CONFIRM-ONLY re-runs: when the stored winner reproduces its stored
    ``winner_rate`` (>= 95%), the exploration ladder is SKIPPED entirely
    unless ``BENCH_EXPLORE=1``.  Exploration is the builder's interactive
    job; a driver/CI re-run only has to witness the known winner plus the
    5k metric, and every extra rung it races risks the documented TPU
    worker wedge (a flagged probe can hang the tunnel 10-30 min,
    ROADMAP.md) with no possible upside beyond noise."""
    explore = os.environ.get("BENCH_EXPLORE", "") not in ("", "0")
    run0 = (builder or build)(n_cells, seed)

    # The staleness certifier (__err_stale) may reject the default
    # rebuild cadence: an actively-signalling tissue shears more per
    # chunk than the binning margin (cube_size - r_max) allows.  The
    # ladder is MEASUREMENT-DRIVEN: the first probe publishes the actual
    # shear closure, and every alternative it implies is re-planned
    # (cube, gs, C, extras), probed, and -- if its flags are clean --
    # TIMED: same cadence with the margin sized to 1.3x the measurement,
    # halved cadences sized to the ~0.6x/halving scaling, and the
    # reference-exact rebuild-per-pass at the cost-optimal cube.  The
    # reported number is the fastest CERTIFIED config by measurement,
    # not the first that happens to pass (a wide-margin lattice pays
    # ~C^2 lane work; per-pass rebuilds pay sort+pour+unbuild -- which
    # wins depends on the physics' shear rate).
    #
    # FAIL-SOFT (round-3 lesson: one rung's capacity miss erased the
    # whole round's record): a flagged probe escalates extras headroom,
    # then CAPACITY (re-plan at the next C rung), and a rung that never
    # certifies is simply not in the race -- measure() raises only when
    # NOTHING certified at all.
    records = []   # {"rate", "cfg", "run", "rebuild", "cm", "rebin"}
    raced = {}     # (config, rebuild, cm, rebin, scale) -> result memo

    def _winner_spec(rec):
        """Reconstruction recipe for a certified rung: enough for a
        future run to remake + race it first (bench_state.json)."""
        run = rec["run"]
        spec = dict(getattr(run, "spec", {}) or {})
        if spec and getattr(run, "r_max", None):
            spec["ms"] = [round(rec["cfg"]["cube"] / run.r_max, 6)]
        spec["rebuild"] = int(rec["rebuild"])
        spec["rebin"] = rec["rebin"] if isinstance(rec["rebin"], str) \
            else bool(rec["rebin"])
        return spec

    def probe_and_time(run, rebuild, cm=1.0, rebin=False, rebin_scale=1):
        """Probe once; if flag-clean, time the same program and record.
        Returns None on success, else the flagged aux dict.  Budget- and
        memo-guarded: an exhausted wall clock skips the rung (marker
        aux), an already-raced identical rung returns its prior result."""
        key = (json.dumps(run.config, sort_keys=True), rebuild, cm,
               str(rebin), rebin_scale)
        if key in raced:
            return raced[key]
        if _expired():
            print(f"# budget exhausted ({_time_left():.0f} s left); "
                  f"skipping rung (rebuild={rebuild}, rebin={rebin}, "
                  f"{run.config})", file=sys.stderr)
            return {"__budget_expired": np.float32(1.0)}
        raced[key] = _probe_and_time(run, rebuild, cm, rebin, rebin_scale)
        return raced[key]

    def _probe_and_time(run, rebuild, cm, rebin, rebin_scale):
        kw = {"rebin": rebin} if rebin else {}
        if rebin and rebin_scale > 1:
            kw["rebin_scale"] = rebin_scale
        out = run(n_steps, rebuild, cm, **kw)  # compile + warm up
        _ = float(np.asarray(out[0].x)[0])  # force completion (readback)
        aux = out[2]
        if not _probe_clean(aux) or int(aux.get("__err_rebin_overflow",
                                                0)) != 0:
            fired = {k: float(np.max(np.asarray(v)))
                     for k, v in aux.items()
                     if k.startswith("__err") and float(
                         np.max(np.asarray(v))) != 0.0}
            print(f"# probe flagged (rebuild={rebuild}, cm={cm}, "
                  f"rebin={rebin}): {fired} "
                  f"closure={float(aux.get('stale_shear_closure', np.nan)):.3f}",
                  file=sys.stderr)
            return aux
        t0 = time.perf_counter()
        out = run(n_steps, rebuild, cm, **kw)
        _ = float(np.asarray(out[0].x)[0])
        dt = time.perf_counter() - t0
        rate = n_cells * n_steps / dt
        aux = out[2]
        if not _probe_clean(aux) or int(aux.get("__err_rebin_overflow",
                                                0)) != 0 \
                or bool(np.max(np.asarray(aux["__err_non_finite"]))):
            # deterministic programs should match their probe; treat a
            # divergence as an uncertified rung, never as a fatal abort
            print(f"# timed run flagged after a clean probe "
                  f"(rebuild={rebuild}, cm={cm}, rebin={rebin}); "
                  f"discarding rung", file=sys.stderr)
            return aux
        print(f"# certified {n_cells}: {rate:.4g} cell-steps/s "
              f"(rebuild_every={rebuild}, rebin={rebin}, {run.config})",
              file=sys.stderr)
        cfg = dict(run.config)
        cfg["rebuild_every"] = rebuild
        cfg["cube_mult"] = cm
        cfg["rebin"] = rebin if isinstance(rebin, str) else bool(rebin)
        if rebin and rebin_scale > 1:
            cfg["rebin_scale"] = rebin_scale
        rec = {"rate": rate, "cfg": cfg, "run": run,
               "rebuild": rebuild, "cm": cm, "rebin": rebin}
        records.append(rec)
        if on_certify is not None and rate >= max(r["rate"]
                                                  for r in records):
            # emit-first: the caller prints the provisional JSON line NOW
            on_certify(rate, dict(cfg), _winner_spec(rec))
        return None

    rebuild0 = getattr(run0, "start_rebuild", REBUILD_EVERY)
    can_rebin = getattr(run0, "supports_rebin", False)

    def _fired(aux):
        return {k for k, v in aux.items()
                if k.startswith("__err") and float(np.max(np.asarray(v)))}

    def probe_time_track(run, rebuild, cm=1.0, rebin=False):
        aux = probe_and_time(run, rebuild, cm, rebin)
        if aux is None:
            return None
        # mover-list-only overflow on a rebin rung: the slot-space
        # rebinning is exact once its mover capacity covers the tissue's
        # cube-face crossing rate -- escalate the cap, nothing else
        if rebin and _fired(aux) == {"__err_rebin_overflow"}:
            for s in (2, 4):
                aux = probe_and_time(run, rebuild, cm, rebin,
                                     rebin_scale=s)
                if aux is None:
                    return None
                if _fired(aux) != {"__err_rebin_overflow"}:
                    break
            return aux
        # capacity-only failures are re-planned in place: first the same
        # binning with escalated sidecar headroom (the timed window's
        # density drift can outrun the chunk-start plan), then -- if
        # cells still drop -- the next CAPACITY rung up (C+1..; fixes
        # round 3's zero-headroom 5k plan, where remake_extras could only
        # regenerate the identical extras-free config)
        if _extras_only_flags(aux):
            if getattr(run, "remake_extras", None) is not None:
                for s in (2, 4):
                    bigger = run.remake_extras(s)
                    if bigger is None or bigger.config == run.config:
                        break
                    aux2 = probe_and_time(bigger, rebuild, cm, rebin)
                    if aux2 is None:
                        return None
                    if not _extras_only_flags(aux2):
                        return aux2
                    aux = aux2
            if getattr(run, "remake_cap", None) is not None and \
                    int(aux.get("__err_lattice_dropped", 0)) != 0:
                up = run.remake_cap()
                if up is not None and up.config != run.config:
                    aux2 = probe_and_time(up, rebuild, cm, rebin)
                    if aux2 is None:
                        return None
                    aux = aux2
        return aux

    # ---- rung order is RECORD-first (round-4 lesson: the driver's clock
    # ran out while exploration rungs raced ahead of the known winner).
    # 1. the persisted winner from bench_state.json, raced verbatim
    if winner_spec and hasattr(run0, "remake"):
        w = None
        try:
            kw = {k: winner_spec[k] for k in ("e_scale", "min_C",
                                              "e_b_cap")
                  if winner_spec.get(k)}
            if winner_spec.get("x_split", 1) > 1:
                kw["x_split"] = int(winner_spec["x_split"])
            w = run0.remake(tuple(winner_spec.get("ms", ())), **kw)
        except Exception as e:
            print(f"# stored winner rebuild failed: "
                  f"{type(e).__name__}: {e}"[:300], file=sys.stderr)
        if w is not None:
            probe_time_track(w, int(winner_spec.get("rebuild", 1)),
                             rebin=winner_spec.get("rebin", False))

    # confirm-only fast path: stored winner reproduced -> don't explore
    skip_explore = False
    if records and winner_rate and not explore:
        got = max(r["rate"] for r in records)
        if got >= 0.95 * float(winner_rate):
            skip_explore = True
            print(f"# stored winner reproduced ({got:.4g} vs stored "
                  f"{float(winner_rate):.4g} cell-steps/s); skipping the "
                  f"exploration ladder (BENCH_EXPLORE=1 races all rungs)",
                  file=sys.stderr)

    # 2. known-strong per-pass families (no staleness certificate, no
    # margin): the margin-free cube-1.0 rebuild plan (the round-4 500k
    # winner), the cost-optimal plan, and their slot-space rebin variants
    aux = None
    base = None
    if skip_explore:
        pass
    elif can_rebin and hasattr(run0, "remake"):
        base = run0.remake((1.0,))
        if base is not None:
            probe_time_track(base, 1)
            # tight-extras rungs: the planner's sidecar headroom is 2x
            # the measured spill; the kernel charges ~2.2 force evals
            # per table slot, so every 8 slots trimmed is ~5% of the
            # modelled lane work at the settled 500k plan.  The probe's
            # extras flags certify the tighter table (density drift
            # during the timed window is the risk the 2x default guards
            # against).  Loosest cap first -- spill overflow is monotone
            # in the cap, so a flagged 24 means 16 would flag too; and a
            # flagged probe's in-place escalation can certify a LOOSER
            # fallback (probe_time_track returns None for it), so check
            # which config actually landed before tightening further.
            for cap in (24, 16):
                if _expired() or base.config["extras_block_cap"] <= cap:
                    break
                tight = run0.remake((1.0,), e_b_cap=cap)
                if tight is None or tight.config == base.config:
                    break
                probe_time_track(tight, 1)
                if not (records and records[-1]["cfg"].get(
                        "extras_block_cap")
                        == tight.config["extras_block_cap"]):
                    break  # rung flagged (or only a looser escalation
                    # certified); a tighter cap cannot do better
        if rebuild0 == 1:
            probe_time_track(run0, 1)
        probe_time_track(run0, 1, rebin="pass")
        if base is not None and not _expired():
            probe_time_track(base, 1, rebin="pass")
        # 3. thin-x-cube contender, gated on its OWN cost model: the win
        # exists only when the half-cube capacity actually halves
        # (ROADMAP 6 / diag_xsplit) -- otherwise the shift counts tie
        # and the probe burns budget on an uncertifiable rung (the
        # round-4 fatal mistake).  Fail-soft per contender.
        if getattr(run0, "x_split", None) is not None and not _expired():
            xsr = None
            try:
                xsr = run0.remake((1.0, 1.1), x_split=2)
            except Exception as e:
                print(f"# x_split contender failed: "
                      f"{type(e).__name__}: {e}"[:300], file=sys.stderr)
            iso = base if base is not None else run0
            if xsr is None:
                pass
            elif (xsr.config["C"] > iso.config["C"] // 2 + 1
                    or xsr.plan_cost >= 0.88 * iso.plan_cost):
                print(f"# x_split=2 skipped by cost model: "
                      f"C'={xsr.config['C']} vs C={iso.config['C']}, "
                      f"modelled lane-cost ratio "
                      f"{xsr.plan_cost / iso.plan_cost:.2f} (need < 0.88 "
                      f"and C' <= C/2 + 1)", file=sys.stderr)
            else:
                try:
                    probe_time_track(xsr, 1)
                    if not _expired():
                        probe_time_track(xsr, 1, rebin="pass")
                except Exception as e:
                    print(f"# x_split rung failed: "
                          f"{type(e).__name__}: {e}"[:300], file=sys.stderr)
        # 4. resident-cadence exploration, only once the per-pass record
        # is already in hand
        if rebuild0 > 1 and not _expired():
            aux = probe_time_track(run0, rebuild0)
    elif rebuild0 > 1:
        aux = probe_time_track(run0, rebuild0)
    else:
        probe_time_track(run0, rebuild0)
    if aux is not None and "__budget_expired" not in aux:
        closure = float(aux.get("stale_shear_closure", np.nan))
        print(f"# flags at rebuild_every={rebuild0} "
              f"(closure {closure:.3f}); racing certified alternatives",
              file=sys.stderr)
        can_size = hasattr(run0, "remake") and np.isfinite(closure)
        if rebuild0 > 1 and can_size:
            # candidate rungs, cheapest-margin first; each may still flag
            # (the 0.6x/halving closure scaling is an estimate) -- a
            # flagged rung re-sizes once from ITS measured closure before
            # giving up.  Per-step rebinning (rebuild 1 + lattice_rebin)
            # joins the race: it needs only the single-step margin but
            # skips the per-pass sort/unbuild round trip entirely.
            cands = []
            margin = 1.3 * closure
            if margin <= 0.45 * run0.r_max:
                cands.append((round(1.0 + margin / run0.r_max, 3),
                              rebuild0, False))
            r, m = rebuild0 // 2, margin
            while r > 1:
                m *= 0.6
                cands.append((round(1.0 + min(m / run0.r_max, 0.45), 3),
                              r, False))
                r //= 2
            if can_rebin:
                # rebin at rebuild 1 still evaluates the corrector under
                # the chunk-start binning -- needs the single-step
                # margin, sized by the same 0.6x/halving scaling
                m1 = m * 0.6 if rebuild0 > 1 else margin
                cands.append((round(1.0 + min(m1 / run0.r_max, 0.45), 3),
                              1, True))
                cands.append((1.0, 1, True))  # base cube; resized on flag
            for cube_m, rb, rbn in cands:
                sized = run0 if cube_m == 1.0 else run0.remake((cube_m,))
                if sized is None:
                    continue
                aux2 = probe_time_track(sized, rb, rebin=rbn)
                if aux2 is not None:
                    cl2 = float(aux2.get("stale_shear_closure", np.nan))
                    if np.isfinite(cl2) and 1.3 * cl2 <= 0.45 * run0.r_max:
                        resized = run0.remake(
                            (round(1.0 + 1.3 * cl2 / run0.r_max, 3),))
                        if resized is not None:
                            probe_time_track(resized, rb, rebin=rbn)
        if rebuild0 > 1:
            # reference-exact rebuild-per-pass at the cost-optimal cube
            # (solvers.cuh:494): no staleness possible, margin irrelevant
            probe_time_track(run0, 1)
    if records and not skip_explore:
        best = max(records, key=lambda r: r["rate"])
        if can_rebin and not best["rebin"]:
            # rebin variant of the best certified rung: certification
            # transfers (same binning per chunk), only the chunk
            # round-trip cost changes
            probe_and_time(best["run"], best["rebuild"], best["cm"],
                           rebin=True)
        # cadence UP-rungs on the best certified config: the measured
        # closure is dominated by instantaneous approach speed (see
        # benchmarks/diag_rebin.py), so longer residencies usually
        # certify at the SAME margin while paying 1/2, 1/4, ... of the
        # rebuild cost; stop at the first flagged doubling
        best = max(records, key=lambda r: r["rate"])
        rb = best["rebuild"] * 2
        while best["rebuild"] > 1 and rb <= 16 and n_steps % rb == 0:
            if probe_time_track(best["run"], rb, best["cm"],
                                best["rebin"]) is not None:
                break
            rb *= 2
    if not records:
        raise AssertionError(
            f"no config certified for n={n_cells} (all rungs flagged, "
            f"including rebuild-per-pass after extras/capacity "
            f"escalation)")
    best = max(records, key=lambda r: r["rate"])
    print(f"# measured {n_cells}: {best['rate']:.4g} cell-steps/s "
          f"(best of {len(records)} certified: {best['cfg']})",
          file=sys.stderr)
    return best["rate"], best["cfg"], _winner_spec(best)


def _measure_retry(n_cells, n_steps, tries=3, builder=None, **kw):
    """The tunnelled TPU worker occasionally restarts between heavy jobs
    ('worker crashed or restarted' on valid programs, see ROADMAP.md);
    retry with a pause before giving up."""
    for attempt in range(tries):
        try:
            return measure(n_cells, n_steps, builder=builder, **kw)
        except jax.errors.JaxRuntimeError as e:
            if "UNAVAILABLE" not in str(e) or attempt == tries - 1:
                raise
            print(f"# TPU worker unavailable (attempt {attempt + 1}); "
                  f"retrying in 60 s", file=sys.stderr)
            time.sleep(60)


def _emit(n_cells, rate, extra):
    """One JSON result line on stdout.  Called PROVISIONALLY the moment
    the headline rung certifies and again after every improvement and at
    exit (final, superset): the driver parses the last JSON line, so a
    later rung's crash or the driver's own clock can never erase an
    already-measured result.  ``vs_baseline`` keeps the assumed-1e8
    convention for cross-round comparability; "extra" carries BOTH the
    assumed and the BASELINE.md-estimated CUDA ratios."""
    ex = dict(extra)
    if rate is not None:
        ex["vs_assumed_1e8"] = round(rate / 1e8, 4)
        lo, hi = CUDA_ESTIMATED_RANGE
        ex["vs_estimated_cuda"] = [round(rate / hi, 3), round(rate / lo, 3)]
    print(json.dumps({
        "metric": f"cell_steps_per_sec_branching_{n_cells // 1000}k",
        "value": round(rate, 1) if rate is not None else None,
        "unit": "cell-steps/s",
        "vs_baseline": round(rate / CUDA_BASELINE_CELL_STEPS_PER_SEC, 3)
        if rate is not None else None,
        "extra": ex,
    }), flush=True)


def main():
    global _DEADLINE
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    budget = float(os.environ.get("BENCH_BUDGET_S", "2100"))
    if budget > 0:
        _DEADLINE = time.monotonic() + budget
        print(f"# wall-clock budget: {budget:.0f} s "
              f"(BENCH_BUDGET_S; <= 0 disables)", file=sys.stderr)
    # persistent compile cache: tunnel compiles are minutes-long and this
    # benchmark's program shapes are stable across runs
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import traceback
    bench_state = _load_bench_state()
    head_key = f"branching_{n_cells}"
    rate, extra = None, {}

    def on_certify(r, cfg, spec):
        """Provisional emit + winner persistence on every improvement."""
        nonlocal rate
        if rate is None or r > rate:
            rate = r
            extra["config"] = cfg
            bench_state[head_key] = {"rate": round(r, 1), "spec": spec,
                                     "cfg": cfg}
            try:
                _save_bench_state(bench_state)
            except Exception:
                pass
            _emit(n_cells, rate, extra)

    global _RESERVE_S
    if n_cells >= 100_000:
        _RESERVE_S = 600.0  # keep the 5k races alive behind the ladder
    try:
        r, config, spec = _measure_retry(
            n_cells, n_steps, on_certify=on_certify,
            winner_spec=(bench_state.get(head_key) or {}).get("spec"),
            winner_rate=(bench_state.get(head_key) or {}).get("rate"))
        on_certify(r, config, spec)
    except Exception as e:
        traceback.print_exc(file=sys.stderr)
        extra["error"] = f"{type(e).__name__}: {e}"[:300]
    _RESERVE_S = 0.0
    if n_cells >= 100_000:
        # the second BASELINE.json size: 5k cells (all on one chip).
        # Race the two small-N engines (MXU central all-pairs vs dense
        # lattice) and report the better -- both run the identical
        # sorting-class physics on the identical relaxed IC (the generic
        # N^2 tile kernel, build_sorting_tile, measured strictly slower
        # than both: BASELINE.md).  Each contender fails independently,
        # the stored 5k winner builder races first, and the runner-up is
        # skipped when the budget is nearly spent.
        # 320 steps: at 5k cells a step is ~1 ms of device work, so the
        # per-dispatch tunnel overhead (~30-60 ms) would otherwise be
        # ~half of a 40-step measurement; the reference's own sorting.cu
        # runs 300 steps.  320 keeps every cadence rung (4/8/16) exact.
        builders = {"build_sorting_mxu": build_sorting_mxu,
                    "build_sorting": build_sorting}
        won_5k = (bench_state.get("sorting_5000") or {}).get("builder")
        order = sorted(builders, key=lambda k: k != won_5k)
        best = None
        explore5 = os.environ.get("BENCH_EXPLORE", "") not in ("", "0")
        stored5 = (bench_state.get("sorting_5000") or {}).get("rate")
        for i, name in enumerate(order):
            if i > 0 and best is not None and _expired(reserve=60):
                print(f"# budget: skipping 5k runner-up {name}",
                      file=sys.stderr)
                break
            if (i > 0 and best is not None and not explore5 and stored5
                    and best[0] >= 0.95 * float(stored5)):
                # confirm-only: the stored 5k winner reproduced; the
                # runner-up engine is already measured slower on record
                print(f"# stored 5k winner reproduced; skipping "
                      f"runner-up {name} (BENCH_EXPLORE=1 races it)",
                      file=sys.stderr)
                break
            b = builders[name]
            spec5 = (bench_state.get("sorting_5000") or {}).get("spec") \
                if name == won_5k else None

            def on5(r5, c5, s5, name=name):
                nonlocal best
                if best is None or r5 > best[0]:
                    best = (r5, c5)
                    extra["cell_steps_per_sec_5k"] = round(r5, 1)
                    extra["config_5k"] = c5
                    bench_state["sorting_5000"] = {
                        "rate": round(r5, 1), "builder": name, "spec": s5,
                        "cfg": c5}
                    try:
                        _save_bench_state(bench_state)
                    except Exception:
                        pass
                    _emit(n_cells, rate, extra)

            try:
                rate5 = (bench_state.get("sorting_5000") or {}).get("rate") \
                    if name == won_5k else None
                r5, c5, s5 = _measure_retry(5_000, max(n_steps, 320),
                                            builder=b, on_certify=on5,
                                            winner_spec=spec5,
                                            winner_rate=rate5)
                on5(r5, c5, s5)
            except Exception as e:
                traceback.print_exc(file=sys.stderr)
                extra.setdefault("errors_5k", []).append(
                    f"{name}: {type(e).__name__}: {e}"[:300])
    _emit(n_cells, rate, extra)
    if rate is None:
        sys.exit(1)


if __name__ == "__main__":
    main()
