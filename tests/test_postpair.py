"""Cartesian angular-gradient accumulation (``bending_force_cart`` +
``bending_post_pair`` via the engines' ``post_pair`` hook) vs the
per-pair-trig fast path (``bending_force_fast``) -- same physics to f32
roundoff (ref polarity.cuh:72-94: the theta/phi gradients are linear in
r_hat, so the spherical-basis contraction commutes with the pair sum).
"""
import jax
import jax.numpy as jnp
import numpy as np

from yalla_tpu.dtypes import Float3, make_pt
from yalla_tpu.polarity import (bending_force_cart, bending_force_fast,
                                bending_post_pair, polarity_precompute,
                                polarity_precompute3)
from yalla_tpu.solvers import TileEngine, friction_w_neighbour, heun_steps

Epi = make_pt("EpiCell", "theta", "phi")


def _forces():
    def fast(Xi, r, dist, i, j):
        near = (i != j) & (dist < 1.0)
        pos = dist > 0
        inv = jnp.where(pos, jax.lax.rsqrt(
            jnp.where(pos, dist * dist, 1.0)), 0.0)
        w = jnp.where(near, jnp.maximum(0.7 - dist, 0) * 2
                      - jnp.maximum(dist - 0.8, 0), 0.0) * inv
        bend = bending_force_fast(Xi, r, dist, inv=inv)
        bw = jnp.where(near, 0.3, 0.0)
        return Xi.replace(x=r.x * w + bend.x * bw, y=r.y * w + bend.y * bw,
                          z=r.z * w + bend.z * bw, theta=bend.theta * bw,
                          phi=bend.phi * bw)

    def cart(Xi, r, dist, i, j):
        near = (i != j) & (dist < 1.0)
        pos = dist > 0
        inv = jnp.where(pos, jax.lax.rsqrt(
            jnp.where(pos, dist * dist, 1.0)), 0.0)
        w = jnp.where(near, jnp.maximum(0.7 - dist, 0) * 2
                      - jnp.maximum(dist - 0.8, 0), 0.0) * inv
        bx, by, bz, gx, gy, gz = bending_force_cart(Xi, r, dist, inv=inv)
        bw = jnp.where(near, 0.3, 0.0)
        zero = jnp.zeros_like(dist)
        dF = Xi.replace(x=r.x * w + bx * bw, y=r.y * w + by * bw,
                        z=r.z * w + bz * bw, theta=zero, phi=zero)
        return dF, {"pg_x": gx * bw, "pg_y": gy * bw, "pg_z": gz * bw}

    cart.post_pair = bending_post_pair
    return fast, cart


def test_cart_bending_matches_fast_path():
    """Polarized ball: 4 Heun steps on the tile engine, per-pair-trig vs
    Cartesian-accumulated formulations track each other in every field
    (incl. the integrated theta/phi)."""
    fast, cart = _forces()
    rng = np.random.default_rng(11)
    n, n_pad = 120, 128
    pos = rng.uniform(-1, 1, (n_pad, 3)).astype(np.float32) * 2.5
    X0 = Epi(x=jnp.asarray(pos[:, 0]), y=jnp.asarray(pos[:, 1]),
             z=jnp.asarray(pos[:, 2]),
             theta=jnp.asarray(rng.uniform(0.2, 2.9, n_pad), jnp.float32),
             phi=jnp.asarray(rng.uniform(-3, 3, n_pad), jnp.float32))
    ov0 = Float3.zeros(n_pad)
    eng = TileEngine()

    def run(force, pre):
        X, ov, aux = heun_steps(
            4, eng, force, friction_w_neighbour, None, "com", X0, ov0,
            jnp.int32(n), jnp.float32(0.1), jnp.float32(1.0),
            jnp.int32(0), None, pre)
        return X, aux

    Xf, _ = run(fast, polarity_precompute)
    Xc, aux = run(cart, polarity_precompute3)
    for f in Epi._fields:
        a = np.asarray(getattr(Xf, f))[:n]
        b = np.asarray(getattr(Xc, f))[:n]
        assert np.allclose(a, b, atol=5e-5), \
            f"cart bending diverges from fast path in {f}"
    # the pg_* channels are consumed by the hook, never returned
    assert not any(k.startswith("pg_") for k in aux)


def test_poles_gimbal_guard():
    """Cells at theta = 0 / pi: the 1/sin(theta) phi-gradient is gated by
    the reference's |sin theta| > 1e-10 guard (polarity.cuh:56-58) -- no
    NaNs, and the Cartesian post-pass matches the per-pair-trig path at
    the poles too (phi legitimately moves once the Heun predictor takes
    theta off the pole; what matters is both formulations agree)."""
    fast, cart = _forces()
    n_pad = 128
    pos = np.zeros((n_pad, 3), np.float32)
    pos[1] = [0.6, 0.1, 0.2]
    pos[2] = [-0.4, 0.5, -0.1]
    th = np.full(n_pad, 0.3, np.float32)
    th[0] = 0.0          # exact pole
    th[2] = np.pi        # sin(pi) rounds to ~ -8.7e-8 in f32
    X0 = Epi(x=jnp.asarray(pos[:, 0]), y=jnp.asarray(pos[:, 1]),
             z=jnp.asarray(pos[:, 2]), theta=jnp.asarray(th),
             phi=jnp.zeros(n_pad))
    ov0 = Float3.zeros(n_pad)
    eng = TileEngine()

    def run(force, pre):
        X, _, _ = heun_steps(2, eng, force, friction_w_neighbour, None,
                             "com", X0, ov0, jnp.int32(3),
                             jnp.float32(0.05), jnp.float32(1.0),
                             jnp.int32(0), None, pre)
        return X

    Xc = run(cart, polarity_precompute3)
    Xf = run(fast, polarity_precompute)
    for leaf in jax.tree.leaves(Xc):
        assert np.isfinite(np.asarray(leaf)).all()
    for f in ("theta", "phi"):
        a = np.asarray(getattr(Xf, f))[:3]
        b = np.asarray(getattr(Xc, f))[:3]
        # both formulations divide by the SIGNED sin(theta) (incl. the
        # f32 rounding artifact sin(pi) ~= -8.7e-8, reference semantics
        # polarity.cuh:56-58): the theta = pi cell's huge phi kick must
        # agree too, to relative precision
        assert np.allclose(a, b, atol=5e-5, rtol=1e-5), \
            f"pole handling differs in {f}: {a} vs {b}"
