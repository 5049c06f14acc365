"""Wall-force tests (ref links.cuh:142-228): the ReLU band keeps cells a
preferred distance from the plane, the wall node feels the averaged
reaction, and links.reset deactivates by predicate."""
import jax
import jax.numpy as jnp
import numpy as np

from helpers import isclose
from yalla_tpu import Float3, Solution, friction_on_background
from yalla_tpu.links import Links, link_wall_forces, wall_forces


def no_pw(Xi, r, dist, i, j):
    return jax.tree.map(lambda a: jnp.zeros_like(dist), Xi)


def test_wall_repels_cell():
    """A cell 0.3 above the wall plane is pushed out to ~0.8 (the band's
    zero), with the wall node recoiling by the averaged reaction."""
    pts = Solution(Float3, 2, solver="tile")
    pts.h_X.z[0] = 0.0   # wall node
    pts.h_X.z[1] = 0.3   # too close
    pts.copy_to_device()
    pts.set_fixed(0)     # pin the wall frame for a clean reading
    for _ in range(200):
        pts.take_step(0.05, no_pw, pw_friction=friction_on_background,
                      gen_forces=wall_forces(0))
    h = pts.copy_to_host()
    assert isclose(h.z[1] - h.z[0], 0.8), f"band eq: {h.z[1] - h.z[0]}"


def test_wall_reaction_on_node():
    """Without pinning, the reaction moves the wall node the opposite way
    (momentum bookkeeping of update_wall_node, ref links.cuh:183-195)."""
    pts = Solution(Float3, 3, solver="tile")
    pts.h_X.z[:3] = [0.0, 0.3, 0.4]
    pts.copy_to_device()
    pts.set_fixed()  # COM fix, like the reference default
    pts.take_step(0.05, no_pw, pw_friction=friction_on_background,
                  gen_forces=wall_forces(0))
    h = pts.copy_to_host()
    assert h.z[1] > 0.3 and h.z[2] > 0.4, "cells not pushed away"
    assert h.z[0] < 0.0, "wall node felt no reaction"


def test_link_wall_combined():
    """link_wall_forces = springs + wall band in one generic hook
    (ref links.cuh:213-228)."""
    pts = Solution(Float3, 3, solver="tile")
    pts.h_X.x[:3] = [0.0, 0.0, 3.0]
    pts.h_X.z[:3] = [0.0, 2.0, 2.0]
    pts.copy_to_device()
    links = Links(1, strength=0.5)
    links.h_a[0], links.h_b[0] = 1, 2
    links.copy_to_device()
    pts.set_fixed(0)
    pts.take_step(0.1, no_pw, pw_friction=friction_on_background,
                  gen_forces=link_wall_forces(links, 0))
    h = pts.copy_to_host()
    # far from the wall: no z force; the link pulls 1 and 2 together in x
    assert h.x[1] > 0.0 and h.x[2] < 3.0, "link did not contract"
    assert isclose(h.z[1], 2.0) and isclose(h.z[2], 2.0), "spurious wall push"


def test_links_reset_predicate():
    links = Links(4)
    links.h_a[:4] = [1, 2, 3, 4]
    links.h_b[:4] = [5, 6, 7, 8]
    links.copy_to_device()
    links.reset(lambda a, b: a % 2 == 0)  # deactivate even-a links
    assert list(links.h_a[:4]) == [1, 0, 3, 0]
    assert list(links.h_b[:4]) == [5, 0, 7, 0]
    links.reset()
    assert links.h_a[:4].sum() == 0
