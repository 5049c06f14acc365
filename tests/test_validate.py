"""Runtime validation layer (C17 rebuild): NaN detection and capacity
overflow findings."""
import numpy as np

from yalla_tpu import Float3, LatticeEngine, Solution
from yalla_tpu.inits import random_sphere, set_seed

set_seed(404)


def test_validate_clean():
    pts = Solution(Float3, 50, solver="grid")
    random_sphere(0.8, pts)
    assert pts.validate() == {}


def test_validate_nan():
    pts = Solution(Float3, 50, solver="grid")
    random_sphere(0.8, pts)
    pts.h_X.x[3] = np.nan
    pts.copy_to_device()
    problems = pts.validate()
    assert problems.get("non_finite", {}).get("x") == 1


def test_validate_lattice_capacity():
    pts = Solution(Float3, 50, engine=LatticeEngine(grid_size=8, capacity=2))
    # all 50 points in one cube -> capacity 2 overflows
    pts.h_X.x[:50] = 0.1
    pts.h_X.y[:50] = 0.1
    pts.h_X.z[:50] = 0.1
    pts.copy_to_device()
    problems = pts.validate()
    assert problems.get("lattice_capacity_dropped") == 48
