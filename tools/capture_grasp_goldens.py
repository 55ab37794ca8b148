"""Freeze the native grasp solver's outputs on the deterministic fixture
grasp set (obman_train_tpu/simulation/fixtures.py) into
tests/goldens/grasp_fixture.npz.

Run after any INTENDED solver change:
    python tools/capture_grasp_goldens.py
then review the displacement deltas it prints before committing.  The
companion test (tests/test_simulation.py::test_grasp_displacement_fixture)
replays the set and asserts the displacements and final trajectory points
match, guarding the first-party impulse solver (native/physics.cpp)
against silent numeric drift.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from obman_train_tpu.simulation.fixtures import grasp_set  # noqa: E402
from obman_train_tpu.simulation.simulate import run_simulation  # noqa: E402


def main():
    out_path = os.path.join(REPO, "tests", "goldens", "grasp_fixture.npz")
    disps, finals = [], []
    for g in grasp_set():
        dist, traj = run_simulation(
            g["hand_verts"], g["hand_faces"], g["obj_verts"], g["obj_faces"],
            backend="native", return_trajectory=True,
        )
        disps.append(dist)
        finals.append(traj[-1])
    disps = np.asarray(disps)
    finals = np.asarray(finals)
    if os.path.exists(out_path):
        old = np.load(out_path)
        delta = np.abs(old["displacements"] - disps)
        print(f"max displacement delta vs committed goldens: {delta.max():.3e} m")
    np.savez(out_path, displacements=disps, final_positions=finals)
    with np.printoptions(precision=4, suppress=True):
        print("displacements (m):", disps)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
