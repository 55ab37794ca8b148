"""Turnkey native-vs-pybullet grasp-solver cross-validation.

Run in any pybullet-equipped image (pybullet is NOT in this repo's image;
the committed golden fixture guards the native solver against drift until
someone runs this):

    python tools/compare_solvers.py --random 30 [--vhacd path/to/vhacd]

Replays the committed fixture grasp set (simulation/fixtures.py — the same
20 grasps tests/goldens/grasp_fixture.npz pins) plus N extra random grasps
through BOTH backends and writes compare_solvers.json with displacement
correlation, rank agreement, and the stable/falling classification split.
See obman_train_tpu/simulation/compare.py for interpretation thresholds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--random", type=int, default=30,
                    help="extra random grasps beyond the fixture set")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--vhacd", default=None,
                    help="V-HACD executable for the pybullet backend's "
                         "concave-hand decomposition (optional)")
    ap.add_argument("--out", default="compare_solvers.json")
    args = ap.parse_args()

    from obman_train_tpu.simulation.compare import (
        compare_backends,
        random_grasps,
    )
    from obman_train_tpu.simulation.fixtures import grasp_set

    grasps = grasp_set() + random_grasps(args.random, seed=args.seed)
    try:
        report = compare_backends(grasps, vhacd_exe=args.vhacd)
    except RuntimeError as e:
        print(f"cannot compare: {e}", file=sys.stderr)
        return 2

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if not k.endswith("displacements")}, indent=1))
    ok = (
        report["rank_correlation"] >= 0.8
        and report["stability_agreement"] >= 0.9
    )
    print("VERDICT:", "backends agree (rank>=0.8, stability>=0.9)"
          if ok else "backends DISAGREE — inspect per-grasp displacements")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
