"""Offline 3DPW error report from a dumped evaluation pkl.

Reference contract: pocolib/utils/compute_error.py:29-85 — re-slice the
per-sample results saved by the trainer/eval (evaluation_results_*.pkl)
into the All / Test-sequences / Occluded-sequences splits.

Usage:
    python tools/compute_error.py --result_file \
        logs/.../evaluation_results_3dpw.pkl
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--result_file", required=True)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    import joblib

    from poco_tpu.eval.runner import pw3d_split_report

    payload = joblib.load(args.result_file)
    report = pw3d_split_report(
        payload["imgname"],
        payload["mpjpe"],
        payload["pampjpe"],
        payload["v2v"],
    )
    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
