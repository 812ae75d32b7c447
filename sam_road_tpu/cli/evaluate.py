"""Metric evaluation CLI (reference: eval_schedule.bash / apls.bash /
topo.bash as one command).

samroad-eval --run_dir save/<run> [--dataset cityscale] [--data_root .]
             [--metric all|apls|topo] [--tiles 8,9,19]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--run_dir", required=True, nargs="+",
                        help="one or more run dirs containing graph/*.p")
    parser.add_argument("--dataset", default="cityscale",
                        choices=["cityscale", "spacenet"])
    parser.add_argument("--data_root", default=".")
    parser.add_argument("--metric", default="all", choices=["all", "apls", "topo"])
    parser.add_argument("--tiles", default=None,
                        help="comma-separated tile ids (default: test split)")
    parser.add_argument("--no_native", action="store_true",
                        help="force the Python APLS fallback")
    args = parser.parse_args(argv)

    from sam_road_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from sam_road_tpu.metrics.runner import evaluate_apls, evaluate_topo

    tiles = None
    if args.tiles:
        raw = args.tiles.split(",")
        tiles = [int(t) if t.isdigit() else t for t in raw]

    for run_dir in args.run_dir:
        print(f"==== evaluating {run_dir} ====")
        if args.metric in ("all", "apls"):
            evaluate_apls(run_dir, args.dataset, args.data_root,
                          use_native=not args.no_native, tiles=tiles)
        if args.metric in ("all", "topo"):
            evaluate_topo(run_dir, args.dataset, args.data_root, tiles=tiles)


if __name__ == "__main__":
    main()
