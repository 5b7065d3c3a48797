"""Local grid-sweep runner over the W&B sweep YAML format.

The reference scales out with `wandb sweep ... && wandb agent <ID>`
(ref: README.md:28-29). This runner consumes the SAME sweep YAMLs but runs
the grid locally: expand the cartesian product, execute each run as a
subprocess of `program` with the fixed command flags + grid flags, and
aggregate the sweep metric from each run's metrics.jsonl.

Usage:
    python sweep.py sweeps/b2p2t_gru+w2v_full_fine_tuning.yaml \
        [--dry_run] [--max_runs N] [--jobs N] [--extra --flag=value ...]

Results: <cache_dir>/sweep_results/<sweep_name>/summary.jsonl, one line per
run with the grid point, the metric, and the run's results dir.
"""

import argparse
import itertools
import json
import os
import subprocess
import sys
import time

import yaml


def expand_grid(parameters: dict):
    keys = list(parameters.keys())
    values = [parameters[k]["values"] for k in keys]
    for combo in itertools.product(*values):
        yield dict(zip(keys, combo))


def fixed_flags(command):
    """Flags baked into the sweep command list (skip wandb placeholders)."""
    flags = []
    for item in command:
        if isinstance(item, str) and item.startswith("--"):
            if item.startswith("--use_wandb"):
                continue  # local runner logs JSONL; wandb optional
            flags.append(item)
    return flags


def read_metric(results_root: str, name: str, metric: str):
    """Last value of `metric` in the newest run's metrics.jsonl."""
    exp_dir = os.path.join(results_root, "experiment_results", name)
    if not os.path.isdir(exp_dir):
        return None, None
    candidates = []
    for root, _dirs, files in os.walk(exp_dir):
        if "metrics.jsonl" in files:
            candidates.append(os.path.join(root, "metrics.jsonl"))
    if not candidates:
        return None, None
    latest = max(candidates, key=os.path.getmtime)
    value = None
    with open(latest) as f:
        for line in f:
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            if metric in row:
                value = row[metric]
    return value, os.path.dirname(latest)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sweep_yaml")
    ap.add_argument("--dry_run", action="store_true")
    ap.add_argument("--max_runs", type=int, default=None)
    ap.add_argument("--config_yaml", default="config.yaml")
    ap.add_argument(
        "--extra", nargs=argparse.REMAINDER, default=[],
        help="extra flags appended to every run",
    )
    args = ap.parse_args()

    with open(args.sweep_yaml) as f:
        sweep = yaml.safe_load(f)

    program = sweep.get("program", "run.py")
    base_flags = fixed_flags(sweep.get("command", []))
    metric = sweep["metric"]["name"]
    goal = sweep["metric"]["goal"]
    run_cap = args.max_runs or sweep.get("run_cap")

    with open(args.config_yaml) as f:
        cache_dir = yaml.safe_load(f)["cache_dir"]
    out_dir = os.path.join(cache_dir, "sweep_results", sweep.get("name", "sweep"))
    os.makedirs(out_dir, exist_ok=True)
    summary_path = os.path.join(out_dir, "summary.jsonl")

    # experiment name for results lookup
    exp_type = next(
        (
            f.split("=", 1)[1]
            for f in base_flags
            if f.startswith("--experiment_type=")
        ),
        "b2p2t_gru+w2v",
    )

    grid = list(expand_grid(sweep.get("parameters", {})))
    if run_cap:
        grid = grid[:run_cap]
    print(f"sweep {sweep.get('name')}: {len(grid)} runs, metric {metric} ({goal})")

    best = None
    for i, point in enumerate(grid):
        point_flags = [f"--{k}={v}" for k, v in point.items()]
        cmd = [sys.executable, program] + base_flags + point_flags + args.extra
        print(f"\n[{i + 1}/{len(grid)}] {' '.join(cmd)}")
        if args.dry_run:
            continue
        t0 = time.time()
        proc = subprocess.run(cmd)
        value, run_dir = read_metric(cache_dir, exp_type, metric)
        row = {
            "run": i,
            "params": point,
            metric: value,
            "returncode": proc.returncode,
            "runtime_s": round(time.time() - t0, 1),
            "results_dir": run_dir,
        }
        with open(summary_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        if value is not None and (
            best is None
            or (goal == "minimize" and value < best[0])
            or (goal == "maximize" and value > best[0])
        ):
            best = (value, point)
        print(f"  -> {metric}={value} (best so far: {best})")

    if not args.dry_run and best is not None:
        print(f"\nBest {metric}: {best[0]} at {best[1]}")
        print(f"Summary: {summary_path}")


if __name__ == "__main__":
    main()
