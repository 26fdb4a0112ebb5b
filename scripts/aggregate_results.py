#!/usr/bin/env python
"""Aggregate final returns across runs into a results JSON keyed game -> seed -> return,
matching the layout of the reference's published results (reference
results/data/DIAMOND.json, README.md:233-235).

Usage: python scripts/aggregate_results.py outputs/**/metrics.jsonl -o results.json
"""

import argparse
import json
from collections import defaultdict
from pathlib import Path

import yaml


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("metrics", nargs="+", type=Path, help="metrics.jsonl files of runs")
    p.add_argument("-o", "--output", type=Path, default=Path("results.json"))
    args = p.parse_args()

    results = defaultdict(dict)
    for m in args.metrics:
        run_dir = m.parent
        cfg_file = run_dir / "config" / "trainer.yaml"
        game, seed = "unknown", 0
        if cfg_file.is_file():
            cfg = yaml.safe_load(cfg_file.read_text())
            game = cfg["env"]["train"]["id"].replace("NoFrameskip-v4", "")
            seed = cfg["common"].get("seed")
        final = None
        for line in m.read_text().splitlines():
            row = json.loads(line)
            if "final_return_mean" in row:
                final = row["final_return_mean"]
        if final is not None:
            results[game][str(seed)] = final
        else:
            print(f"warning: no final_return_mean in {m}")

    args.output.write_text(json.dumps(results, indent=2, sort_keys=True))
    for game, seeds in sorted(results.items()):
        vals = list(seeds.values())
        print(f"{game}: mean={sum(vals) / len(vals):.1f} over {len(vals)} seed(s)")


if __name__ == "__main__":
    main()
