#!/usr/bin/env python
"""Summarize the multi-seed capability runs (VERDICT round-2 #7) into the VALIDATION.md
table: per-seed final protocol (mean return over the 100-episode final eval, reference
trainer.py:302-324 semantics), cross-seed mean +/- std, and per-phase epoch-time stats.

Usage: python scripts/summarize_seeds.py /root/runs_r3/seed1 /root/runs_r3/seed2 ...
"""

import argparse
import json
import statistics
from pathlib import Path


def load_rows(run_dir: Path):
    m = run_dir / "metrics.jsonl"
    if not m.is_file():
        return []
    return [json.loads(line) for line in m.read_text().splitlines() if line.strip()]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("runs", nargs="+", type=Path)
    args = p.parse_args()

    finals, rows_out = [], []
    for run in args.runs:
        rows = load_rows(run)
        final_mean = final_std = None
        epoch_s = []
        for r in rows:
            if "final_return_mean" in r:
                final_mean = r["final_return_mean"]
                final_std = r.get("final_return_std")
            if "epoch_duration_s" in r:
                epoch_s.append(r["epoch_duration_s"])
            elif "duration" in r:  # reference-style hours
                epoch_s.append(float(r["duration"]) * 3600)
        n_epochs = len({r["epoch"] for r in rows if "epoch" in r})
        status = "complete" if final_mean is not None else "incomplete"
        rows_out.append((run.name, final_mean, final_std, n_epochs,
                         statistics.median(epoch_s) if epoch_s else None, status))
        if final_mean is not None:
            finals.append(final_mean)

    print("| run | final_return_mean (100 ep) | final std | epochs logged | "
          "median epoch s | status |")
    print("|---|---|---|---|---|---|")
    for name, fm, fs, ne, med, status in rows_out:
        print(f"| {name} | {fm if fm is not None else '—'} | "
              f"{fs if fs is not None else '—'} | {ne} | "
              f"{f'{med:.0f}' if med else '—'} | {status} |")
    if finals:
        mean = statistics.mean(finals)
        std = statistics.pstdev(finals) if len(finals) > 1 else 0.0
        print(f"\ncross-seed final_return: {mean:.2f} +/- {std:.2f} "
              f"over {len(finals)} seed(s)")


if __name__ == "__main__":
    main()
