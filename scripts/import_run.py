#!/usr/bin/env python
"""Interactive puller for remote run folders (TPU-native counterpart of reference
scripts/import_run.py:11-123): pick a date/time run dir on a remote host, rsync it locally
excluding the heavy subdirs, and fetch the last agent checkpoint."""

import argparse
import json
import subprocess
import sys
from pathlib import Path


def ssh_ls(host: str, path: str):
    out = subprocess.run(["ssh", host, f"ls -1 {path}"], capture_output=True, text=True)
    if out.returncode != 0:
        sys.exit(f"ssh failed: {out.stderr}")
    return [l for l in out.stdout.splitlines() if l]


def choose(options, what):
    for i, o in enumerate(options):
        print(f"{i:3d}: {o}")
    while True:
        x = input(f"Pick a {what}: ")
        if x.isdigit() and int(x) < len(options):
            return options[int(x)]
        print("Invalid.")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("host", help="ssh host with remote runs")
    p.add_argument("--remote-root", default="outputs")
    p.add_argument("--local-root", type=Path, default=Path("imported_runs"))
    p.add_argument("--with-dataset", action="store_true",
                   help="also pull the episode dataset (heavy)")
    args = p.parse_args()

    date = choose(ssh_ls(args.host, args.remote_root), "date")
    time_ = choose(ssh_ls(args.host, f"{args.remote_root}/{date}"), "time")
    remote = f"{args.remote_root}/{date}/{time_}"
    local = args.local_root / date / time_
    local.mkdir(parents=True, exist_ok=True)

    excludes = ["--exclude", "dataset"] if not args.with_dataset else []
    excludes += ["--exclude", "checkpoints/agent_versions", "--exclude", "checkpoints/state.pt"]
    subprocess.run(["rsync", "-avz", *excludes, f"{args.host}:{remote}/", str(local)],
                   check=True)

    # fetch only the newest agent checkpoint
    versions = ssh_ls(args.host, f"{remote}/checkpoints/agent_versions")
    if versions:
        last = sorted(versions)[-1]
        (local / "checkpoints" / "agent_versions").mkdir(parents=True, exist_ok=True)
        subprocess.run(["rsync", "-avz",
                        f"{args.host}:{remote}/checkpoints/agent_versions/{last}",
                        str(local / "checkpoints" / "agent_versions" / last)], check=True)
    info = local / "checkpoints" / "info_for_import_script.json"
    if info.is_file():
        print(json.loads(info.read_text()))
    print(f"imported into {local}")


if __name__ == "__main__":
    main()
