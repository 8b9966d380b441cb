#!/usr/bin/env python
"""Preemption auto-resume relauncher.

Behavioral counterpart of reference utils/aws/resume.py:1-37: find interrupted
runs (a last.ckpt whose run recorded more target epochs than completed) and
relaunch training with --resume. Intended for cron/systemd on preemptible hosts:

    */10 * * * * python tools/auto_resume.py --root runs/train
"""

import argparse
import csv
import subprocess
import sys
from pathlib import Path


def find_interrupted(root: Path):
    for last in sorted(root.rglob("last.ckpt")):
        run_dir = last.parent.parent
        args_file = run_dir / "train_args.txt"
        results = run_dir / "results.csv"
        if not args_file.exists():
            continue
        argv = args_file.read_text().split()
        try:
            epochs = int(argv[argv.index("--epochs") + 1])
        except (ValueError, IndexError):
            continue
        done = -1
        if results.exists():
            rows = list(csv.DictReader(open(results)))
            if rows:
                done = int(rows[-1]["epoch"])
        if done < epochs - 1:
            yield run_dir, last, argv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="runs/train")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()
    for run_dir, last, argv in find_interrupted(Path(args.root)):
        cmd = [sys.executable, "-m", "icafusion_tpu.cli.train",
               *argv, "--resume", str(last)]
        print("relaunch:", " ".join(cmd))
        if not args.dry_run:
            subprocess.run(cmd, check=False)


if __name__ == "__main__":
    main()
