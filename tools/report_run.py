"""Summarize a training run's metrics.jsonl into a markdown report.

Produces the accuracy-evidence table for docs/USAGE.md (VERDICT round-1
item 1): loss curve milestones, the ADD(-S) val-recall trajectory from the
--eval-every ticks, throughput, and the best checkpoint to evaluate.

Usage:
    python tools/report_run.py /path/to/run_dir [--every 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def load(path: str) -> list[dict]:
    """Parse metrics.jsonl, deduping supervised-restart replays.

    The trainer appends; after a --supervise restart it resumes from the
    last checkpoint and re-logs the epochs since (VERDICT r2 weak #4: the
    r2 log has epoch 73, then 71-73 again). Keep the LAST row per
    (epoch, step) key and return rows sorted by step so the trajectory is
    monotonic across restarts.
    """
    by_key: dict = {}
    order = 0
    with open(path) as f:
        for ln in f:
            ln = ln.strip()
            if not ln:
                continue
            rec = json.loads(ln)
            key = (rec.get("epoch"), rec.get("step"))
            by_key[key] = (order, rec)  # later rows win
            order += 1
    recs = [rec for _, rec in by_key.values()]
    recs.sort(key=lambda r: (r.get("step") or 0, r.get("epoch") or 0))
    return recs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--every", type=int, default=1,
                    help="print every Nth eval row")
    args = ap.parse_args()

    path = os.path.join(args.run_dir, "metrics.jsonl")
    recs = load(path)
    if not recs:
        print("no records", file=sys.stderr)
        return 1

    evals = [r for r in recs if "val_recall" in r]
    last = recs[-1]
    print(f"run: {args.run_dir}")
    print(f"epochs logged: {len(recs)}  (last step {last.get('step')})")
    print(f"final train loss: {last.get('loss'):.4f}  "
          f"(box3d {last.get('loss_box3d', float('nan')):.4f}, "
          f"cls {last.get('loss_cls', float('nan')):.2e}, "
          f"mask {last.get('loss_mask', float('nan')):.2e})")
    if "img_s" in last:
        print(f"throughput: {last['img_s']} img/s")
    print()
    if not evals:
        print("no --eval-every records")
        return 0
    print("| epoch | step | train loss | val ADD(-S) recall "
          "| val det rate | val median ADD/d |")
    print("|---|---|---|---|---|---|")
    for i, r in enumerate(evals):
        if i % args.every and r is not evals[-1]:
            continue
        med = r.get("val_median_add_rel")
        med_s = f"{med:.3f}" if med is not None else "n/a"
        print(
            f"| {r.get('epoch')} | {r.get('step')} | {r.get('loss'):.4f} "
            f"| {r.get('val_recall'):.4f} "
            f"| {r.get('val_detection_rate'):.4f} "
            f"| {med_s} |"
        )
    best = max(evals, key=lambda r: r.get("val_recall", 0.0))
    print(f"\nbest val recall: {best['val_recall']:.4f} at epoch "
          f"{best['epoch']} (step {best['step']})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
