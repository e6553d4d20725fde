"""Parse a Spark JSON event log into a per-stage timing profile.

Used to attribute the N-vs-4N scaling gap: for each stage, wall span,
summed task time, task count, max task (straggler), and the scheduling
gap to the previous stage. Usage:

  python scripts/stage_profile.py /tmp/spark-events/<app-id>
"""

from __future__ import annotations

import json
import sys


def main(path: str) -> None:
    stages = {}
    tasks: dict[tuple, list[float]] = {}
    app_start = app_end = None
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerApplicationStart":
                app_start = ev.get("Timestamp")
            elif kind == "SparkListenerApplicationEnd":
                app_end = ev.get("Timestamp")
            elif kind == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[(si["Stage ID"], si["Stage Attempt ID"])] = {
                    "name": si["Stage Name"].split("\n")[0][:60],
                    "submit": si.get("Submission Time"),
                    "complete": si.get("Completion Time"),
                    "n_tasks": si.get("Number of Tasks"),
                    "task_ms": [],
                }
            elif kind == "SparkListenerTaskEnd":
                key = (ev["Stage ID"], ev["Stage Attempt ID"])
                ti = ev.get("Task Info", {})
                if ti:
                    tasks.setdefault(key, []).append(
                        ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                    )
    for key, ms in tasks.items():
        if key in stages:
            stages[key]["task_ms"] = ms
    order = sorted(stages.items(), key=lambda kv: kv[1]["submit"] or 0)
    prev_end = app_start
    total_span = total_gap = total_task = 0
    print(f"{'stage':>5} {'span_s':>7} {'gap_s':>6} {'tasks':>5} {'sum_s':>7} {'max_s':>6}  name")
    for (sid, _att), s in order:
        span = (s["complete"] - s["submit"]) / 1e3 if s["complete"] and s["submit"] else 0
        gap = (s["submit"] - prev_end) / 1e3 if prev_end and s["submit"] else 0
        tsum = sum(s["task_ms"]) / 1e3
        tmax = max(s["task_ms"], default=0) / 1e3
        total_span += span
        total_gap += max(gap, 0)
        total_task += tsum
        print(
            f"{sid:>5} {span:>7.2f} {gap:>6.2f} {s['n_tasks']:>5} {tsum:>7.2f} {tmax:>6.2f}  {s['name']}"
        )
        prev_end = s["complete"] or prev_end
    wall = (app_end - app_start) / 1e3 if app_start and app_end else 0
    print(
        f"\napp wall {wall:.2f}s | stage spans {total_span:.2f}s | "
        f"inter-stage gaps {total_gap:.2f}s | summed task time {total_task:.2f}s"
    )


if __name__ == "__main__":
    main(sys.argv[1])
