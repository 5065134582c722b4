"""Per-stage metrics + run lineage.

``parse_dataset_stats`` turns Ray Data's ``ds.stats()`` text into structured
per-operator rows (wall time, cpu time, rows, bytes, tasks) so
``metrics.json`` carries machine-readable per-stage throughput, not just a
blob. ``write_lineage`` records what a run consumed and how it was
configured — with the per-bucket manifest rows this is the engine's lineage
story (north_rule: "resumable from per-partition checkpoints with lineage
and throughput metrics emitted per stage").
"""

from __future__ import annotations

import json
import os
import re


_NUM = r"([0-9.]+)(us|ms|s|min)?"


def _to_seconds(val: str, unit: str | None) -> float:
    f = float(val)
    return f * {"us": 1e-6, "ms": 1e-3, "s": 1.0, "min": 60.0, None: 1.0}[unit]


def parse_dataset_stats(stats: str) -> list[dict]:
    """Best-effort structured view of ``Dataset.stats()`` output."""
    out = []
    cur = None
    for line in stats.splitlines():
        m = re.match(r"Operator (\d+) (.+?): (?:(\d+) tasks executed, )?(\d+) blocks? produced in ([0-9.]+)s", line.strip())
        if m:
            cur = {
                "operator": m.group(2)[:120],
                "tasks": int(m.group(3)) if m.group(3) else None,
                "blocks": int(m.group(4)),
                "wall_s": float(m.group(5)),
            }
            out.append(cur)
            continue
        if cur is None:
            continue
        s = line.strip()
        m = re.match(rf"\* Remote wall time: .* {_NUM} total", s)
        if m:
            cur["task_wall_total_s"] = round(_to_seconds(m.group(1), m.group(2)), 4)
        m = re.match(rf"\* Remote cpu time: .* {_NUM} total", s)
        if m:
            cur["task_cpu_total_s"] = round(_to_seconds(m.group(1), m.group(2)), 4)
        m = re.match(r"\* Output num rows per block: .* (\d+) total", s)
        if m:
            cur["rows_out"] = int(m.group(1))
        m = re.match(r"\* Output size bytes per block: .* (\d+) total", s)
        if m:
            cur["bytes_out"] = int(m.group(1))
    return out


def write_lineage(out_dir: str, input_path: str, config: dict) -> None:
    """Record run lineage: input files (path, size, mtime) + job config."""
    files = []
    if os.path.isdir(input_path):
        for f in sorted(os.listdir(input_path)):
            p = os.path.join(input_path, f)
            if os.path.isfile(p):
                st = os.stat(p)
                files.append({"file": f, "bytes": st.st_size,
                              "mtime": int(st.st_mtime)})
    elif os.path.isfile(input_path):
        st = os.stat(input_path)
        files.append({"file": os.path.basename(input_path),
                      "bytes": st.st_size, "mtime": int(st.st_mtime)})
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, ".lineage.json.tmp")
    with open(tmp, "w") as fh:
        json.dump({"input_path": os.path.abspath(input_path),
                   "input_files": files, "config": config}, fh, indent=1,
                  sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "lineage.json"))
