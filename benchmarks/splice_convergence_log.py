"""Splice convergence.py run-segment logs into one results json.

A SAVE_DIR convergence run that was restarted prints its final history JSON
covering only (start_step, steps]; earlier segments' rows exist as the
per-chunk stdout lines. This tool parses any number of segment logs (chunk
lines and/or final JSON), dedups by step (later files win), and writes the
full curve.

Usage: python benchmarks/splice_convergence_log.py out.json log1 [log2 ...]
"""

import json
import re
import sys

LINE = re.compile(
    r"step\s+(\d+): loss ([\d.eE+-]+)\s+full-res fg IoU ([\d.eE+-]+)"
    r"\s+bin IoU ([\d.eE+-]+)\s+acc ([\d.eE+-]+)"
)


def main():
    out_path, logs = sys.argv[1], sys.argv[2:]
    rows: dict[int, dict] = {}
    meta = {}
    for path in logs:
        with open(path) as fh:
            for line in fh:
                m = LINE.search(line)
                if m:
                    step = int(m.group(1))
                    rows[step] = {
                        "step": step,
                        "train_loss": float(m.group(2)),
                        "heldout_fg_iou": float(m.group(3)),
                        "heldout_bin_iou": float(m.group(4)),
                        "heldout_pixel_acc": float(m.group(5)),
                    }
                elif line.startswith("{") and '"history"' in line:
                    data = json.loads(line)
                    for r in data.pop("history"):
                        rows[int(r["step"])] = r
                    meta.update(data)
    meta["history"] = [rows[k] for k in sorted(rows)]
    # meta.update(data) above keeps only the LAST segment's start_step/steps;
    # recompute both from the merged rows so the metadata describes the
    # whole spliced range (advisor r3 finding)
    if rows:
        meta["start_step"] = min(rows)
        meta["steps"] = max(rows)
    meta["spliced_from"] = [p.split("/")[-1] for p in logs]
    with open(out_path, "w") as fh:
        json.dump(meta, fh)
    print(f"{out_path}: {len(rows)} rows, steps "
          f"{min(rows)}..{max(rows)}")


if __name__ == "__main__":
    main()
