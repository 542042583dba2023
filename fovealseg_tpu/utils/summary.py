"""Parameter summaries (lib/torchsummary.py equivalent, 119 LoC there)."""

from __future__ import annotations

import jax
import numpy as np


def count_params(tree) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(tree)))


def summarize(params: dict, batch_stats: dict | None = None) -> str:
    """Human-readable per-subtree parameter counts (the reference prints
    torchsummary tables per network; here one line per top-level subtree)."""
    lines = ["=" * 52, f"{'subtree':<28}{'params':>12}{'MB (f32)':>10}", "-" * 52]
    total = 0
    for name, sub in sorted(params.items()):
        n = count_params(sub)
        total += n
        lines.append(f"{name:<28}{n:>12,}{n * 4 / 2**20:>10.2f}")
    lines.append("-" * 52)
    lines.append(f"{'total':<28}{total:>12,}{total * 4 / 2**20:>10.2f}")
    if batch_stats:
        lines.append(f"{'batch_stats':<28}{count_params(batch_stats):>12,}")
    lines.append("=" * 52)
    return "\n".join(lines)
