"""Misc utilities: logging, file lists, time formatting, FLOPs accounting.

Mirrors reference utils.py (setup_logging :31, readlines :46, sec_to_hm_str
:75) with the thop FLOPs profiler replaced by XLA's own cost analysis.
"""

from __future__ import annotations

import logging
import os
import sys


def readlines(filename: str) -> list[str]:
    with open(filename, "r") as f:
        return f.read().splitlines()


def sec_to_hm(t: float) -> tuple[int, int, int]:
    t = int(t)
    s = t % 60
    t //= 60
    m = t % 60
    t //= 60
    return t, m, s


def sec_to_hm_str(t: float) -> str:
    h, m, s = sec_to_hm(t)
    return f"{h:02d}h{m:02d}m{s:02d}s"


def setup_logging(filename: str | None = None, filemode: str = "w", rank: int = 0):
    """Rank-0 INFO logging to console + optional per-experiment logfile."""
    level = logging.INFO if rank == 0 else logging.WARNING
    handlers: list[logging.Handler] = [logging.StreamHandler(sys.stdout)]
    if filename is not None and rank == 0:
        os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
        handlers.append(logging.FileHandler(filename, mode=filemode))
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname)s %(message)s",
        handlers=handlers,
        force=True,
    )


def xla_flops(fn, *args, **kwargs) -> float:
    """FLOPs of a jitted function via XLA cost analysis (replaces thop,
    reference utils.py:18-28). Returns total flops or -1 if unavailable."""
    import jax

    try:
        compiled = jax.jit(fn).lower(*args, **kwargs).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", -1.0))
    except Exception:
        return -1.0


def count_params(tree) -> int:
    import jax
    import numpy as np

    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(tree)))
