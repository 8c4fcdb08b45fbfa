"""Structured metrics logging (reference train.py:87-88, 223-234).

The reference keeps python lists of losses and refreshes a tqdm postfix with
the rolling mean every ``refresh_stat_step`` iterations.  Here: the same
rolling-mean console readout, plus a machine-readable ``metrics.jsonl``
stream (iteration, losses, images/sec) — the observability layer the
reference lacks (SURVEY.md §5).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional


class MetricsLogger:
    def __init__(
        self,
        refresh_stat_step: int = 5,
        jsonl_path: Optional[str] = None,
        print_fn=print,
    ):
        self.refresh_stat_step = refresh_stat_step
        self.c_loss_history: List[float] = []
        self.g_loss_history: List[float] = []
        self._jsonl = None
        if jsonl_path:
            os.makedirs(os.path.dirname(jsonl_path) or ".", exist_ok=True)
            self._jsonl = open(jsonl_path, "a")
        self._print = print_fn
        self._last_time = time.perf_counter()
        self._last_iters = 0

    def log_step(
        self,
        iters: int,
        c_loss: float,
        g_loss: float,
        epoch: int,
        stage: int,
        batch: int,
        extra: Optional[Dict[str, float]] = None,
    ) -> None:
        """Record one readout.  The caller invokes this at the refresh cadence
        with ALREADY-AVERAGED window losses (the train loop keeps the window
        on device and fetches it in one transfer — train/loop.py)."""
        avg_c, avg_g = float(c_loss), float(g_loss)
        self.c_loss_history.append(avg_c)
        self.g_loss_history.append(avg_g)
        now = time.perf_counter()
        imgs_per_sec = (
            (iters - self._last_iters) * batch / (now - self._last_time)
            if now > self._last_time and iters > self._last_iters
            else 0.0
        )
        self._last_time, self._last_iters = now, iters
        # Same readout fields as the reference's pbar (train.py:231-234).
        self._print(
            f"step {stage} iter {iters}  g_loss: {avg_g:.3}  "
            f"c_loss: {avg_c:.3}  epoch: {epoch + 1}  "
            f"({imgs_per_sec:.1f} img/s)"
        )
        if self._jsonl:
            rec = {
                "iter": iters,
                "stage": stage,
                "epoch": epoch,
                "c_loss": avg_c,
                "g_loss": avg_g,
                "images_per_sec": imgs_per_sec,
            }
            if extra:
                rec.update(extra)
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()

    def log_eval(
        self, iters: int, stage: int, values: Dict[str, float]
    ) -> None:
        """Record a periodic evaluation readout (SWD; train/loop.py).

        Written as a separate ``{"kind": "eval"}`` jsonl record so loss-
        trajectory consumers can filter on the absence/presence of the key.
        """
        readout = "  ".join(f"{k}: {v:.6g}" for k, v in values.items())
        self._print(f"eval step {stage} iter {iters}  {readout}")
        if self._jsonl:
            rec = {"kind": "eval", "iter": iters, "stage": stage, **values}
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()
            self._jsonl = None


def read_metrics(path: str, kind: Optional[str] = None) -> List[Dict]:
    """Parse a metrics.jsonl file; ``kind`` filters records ("eval" for the
    periodic SWD readouts, None for all).  Shared by the convergence/demo
    scripts so the jsonl-scan idiom lives in one place."""
    records: List[Dict] = []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if kind is None or rec.get("kind") == kind:
                records.append(rec)
    return records
