"""Metric sinks: stdout, CSV, optional wandb.

The reference logs to wandb per step and per epoch (trail_01.py:135-151,
train_val_epoch.py:383-384) and appends per-batch prediction DataFrames to a
dated CSV (utilities.py:8-13, train_val_epoch.py:836-854).  wandb is
optional here (not installed in this image); the MetricLogger fans out to
whichever sinks are configured.
"""
from __future__ import annotations

import csv
import datetime
import os
from typing import Dict, Iterable, Optional


class CsvSink:
    """Append rows to a CSV, writing the header only when the file is new
    (append_df_to_csv semantics, utilities.py:8-13)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, row: Dict) -> None:
        exists = os.path.exists(self.path)
        with open(self.path, "a", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(row.keys()))
            if not exists:
                writer.writeheader()
            writer.writerow(row)

    def log_rows(self, rows: Iterable[Dict]) -> None:
        for r in rows:
            self.log(r)


def dated_csv_path(directory: str, prefix: str = "predictions") -> str:
    """A dated log filename like the reference's per-day CSV
    (train_val_epoch.py:848-854)."""
    stamp = datetime.date.today().isoformat()
    return os.path.join(directory, f"{prefix}_{stamp}.csv")


class MetricLogger:
    """Fan-out logger: stdout + optional CSV + optional wandb."""

    def __init__(self, csv_path: Optional[str] = None,
                 use_wandb: bool = False, wandb_kwargs: Optional[Dict] = None,
                 quiet: bool = False):
        self.quiet = quiet
        self.csv = CsvSink(csv_path) if csv_path else None
        self.wandb = None
        if use_wandb:
            try:
                import wandb
                self.wandb = wandb
                wandb.init(**(wandb_kwargs or {}))
            except ImportError:
                pass

    def log(self, metrics: Dict, step: Optional[int] = None) -> None:
        scalars = {k: (float(v) if hasattr(v, "item") or
                       isinstance(v, (int, float)) else v)
                   for k, v in metrics.items()}
        if not self.quiet:
            body = " ".join(f"{k}={v:.5g}" if isinstance(v, float) else
                            f"{k}={v}" for k, v in scalars.items())
            prefix = f"[step {step}] " if step is not None else ""
            print(prefix + body, flush=True)
        if self.csv is not None:
            row = dict(scalars)
            if step is not None:
                row["step"] = step
            self.csv.log(row)
        if self.wandb is not None:
            self.wandb.log(scalars, step=step)
