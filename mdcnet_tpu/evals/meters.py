"""Running-average meters (utils.py:33-48)."""
from __future__ import annotations


class AvgMeter:
    """Weighted running average; unifies the reference's three copies
    (utils.py:33-48, allied_files.py:75-90)."""

    def __init__(self, name: str = "Metric"):
        self.name = name
        self.reset()

    def reset(self) -> None:
        self.avg, self.sum, self.count = 0.0, 0.0, 0

    def update(self, val: float, count: int = 1) -> None:
        self.count += count
        self.sum += val * count
        self.avg = self.sum / self.count

    def __repr__(self) -> str:
        return f"{self.name}: {self.avg:.4f}"
