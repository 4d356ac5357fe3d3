"""Windowed running average for training metrics.

Same role as the reference's meter (scripts/utils/average_meter.py, which
is itself the stock pytorch-examples utility): accumulate weighted values
between print intervals, reset after each report.
"""

from dataclasses import dataclass, field


@dataclass
class AverageMeter:
    name: str
    fmt: str = ":f"
    val: float = 0.0
    sum: float = field(default=0.0, repr=False)
    count: int = field(default=0, repr=False)

    @property
    def avg(self):
        return self.sum / self.count if self.count else 0.0

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, value, n=1):
        self.val = value
        self.sum += value * n
        self.count += n

    def __str__(self):
        spec = self.fmt.lstrip(":")
        return "{} {:{}} ({:{}})".format(self.name, self.val, spec,
                                         self.avg, spec)
