"""Validation-plateau stopping rule.

Replicates the reference's controller (src/linksampling.cc:1003-1050;
src/mmsbinfer.cc:2133-2173): stop when the held-out likelihood at network
sparsity (nshol) plateaus (relative change < stopthresh while increasing)
or declines for 3 consecutive reports. During the annealing phase the first
"stop" instead ends annealing (src/linksampling.cc:1036-1043).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class ValidationStop:
    stopthresh: float = 1e-5
    min_iter: int = 10

    prev_h: float = -2147483647.0
    max_h: float = -2147483647.0
    max_t: float = 0.0
    nh: int = 0
    why: int = -1
    since_max: int = 0   # reports since a new best nshol was set

    def update(self, iteration: int, nshol: float) -> bool:
        """Feed one report; returns True when the run should stop."""
        a = nshol
        stop = False
        self.why = -1
        if a > self.max_h:
            self.max_h = a
            self.max_t = 0.0
            self.since_max = 0
        else:
            self.since_max += 1
        if iteration > self.min_iter:
            if (a > self.prev_h and self.prev_h != 0 and
                    abs((a - self.prev_h) / self.prev_h) < self.stopthresh):
                stop = True
                self.why = 100
            elif a < self.prev_h:
                self.nh += 1
            elif a > self.prev_h:
                self.nh = 0
            if self.nh > 2:   # robust to small fluctuations
                self.why = 1
                stop = True
        self.prev_h = a
        return stop

    def reset_after_annealing(self) -> None:
        """The first plateau ends the annealing phase instead of the run."""
        self.nh = 0
        self.why = 0
        self.prev_h = 0.0
        self.since_max = 0
