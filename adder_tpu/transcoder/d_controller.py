"""Legacy decimation-adaptation controllers.

ref: adder-codec-rs/src/transcoder/d_controller.rs (pub(crate), not wired
into the current Video path in the reference either — kept for parity).
Strategies adjust per-pixel D from the stability of delta-t predictions.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

from ..core.types import D_MAX


class DControlMode(enum.IntEnum):
    Standard = 0
    AggressiveRoi = 1
    Manual = 2


@dataclass
class DControllerStandard:
    """Grow D while the pixel's delta-t prediction is stable; shrink on
    misprediction (ref: d_controller.rs:52-160)."""

    d: int = 7
    predicted_dt: float = 0.0
    stable_count: int = 0
    stability_threshold: int = 2

    def throttle(self, observed_dt: float, tolerance: float = 0.25) -> int:
        if self.predicted_dt > 0 and abs(observed_dt - self.predicted_dt) <= (
            tolerance * self.predicted_dt
        ):
            self.stable_count += 1
            if self.stable_count >= self.stability_threshold and self.d < D_MAX:
                self.d += 1
                self.stable_count = 0
        else:
            self.stable_count = 0
            if self.d > 0:
                self.d -= 1
        self.predicted_dt = observed_dt
        return self.d


@dataclass
class DControllerAggressive(DControllerStandard):
    """ROI-biased variant: doubles the growth step inside the ROI
    (ref: d_controller.rs:162-210)."""

    in_roi: bool = False

    def throttle(self, observed_dt: float, tolerance: float = 0.25) -> int:
        d = super().throttle(observed_dt, tolerance)
        if self.in_roi and d > 0:
            self.d = max(d - 1, 0)  # keep ROI pixels more sensitive
        return self.d


@dataclass
class DControllerManual:
    """Fixed D (ref: d_controller.rs:212-233)."""

    d: int = 7

    def throttle(self, observed_dt: float, tolerance: float = 0.25) -> int:
        return self.d
