"""Default-lane check of the per-round seam report (this one must NOT
live in test_realdeps.py: that whole file is deselected by default, and
the probe's entire point is to run every round without opt-in)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.realdeps_probe import SEAMS, probe  # noqa: E402


def test_realdeps_probe_reports_seam_availability():
    """Packages appear in the sandbox silently between rounds (moto did,
    round 9), so every round's bench emits which seams became testable.
    Pins the report shape and that it notices moto — which IS installed
    here — so an unblocked seam can never again be carried as 'blocked'
    without the artifact contradicting it."""
    report = probe()
    assert set(report["available"]) | set(report["missing"]) == set(SEAMS)
    assert not set(report["available"]) & set(report["missing"])
    assert "moto" in report["available"]
    assert set(report["seams"]) == set(report["available"])
