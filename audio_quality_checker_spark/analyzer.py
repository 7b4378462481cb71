"""Analyzer — the fluent class facade over run_checks/CheckSuite.

Heir of the reference's ``AudioAnalyzer`` (analyzer.rs:18-84: ``new /
with_config / analyze``) and its builder (analyzer.rs:98-153): a thin
object that carries the input frames plus a CheckSuite and exposes
``analyze()`` / ``quick()`` / ``full()``.  All execution stays in
plans.validate.run_checks — this class adds NO plan logic, only the
ergonomic surface SURVEY.md §2.11 lists (hold the config, fluently
override it, run).

    result = (
        Analyzer(pages, ref_hosts=hosts, baseline=snap)
        .with_(max_null_rate=0.01, check_exact_ks=True)
        .analyze()
    )
    result.verdicts.show()
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from audio_quality_checker_spark.config import FULL, QUICK, CheckSuite
from audio_quality_checker_spark.plans.validate import (
    ValidationResult,
    run_checks,
)


class Analyzer:
    """Holds (pages, ref_hosts, baseline, suite); each ``with_*`` returns
    a NEW Analyzer (the CheckSuite is a frozen dataclass — the facade
    keeps that immutability, like the reference builder's move-semantics
    chain)."""

    def __init__(self, pages: DataFrame,
                 ref_hosts: DataFrame | None = None,
                 baseline: DataFrame | None = None,
                 suite: CheckSuite | None = None) -> None:
        self.pages = pages
        self.ref_hosts = ref_hosts
        self.baseline = baseline
        self.suite = suite or CheckSuite()

    # ---- fluent configuration (analyzer.rs:98-153 analog) ----

    def with_suite(self, suite: CheckSuite) -> "Analyzer":
        """with_config analog: swap the whole CheckSuite."""
        return Analyzer(self.pages, self.ref_hosts, self.baseline, suite)

    def with_(self, **overrides) -> "Analyzer":
        """Fluent per-field override, passthrough to CheckSuite.with_
        (any CheckSuite field: thresholds, check toggles, penalties)."""
        return self.with_suite(self.suite.with_(**overrides))

    def with_ref_hosts(self, ref_hosts: DataFrame) -> "Analyzer":
        return Analyzer(self.pages, ref_hosts, self.baseline, self.suite)

    def with_baseline(self, baseline: DataFrame) -> "Analyzer":
        return Analyzer(self.pages, self.ref_hosts, baseline, self.suite)

    # ---- execution (analyzer.rs:18-84 analog) ----

    def analyze(self, exact: bool = False) -> ValidationResult:
        """Run the configured suite; ``exact=True`` is the small-scale
        oracle mode (exact distinct counts instead of HLL++)."""
        return run_checks(
            self.pages.sparkSession, self.pages, self.ref_hosts,
            self.baseline, self.suite, exact=exact,
        )

    def quick(self) -> ValidationResult:
        """Cheap structural checks only (main.rs:194-196 --quick analog);
        keeps this Analyzer's thresholds, toggles only the check set."""
        merged = self.suite.with_(
            check_drift=QUICK.check_drift,
            check_extraction=QUICK.check_extraction,
        )
        return self.with_suite(merged).analyze()

    def full(self) -> ValidationResult:
        """Everything on — full-corpus extraction identity + exact KS
        (regression-suite analog)."""
        merged = self.suite.with_(
            check_extraction_full=FULL.check_extraction_full,
            check_exact_ks=FULL.check_exact_ks,
        )
        return self.with_suite(merged).analyze()
