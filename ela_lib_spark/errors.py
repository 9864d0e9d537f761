"""Typed engine errors (SURVEY §2.10 O9 — the reference's custom
error-code taxonomy, pkg/errs: collapsed to an exception hierarchy,
which is the idiomatic Python/Spark form of error codes).

Every failure a caller can act on gets its own type; everything
derives from EngineError so `except EngineError` is the coarse net.
"""

from __future__ import annotations


class EngineError(Exception):
    """Base for all ela_lib_spark errors."""


class IndexNotFoundError(EngineError):
    """Index directory missing or has no readable manifest."""


class IndexCorruptError(EngineError):
    """Manifest present but a referenced dataset is missing/unreadable."""


class SettingsError(EngineError):
    """Schema/settings translation failed (merge conflict, bad spec)."""


class MaintenanceLockError(EngineError):
    """Another compaction/GC holds the index's maintenance lock."""
