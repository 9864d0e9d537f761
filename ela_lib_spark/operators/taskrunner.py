"""Multi-table task orchestration — parity with the reference's task
layer (SURVEY.md §2.10): TaskMgr sequential task list
(service/task/taskmgr.go:49-67), per-index-pair worker pool with
deterministic submit order (bulkmigrator.go:930-974), cooperative
cancellation (migrator.go:835-837), error collection (utils/errs.go).

Spark version: one job per table pair; bounded concurrency via a
thread pool submitting concurrent Spark jobs (Spark's scheduler
multiplexes them); deterministic ordering by source name; errors
collected, not raised mid-flight.
"""

from __future__ import annotations

import fnmatch
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field


@dataclass
class TaskResult:
    name: str
    ok: bool
    detail: object = None
    error: str | None = None


@dataclass
class TaskRunner:
    parallelism: int = 4  # reference default 12 (config/cfg.go), pool-bounded
    _cancelled: bool = field(default=False, init=False)

    def cancel(self) -> None:
        self._cancelled = True

    def run_pairs(self, pairs: list[tuple[str, callable]]) -> list[TaskResult]:
        """pairs: [(name, thunk)] — deterministic order by name
        (mirrors the sorted submit at bulkmigrator.go:930-944)."""
        pairs = sorted(pairs, key=lambda p: p[0])
        results: list[TaskResult] = []
        lock = threading.Lock()

        def run_one(name, thunk):
            if self._cancelled:
                res = TaskResult(name, False, error="cancelled")
            else:
                try:
                    res = TaskResult(name, True, detail=thunk())
                except Exception as e:  # collect, don't abort siblings
                    res = TaskResult(name, False, error=str(e))
            with lock:
                results.append(res)
            return res

        with ThreadPoolExecutor(max_workers=self.parallelism) as pool:
            futs = [pool.submit(run_one, n, t) for n, t in pairs]
            for f in futs:
                f.result()
        return sorted(results, key=lambda r: r.name)


def filter_tables(names: list[str], patterns: list[str],
                  skip_system: bool = True) -> list[str]:
    """Glob-pattern table selection (reference filterIndexes,
    bulkmigrator.go:464-498; system-index skip at 477-479)."""
    out = []
    for n in sorted(names):
        if skip_system and n.startswith("."):
            continue
        if any(fnmatch.fnmatch(n, p) for p in patterns):
            out.append(n)
    return out


def list_indexes(root: str) -> list[str]:
    """Catalog listing (S9): every committed table dataset under a
    warehouse directory — the GetIndexes analog for a parquet/Iceberg
    warehouse (reference lists live cluster indexes, es5.go GetIndexes)."""
    import os

    out = []
    if not os.path.isdir(root):
        return out
    for name in sorted(os.listdir(root)):
        p = os.path.join(root, name)
        if os.path.isdir(p) and (
            os.path.exists(os.path.join(p, "_SUCCESS"))
            or any(fn.endswith(".parquet") for fn in os.listdir(p))
        ):
            out.append(name)
    return out


def resolve_template_index(patterns: list[str], names: list[str]) -> str | None:
    """Template pattern→index resolution (S18): the FIRST existing
    index matching any glob pattern seeds the template's settings —
    mirrors service/task/migrator.go:590-635. fnmatch handles glob
    semantics properly (a naive '*'→'.*' regex rewrite mis-matches
    names containing '.', and crashes on '[' — same matcher
    filter_tables uses)."""
    import fnmatch

    for name in names:
        for p in patterns:
            if fnmatch.fnmatchcase(name, p):
                return name
    return None
