"""Thin orchestration shim (SURVEY.md §7.5): a dependency-free DAG runner
with the same task-graph shape as the reference's Airflow DAGs (ingest →
transform → load, /root/reference/code/airflow/dags/*.py) but none of the
scheduler machinery — the engine does the heavy lifting; orchestration is
just ordering, retries, and status.

Airflow-compatible by construction: each Task is a plain callable with
named upstream deps, so wiring the same graph into Airflow PythonOperators
is mechanical. Unlike the reference, there is no per-file job submission
(transform_json_INFO.py:61-95) — a "task" here is one Spark action over a
glob, never N cluster round-trips.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class Task:
    name: str
    fn: Callable[[], object]
    deps: list[str] = field(default_factory=list)
    retries: int = 0


@dataclass
class TaskResult:
    name: str
    status: str  # success | failed | skipped
    elapsed: float
    attempts: int
    error: str | None = None
    output: object = None


class Dag:
    def __init__(self, name: str):
        self.name = name
        self.tasks: dict[str, Task] = {}

    def add(
        self,
        name: str,
        fn: Callable[[], object],
        deps: list[str] | None = None,
        retries: int = 0,
    ) -> "Dag":
        if name in self.tasks:
            raise ValueError(f"duplicate task {name!r}")
        self.tasks[name] = Task(name, fn, list(deps or []), retries)
        return self

    def _topo_order(self) -> list[str]:
        for t in self.tasks.values():
            for d in t.deps:
                if d not in self.tasks:
                    raise ValueError(f"task {t.name!r} depends on unknown {d!r}")
        order: list[str] = []
        seen: dict[str, int] = {}  # 0=visiting, 1=done

        def visit(name: str) -> None:
            state = seen.get(name)
            if state == 1:
                return
            if state == 0:
                raise ValueError(f"cycle through task {name!r}")
            seen[name] = 0
            for d in self.tasks[name].deps:
                visit(d)
            seen[name] = 1
            order.append(name)

        for name in self.tasks:
            visit(name)
        return order

    def run(self) -> dict[str, TaskResult]:
        """Run all tasks in dependency order. A failed task (after retries)
        marks every transitive downstream task skipped; independent branches
        keep running — the reference's per-ticker try/except-and-continue
        (raw_to_landing_sparkjob.py:171-178) generalized to the task graph."""
        results: dict[str, TaskResult] = {}
        for name in self._topo_order():
            task = self.tasks[name]
            if any(results[d].status != "success" for d in task.deps):
                results[name] = TaskResult(name, "skipped", 0.0, 0)
                continue
            t0 = time.perf_counter()
            attempts = 0
            error: str | None = None
            output = None
            status = "failed"
            while attempts <= task.retries:
                attempts += 1
                try:
                    output = task.fn()
                    status = "success"
                    error = None
                    break
                except Exception as exc:  # noqa: BLE001 — boundary: record & continue
                    error = f"{type(exc).__name__}: {exc}"
            results[name] = TaskResult(
                name, status, round(time.perf_counter() - t0, 4), attempts, error, output
            )
        return results
