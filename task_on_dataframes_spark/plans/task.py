"""Task model and registry.

A :class:`Task` declares, purely in column-name space:

* ``requires``: ordered ``(arg, Variable)`` pairs — the input columns it
  needs, grouped by named DataFrame parameter (reference:
  frame_tasks/tasks.py:130-151);
* ``generates``: ordered ``(position, name_template)`` pairs — the output
  columns, optionally tagged with a return-tuple position (reference:
  frame_tasks/tasks.py:153-154);
* flags: ``appends`` (pass the bound input frame's remaining columns
  through to the output via a dedup + left join-back — reference:
  frame_tasks/tasks.py:262-269) and ``pass_extra`` (inject
  ``requires``/``expects`` kwargs — reference: frame_tasks/tasks.py:207-232).

Execution is *not* defined here: the planner layer never imports pyspark.
:mod:`task_on_dataframes_spark.runtime` binds tasks to Spark DataFrames.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Iterator, List, Optional, Tuple

from .variable import Variable

Arg = str
Requirement = Tuple[Arg, Variable]
#: output column: (return-tuple position or None, name template)
RetArg = Tuple[Optional[int], str]
#: concrete binding map: (frame_idx, concrete_column) -> (arg, resolved Variable)
CallReqsMap = Dict[Tuple[int, str], Tuple[Arg, Variable]]


class BadTask(RuntimeError):
    """Raised for structurally invalid tasks (e.g. every requirement is
    a dynamic ``{...}`` template, so nothing can ever bind first)."""


class NotSolvable(RuntimeError):
    """Raised when an output-name template cannot be instantiated from
    the current bindings."""


@dataclass
class Task:
    """A registered unit of work, declared by column names only."""

    name: str
    requires: List[Requirement] = field(default_factory=list)
    generates: List[RetArg] = field(default_factory=list)
    fcode: Optional[Callable] = None
    appends: bool = False
    pass_extra: Optional[bool] = None
    ref: Optional[str] = None

    def is_generic(self) -> bool:
        """A task is *generic* when any requirement is a regex pattern —
        such tasks branch the planner's search and are capped per path
        (see solve.MAX_REPEAT_GENERIC_TASK)."""
        return any(var.is_pattern for _, var in self.requires)

    def args(self) -> List[Arg]:
        seen: List[Arg] = []
        for arg, _ in self.requires:
            if arg not in seen:
                seen.append(arg)
        return seen

    def arg_requirements(self, arg: Arg) -> List[Requirement]:
        return [(a, v) for a, v in self.requires if a == arg]

    def __repr__(self) -> str:
        return f"Task({self.name}: {self.requires} -> {self.generates})"


class TaskRegistry:
    """Mutable name → Task mapping.

    The reference keeps a single module-global dict (frame_tasks/
    tasks.py:18); we expose the same convenience via
    :data:`default_registry` but allow independent registries so tests
    and embedded planners don't fight over global state.
    """

    def __init__(self) -> None:
        self._tasks: Dict[str, Task] = {}

    def register(self, task: Task) -> None:
        self._tasks[task.name] = task

    def unregister(self, name: str) -> None:
        self._tasks.pop(name, None)

    def get(self, name: str) -> Task:
        return self._tasks[name]

    def __getitem__(self, name: str) -> Task:
        return self._tasks[name]

    def __contains__(self, name: str) -> bool:
        return name in self._tasks

    def __iter__(self) -> Iterator[Tuple[str, Task]]:
        return iter(self._tasks.items())

    def __len__(self) -> int:
        return len(self._tasks)

    def names(self) -> List[str]:
        return list(self._tasks)

    def snapshot(self) -> Dict[str, Task]:
        return dict(self._tasks)

    def restore(self, snap: Dict[str, Task]) -> None:
        self._tasks = dict(snap)


#: module-level default registry, mirroring the reference's global ``tasks``
default_registry = TaskRegistry()

#: reference-compatible alias: ``tada.tasks["counts"]`` works
tasks = default_registry
