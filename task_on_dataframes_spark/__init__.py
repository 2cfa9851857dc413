"""task_on_dataframes_spark — a PySpark-native, goal-driven dataflow engine.

A brand-new implementation of the capabilities of the reference project
``sankho-t/task-on-dataframes`` (surveyed in /root/repo/SURVEY.md), built
Spark-first: tasks declare the column names they *require* and *make*
(exact strings or regex patterns with capture-group templating), a BFS
planner finds a task sequence that manufactures a requested goal column
set, and the executor binds that plan to **lazy** PySpark DataFrames so
Catalyst/AQE optimize the whole composed pipeline as one logical plan.

Public API mirrors the reference's user surface (reference:
frame_tasks/__init__.py, frame_tasks/decorator.py:14-111) so a user of
the reference can switch with minimal changes::

    import task_on_dataframes_spark as tada

    @tada.new_task()
    @tada.requires([re.compile(r"(.+)\\.multiline")], arg="x")
    @tada.makes([r"{x}.lines"])
    @tada.close_task()
    def get_splits(x, expects): ...

    frames = tada.Executor([df], [["doc.multiline.lines"]])
"""

from . import view
from .introspect import plan_facts
from .plans.variable import Variable, set_ignore_case
from .runtime import quoted, spark_col, reindex_frame, append_join_back
from .plans.task import Task, TaskRegistry, default_registry, tasks
from .plans.decorator import new_task, requires, makes, close_task, temporary_tasks
from .plans.solve import (
    Action,
    State,
    Executor,
    TaskProblem,
    actions_given_state,
    apply_action,
    apply_many_actions,
    find_path,
    perform_actions,
    solve_goal,
)

def create_app(*args, **kwargs):
    """Lazy re-export of :func:`serve.create_app` (Flask optional)."""
    from .serve import create_app as _create_app

    return _create_app(*args, **kwargs)


__all__ = [
    "create_app",
    "view",
    "plan_facts",
    "quoted",
    "spark_col",
    "reindex_frame",
    "append_join_back",
    "Variable",
    "set_ignore_case",
    "Task",
    "TaskRegistry",
    "default_registry",
    "tasks",
    "new_task",
    "requires",
    "makes",
    "close_task",
    "temporary_tasks",
    "Action",
    "State",
    "Executor",
    "TaskProblem",
    "actions_given_state",
    "apply_action",
    "apply_many_actions",
    "find_path",
    "perform_actions",
    "solve_goal",
]

__version__ = "0.1.0"
