"""Interactive plan state + URL codec — the reference's BrowseState
(M9: browse.py:29-131) without the Flask layer.

A :class:`BrowseState` is (source files, chosen actions). It serializes
to/from a URL query string so an interactive surface (web UI, notebook
widget, CLI) can treat the query string as the *entire* session state,
exactly like the reference's ``/explore/<q>`` flow: replay the actions
over the sources' schemas to get the abstract state, list the legal
next actions, append one, re-encode.

Encoding (reference-shaped, browse.py:65-126): ``file_<i>=<path>`` per
source, and per action ``act_<i>_task=<name>``,
``act_<i>_cm_<frame>_<col>=<arg>|<varenc>|<reqidx>`` per binding, and
``act_<i>_ret_<pos>=<name>`` per return (pos -1 = unpositioned).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple
from urllib.parse import parse_qsl, quote, unquote, urlencode

from .plans.solve import (
    Action,
    State,
    actions_given_state,
    apply_many_actions,
)
from .plans.task import RetArg, TaskRegistry, default_registry
from .plans.unify import Binding
from .plans.variable import Variable


class BrowseState:
    def __init__(
        self,
        files: List[str],
        actions: Optional[List[Action]] = None,
        registry: Optional[TaskRegistry] = None,
    ):
        self.files = list(files)
        self.actions = list(actions or [])
        self.registry = default_registry if registry is None else registry

    # -- codec ---------------------------------------------------------
    def to_url_q(self) -> str:
        params: List[Tuple[str, str]] = []
        for i, f in enumerate(self.files):
            params.append((f"file_{i}", f))
        for i, act in enumerate(self.actions):
            params.append((f"act_{i}_task", act.Task))
            for b in act.Bindings:
                params.append(
                    (
                        f"act_{i}_cm_{b.frame}_{quote(b.column, safe='')}",
                        f"{b.arg}|{b.var.q_enc()}|{b.req_index}",
                    )
                )
            for pos, name in act.Returns:
                p = -1 if pos is None else pos
                params.append((f"act_{i}_ret_{p}", name))
        return urlencode(params)

    @classmethod
    def from_url_q(
        cls, q: str, registry: Optional[TaskRegistry] = None
    ) -> "BrowseState":
        pairs = parse_qsl(q, keep_blank_values=True)
        files: Dict[int, str] = {}
        tasks: Dict[int, str] = {}
        bindings: Dict[int, List[Binding]] = {}
        returns: Dict[int, List[RetArg]] = {}
        for key, val in pairs:
            if key.startswith("file_"):
                files[int(key[5:])] = val
            elif key.endswith("_task"):
                idx = int(key.split("_")[1])
                tasks[idx] = val
            elif "_cm_" in key:
                head, cm = key.split("_cm_", 1)
                idx = int(head.split("_")[1])
                frame_s, col_enc = cm.split("_", 1)
                # the variable encoding may itself contain '|' (regex
                # alternation): arg is the first field, req_index the
                # last — everything between is the encoding
                arg, rest = val.split("|", 1)
                varenc, reqidx = rest.rsplit("|", 1)
                bindings.setdefault(idx, []).append(
                    Binding(
                        frame=int(frame_s),
                        column=unquote(col_enc),
                        arg=arg,
                        var=Variable.from_q(varenc),
                        req_index=int(reqidx),
                    )
                )
            elif "_ret_" in key:
                head, pos_s = key.split("_ret_", 1)
                idx = int(head.split("_")[1])
                pos = int(pos_s)
                returns.setdefault(idx, []).append(
                    (None if pos == -1 else pos, val)
                )
        actions = [
            Action(
                Task=tasks[i],
                Bindings=tuple(bindings.get(i, [])),
                Returns=tuple(returns.get(i, [])),
            )
            for i in sorted(tasks)
        ]
        return cls(
            [files[i] for i in sorted(files)], actions, registry=registry
        )

    # -- planner views -------------------------------------------------
    def abstract_state(self, source_columns: List[List[str]]) -> State:
        state = State(
            Vars=tuple(frozenset(c) for c in source_columns), Tasks=()
        )
        return apply_many_actions(state, self.actions)

    def further_actions(self, source_columns: List[List[str]]) -> List[Action]:
        """One-step lookahead of legal actions (reference:
        browse.py:61-63) — the interactive surface renders these as
        links that append one action and re-encode."""
        return actions_given_state(
            self.abstract_state(source_columns), self.registry
        )

    def with_action(self, action: Action) -> "BrowseState":
        return BrowseState(
            self.files, self.actions + [action], registry=self.registry
        )
