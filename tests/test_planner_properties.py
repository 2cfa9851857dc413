"""Property-based tests (hypothesis) for the planner layer.

The reference ships zero assertions (SURVEY §5); these pin the
engine-agnostic invariants: Variable matching, codec round-trips, and
planner soundness (a found plan, executed, actually manufactures the
goal columns).
"""

import re
import string

import pandas as pd
from hypothesis import given, settings, strategies as st

import task_on_dataframes_spark as tada
from task_on_dataframes_spark.browse import BrowseState
from task_on_dataframes_spark.plans.solve import Action
from task_on_dataframes_spark.plans.unify import Binding
from task_on_dataframes_spark.plans.variable import Variable

names = st.text(
    alphabet=string.ascii_lowercase + string.digits + "._-", min_size=1, max_size=20
).filter(lambda s: s.strip("."))


@given(names)
def test_variable_exact_match_is_equality(s):
    v = Variable(s)
    assert v == s
    assert not (v == s + "x")


@given(names)
def test_variable_pattern_is_anchored_prefix(s):
    v = Variable(re.compile("(" + re.escape(s) + ")"))
    assert v == s
    assert v == s + ".suffix"  # re.match = prefix semantics
    assert not (v == "#" + s)  # '#' is outside the name alphabet
    z = Variable(re.compile("(" + re.escape(s) + r")\Z"))
    assert z == s
    assert not (z == s + ".suffix")


@given(names)
def test_variable_q_roundtrip(s):
    for v in (Variable(s), Variable(re.compile(re.escape(s)))):
        rt = Variable.from_q(v.q_enc())
        assert (rt == s) == (v == s)
        assert rt.is_pattern == v.is_pattern


@given(
    st.lists(names, min_size=1, max_size=4, unique=True),
    st.integers(0, 3),
)
def test_browse_codec_roundtrips_any_action(cols, req_index):
    # variables whose encodings contain the codec's own delimiters
    var = Variable(re.compile(r"(.+)\|(\d_+)"))
    action = Action(
        Task="t",
        Bindings=tuple(
            Binding(frame=i, column=c, arg="x", var=var, req_index=req_index)
            for i, c in enumerate(cols)
        ),
        Returns=((None, cols[0] + ".out"), (1, "pos.out")),
    )
    state = BrowseState(files=["/tmp/f.parquet"], actions=[action])
    back = BrowseState.from_url_q(state.to_url_q())
    assert back.files == state.files
    assert len(back.actions) == 1
    got = back.actions[0]
    assert got.Task == "t"
    assert got.Returns == action.Returns
    assert [
        (b.frame, b.column, b.arg, b.req_index) for b in got.Bindings
    ] == [(b.frame, b.column, b.arg, b.req_index) for b in action.Bindings]
    assert all(
        g.var.pattern.pattern == b.var.pattern.pattern
        for g, b in zip(got.Bindings, action.Bindings)
    )


@settings(deadline=None, max_examples=60)
@given(
    st.dictionaries(
        st.integers(0, 2),
        st.lists(names, min_size=0, max_size=5, unique=True),
        max_size=3,
    )
)
def test_unification_invariants_hold_for_any_have_set(have):
    """Every satisfying call must: bind each (frame,col) at most once,
    keep all of one arg's requirements in a single frame, bind vars
    that actually match their column, and fully resolve templates."""
    from task_on_dataframes_spark.plans.task import Task
    from task_on_dataframes_spark.plans.unify import TaskCaller
    from task_on_dataframes_spark.plans.variable import Variable

    task = Task(
        name="fuzz",
        requires=[
            ("x", Variable(re.compile(r"(.+)"))),
            ("x", Variable(re.compile(r"(.+)\.b\Z"))),
            ("y", Variable("{x.1.0}.c")),
        ],
        generates=[(None, "{x.1}.out"), (1, "{x}.pos")],
    )
    calls = list(TaskCaller(have, task).satisfy())
    for bindings, returns in calls:
        cells = [(b.frame, b.column) for b in bindings]
        assert len(cells) == len(set(cells))
        for arg in ("x", "y"):
            frames = {b.frame for b in bindings if b.arg == arg}
            assert len(frames) <= 1
        for b in bindings:
            assert b.var.matches(b.column) is not None
        for _, name in returns:
            assert "{" not in name


@settings(deadline=None, max_examples=25)
@given(
    st.lists(
        st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=6),
        min_size=1,
        max_size=4,
        unique=True,
    )
)
def test_plan_found_implies_execution_reaches_goal(chain):
    """Random concrete task chain c0 -> c1 -> ... -> cn: the planner
    must find the n-step plan and executing it must produce the goal
    column with the transformed values."""
    cols = ["base"] + [f"base.{c}" for c in chain]
    with tada.temporary_tasks():
        for i in range(len(chain)):
            src_col, dst_col = cols[i], cols[i + 1]

            def body(x, expects, _dst=dst_col, _src=src_col):
                out = x[_src].map(lambda v: v + "+")
                return out.rename(_dst).to_frame().join(x)

            deco = tada.new_task(name=f"step{i}")(
                tada.requires([src_col], arg="x")(
                    tada.makes([dst_col], appends=True)(body)
                )
            )
            _ = deco
        src = pd.DataFrame({"base": ["v"]})
        result = tada.solve_goal([src], [cols[-1]])
        assert result[cols[-1]].tolist() == ["v" + "+" * len(chain)]
