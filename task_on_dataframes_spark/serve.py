"""HTTP explore/view service — the reference's interactive surface
(reference serve.py:110-147 ``/explore``, serve_view_df.py:75-157
``/view``, serve_view_df.py:160-173 ``/download/csv``) rebuilt over a
live SparkSession.

The whole session state is the URL query string (:class:`.browse.
BrowseState` codec), exactly like the reference: ``/explore`` replays
the encoded actions over the source *schemas only* (no data touched —
Spark schemas are free on lazy frames), lists the legal next actions as
links that append one action and re-encode, and links each live frame
to ``/view``. ``/view`` is the only route that executes, and it goes
through :class:`.cache.ResultCache`: the first hit materializes the
frame to parquet keyed by the canonical plan digest, every later page /
re-visit / CSV download of the same state is a zero-work
``spark.read.parquet`` plus an offset/limit page — the reference needs
Celery + pickle polling for this (serve.py:25-107); on Spark the
driver/executor split plus the parquet cache covers it synchronously.

Scale: pagination compiles to GlobalLimit operators inside Spark
(view.py:25), so a 100 TB result ships at most ``page_size`` rows to
the driver; the CSV route downloads one *page*, with the full-export
path deliberately left to ``sources.writers.csv_sink`` (distributed
write).
"""

from __future__ import annotations

from typing import Callable, List, Optional
from urllib.parse import quote

from .browse import BrowseState
from .cache import ResultCache, plan_key
from .plans.solve import perform_actions
from .plans.task import TaskRegistry
from .view import download_name, page, to_csv, to_html, palette

_EXPLORE_TPL = """<!doctype html><html><head><title>explore</title>
<style>body{{font-family:sans-serif;margin:2em}}li{{margin:.3em 0}}
.col{{padding:1px 6px;border-radius:4px;margin:0 2px}}</style></head>
<body><h1>Explore</h1>
<h2>Frames</h2><ol start="0">{frames}</ol>
<h2>Next actions</h2><ul>{actions}</ul>
<p>{back}</p></body></html>"""

_WAIT_TPL = """<!doctype html><html><head><title>computing</title>
<meta http-equiv="refresh" content="1"></head>
<body><p>Query running in the background &mdash; this page refreshes
until the result is ready.</p></body></html>"""

_ERROR_TPL = """<!doctype html><html><head><title>failed</title></head>
<body><h1>Query failed</h1><pre>{err}</pre></body></html>"""

_VIEW_TPL = """<!doctype html><html><head><title>view</title>
<style>body{{font-family:sans-serif;margin:2em}}
table{{border-collapse:collapse}}td,th{{border:1px solid #999;
padding:2px 8px;font-size:13px}}</style></head>
<body><p><a href="{back}">Back</a> |
<a href="{csv}">Download as csv</a></p>
{table}
<p>Pages: {pages}</p></body></html>"""


def create_app(
    spark,
    registry: Optional[TaskRegistry] = None,
    cache_root: Optional[str] = None,
    page_size: int = 50,
    source_loader: Optional[Callable[[str], object]] = None,
    background: bool = False,
):
    """Build the Flask app bound to ``spark``.

    ``source_loader`` maps an encoded file entry to a DataFrame
    (default: ``spark.read.parquet``) — the hook for glob/CSV sources.
    Flask is imported lazily so the engine has no hard web dependency.

    ``background=True`` reproduces the reference's async serve loop
    (serve.py:47-107): the first ``/view`` of an uncached plan submits
    the materialization to :class:`ResultCache`'s thread pool and
    returns an auto-refreshing 202 wait page immediately; every poll
    (and any concurrent request for the same plan) gets the wait page
    until the parquet write finishes, then the result serves from
    cache. Default ``False`` keeps the synchronous behavior (the Spark
    driver/executor split already keeps the web thread responsive for
    interactive-sized plans).
    """
    from flask import Flask, Response, abort

    app = Flask("task_on_dataframes_spark")
    cache = ResultCache(cache_root)
    load = source_loader or (lambda f: spark.read.parquet(f))

    def _bs(q: str) -> BrowseState:
        return BrowseState.from_url_q(q, registry=registry)

    def _sources(bs: BrowseState) -> List:
        return [load(f) for f in bs.files]

    def _frames(bs: BrowseState) -> List:
        """Live frames (sources + every action output), oldest first,
        all still lazy."""
        return perform_actions(
            _sources(bs), bs.actions, registry=bs.registry,
            return_latest_first=False,
        )

    def _cached_frame(bs: BrowseState, q: str, index: int):
        key = plan_key(list(bs.actions), [*bs.files, f"frame={index}"])
        return cache.get_or_compute(
            spark, key, lambda: _frames(bs)[index]
        )

    def _frame_or_wait(bs: BrowseState, index: int):
        """Background mode: (df, None) when ready, (None, response)
        while computing or after failure."""
        from flask import Response

        key = plan_key(list(bs.actions), [*bs.files, f"frame={index}"])
        st = cache.status(key)
        if st == "done":
            return cache.load(spark, key), None
        if st == "error":
            return None, Response(
                _ERROR_TPL.format(err=cache.error(key) or "unknown"),
                status=500,
                mimetype="text/html",
            )
        cache.submit(key, lambda: _frames(bs)[index])
        return None, Response(_WAIT_TPL, status=202, mimetype="text/html")

    @app.route("/explore/")
    @app.route("/explore/<path:q>")
    def explore(q: str = ""):
        bs = _bs(q)
        source_cols = [list(df.columns) for df in _sources(bs)]
        state = bs.abstract_state(source_cols)
        colors = palette(len({c for v in state.Vars for c in v}))
        color_of = {
            c: colors[i % len(colors)]
            for i, c in enumerate(sorted({c for v in state.Vars for c in v}))
        }
        frames_html = "".join(
            "<li><a href=\"/view/0/{i}/{q}\">view</a> [{cols}]</li>".format(
                i=i,
                q=quote(q, safe=""),
                cols=" ".join(
                    f'<span class="col" style="background:{color_of[c]}">'
                    f"{c}</span>"
                    for c in sorted(v)
                ),
            )
            for i, v in enumerate(state.Vars)
        )
        acts_html = "".join(
            '<li><a href="/explore/{q}">{task}</a> → {rets}</li>'.format(
                q=quote(bs.with_action(a).to_url_q(), safe=""),
                task=a.Task,
                rets=", ".join(n for _, n in a.Returns) or "(frame)",
            )
            for a in bs.further_actions(source_cols)
        )
        back = ""
        if bs.actions:
            prev = BrowseState(bs.files, bs.actions[:-1], registry=bs.registry)
            back = f'<a href="/explore/{quote(prev.to_url_q(), safe="")}">Back</a>'
        return _EXPLORE_TPL.format(
            frames=frames_html, actions=acts_html, back=back
        )

    @app.route("/view/<int:page_no>/<int:index>/<path:q>")
    def view(page_no: int, index: int, q: str):
        bs = _bs(q)
        if background:
            df, wait = _frame_or_wait(bs, index)
            if wait is not None:
                return wait
        else:
            df = _cached_frame(bs, q, index)
        if df is None:
            abort(404)
        total = df.count()
        n_pages = max((total + page_size - 1) // page_size, 1)
        page_df = page(df, page_no, page_size)
        qq = quote(q, safe="")
        pages = " ".join(
            f'<a href="/view/{p}/{index}/{qq}">{p}</a>'
            if p != page_no
            else f"<b>{p}</b>"
            for p in range(min(n_pages, 20))
        )
        return _VIEW_TPL.format(
            back=f"/explore/{qq}",
            csv=f"/download/csv/{index}/{qq}",
            table=to_html(page_df),
            pages=pages,
        )

    @app.route("/download/csv/<int:index>/<path:q>")
    def download_csv(index: int, q: str):
        bs = _bs(q)
        if background:
            df, wait = _frame_or_wait(bs, index)
            if wait is not None:
                return wait
        else:
            df = _cached_frame(bs, q, index)
        if df is None:
            abort(404)
        body = to_csv(page(df, 0, page_size))
        return Response(
            body,
            mimetype="text/csv",
            headers={
                "Content-Disposition":
                    f'attachment; filename="{download_name(df)}"'
            },
        )

    return app


def main() -> None:  # pragma: no cover — manual entry point
    from .session import get_spark

    spark = get_spark("tada-serve")
    create_app(spark).run(host="127.0.0.1", port=5057)


if __name__ == "__main__":  # pragma: no cover
    main()
