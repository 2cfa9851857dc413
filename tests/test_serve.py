"""HTTP service routes (serve.py) — explore / view / CSV download
driven through Flask's test client against a live SparkSession,
mirroring the reference's interactive flow (serve.py:110-147)."""

from urllib.parse import quote

import pytest

flask = pytest.importorskip("flask")


@pytest.fixture()
def served(spark, tmp_path):
    from task_on_dataframes_spark.basic_tasks import register_document_tasks
    from task_on_dataframes_spark.serve import create_app

    registry = register_document_tasks(spark, "/root/testdata/sf0.001")
    app = create_app(
        spark, registry=registry, cache_root=str(tmp_path / "cache")
    )
    return app, registry


def test_full_flow_explore_view_csv(served):
    from task_on_dataframes_spark.browse import BrowseState

    app, registry = served
    client = app.test_client()

    # step 1: empty state — get_docs must be offered as a next action
    r = client.get("/explore/")
    assert r.status_code == 200 and "get_docs" in r.get_data(as_text=True)

    # step 2: append get_docs exactly the way the rendered link does
    bs = BrowseState([], [], registry=registry)
    get_docs = next(
        a for a in bs.further_actions([]) if a.Task == "get_docs"
    )
    q = quote(bs.with_action(get_docs).to_url_q(), safe="")

    r = client.get(f"/explore/{q}")
    assert r.status_code == 200
    body = r.get_data(as_text=True)
    assert "docs.id" in body and "docs.text" in body
    assert "Back" in body

    # step 3: view the produced frame — executes through the cache
    r = client.get(f"/view/0/0/{q}")
    assert r.status_code == 200
    body = r.get_data(as_text=True)
    assert "<table>" in body and "docs.id" in body

    # the cache now holds the frame: later pages are parquet reads
    assert client.get(f"/view/1/0/{q}").status_code == 200

    # step 4: CSV download of page 0
    r = client.get(f"/download/csv/0/{q}")
    assert r.status_code == 200
    assert r.mimetype == "text/csv"
    lines = r.get_data(as_text=True).strip().splitlines()
    assert lines[0].split(",")[0] in ("docs.id", "docs.text")
    assert len(lines) > 1


def test_view_is_served_from_cache_after_first_hit(served, tmp_path):
    from task_on_dataframes_spark.browse import BrowseState
    from task_on_dataframes_spark.cache import plan_key, ResultCache

    app, registry = served
    client = app.test_client()
    bs = BrowseState([], [], registry=registry)
    act = next(a for a in bs.further_actions([]) if a.Task == "get_docs")
    bs2 = bs.with_action(act)
    q = quote(bs2.to_url_q(), safe="")

    assert client.get(f"/view/0/0/{q}").status_code == 200
    key = plan_key(list(bs2.actions), ["frame=0"])
    cache = ResultCache(str(tmp_path / "cache"))
    assert cache.status(key) == "done"
