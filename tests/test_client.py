"""SeekClient — the `seekstorm_client` analog — driving a live server
through the full lifecycle (reference seekstorm_client tests shape:
create → index → query → update → delete → drop)."""

from __future__ import annotations

import pytest

from seekstorm_spark.client import SeekClient, SeekClientError
from seekstorm_spark.server import serve_in_thread


@pytest.fixture()
def client(spark, tmp_path):
    srv, _t = serve_in_thread(
        spark,
        {},
        port=0,
        writable=True,
        index_root=str(tmp_path / "root"),
        admin_key="master-secret",
    )
    c = SeekClient(
        f"http://127.0.0.1:{srv.server_address[1]}",
        admin_key="master-secret",
    )
    yield c
    srv.shutdown()


def test_full_lifecycle(client):
    assert client.live()["status"] == "ok"
    assert client.indices() == []

    client.create_index("c1")
    assert client.indices() == ["c1"]

    r = client.index_documents(
        "c1",
        [
            {"url": "u1", "text": "klaxon alpha beta"},
            {"url": "u2", "text": "klaxon gamma"},
            {"url": "u3", "text": "unrelated words"},
        ],
    )
    assert r["staged"] == 3

    # realtime-visible pre-commit
    res = client.query("c1", "klaxon", top_k=10)
    assert len(res["results"]) == 2
    assert client.count("c1", "klaxon") == 2

    client.commit("c1")
    post = client.query("c1", "klaxon", top_k=10)
    assert {x["docid"] for x in post["results"]} == {
        x["docid"] for x in res["results"]
    }

    # batch queries fuse into one action server-side
    batch = client.query_batch("c1", ["klaxon", "unrelated"], top_k=5)
    assert len(batch["results"]) == 2

    # iterator pages over live docids
    it = client.iterator("c1", take=10)
    assert len(it["docids"]) == 3

    # update = delete old + stage replacement
    victim = min(x["docid"] for x in post["results"])
    client.update_documents(
        "c1", [{"url": "u1", "text": "klaxon delta"}], [victim]
    )
    assert client.count("c1", "klaxon") == 2

    # delete by query
    client.delete_by_query("c1", "unrelated")
    res2 = client.query("c1", "unrelated", top_k=10)
    assert res2["results"] == []

    # synonyms set + add (PUT) + get
    client.set_synonyms("c1", [{"terms": ["car", "auto"], "multiway": True}])
    client.add_synonyms("c1", [{"terms": ["fast", "quick"]}])
    assert [g["terms"] for g in client.get_synonyms("c1")] == [
        ["car", "auto"], ["fast", "quick"]
    ]

    # clear keeps the index, drops the docs
    client.clear_index("c1")
    assert client.count("c1", "klaxon") == 0

    client.delete_index("c1")
    assert client.indices() == []


def test_pdf_roundtrip_and_errors(client):
    from seekstorm_spark.sources.pdf import build_pdf

    client.create_index("pdfs")
    pdf = build_pdf(
        ["quobble page one", "quobble page two"],
        title="Client PDF",
        creation_date="D:20230102030405Z",
    )
    r = client.index_pdf("pdfs", pdf, file_path="a/b.pdf", date=55)
    assert r["title"] == "Client PDF"
    docid = r["docid"]
    assert client.get_pdf("pdfs", docid) == pdf
    res = client.query("pdfs", "quobble", top_k=5)
    assert [x["docid"] for x in res["results"]] == [docid]

    # error mapping: 404 file, 400 bad payload, 404 unknown index
    with pytest.raises(SeekClientError) as ei:
        client.get_pdf("pdfs", 999999)
    assert ei.value.status == 404
    with pytest.raises(SeekClientError) as ei:
        client.index_pdf("pdfs", b"not a pdf")
    assert ei.value.status == 400
    with pytest.raises(SeekClientError) as ei:
        client.query("nope", "x")
    assert ei.value.status == 404
    client.delete_index("pdfs")


def test_api_key_flow(client):
    client.create_index("locked")
    client.index_documents("locked", [{"url": "u", "text": "sealed word"}])
    client.set_api_key("locked", "tok-123")

    # keyless client is rejected; keyed client passes
    with pytest.raises(SeekClientError) as ei:
        client.query("locked", "sealed")
    assert ei.value.status == 401
    keyed = SeekClient(client.base_url, api_key="tok-123",
                       admin_key=client.admin_key)
    assert keyed.count("locked", "sealed") == 1
    wrong = SeekClient(client.base_url, api_key="bad")
    with pytest.raises(SeekClientError) as ei:
        wrong.query("locked", "sealed")
    assert ei.value.status == 403

    # apikey_info lists the index this key protects
    info = keyed.apikey_info()
    assert [i["name"] for i in info["indices"]] == ["locked"]

    keyed.delete_api_key("locked")
    assert client.count("locked", "sealed") == 1  # open again
    keyed.delete_index("locked")
