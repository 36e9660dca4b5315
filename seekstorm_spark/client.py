"""REST client for the seekstorm_spark server — the
`seekstorm_client` analog (reference
`/root/reference/seekstorm_client/src/api_endpoints.rs:26-1084`:
live, apikey CRUD/info, index create/delete/clear/commit/info,
document index/update/delete (single, batch, by query), PDF
index/get, get_document, iterator, query).

Stdlib-only (urllib), synchronous, one class per server. Index-scoped
requests carry the per-index bearer token when ``api_key`` is set;
apikey management uses the server's admin key (the reference's
master-apikey split).
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request


class SeekClientError(Exception):
    """Non-2xx response: carries the HTTP status and the server's
    JSON error message."""

    def __init__(self, status: int, message: str):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status
        self.message = message


class SeekClient:
    def __init__(
        self,
        base_url: str,
        api_key: str | None = None,
        admin_key: str | None = None,
        timeout: float = 120.0,
    ):
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.admin_key = admin_key
        self.timeout = timeout

    # -- plumbing ----------------------------------------------------

    def _req(
        self,
        method: str,
        path: str,
        body: dict | None = None,
        raw: bytes | None = None,
        headers: dict | None = None,
        token: str | None = None,
        binary_response: bool = False,
    ):
        hdrs = dict(headers or {})
        if raw is not None:
            data = raw
            hdrs.setdefault("Content-Type", "application/octet-stream")
        elif body is not None:
            data = json.dumps(body).encode()
            hdrs.setdefault("Content-Type", "application/json")
        else:
            data = None
        tok = token if token is not None else self.api_key
        if tok:
            hdrs.setdefault("Authorization", f"Bearer {tok}")
        req = urllib.request.Request(
            self.base_url + path, data=data, headers=hdrs, method=method
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                payload = r.read()
        except urllib.error.HTTPError as e:
            detail = e.read()
            try:
                msg = json.loads(detail).get("error", detail.decode())
            except (json.JSONDecodeError, UnicodeDecodeError):
                msg = detail.decode(errors="replace")
            raise SeekClientError(e.code, msg) from None
        return payload if binary_response else json.loads(payload)

    # -- server ------------------------------------------------------

    def live(self) -> dict:
        return self._req("GET", "/live")

    def indices(self) -> list[str]:
        return self._req("GET", "/indices")["indices"]

    def apikey_info(self) -> dict:
        return self._req("GET", "/apikey")

    # -- index lifecycle ----------------------------------------------

    def create_index(self, name: str, **options) -> dict:
        body: dict = {"name": name}
        if options:
            body["options"] = options
        return self._req("POST", "/indices", body=body)

    def delete_index(self, name: str) -> dict:
        return self._req("DELETE", f"/indices/{name}")

    def clear_index(self, name: str) -> dict:
        return self._req("POST", f"/indices/{name}/clear")

    def close_index(self, name: str) -> dict:
        return self._req("PUT", f"/indices/{name}")

    def commit(self, name: str) -> dict:
        return self._req("POST", f"/indices/{name}/commit")

    def index_info(self, name: str) -> dict:
        return self._req("GET", f"/indices/{name}/info")

    # -- documents ----------------------------------------------------

    def index_documents(self, name: str, docs: list[dict]) -> dict:
        return self._req(
            "POST", f"/indices/{name}/docs", body={"documents": docs}
        )

    def index_document(self, name: str, doc: dict) -> dict:
        return self.index_documents(name, [doc])

    def update_documents(
        self, name: str, docs: list[dict], old_docids: list[int]
    ) -> dict:
        return self._req(
            "PATCH",
            f"/indices/{name}/docs",
            body={"documents": docs, "old_docids": old_docids},
        )

    def delete_by_docid(self, name: str, docids: list[int]) -> dict:
        return self._req(
            "POST", f"/indices/{name}/delete", body={"docids": docids}
        )

    def delete_by_query(
        self, name: str, query: str, default_type: str = "union"
    ) -> dict:
        return self._req(
            "POST",
            f"/indices/{name}/delete",
            body={"query": query, "default_type": default_type},
        )

    def get_document(self, name: str, docid: int) -> dict:
        return self._req("GET", f"/indices/{name}/doc/{docid}")

    # -- PDF files ------------------------------------------------------

    def index_pdf(
        self,
        name: str,
        data: bytes,
        file_path: str = "",
        date: int | None = None,
    ) -> dict:
        hdrs = {"Content-Type": "application/pdf", "file": file_path}
        if date is not None:
            hdrs["date"] = str(int(date))
        return self._req(
            "POST", f"/indices/{name}/file", raw=data, headers=hdrs
        )

    def get_pdf(self, name: str, docid: int) -> bytes:
        return self._req(
            "GET", f"/indices/{name}/file/{docid}", binary_response=True
        )

    # -- query ----------------------------------------------------------

    def query(self, name: str, query: str, **opts) -> dict:
        return self._req(
            "POST",
            f"/indices/{name}/query",
            body={"query": query, **opts},
        )

    def query_batch(self, name: str, queries: list[str], **opts) -> dict:
        return self._req(
            "POST",
            f"/indices/{name}/query_batch",
            body={"queries": queries, **opts},
        )

    def count(self, name: str, query: str, **opts) -> int:
        return self._req(
            "POST",
            f"/indices/{name}/count",
            body={"query": query, **opts},
        )["matches"]

    def iterator(self, name: str, **opts) -> dict:
        return self._req("POST", f"/indices/{name}/iterator", body=opts)

    def suggest(self, name: str, prefix: str, k: int = 5) -> dict:
        from urllib.parse import quote

        return self._req(
            "GET", f"/indices/{name}/suggest?prefix={quote(prefix)}&k={k}"
        )

    def spell(self, name: str, term: str, max_edits: int = 2) -> dict:
        from urllib.parse import quote

        return self._req(
            "GET",
            f"/indices/{name}/spell?term={quote(term)}&max_edits={max_edits}",
        )

    # -- synonyms ---------------------------------------------------------

    def get_synonyms(self, name: str) -> list[dict]:
        return self._req("GET", f"/indices/{name}/synonyms")["synonyms"]

    def set_synonyms(self, name: str, groups: list[dict]) -> dict:
        return self._req(
            "POST",
            f"/indices/{name}/synonyms",
            body={"synonyms": groups},
        )

    def add_synonyms(self, name: str, groups: list[dict]) -> dict:
        # reference PUT /index/{id}/synonyms = add/merge
        return self._req(
            "PUT",
            f"/indices/{name}/synonyms",
            body={"synonyms": groups},
        )

    # -- api keys (admin) ---------------------------------------------------

    def set_api_key(
        self, name: str, token: str, rate_limit: int | None = None
    ) -> dict:
        body: dict = {"key": token}
        if rate_limit is not None:
            body["rate_limit"] = rate_limit
        return self._req(
            "POST",
            f"/indices/{name}/apikey",
            body=body,
            token=self.admin_key,
        )

    def delete_api_key(self, name: str) -> dict:
        return self._req(
            "DELETE", f"/indices/{name}/apikey", token=self.admin_key
        )
