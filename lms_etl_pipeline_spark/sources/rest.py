"""REST source connector (reference S1/S2/S3: authenticated LMS API scans,
``/root/reference/src/lms_to_s3_lambda.py:16-66``).

Driver-side fetch -> ``spark.createDataFrame(rows, schema)`` with an
EXPLICIT schema — the Lambda-parity shape (the reference pulls one
department snapshot per run; a driver-side fetch is the honest design for
that volume).  For genuinely large REST corpora the same ``RestSource``
endpoint/params contract would back a DataSource V2 reader with
``SupportsPushDownFilters``; the pushdown *transport* is already here:
``filters`` renders to the API's OData-style ``_filter`` query param
(reference O1) so predicates ship to the server, not into Spark.

stdlib ``urllib`` only — no third-party HTTP dependency; TLS/headers/token
semantics mirror the reference (``x-api-key`` + ``x-api-version`` headers,
bearer token after authenticate).
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: logical name -> endpoint template (reference S3 routing,
#: lms_to_s3_lambda.py:54-66).  ``{course_id}`` is filled from params.
ENDPOINTS: dict[str, str] = {
    "enrollments": "/learn/api/public/v1/courses/{course_id}/users",
    "sessions": "/learn/api/public/v1/sessions",
    "courses": "/learn/api/public/v1/courses",
    "users": "/learn/api/public/v1/users",
    "list_users": "/learn/api/public/v1/users",
}

#: keys the reference strips before flattening (O2).
PAGINATION_KEYS: tuple[str, ...] = ("totalItems", "limit", "offset", "returnedItems")


@dataclass
class RestSource:
    """Thin authenticated JSON-over-HTTP source.

    ``base_url`` points at the API root; ``api_key``/``api_version`` go out
    as headers on every call (reference S1).  The access token is cached
    per instance — one authenticate per batch, like the reference.
    """

    base_url: str
    api_key: str = ""
    api_version: str = "2"
    timeout: float = 30.0
    _token: str | None = field(default=None, repr=False)

    # -- S1: authenticate ---------------------------------------------------
    def authenticate(self, username: str, password: str, private_key: str = "") -> str:
        payload = json.dumps(
            {"userName": username, "password": password, "privateKey": private_key}
        ).encode()
        req = urllib.request.Request(
            f"{self.base_url}/authenticate",
            data=payload,
            headers=self._headers(),
            method="POST",
        )
        body = self._call(req)
        self._token = body["access_token"]
        return self._token

    # -- S2: JSON scan with pushed filter -----------------------------------
    def fetch(
        self,
        endpoint: str,
        params: dict[str, str] | None = None,
        filters: dict[str, str] | None = None,
    ) -> dict[str, Any]:
        """GET one JSON page.  ``filters`` renders to the OData-ish
        ``_filter`` param (``{"departmentId": "X"}`` ->
        ``_filter=departmentId eq 'X'``) — predicate pushdown by transport,
        with the value actually interpolated (the reference shipped the
        literal string ``'department_id'``; SURVEY §2.2 O1)."""
        q = dict(params or {})
        if filters:
            q["_filter"] = " and ".join(f"{k} eq '{v}'" for k, v in filters.items())
        url = f"{self.base_url}{endpoint}"
        if q:
            url += "?" + urllib.parse.urlencode(q)
        req = urllib.request.Request(url, headers=self._headers(), method="GET")
        return self._call(req)

    # -- S3: routing + DataFrame assembly -----------------------------------
    def read_table(
        self,
        spark: SparkSession,
        logical_name: str,
        schema: T.StructType,
        rows_key: str = "users",
        params: dict[str, str] | None = None,
        filters: dict[str, str] | None = None,
    ) -> DataFrame:
        """Scan a logical table (S3 name routing) into a typed DataFrame.

        Pagination metadata is dropped (O2); nested objects survive as
        struct columns for ``etl.flatten_struct`` (O3).  Explicit schema
        only — inference over an API response is nondeterministic.
        """
        endpoint = ENDPOINTS[logical_name].format(**(params or {}))
        doc = self.fetch(endpoint, params=None, filters=filters)
        for k in PAGINATION_KEYS:
            doc.pop(k, None)
        rows = doc.get(rows_key, doc.get("results", []))
        return spark.createDataFrame(rows, schema)

    # -- plumbing -----------------------------------------------------------
    def _headers(self) -> dict[str, str]:
        h = {"Content-Type": "application/json"}
        if self.api_key:
            h["x-api-key"] = self.api_key
        if self.api_version:
            h["x-api-version"] = self.api_version
        if self._token:
            h["Authorization"] = f"Bearer {self._token}"
        return h

    def _call(self, req: urllib.request.Request) -> dict[str, Any]:
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            if resp.status != 200:
                raise RuntimeError(f"REST source HTTP {resp.status} for {req.full_url}")
            return json.loads(resp.read().decode())
