"""Loopback Iceberg REST catalog server (spec subset, dev/test).

The Iceberg REST catalog protocol is a public OpenAPI spec
(`rest-catalog-open-api.yaml` in the Iceberg repo); production
catalogs (Polaris, Lakekeeper, Unity, Glue-REST, Nessie) speak it,
and it is the catalog a modern deployment most often points an
engine at. This module is an in-process loopback implementation of
the subset :class:`bergloom_spark.lake.catalog.RestCatalog` needs —
enough protocol to test the client adapter end-to-end without
network access:

- ``GET  /v1/config`` — catalog config (prefix handshake)
- ``GET  /v1/{prefix}/namespaces/{ns}/tables`` — list
- ``GET  /v1/{prefix}/namespaces/{ns}/tables/{t}`` — loadTable
- ``POST /v1/{prefix}/namespaces/{ns}/register`` — registerTable
- ``POST /v1/{prefix}/namespaces/{ns}/tables/{t}`` — commit
  (CommitTableRequest: requirements + updates)
- ``DELETE /v1/{prefix}/namespaces/{ns}/tables/{t}`` — dropTable

The commit endpoint is the protocol's CAS: requirements are checked
against the server's CURRENT state under one lock (the stand-in for
a real service's transactional backend), a failed requirement is
``409 Conflict``, and on success the server applies the updates to a
working copy of the current metadata, writes the result as a NEW
metadata JSON file under its spool directory, and returns the new
``metadata-location`` — exactly the flow `iceberg-rs`/Spark drive
against a real REST catalog (reference analog: any ``dyn Catalog``
slots into ``compaction/mod.rs:226``).

Supported update actions (the set a full-tree replacement or a
rewrite commit decomposes into): assign-uuid,
upgrade-format-version, set-location, add-schema,
set-current-schema, add-partition-spec, set-default-spec,
add-sort-order, set-default-sort-order, set-properties,
remove-properties, add-snapshot, set-snapshot-ref,
remove-snapshot-ref, remove-snapshots.

Supported requirements: assert-create, assert-table-uuid,
assert-ref-snapshot-id.

This is a STUB in the same sense the reference's mock executor is
(`executor/mock.rs:22-29`): real protocol, simplified bookkeeping —
same-id add-schema/add-snapshot replaces rather than erroring, and
history logs are not maintained.
"""

from __future__ import annotations

import http.server
import itertools
import json
import os
import re
import threading
import uuid as _uuid


class _RequirementFailed(Exception):
    pass


def _apply_update(md: dict, u: dict) -> None:
    """Apply one spec update action to metadata dict ``md`` in place."""
    a = u.get("action")
    if a == "assign-uuid":
        md["table-uuid"] = u["uuid"]
    elif a == "upgrade-format-version":
        md["format-version"] = u["format-version"]
    elif a == "set-location":
        md["location"] = u["location"]
    elif a == "add-schema":
        sch = u["schema"]
        schemas = [
            s for s in md.get("schemas", [])
            if s.get("schema-id") != sch.get("schema-id")
        ]
        schemas.append(sch)
        md["schemas"] = schemas
        md["last-added-schema-id"] = sch.get("schema-id")
    elif a == "set-current-schema":
        sid = u["schema-id"]
        if sid == -1:
            sid = md.get("last-added-schema-id")
        md["current-schema-id"] = sid
    elif a == "add-partition-spec":
        sp = u["spec"]
        specs = [
            s for s in md.get("partition-specs", [])
            if s.get("spec-id") != sp.get("spec-id")
        ]
        specs.append(sp)
        md["partition-specs"] = specs
        md["last-added-spec-id"] = sp.get("spec-id")
    elif a == "set-default-spec":
        sid = u["spec-id"]
        if sid == -1:
            sid = md.get("last-added-spec-id")
        md["default-spec-id"] = sid
    elif a == "add-sort-order":
        so = u["sort-order"]
        orders = [
            s for s in md.get("sort-orders", [])
            if s.get("order-id") != so.get("order-id")
        ]
        orders.append(so)
        md["sort-orders"] = orders
        md["last-added-order-id"] = so.get("order-id")
    elif a == "set-default-sort-order":
        oid = u["sort-order-id"]
        if oid == -1:
            oid = md.get("last-added-order-id")
        md["default-sort-order-id"] = oid
    elif a == "set-properties":
        md.setdefault("properties", {}).update(u.get("updates", {}))
    elif a == "remove-properties":
        for k in u.get("removals", []):
            md.get("properties", {}).pop(k, None)
    elif a == "add-snapshot":
        snap = u["snapshot"]
        snaps = [
            s for s in md.get("snapshots", [])
            if s.get("snapshot-id") != snap.get("snapshot-id")
        ]
        snaps.append(snap)
        md["snapshots"] = snaps
        seq = snap.get("sequence-number")
        if isinstance(seq, int):
            md["last-sequence-number"] = max(
                md.get("last-sequence-number", 0), seq
            )
    elif a == "set-snapshot-ref":
        name = u["ref-name"]
        ref = {
            "snapshot-id": u["snapshot-id"],
            "type": u.get("type", "branch"),
        }
        md.setdefault("refs", {})[name] = ref
        if name == "main":
            md["current-snapshot-id"] = u["snapshot-id"]
    elif a == "remove-snapshot-ref":
        name = u["ref-name"]
        md.get("refs", {}).pop(name, None)
        if name == "main":
            md["current-snapshot-id"] = None
    elif a == "remove-snapshots":
        drop = set(u.get("snapshot-ids", []))
        md["snapshots"] = [
            s for s in md.get("snapshots", [])
            if s.get("snapshot-id") not in drop
        ]
    else:
        raise ValueError(f"unsupported update action: {a!r}")


def _check_requirement(md: dict | None, r: dict) -> None:
    t = r.get("type")
    if t == "assert-create":
        if md is not None:
            raise _RequirementFailed("table already exists")
    elif t == "assert-table-uuid":
        if md is None or md.get("table-uuid") != r.get("uuid"):
            raise _RequirementFailed(
                f"uuid is {None if md is None else md.get('table-uuid')},"
                f" expected {r.get('uuid')}"
            )
    elif t == "assert-ref-snapshot-id":
        if md is None:
            raise _RequirementFailed("no such table")
        ref = md.get("refs", {}).get(r.get("ref"))
        have = None if ref is None else ref.get("snapshot-id")
        if have is None and r.get("ref") == "main":
            # spec: main implicitly tracks the current snapshot even
            # when a writer (like our v2 exporter) omits the refs map
            have = md.get("current-snapshot-id")
        if have == -1:
            have = None  # v1 "no snapshot" sentinel
        if have != r.get("snapshot-id"):
            raise _RequirementFailed(
                f"ref {r.get('ref')!r} at {have},"
                f" expected {r.get('snapshot-id')}"
            )
    else:
        raise ValueError(f"unsupported requirement: {t!r}")


class RestCatalogServer:
    """In-process threading HTTP server holding the catalog state.

    ``spool_dir`` is where committed metadata JSON files land; the
    returned ``metadata-location`` values point into it, so a client
    on the same machine (the loopback scenario) can read the trees
    directly — the same division of labor as a real REST catalog
    whose metadata lives in object storage.
    """

    def __init__(self, spool_dir: str, prefix: str = "bergloom") -> None:
        self.spool_dir = spool_dir
        self.prefix = prefix
        os.makedirs(spool_dir, exist_ok=True)
        self._lock = threading.Lock()
        # (ns, name) -> {"metadata": dict, "metadata-location": str}
        self._tables: dict[tuple[str, str], dict] = {}
        self._counter = itertools.count(1)
        self._httpd: http.server.ThreadingHTTPServer | None = None

    # -- lifecycle ----------------------------------------------------
    def start(self) -> str:
        """Bind 127.0.0.1:<ephemeral>, serve in a daemon thread,
        return the base URI."""
        server = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # noqa: D102 - silence
                pass

            def _reply(self, code: int, doc: dict) -> None:
                body = json.dumps(doc).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length") or 0)
                raw = self.rfile.read(n) if n else b"{}"
                return json.loads(raw or b"{}")

            def do_GET(self):
                self._route("GET")

            def do_POST(self):
                self._route("POST")

            def do_DELETE(self):
                self._route("DELETE")

            def _route(self, method: str) -> None:
                try:
                    code, doc = server.handle(
                        method, self.path,
                        self._body() if method == "POST" else {},
                    )
                except Exception as exc:  # noqa: BLE001 - stub surface
                    code, doc = 400, {
                        "error": {"message": str(exc), "type": "BadRequest"}
                    }
                self._reply(code, doc)

        self._httpd = http.server.ThreadingHTTPServer(
            ("127.0.0.1", 0), Handler
        )
        threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        ).start()
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

    # -- routing ------------------------------------------------------
    _TABLES_RE = re.compile(
        r"^/v1/(?P<prefix>[^/]+)/namespaces/(?P<ns>[^/]+)/tables"
        r"(?:/(?P<table>[^/]+))?$"
    )
    _REGISTER_RE = re.compile(
        r"^/v1/(?P<prefix>[^/]+)/namespaces/(?P<ns>[^/]+)/register$"
    )

    def handle(self, method: str, path: str, body: dict):
        """(status_code, response_doc) for one request."""
        if method == "GET" and path == "/v1/config":
            return 200, {
                "defaults": {},
                "overrides": {"prefix": self.prefix},
            }
        m = self._REGISTER_RE.match(path)
        if m and method == "POST":
            return self._register(m.group("ns"), body)
        m = self._TABLES_RE.match(path)
        if not m:
            return 404, self._err(404, f"no route {path}")
        ns, table = m.group("ns"), m.group("table")
        if table is None:
            if method == "GET":
                with self._lock:
                    names = sorted(
                        n for (s, n) in self._tables if s == ns
                    )
                return 200, {
                    "identifiers": [
                        {"namespace": [ns], "name": n} for n in names
                    ]
                }
            return 405, self._err(405, "method not allowed")
        if method == "GET":
            with self._lock:
                doc = self._tables.get((ns, table))
                if doc is None:
                    return 404, self._err(404, f"{ns}.{table} not found")
                return 200, {
                    "metadata-location": doc["metadata-location"],
                    "metadata": doc["metadata"],
                }
        if method == "DELETE":
            with self._lock:
                if self._tables.pop((ns, table), None) is None:
                    return 404, self._err(404, f"{ns}.{table} not found")
            return 204, {}
        if method == "POST":
            return self._commit(ns, table, body)
        return 405, self._err(405, "method not allowed")

    @staticmethod
    def _err(code: int, msg: str) -> dict:
        kind = {404: "NoSuchTableException",
                409: "CommitFailedException"}.get(code, "BadRequest")
        return {"error": {"message": msg, "type": kind, "code": code}}

    # -- operations ---------------------------------------------------
    def _register(self, ns: str, body: dict):
        name = body.get("name")
        loc = body.get("metadata-location")
        if not name or not loc:
            return 400, self._err(400, "name and metadata-location required")
        try:
            with open(loc) as f:
                md = json.load(f)
        except (OSError, json.JSONDecodeError) as exc:
            return 400, self._err(400, f"unreadable metadata: {exc}")
        if not isinstance(md, dict):
            return 400, self._err(400, "metadata must be a JSON object")
        with self._lock:
            if (ns, name) in self._tables:
                return 409, {
                    "error": {
                        "message": f"{ns}.{name} already exists",
                        "type": "AlreadyExistsException",
                        "code": 409,
                    }
                }
            self._tables[(ns, name)] = {
                "metadata": md,
                "metadata-location": loc,
            }
        return 200, {"metadata-location": loc, "metadata": md}

    def _commit(self, ns: str, table: str, body: dict):
        reqs = body.get("requirements", [])
        updates = body.get("updates", [])
        with self._lock:
            doc = self._tables.get((ns, table))
            create = any(
                r.get("type") == "assert-create" for r in reqs
            )
            if doc is None and not create:
                return 404, self._err(404, f"{ns}.{table} not found")
            current = None if doc is None else doc["metadata"]
            try:
                for r in reqs:
                    _check_requirement(current, r)
            except _RequirementFailed as exc:
                return 409, self._err(409, str(exc))
            md = json.loads(json.dumps(current)) if current else {}
            for u in updates:
                _apply_update(md, u)
            v = next(self._counter)
            loc = os.path.join(
                self.spool_dir, ns, table, "metadata",
                f"{v:05d}-{_uuid.uuid4().hex[:12]}.metadata.json",
            )
            os.makedirs(os.path.dirname(loc), exist_ok=True)
            tmp = loc + ".tmp"
            with open(tmp, "w") as f:
                json.dump(md, f)
            os.rename(tmp, loc)
            self._tables[(ns, table)] = {
                "metadata": md,
                "metadata-location": loc,
            }
        return 200, {"metadata-location": loc, "metadata": md}
