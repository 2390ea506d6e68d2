"""Iceberg REST catalog client — the published REST Catalog OpenAPI
(`rest-catalog-open-api.yaml` in apache/iceberg), jar-free over
urllib.

Reference surface: the reference reaches Iceberg through pyiceberg
catalogs (REST/Hive/Glue) — `deltacat/experimental/storage/iceberg/`;
this sandbox has no network, so the client is exercised against a
stdlib HTTP stub serving the spec JSON shapes
(`tests/test_iceberg_rest.py`). Endpoints implemented:

    GET  {uri}/v1/config?warehouse=…            → defaults/overrides
                                                  (prefix resolution)
    GET  {uri}/v1/{prefix}/namespaces           → {"namespaces": [[…]]}
    GET  …/namespaces/{ns}/tables               → {"identifiers": […]}
    GET  …/namespaces/{ns}/tables/{name}        → LoadTableResult
                                                  (metadata-location,
                                                  metadata, config)
    POST …/namespaces/{ns}/tables/{name}        → CommitTableRequest
                                                  (requirements +
                                                  updates; 409 =
                                                  CommitFailed)

Multi-level namespaces encode with the unit separator 0x1F between
levels per the spec. Bearer-token auth via the `token` argument.
`read_table` hands the LoadTableResult's METADATA to `read_iceberg`
(the catalog owns the current-metadata pointer; the data/manifest
planes read from the table location) — only local/file locations are
servable in this sandbox; remote object-store locations refuse with a
named error.

Scale shape: one metadata round-trip per table load, exactly
pyiceberg's model; everything after resolution is the normal
manifest-replay read.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_NS_SEP = "\x1f"


class IcebergRestError(RuntimeError):
    def __init__(self, status: int, message: str):
        super().__init__(f"REST catalog error {status}: {message}")
        self.status = status


class IcebergRestCatalog:
    """One catalog endpoint. `prefix` usually comes back from the
    /v1/config handshake (override wins); pass explicitly to skip it."""

    def __init__(
        self,
        uri: str,
        token: str | None = None,
        warehouse: str | None = None,
        prefix: str | None = None,
    ):
        self.uri = uri.rstrip("/")
        self.token = token
        if prefix is None:
            q = (
                "?" + urllib.parse.urlencode({"warehouse": warehouse})
                if warehouse
                else ""
            )
            cfg = self._get(f"/v1/config{q}")
            merged = dict(cfg.get("defaults") or {})
            merged.update(cfg.get("overrides") or {})
            prefix = merged.get("prefix", "")
        self.prefix = prefix.strip("/")

    # -- plumbing ----------------------------------------------------------
    def _request(self, path: str, body: dict | None = None) -> dict:
        data = (
            json.dumps(body).encode("utf-8") if body is not None else None
        )
        req = urllib.request.Request(
            self.uri + path,
            data=data,
            method="POST" if body is not None else "GET",
        )
        if body is not None:
            req.add_header("Content-Type", "application/json")
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        try:
            with urllib.request.urlopen(req, timeout=30) as r:
                return json.loads(r.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            raw = e.read().decode("utf-8", "replace")[:300]
            raise IcebergRestError(e.code, raw or e.reason) from None

    def _get(self, path: str) -> dict:
        return self._request(path)

    def _post(self, path: str, body: dict) -> dict:
        return self._request(path, body)

    def _p(self, path: str) -> str:
        pre = f"/{self.prefix}" if self.prefix else ""
        return f"/v1{pre}{path}"

    @staticmethod
    def _ns(namespace: "str | list[str]") -> str:
        levels = (
            namespace.split(".")
            if isinstance(namespace, str)
            else list(namespace)
        )
        return urllib.parse.quote(_NS_SEP.join(levels), safe="")

    # -- catalog surface -----------------------------------------------------
    def list_namespaces(self) -> list[list[str]]:
        return self._get(self._p("/namespaces")).get("namespaces", [])

    def list_tables(self, namespace: "str | list[str]") -> list[str]:
        out = self._get(
            self._p(f"/namespaces/{self._ns(namespace)}/tables")
        )
        return [i["name"] for i in out.get("identifiers", [])]

    def load_table(
        self, namespace: "str | list[str]", name: str
    ) -> dict:
        """The spec LoadTableResult: {metadata-location?, metadata,
        config?}."""
        return self._get(
            self._p(
                f"/namespaces/{self._ns(namespace)}/tables/"
                f"{urllib.parse.quote(name, safe='')}"
            )
        )

    def table_exists(
        self, namespace: "str | list[str]", name: str
    ) -> bool:
        try:
            self.load_table(namespace, name)
            return True
        except IcebergRestError as e:
            if e.status == 404:
                return False
            raise

    # -- write (CommitTableRequest protocol) ---------------------------------
    def commit_table(
        self,
        namespace: "str | list[str]",
        name: str,
        requirements: list[dict],
        updates: list[dict],
    ) -> dict:
        """POST the spec CommitTableRequest — the catalog validates
        `requirements` against its CURRENT metadata (409 = another
        writer won; this client surfaces it as IcebergRestError 409 —
        retry from a fresh load) and applies `updates` atomically.
        Returns the CommitTableResponse (metadata-location, metadata)."""
        levels = (
            namespace.split(".")
            if isinstance(namespace, str)
            else list(namespace)
        )
        return self._post(
            self._p(
                f"/namespaces/{self._ns(namespace)}/tables/"
                f"{urllib.parse.quote(name, safe='')}"
            ),
            {
                "identifier": {"namespace": levels, "name": name},
                "requirements": requirements,
                "updates": updates,
            },
        )

    def append_table(
        self,
        spark: SparkSession,
        namespace: "str | list[str]",
        name: str,
        df: DataFrame,
        retries: int = 0,
    ) -> int:
        """Append through the REST commit protocol the way a real
        engine does: data files + manifests + the new snapshot write
        CLIENT-SIDE into the table location, then the METADATA POINTER
        advances via CommitTableRequest guarded by
        `assert-ref-snapshot-id` on `main` — a commit that landed since
        our load makes the catalog answer 409 instead of silently
        losing either writer's snapshot. Returns the snapshot id.

        The CATALOG pointer is authoritative, the local version-hint is
        a cache (r14): when they diverge — a prior append whose REST
        commit 409'd left the losing snapshot current locally, or
        another writer advanced the catalog — the catalog's metadata is
        materialized as the next local version BEFORE writing, so the
        new manifest list carries exactly the catalog-committed
        manifests forward (never the loser's). A 409 on THIS commit
        rolls the locally written metadata version back, keeping local
        state converged for the retry. `retries` (r14) re-runs the
        whole load→rebase→write→commit cycle after a 409 up to N more
        times — safe-by-construction because each attempt rebases onto
        the fresh catalog state."""
        for attempt in range(retries + 1):
            try:
                return self._append_table_once(spark, namespace, name, df)
            except IcebergRestError as e:
                if e.status != 409 or attempt == retries:
                    raise
        raise AssertionError("unreachable")

    def _append_table_once(
        self,
        spark: SparkSession,
        namespace: "str | list[str]",
        name: str,
        df: DataFrame,
    ) -> int:
        import os

        from deltacat_spark.sources.iceberg import (
            IcebergTable,
            _commit_metadata,
            write_iceberg,
        )

        result = self.load_table(namespace, name)
        meta = result.get("metadata") or {}
        root = table_location_path(meta)
        prev_sid = meta.get("current-snapshot-id")

        ltbl = IcebergTable(root)
        pre_version: int | None = None
        if ltbl.exists():
            pre_version = ltbl.current_version()
            if ltbl.metadata().get("current-snapshot-id") != prev_sid:
                # diverged: rebase the local cache onto the catalog's
                # authoritative state (loaded_version was just set by
                # metadata(), so this CAS-commits as pre_version + 1)
                _commit_metadata(ltbl, dict(meta))
                pre_version = ltbl.current_version()
        elif meta.get("snapshots") or prev_sid is not None:
            # catalog knows committed state but the location has no
            # local metadata yet — materialize it, or write_iceberg
            # would start a fresh v1 table that drops catalog history
            os.makedirs(ltbl._meta_dir(), exist_ok=True)
            ltbl.loaded_version = 0
            _commit_metadata(ltbl, dict(meta))
            pre_version = ltbl.current_version()

        new_sid = write_iceberg(df, root, mode="append")
        ntbl = IcebergTable(root)
        new_meta = ntbl.metadata()
        new_version = ntbl.loaded_version
        snap = next(
            s
            for s in new_meta["snapshots"]
            if s["snapshot-id"] == new_sid
        )
        try:
            self.commit_table(
                namespace,
                name,
                requirements=[
                    {
                        "type": "assert-ref-snapshot-id",
                        "ref": "main",
                        "snapshot-id": prev_sid,
                    }
                ],
                updates=[
                    {"action": "add-snapshot", "snapshot": snap},
                    {
                        "action": "set-snapshot-ref",
                        "ref-name": "main",
                        "type": "branch",
                        "snapshot-id": new_sid,
                    },
                ],
            )
        except IcebergRestError:
            # the catalog rejected the pointer move — roll the local
            # metadata version back so the losing snapshot does not
            # masquerade as current (data files stay; they are orphans
            # until a retry or vacuum)
            if new_version is not None:
                try:
                    os.remove(
                        os.path.join(
                            ltbl._meta_dir(),
                            f"v{new_version}.metadata.json",
                        )
                    )
                except FileNotFoundError:
                    pass
                hint = os.path.join(
                    ltbl._meta_dir(), "version-hint.text"
                )
                if pre_version is not None:
                    with open(hint, "w") as f:
                        f.write(str(pre_version))
                elif os.path.isfile(hint):
                    os.remove(hint)
            raise
        return new_sid

    # -- read ----------------------------------------------------------------
    def read_table(
        self,
        spark: SparkSession,
        namespace: "str | list[str]",
        name: str,
        **read_kwargs: Any,
    ) -> DataFrame:
        """Catalog-resolved `read_iceberg`: the REST LoadTableResult's
        metadata is authoritative (the catalog owns the current
        pointer — a version-hint file may be stale or absent)."""
        from deltacat_spark.sources.iceberg import read_iceberg

        result = self.load_table(namespace, name)
        meta = result.get("metadata")
        if not meta:
            raise ValueError(
                f"LoadTableResult for {namespace}.{name} carries no "
                "metadata"
            )
        root = table_location_path(meta)
        return read_iceberg(spark, root, metadata=meta, **read_kwargs)


def table_location_path(meta: dict) -> str:
    """Table `location` → local filesystem path. Object-store schemes
    need their connectors (env-blocked here) — refuse loudly rather
    than misread."""
    loc = meta.get("location") or ""
    parsed = urllib.parse.urlparse(loc)
    if parsed.scheme in ("", "file"):
        return parsed.path or loc
    raise NotImplementedError(
        f"table location scheme {parsed.scheme!r} needs an object-store "
        "connector that is not available in this environment (local/"
        "file locations are supported)"
    )
