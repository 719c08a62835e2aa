"""Pluggable table discovery: local filesystem and GCS listers behind one seam.

The reference wires discovery through a ``TableSource`` config ADT
(reference: config/Config.scala tableSource, TableProvider.scala:11-29):
``DiscoveryBucket`` pages GCS blobs and collects the first path segment
under the stream prefix (google/GCSOps.scala:14-44 paging walk, client
wrapper GCSClient.scala:6-17), while local roots just list subdirectories
(utils/FileOps.scala:7-15). Round 1 had only the local lister with no seam
— this module adds the protocol plus a GCS implementation written against
an injected client, tested with a fake exactly like the reference's
mockable-client spec (GCSOpsSpec.scala:13-15). The real google-cloud-storage
client is not in this container (and would be a network dependency); any
object with the same ``list_blobs`` shape — including the official client
wrapped in two lines — plugs in.
"""

from __future__ import annotations

from typing import Iterable, Protocol, runtime_checkable

from .cdc import DatastreamTable, discover_tables as _discover_local

__all__ = [
    "TableSource",
    "LocalTableSource",
    "GCSTableSource",
    "GCSClientProtocol",
    "GoogleCloudGCSClient",
    "make_table_source",
]


@runtime_checkable
class TableSource(Protocol):
    """Anything that can enumerate the source tables of a stream."""

    def list_tables(self) -> list[DatastreamTable]:  # pragma: no cover - protocol
        ...


class LocalTableSource:
    """Every subdirectory of the stream root is a table
    (reference: FileOps.scala:7-15 + TableProvider.scala:26-29)."""

    def __init__(self, root: str):
        self.root = root

    def list_tables(self) -> list[DatastreamTable]:
        return _discover_local(self.root)


@runtime_checkable
class GCSClientProtocol(Protocol):
    """The injected-client contract (reference: GCSClient.scala:6-17).

    ``list_blobs(bucket, prefix, page_token)`` returns one page:
    (blob names, next page token or None)."""

    def list_blobs(
        self, bucket: str, prefix: str, page_token: str | None
    ) -> tuple[Iterable[str], str | None]:  # pragma: no cover - protocol
        ...


class GCSTableSource:
    """Paging walk over ``gs://bucket/prefix``: collect the first path
    segment of every blob under the prefix (reference: GCSOps.scala:14-44 —
    same loop shape: request page, fold names, follow nextPageToken)."""

    def __init__(self, client: GCSClientProtocol, bucket: str, prefix: str):
        self.client = client
        self.bucket = bucket
        self.prefix = prefix.strip("/")

    @property
    def root(self) -> str:
        return f"gs://{self.bucket}/{self.prefix}"

    def list_tables(self) -> list[DatastreamTable]:
        names: set[str] = set()
        token: str | None = None
        while True:
            blobs, token = self.client.list_blobs(self.bucket, self.prefix + "/", token)
            for blob in blobs:
                rel = blob[len(self.prefix) + 1 :] if blob.startswith(self.prefix + "/") else blob
                seg = rel.split("/", 1)[0]
                if seg:
                    names.add(seg)
            if not token:
                break
        return [DatastreamTable(self.root, name) for name in sorted(names)]


class GoogleCloudGCSClient:
    """Adapter: the official ``google-cloud-storage`` ``Client`` →
    :class:`GCSClientProtocol` (reference: GCSClient.scala:6-17 constructs
    the Storage service the same way — default credentials, one client per
    job). One protocol call = one API page: ``Client.list_blobs`` returns an
    HTTP iterator whose ``pages`` generator fetches lazily, and consuming a
    page sets ``next_page_token`` — exactly the (names, token) contract
    GCSTableSource's paging walk folds over.

    The library is an optional dependency (absent in this container);
    constructing without it raises ImportError with the install hint.
    A pre-built client (or any duck-typed equivalent) can be injected for
    tests."""

    def __init__(self, client=None):
        if client is None:
            try:
                from google.cloud import storage  # type: ignore
            except ImportError as exc:  # pragma: no cover - env without lib
                raise ImportError(
                    "google-cloud-storage is required for table_source='gcs' "
                    "(pip install google-cloud-storage), or inject a client"
                ) from exc
            client = storage.Client()
        self._client = client

    def list_blobs(
        self, bucket: str, prefix: str, page_token: str | None
    ) -> tuple[Iterable[str], str | None]:
        it = self._client.list_blobs(bucket, prefix=prefix, page_token=page_token)
        try:
            page = next(it.pages)
        except StopIteration:  # empty listing: no pages at all
            return [], None
        return [b.name for b in page], it.next_page_token


def make_table_source(cfg, stream_root: str | None = None) -> TableSource:
    """Config-driven discovery dispatch (reference: TableProvider.scala:11-29
    choosing DiscoveryBucket vs local root from the config ADT).

    ``cfg``: a config.ConnectorConfig (or anything with ``table_source``,
    ``bucket``, ``prefix``); ``stream_root`` is required for 'local'."""
    if cfg.table_source == "gcs":
        if not cfg.bucket:
            raise ValueError("table_source='gcs' requires bucket")
        return GCSTableSource(GoogleCloudGCSClient(), cfg.bucket, cfg.prefix or "")
    if stream_root is None:
        raise ValueError("table_source='local' requires stream_root")
    return LocalTableSource(stream_root)
