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

__all__ = ["TableSource", "LocalTableSource", "GCSTableSource", "GCSClientProtocol"]


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
