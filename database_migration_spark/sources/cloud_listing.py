"""Cloud object-store listings feeding the manifest state machine.

Reference: /root/reference/s3_to_exasol.sql:4-72 (S3_GET_FILENAMES — boto3
``list_objects_v2`` paginated via ContinuationToken, fnmatch on
folder+filter, directory-marker keys skipped, FILE_LAST_MODIFIED emitted so
re-uploaded files re-import) and /root/reference/
azure_blob_storage_to_exasol.sql:4-34 (AZURE_GET_FILENAMES —
``list_blobs(name_starts_with=...)`` + fnmatch).

The listers take an INJECTED client object shaped like the respective SDK
(boto3 s3 client / azure ContainerClient) — the cloud SDKs are not installed
in every environment and unit tests drive the full pagination/filter/
state-machine path through fakes. ``from_boto3`` / ``from_azure`` factories
construct real clients when the SDKs are present.

Rows are normalized to the ``list_local_files`` shape
(file_name, last_modified: epoch float, size) with Spark-native URIs
(s3a:// / wasbs://), so :class:`ManifestLoader` consumes any lister
unchanged — at scale the actual data read is a single distributed
``spark.read`` over the pending URI batch, never a driver-side download.
"""

from __future__ import annotations

import fnmatch
from typing import Callable, Iterable

ListingRow = dict  # {"file_name": str, "last_modified": float, "size": int}


def _epoch(ts) -> float:
    """LastModified → epoch seconds; the reference strips tzinfo, we keep
    the instant (tz-aware datetimes compare fine as epochs)."""
    if isinstance(ts, (int, float)):
        return float(ts)
    return ts.timestamp()


class S3Lister:
    """boto3-shaped listing (s3_to_exasol.sql:44-72 semantics).

    ``client`` must provide ``list_objects_v2(Bucket=..., [ContinuationToken=...])``
    returning {'Contents': [{'Key','LastModified','Size'}, ...],
    'NextContinuationToken': ...} — the boto3 response shape.
    """

    def __init__(self, client, bucket: str, scheme: str = "s3a"):
        self.client = client
        self.bucket = bucket
        self.scheme = scheme

    def __call__(self, folder_name: str = "", filter_string: str = "*") -> list[ListingRow]:
        # empty folder → '*' so the combined fnmatch pattern still works
        # (s3_to_exasol.sql:53-55); the reference concatenates folder+filter
        folder = folder_name or "*"
        # a glob-free folder is a literal key prefix: push it down as
        # Prefix so S3 lists only that subtree instead of the whole bucket.
        # Only when the fnmatch filter is active — with an empty
        # filter_string the reference's semantics are "list EVERYTHING,
        # folder ignored" (s3:53-55), and a Prefix would change the result.
        prefix = (
            folder_name
            if filter_string and not any(ch in folder_name for ch in "*?[")
            else ""
        )
        out: list[ListingRow] = []
        token = None
        while True:
            kwargs = {"Bucket": self.bucket}
            if prefix:
                kwargs["Prefix"] = prefix
            if token:
                kwargs["ContinuationToken"] = token
            resp = self.client.list_objects_v2(**kwargs)
            for key in resp.get("Contents", []):
                name = key["Key"]
                if filter_string and not fnmatch.fnmatch(name, folder + filter_string):
                    continue
                if name.endswith("/"):  # directory marker keys (s3:58)
                    continue
                out.append(
                    {
                        "file_name": f"{self.scheme}://{self.bucket}/{name}",
                        "last_modified": _epoch(key["LastModified"]),
                        "size": int(key.get("Size", 0)),
                    }
                )
            token = resp.get("NextContinuationToken")
            if not token:
                break
        return sorted(out, key=lambda d: d["file_name"])


class AzureBlobLister:
    """Azure-shaped listing (azure_blob_storage_to_exasol.sql:18-34).

    ``container_client`` must provide ``list_blobs(name_starts_with=...)``
    yielding objects with ``.name``, ``.last_modified``, ``.size``.
    """

    def __init__(self, container_client, container: str, account: str = "", scheme: str = "wasbs"):
        self.client = container_client
        self.container = container
        self.account = account
        self.scheme = scheme

    def __call__(self, folder_name: str = "", filter_string: str = "*") -> list[ListingRow]:
        host = f"@{self.account}" if self.account else ""
        out: list[ListingRow] = []
        for blob in self.client.list_blobs(name_starts_with=folder_name):
            if filter_string and not fnmatch.fnmatch(blob.name, filter_string):
                continue
            out.append(
                {
                    "file_name": f"{self.scheme}://{self.container}{host}/{blob.name}",
                    "last_modified": _epoch(blob.last_modified),
                    "size": int(getattr(blob, "size", 0) or 0),
                }
            )
        return sorted(out, key=lambda d: d["file_name"])


def from_boto3(bucket: str, **client_kwargs) -> S3Lister:
    """Real-SDK factory (import-gated: boto3 is absent in this env)."""
    try:
        import boto3
    except ImportError as e:  # pragma: no cover
        raise ImportError("boto3 not installed; inject a client into S3Lister") from e
    return S3Lister(boto3.client("s3", **client_kwargs), bucket)


def from_azure(connection_string: str, container: str) -> AzureBlobLister:  # pragma: no cover
    """Real-SDK factory (import-gated: azure-storage-blob absent here)."""
    try:
        from azure.storage.blob import BlobServiceClient
    except ImportError as e:
        raise ImportError(
            "azure-storage-blob not installed; inject a container client"
        ) from e
    svc = BlobServiceClient.from_connection_string(connection_string)
    return AzureBlobLister(svc.get_container_client(container), container)
