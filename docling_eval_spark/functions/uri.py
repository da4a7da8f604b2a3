"""Local-filesystem URI handling shared by every site that must
decide "is this path on MY disk and safe to touch with os/shutil".

One rule, one place: `sources/bucketed.py` (orphan cleanup + catalog
ownership check) and `operators/text_analysis.py` (postings scratch
reclamation) previously each inlined the file:-prefix strip; a future
change to the rule (new scheme, single-slash quirks) must not be able
to make the guards disagree about path identity.
"""

from __future__ import annotations


def local_path_of(uri: str) -> str | None:
    """Filesystem path for a bare path / ``file:`` / ``file://`` URI,
    else None (hdfs/s3/... — remote storage the caller must manage
    through its own filesystem API, never os/shutil).

    Handles all three local spellings Spark emits: ``/p``,
    ``file:/p`` (single slash — Hadoop Path.toString), and
    ``file:///p`` — plus the RFC 8089 authority form
    ``file://localhost/p``. A non-localhost authority
    (``file://nas01/p``) names a REMOTE host: that is not a local
    path, so it returns None rather than the cwd-relative garbage a
    naive prefix strip would yield."""
    path = uri
    if path.startswith("file://"):
        rest = path[7:]
        if rest.startswith("/") or rest == "":
            path = rest
        else:
            authority, sep, tail = rest.partition("/")
            if not sep or authority.lower() != "localhost":
                return None
            path = "/" + tail
    elif path.startswith("file:"):
        path = path[5:]
    if "://" in path:
        return None
    return path
