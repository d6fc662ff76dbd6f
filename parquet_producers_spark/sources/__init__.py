"""Input layer: snapshot-manifest tables (the Iceberg-shaped source).

See :mod:`.snapshots` — atomic manifest commits, manifest-driven scans
(never directory listings), time travel, and per-file stats that feed
the direct-scan encoder.
"""

from .snapshots import (  # noqa: F401
    commit_snapshot,
    list_snapshots,
    read_snapshot,
    snapshot_files,
)
