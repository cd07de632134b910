"""Named-source catalog + environment switch.

Reference equivalents:
  * ``config/config.sample.json:2-27`` — a catalog of named clusters keyed
    by CLI ``--read``/``--write`` (S10, run.ts:23-39).
  * ``constants.ts:1-21`` — index patterns as table names, with
    ``remote_cluster:``-prefixed cross-cluster variants selected by the
    ``ES_IS_CCS`` env var (S3).

Here a *catalog* maps logical source names to parquet directories (or any
Spark-readable path/glob); "cross-cluster" is just an alternate path prefix
chosen by an env switch.  On a real deployment these would be object-store
URIs (s3a://...) or an Elasticsearch DataSourceV2 resource string — the
DataFrame plans downstream are identical either way.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Logical "index pattern" tables (constants.ts:1-2).  In the fixture
#: mapping (FIXTURES.md §2) both signal streams live in events.parquet;
#: the catalog still models them as distinct logical sources so multi-source
#: union scans (S4, lib/collectPods.ts:13) stay observable in plans.
LOGS_INDICES = "logs"
APM_INDICES = "apm"


@dataclass
class Catalog:
    """Maps logical source names → storage paths (run.ts:28-37 analog)."""

    root: str = DEFAULT_SF_DIR
    #: remote-cluster root used when ``cross_cluster`` is set (constants.ts:4-5)
    remote_root: str | None = None
    cross_cluster: bool = field(
        default_factory=lambda: os.environ.get("ES_IS_CCS", "").lower() == "true"
    )
    #: write-side root; defaults to read side (run.ts:36-37: write ?? read)
    write_root: str | None = None

    def source_path(self, table: str) -> str:
        root = self.remote_root if (self.cross_cluster and self.remote_root) else self.root
        return f"{root}/{table}.parquet"

    def sink_path(self, name: str) -> str:
        return f"{self.write_root or self.root}/{name}"
