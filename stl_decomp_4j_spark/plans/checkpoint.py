"""Checkpoint/resume manifest for the rollup pipeline.

Work is sliced into url-hash buckets (``pmod(xxhash64(url), n_buckets)``).
Each completed bucket appends a manifest row (run_id, bucket, status, rows,
wall seconds); a resumed run plans only buckets without a 'done' row and
rewrites their output partitions idempotently (dynamic partition overwrite /
Iceberg overwritePartitions).  Lineage: every output row carries run_id and
bucket.
"""
from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path


class Manifest:
    """Tiny JSONL manifest; on a cluster this would be an Iceberg table, but
    the semantics (append-only status rows, read-back to plan work) are the
    same and a file keeps the sandbox dependency-free."""

    def __init__(self, root: str) -> None:
        self.path = Path(root) / "manifest.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def done_buckets(self, schema_version: int | None = None) -> set[int]:
        """Buckets with a 'done' row.  When ``schema_version`` is given,
        refuse to resume across a tier-schema upgrade: appending new-schema
        partitions beside old-schema ones under the same table root would
        yield a mixed-schema table that readers fail on or null-fill."""
        done = set()
        if self.path.exists():
            for line in self.path.read_text().splitlines():
                row = json.loads(line)
                if row["status"] == "done":
                    if schema_version is not None and row.get("schema_version", 1) != schema_version:
                        raise RuntimeError(
                            f"manifest {self.path} has completed buckets with tier schema "
                            f"v{row.get('schema_version', 1)}, current engine writes "
                            f"v{schema_version}; resume refused — use a fresh out_root"
                        )
                    done.add(row["bucket"])
        return done

    def mark(self, run_id: str, bucket: int, status: str, **metrics) -> None:
        row = {"run_id": run_id, "bucket": bucket, "status": status, "ts": time.time(), **metrics}
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")

    def last_done(self, schema_version: int | None = None) -> dict[int, dict]:
        """Latest 'done' row per bucket (schema-version-guarded like
        done_buckets) — incremental runs compare each bucket's recorded
        ``data_max_ts`` against the input to decide what re-runs."""
        self.done_buckets(schema_version)  # reuse the version guard
        rows: dict[int, dict] = {}
        if self.path.exists():
            for line in self.path.read_text().splitlines():
                row = json.loads(line)
                if row["status"] == "done":
                    rows[row["bucket"]] = row
        return rows


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]
