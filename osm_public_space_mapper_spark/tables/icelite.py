"""Icelite — minimal Iceberg-layout table format over parquet (SURVEY.md §4.2.4).

No Iceberg runtime jar is reachable in this environment, so the engine
implements the subset of Iceberg semantics the north rule needs, from scratch:

  table/
    metadata/metadata.json        current snapshot pointer + schema + history
    metadata/snap-<n>.json        snapshot: list of manifest entries
    data/<partition>/<file>.parquet

Guarantees:
- atomic snapshot commit: data files land first, then snap-N.json, then
  metadata.json is atomically replaced (os.replace) — readers never see a
  partial commit
- per-partition lineage: each manifest entry records partition key, row
  count, and a content hash (north rule "every partition emits lineage +
  row-count metrics to a checkpoint table")
- exact resume: `completed_partitions(stage)` lets a writer anti-join
  already-committed partition keys and skip them (batch incremental
  processing; reference is one-shot batch so no streaming state is needed)

Read path is plain `spark.read.parquet(*files)` over manifest-listed files —
partition pruning by passing only matching partitions' files.
"""

from __future__ import annotations

import json
import os
import time
import uuid


class IceliteTable:
    def __init__(self, path: str):
        self.path = path
        self.meta_dir = os.path.join(path, "metadata")
        self.data_dir = os.path.join(path, "data")
        os.makedirs(self.meta_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # -- metadata ----------------------------------------------------------
    def _meta_path(self) -> str:
        return os.path.join(self.meta_dir, "metadata.json")

    def current_metadata(self) -> dict:
        p = self._meta_path()
        if not os.path.exists(p):
            return {"snapshot": None, "history": [], "schema": None}
        with open(p) as f:
            return json.load(f)

    def current_snapshot(self) -> dict:
        meta = self.current_metadata()
        if meta["snapshot"] is None:
            return {"manifests": [], "snapshot_id": None}
        with open(os.path.join(self.meta_dir, meta["snapshot"])) as f:
            return json.load(f)

    # -- write -------------------------------------------------------------
    def commit(self, df, partition_col: str, stage: str = "default", mode: str = "append") -> dict:
        """Write df partitioned by `partition_col` and atomically commit a
        new snapshot whose manifest carries per-partition lineage.

        Single-pass write: each executor task writes its own parquet file(s)
        (the Iceberg writer model — tasks produce data files, the driver
        commits manifest entries) and RETURNS one lineage row per written
        file (partition, path, row_count, content_hash). The input is
        scanned exactly once; the r01 version re-read everything it had just
        written to compute hashes, doubling write-path I/O per commit.

        content_hash is an order-insensitive wrap-around SUM of per-row
        hashes (+ the row count in the manifest): unlike bit_xor, duplicate
        row pairs don't cancel out. Failed/retried tasks may leave orphan
        files in the write dir; only rows from successful attempts reach the
        manifest (standard Iceberg orphan semantics)."""
        from pyspark.sql import functions as F

        write_id = uuid.uuid4().hex[:12]
        out_dir = os.path.join(self.data_dir, write_id)
        os.makedirs(out_dir, exist_ok=True)
        pcol = partition_col

        def _write_files(batches):
            import uuid as _uuid
            from hashlib import md5

            import numpy as np
            import pandas as pd
            import pyarrow as pa
            import pyarrow.parquet as pq

            def _cell64(v):
                """Stable 64-bit digest for non-hashable payload cells
                (nested arrays, binary geometry/mask blobs)."""
                if v is None:
                    b = b"\x00"
                elif isinstance(v, (bytes, bytearray)):
                    b = bytes(v)
                elif isinstance(v, np.ndarray):
                    b = v.tobytes() + str(v.dtype).encode() + str(v.shape).encode()
                else:
                    b = repr(v).encode()
                return int.from_bytes(md5(b).digest()[:8], "big")

            def _row_hashes(pdf: "pd.DataFrame") -> "np.ndarray":
                total = np.zeros(len(pdf), dtype=np.uint64)
                for c in sorted(pdf.columns):
                    col = pdf[c]
                    if col.dtype == object:
                        col = pd.Series([_cell64(v) for v in col], dtype="uint64")
                    h = pd.util.hash_pandas_object(col, index=False).to_numpy().astype(np.uint64)
                    total = total * np.uint64(1099511628211) + h  # FNV-ish column mix
                return total

            # flush per Arrow batch — a task never buffers more than one
            # batch, so memory stays bounded regardless of partition size;
            # a partition spanning batches just yields several data files,
            # which the manifest (one row per FILE) already models.
            rows = {"partition": [], "path": [], "row_count": [], "content_hash": []}
            for pdf in batches:
                # dropna=False: rows with a NULL partition value must land in
                # the table (under the Hive default-partition sentinel, like
                # the partitionBy writer this replaced), not be silently lost
                for val, grp in pdf.groupby(pcol, sort=False, dropna=False):
                    if pd.isna(val):
                        val = "__HIVE_DEFAULT_PARTITION__"
                    pdir = os.path.join(out_dir, f"{pcol}={val}")
                    os.makedirs(pdir, exist_ok=True)
                    fpath = os.path.join(pdir, f"part-{_uuid.uuid4().hex[:16]}.parquet")
                    grp = grp.reset_index(drop=True)
                    pq.write_table(pa.Table.from_pandas(grp, preserve_index=False), fpath)
                    h = _row_hashes(grp)
                    rows["partition"].append(str(val))
                    rows["path"].append(fpath)
                    rows["row_count"].append(len(grp))
                    rows["content_hash"].append(int(h.sum(dtype=np.uint64)))
            yield pd.DataFrame(rows)

        lineage_rows = (
            df.repartition(F.col(partition_col))
            .mapInPandas(
                _write_files,
                "partition string, path string, row_count long, content_hash decimal(20,0)",
            )
            .collect()
        )
        manifests = [
            {
                "partition": r["partition"],
                "row_count": int(r["row_count"]),
                "content_hash": int(r["content_hash"]),
                "stage": stage,
                "path": r["path"],
            }
            for r in lineage_rows
        ]
        schema_json = df.schema.json()

        prev = self.current_metadata()
        snap = self.current_snapshot()
        old_manifests = snap["manifests"] if mode == "append" else []
        n = len(prev["history"]) + 1
        snap_name = f"snap-{n:06d}.json"
        new_snap = {
            "snapshot_id": n,
            "timestamp_ms": int(time.time() * 1000),
            "stage": stage,
            "manifests": old_manifests + manifests,
        }
        with open(os.path.join(self.meta_dir, snap_name), "w") as f:
            json.dump(new_snap, f)
        new_meta = {
            "snapshot": snap_name,
            "history": prev["history"] + [snap_name],
            "schema": schema_json,
            "partition_col": partition_col,
        }
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(new_meta, f)
        os.replace(tmp, self._meta_path())  # atomic commit point
        return new_snap

    # -- read --------------------------------------------------------------
    def snapshot(self, snapshot_id: int) -> dict:
        """Load a historical snapshot by id (time travel — snapshots are
        immutable; `history` in metadata.json lists them all)."""
        with open(os.path.join(self.meta_dir, f"snap-{snapshot_id:06d}.json")) as f:
            return json.load(f)

    def read(self, spark, partitions: list[str] | None = None,
             snapshot_id: int | None = None):
        """Read the current snapshot, or a historical one via `snapshot_id`
        (Iceberg-style time travel: VERSION AS OF)."""
        snap = self.current_snapshot() if snapshot_id is None else self.snapshot(snapshot_id)
        paths = [
            m["path"]
            for m in snap["manifests"]
            if partitions is None or m["partition"] in set(partitions)
        ]
        if not paths:
            raise ValueError("empty table or no matching partitions")
        # manifest-driven pruning: only the listed data files are touched;
        # the partition column is stored inside each file (Iceberg-style,
        # no hive-dir recovery needed)
        return spark.read.parquet(*sorted(paths))

    def lineage(self) -> list[dict]:
        return self.current_snapshot()["manifests"]

    def completed_partitions(self, stage: str | None = None) -> set[str]:
        return {
            m["partition"]
            for m in self.lineage()
            if stage is None or m["stage"] == stage
        }

    def commit_resumable(self, df, partition_col: str, stage: str = "default") -> dict:
        """Resume-aware commit: skips partitions already committed for this
        stage (anti-join on the checkpoint manifest) and appends the rest."""
        from pyspark.sql import functions as F

        done = self.completed_partitions(stage)
        if done:
            # NULL-safe anti-filter: coalesce to the same sentinel the writer
            # files NULL partitions under, so (a) a committed NULL partition
            # is skipped and (b) an uncommitted one isn't dropped by
            # NULL-propagating isin()
            key = F.coalesce(
                F.col(partition_col).cast("string"), F.lit("__HIVE_DEFAULT_PARTITION__")
            )
            df = df.filter(~key.isin(list(done)))
        if df.isEmpty():
            return self.current_snapshot()
        return self.commit(df, partition_col, stage=stage, mode="append")
