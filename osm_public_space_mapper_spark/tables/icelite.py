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
        """Write df partitioned by `partition_col`, then atomically commit a
        new snapshot whose manifest carries per-partition lineage."""
        from pyspark.sql import functions as F

        write_id = uuid.uuid4().hex[:12]
        out_dir = os.path.join(self.data_dir, write_id)
        (df.repartition(F.col(partition_col))
           .write.mode("errorifexists")
           .partitionBy(partition_col)
           .parquet(out_dir))

        # lineage: row count + order-insensitive content hash per partition
        spark = df.sparkSession
        written = spark.read.parquet(out_dir)
        cols = [c for c in written.columns]
        lineage_rows = (
            written.withColumn(
                "_h", F.xxhash64(*[F.col(c).cast("string") for c in sorted(cols)])
            )
            .groupBy(partition_col)
            .agg(
                F.count("*").alias("row_count"),
                F.expr("bit_xor(_h)").alias("content_hash"),  # commutative, overflow-free
            )
            .collect()
        )
        manifests = [
            {
                "partition": str(r[partition_col]),
                "row_count": int(r["row_count"]),
                "content_hash": int(r["content_hash"]),
                "stage": stage,
                "path": os.path.join(out_dir, f"{partition_col}={r[partition_col]}"),
            }
            for r in lineage_rows
        ]

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
            "schema": written.schema.json(),
            "partition_col": partition_col,
        }
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(new_meta, f)
        os.replace(tmp, self._meta_path())  # atomic commit point
        return new_snap

    # -- read --------------------------------------------------------------
    def read(self, spark, partitions: list[str] | None = None):
        snap = self.current_snapshot()
        paths = [
            m["path"]
            for m in snap["manifests"]
            if partitions is None or m["partition"] in set(partitions)
        ]
        if not paths:
            raise ValueError("empty table or no matching partitions")
        # group by write dir so the hive-style partition column is recovered
        # via basePath (manifest-driven partition pruning: only listed dirs
        # are touched)
        by_base: dict[str, list[str]] = {}
        for p in paths:
            by_base.setdefault(os.path.dirname(p), []).append(p)
        dfs = [
            spark.read.option("basePath", base).parquet(*ps)
            for base, ps in sorted(by_base.items())
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

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
            df = df.filter(~F.col(partition_col).cast("string").isin(list(done)))
        if df.isEmpty():
            return self.current_snapshot()
        return self.commit(df, partition_col, stage=stage, mode="append")
