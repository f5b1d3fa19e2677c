"""Table layer: Iceberg when available, partitioned parquet otherwise.

The north-star deployment writes Iceberg tables (snapshots give checkpoint-
resume and time travel; hidden partitioning on the cell id gives partition
pruning for bbox queries). This sandbox has no Iceberg runtime jar, so the
same interface falls back to partitioned parquet + the StageRunner's JSON
manifests (osmgraft/pipeline/runner.py), which provide equivalent resume
semantics. Switch by configuring a catalog, e.g.:

    spark.sql.catalog.osm = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.osm.type = hadoop
    spark.sql.catalog.osm.warehouse = <path>
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession, catalog: str = "osm") -> bool:
    return spark.conf.get(f"spark.sql.catalog.{catalog}", None) is not None


class TableIO:
    """write/read tables by name, Iceberg-or-parquet."""

    def __init__(self, spark: SparkSession, warehouse: str, catalog: str = "osm"):
        self.spark = spark
        self.warehouse = warehouse.rstrip("/")
        self.catalog = catalog
        self.use_iceberg = iceberg_available(spark, catalog)

    def _ident(self, name: str) -> str:
        return f"{self.catalog}.{name}"

    def write(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str] | None = None,
        sort_by: list[str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        """Sorted/partitioned write: sort_by plays the role of the
        reference's btree indexes (min-max pruning on score/tier), the
        partition column the role of the GiST index (cell pruning)."""
        if sort_by:
            df = df.sortWithinPartitions(*sort_by)
        if self.use_iceberg:
            w = df.writeTo(self._ident(name))
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            (w.createOrReplace() if mode == "overwrite" else w.append())
        else:
            w = df.write.mode(mode)
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(f"{self.warehouse}/{name}")

    def read(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(self._ident(name))
        return self.spark.read.parquet(f"{self.warehouse}/{name}")

    def write_bucketed(
        self,
        df: DataFrame,
        name: str,
        bucket_by: list[str],
        n_buckets: int = 32,
        sort_by: list[str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        """Bucketed (hash-clustered) write — the co-located-join lever.

        Both sides of a join bucketed on the join key with the same bucket
        count read back ALREADY distributed: Catalyst elides the Exchange
        on both sides (plan-audited in tests/test_plans.py), so at 100 TB
        the repeated joins/aggregations on a hot key (cell id, user id,
        url) pay the shuffle ONCE at write time instead of per query.
        sort_by additionally orders within buckets (min-max pruning +
        sort-merge-ready runs). Iceberg path uses the bucket partition
        transform; the parquet path uses Spark's native bucketed tables
        (requires saveAsTable — bucket metadata lives in the catalog)."""
        if self.use_iceberg:
            from pyspark.sql import functions as F

            # refuse rather than silently degrade: the writeTo API exposes
            # only single-transform bucketing here, and within-bucket sort
            # needs a table sort-order DDL — callers relying on multi-key
            # co-location or sorted runs must not get a different layout
            if len(bucket_by) != 1:
                raise NotImplementedError(
                    "Iceberg path supports a single bucket column "
                    f"(got {bucket_by!r}); pre-combine keys or use the "
                    "parquet path"
                )
            if sort_by:
                raise NotImplementedError(
                    "Iceberg path does not apply sort_by (needs a table "
                    "sort-order); drop sort_by or use the parquet path"
                )
            w = df.writeTo(self._ident(name)).partitionedBy(
                F.bucket(n_buckets, F.col(bucket_by[0]))
            )
            (w.createOrReplace() if mode == "overwrite" else w.append())
            return
        w = (
            df.write.format("parquet")
            .mode(mode)
            .option("path", f"{self.warehouse}/{name}")
            .bucketBy(n_buckets, *bucket_by)
        )
        if sort_by:
            w = w.sortBy(*sort_by)
        w.saveAsTable(name)

    def read_bucketed(self, name: str) -> DataFrame:
        """Catalog read — REQUIRED for the bucketing metadata to reach the
        planner (a raw path read sees plain parquet and re-shuffles)."""
        if self.use_iceberg:
            return self.spark.read.table(self._ident(name))
        return self.spark.table(name)
