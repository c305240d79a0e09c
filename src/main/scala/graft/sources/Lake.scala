package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Lake-format source/sink surface (SURVEY.md §2.3 scans/sinks: the
  * reference's declared warehouse reads Parquet/CSV/JSON off S3 —
  * reference `README.md:21`; its own sink is CSV-to-object-store,
  * `etls/aws_etl.py:42-57`). Paths are format-agnostic (`s3a://` at
  * scale, local files here — the Hadoop FileSystem layer is the same
  * code path, SURVEY §2.1 A6).
  *
  * Scale posture:
  *  - always explicit schemas on read (`inferSchema` double-scans the
  *    data and guesses types — never at 100 TB);
  *  - writes partition by a date-derived column so downstream queries
  *    prune partitions at the directory level before any IO;
  *  - `maxRecordsPerFile` bounds file sizes so a 1000-executor scan gets
  *    even splits.
  */
object Lake {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Date-partitioned parquet write — the lake layout the reference's
    * daily `reddit_{ds_nodash}` files imply (`dags/reddit_dag.py:37`):
    * one directory per day, so time-ranged queries prune at the
    * directory level (PartitionFilters in the scan, zero IO for pruned
    * days). */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String,
                           maxRecordsPerFile: Int = 1000000): Unit =
    df.withColumn("p_date", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("p_date")
      .parquet(path)

  /** Read back a date-partitioned lake table; `p_date` comes from the
    * directory structure, not file contents. */
  def readDatePartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed catalog table: pre-shuffle the data once at write time so
    * every later equi-join/aggregation on `bucketCol` is exchange-free —
    * the co-located-join layout for fact⋈fact joins that recur at 100 TB
    * (a sort-merge join of two tables bucketed on the key needs zero
    * shuffle; the exchange happens once, at ingest).
    *
    * Uses the session catalog (`saveAsTable` — bucketing metadata lives
    * in the catalog, not the files). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
