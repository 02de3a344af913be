package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ingestion surface of the reference (ingest-dag.sql COPY INTO
  * tasks): scan a parquet stage laid out as
  * `<root>/<feed>/yyyy=YYYY/mm=MM/dd=DD/part-*.parquet`, recover the
  * partition columns from the FILE PATH (not the file contents — the
  * reference's `metadata$filename` regexes, ingest-dag.sql:8-33),
  * NULLIF the hive default-partition sentinel, and derive
  * `metadata_date` with a failure-tolerant cast.
  *
  * Unlike Spark's built-in partition discovery this works on stages the
  * writer didn't register as hive-partitioned, tolerates
  * `__HIVE_DEFAULT_PARTITION__`, and keeps the path parse in the plan
  * (input_file_name is evaluated at scan time; the rest is codegen'd
  * projection). Date-range predicates on yyyy/mm/dd prune at the file
  * listing via pushed filters on the derived columns when the stage IS
  * hive-registered; for raw stages the filter still short-circuits
  * per-file since the path columns are constant within a file.
  */
object RawLoader {

  val Sentinel = "__HIVE_DEFAULT_PARTITION__"

  /** One hive path segment from an arbitrary path column — shared by
    * the file-scan loader below and any query that parses path-shaped
    * strings (see q_partition_extract). */
  def partFrom(path: org.apache.spark.sql.Column, pattern: String): org.apache.spark.sql.Column =
    nullif(regexp_extract(path, pattern, 1), lit(Sentinel))

  private def part(pattern: String): org.apache.spark.sql.Column =
    partFrom(input_file_name(), pattern)

  /** Reads every parquet file under `root` matching the feed subdir,
    * adding yyyy/mm/dd/metadata_date from the path. */
  def load(spark: SparkSession, root: String, feed: String): DataFrame =
    spark.read
      .option("recursiveFileLookup", "true") // ignore writer-side partition registration
      .option("pathGlobFilter", "*.parquet")
      .parquet(s"$root/$feed")
      .withColumn("yyyy", part(".*/yyyy=([^/]+)/.*"))
      .withColumn("mm", part(".*/mm=([^/]+)/.*"))
      .withColumn("dd", part(".*/dd=([^/]+)/.*"))
      .withColumn("metadata_date",
        expr("try_cast(concat(yyyy, '-', mm, '-', dd) AS DATE)"))
}
