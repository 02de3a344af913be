package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write side of the ingestion contract: lay a frame out as the
  * `feed/yyyy=YYYY/mm=MM/dd=DD/part-N.parquet` stage that the reference's
  * COPY INTO tasks (ingest-dag.sql pattern regexes) and our RawLoader
  * consume. Derives the partition columns from an event-time column,
  * so a day's data lands in one prunable directory — at 100 TB this
  * layout is what makes date-range queries scan only their days.
  */
object LakeWriter {

  def writeHive(df: DataFrame, tsCol: String, root: String, feed: String): Unit =
    writeHiveAs(df, tsCol, root, feed, "parquet")

  /** `format`: parquet (columnar lake), json (JSONL — the interchange
    * format LLM corpus tooling expects; Spark writes one JSON object
    * per line), or csv (header on, so the round-trip is self-describing
    * modulo types — CSV readers must supply or infer a schema). */
  def writeHiveAs(
      df: DataFrame, tsCol: String, root: String, feed: String, format: String): Unit = {
    val partitioned = df
      .withColumn("yyyy", date_format(col(tsCol), "yyyy"))
      .withColumn("mm", date_format(col(tsCol), "MM"))
      .withColumn("dd", date_format(col(tsCol), "dd"))
      .write
      .partitionBy("yyyy", "mm", "dd")
      .mode("overwrite")
    (if (format == "csv") partitioned.option("header", "true") else partitioned)
      .format(format)
      .save(s"$root/$feed")
  }

  /** Small-files compaction — the OPTIMIZE job every streaming lake
    * needs: micro-batch sinks write one file per trigger per day, and
    * reads then pay a per-file open cost that dwarfs the data. Rewrites
    * the feed so each `yyyy=/mm=/dd=` directory holds
    * ~`targetBytes`-sized files: file count per day derives from the
    * feed's on-disk size (floor one file), days are clustered by a
    * deterministic salt so a big day splits without a shuffle of
    * anything else, and dynamic partition overwrite replaces only the
    * directories being rewritten. Partition columns are re-derived
    * from `tsCol` (not the inferred directory values) so zero-padded
    * dir names survive the round-trip. The merged frame is
    * materialized before the overwrite of the path being read; a
    * production job writes a fresh location or uses a table format
    * with atomic commit instead. */
  def compact(spark: org.apache.spark.sql.SparkSession, root: String,
      feed: String, tsCol: String, targetBytes: Long = 128L << 20): Unit = {
    val src = s"$root/$feed"
    val path = new org.apache.hadoop.fs.Path(src)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(path).getLength
    val df = spark.read.parquet(src).drop("yyyy", "mm", "dd")
    val days = math.max(1L, df.select(to_date(col(tsCol))).distinct().count())
    val filesPerDay = math.max(1L,
      math.ceil(totalBytes.toDouble / days / targetBytes).toLong)
    val out = df
      .withColumn("yyyy", date_format(col(tsCol), "yyyy"))
      .withColumn("mm", date_format(col(tsCol), "MM"))
      .withColumn("dd", date_format(col(tsCol), "dd"))
      .withColumn("__salt", pmod(xxhash64(col(tsCol)), lit(filesPerDay)))
      .repartition(col("yyyy"), col("mm"), col("dd"), col("__salt"))
      .drop("__salt")
      .localCheckpoint()
    out.write
      .partitionBy("yyyy", "mm", "dd")
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(src)
  }
}
