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
}
