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
    * per line), orc (the columnar alternative — same pushdown/stats
    * story as parquet, for stacks standardized on it), or csv (header
    * on, so the round-trip is self-describing modulo types — CSV
    * readers must supply or infer a schema). */
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
    * anything else. Partition columns are re-derived from `tsCol` (not
    * the inferred directory values) so zero-padded dir names survive
    * the round-trip. `format` must match how the feed was written
    * (mirrors [[writeHiveAs]]; CSV round-trips through schema
    * inference, so types are only as stable as inference makes them).
    *
    * The rewrite is staged NEXT TO the live feed and published by
    * rename ([[publish]]): the compaction job reads the intact feed
    * while writing, so a crash or executor loss at any point leaves a
    * complete copy on disk — never the half-written target the old
    * in-place overwrite risked. */
  def compact(spark: org.apache.spark.sql.SparkSession, root: String,
      feed: String, tsCol: String, targetBytes: Long = 128L << 20,
      format: String = "parquet"): Unit = {
    require(Seq("parquet", "orc", "json", "csv").contains(format),
      s"compact: unsupported feed format '$format' (parquet|orc|json|csv)")
    val src = s"$root/$feed"
    val path = new org.apache.hadoop.fs.Path(src)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(path).getLength
    val df = (format match {
      case "parquet" => spark.read.parquet(src)
      case "orc"     => spark.read.orc(src)
      case "json"    => spark.read.json(src)
      case "csv"     => spark.read
        .option("header", "true").option("inferSchema", "true").csv(src)
    }).drop("yyyy", "mm", "dd")
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
    val staged = stagingPath(src)
    val w = out.write.partitionBy("yyyy", "mm", "dd").mode("overwrite")
    (if (format == "csv") w.option("header", "true") else w)
      .format(format).save(staged)
    // the swap below replaces the whole directory — including any
    // stats/bloom index living inside it — so capture what's indexed
    // now and rebuild over the new layout after publishing
    val idx =
      if (format == "parquet") StatsIndex.captureIndexes(spark, src)
      else StatsIndex.IndexSpec(Seq.empty, Seq.empty)
    publish(spark, staged, src)
    if (!idx.isEmpty) StatsIndex.rebuildIndexes(spark, src, idx)
  }

  /** Z-ORDER clustering (the OPTIMIZE ZORDER layout): rewrite a table
    * so every file covers a NARROW range of BOTH `colA` and `colB`,
    * making parquet min/max stats prune files for predicates on either
    * column. A sort can only cluster its leading column — files then
    * span the full range of every other column and no stat prunes
    * them; interleaving quantile-bucket bits (Morton order) spreads
    * locality across both dimensions at ~sqrt cost to each.
    *
    * Buckets are QUANTILE-based (percentile_approx boundaries — the
    * rank-based normalization range-partitioning uses), not
    * min/max-linear, so skewed columns still split evenly. The
    * boundary fetch is one aggregate row (control-plane, like the IVF
    * centroid collect); bucketing and bit-interleave are codegen'd
    * column expressions; the write is repartitionByRange on the
    * z-value — total cost one range exchange, same as any sorted
    * rewrite. Files are sized by `nFiles`, staged and published by
    * rename with the same crash contract as [[compact]]. */
  def zorderBy(spark: org.apache.spark.sql.SparkSession, path: String,
      colA: String, colB: String, nFiles: Int, buckets: Int = 64): Unit = {
    require(buckets > 1 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    val bits = java.lang.Integer.numberOfTrailingZeros(buckets)
    val df = spark.read.parquet(path)
    val probs = array((1 until buckets).map(i => lit(i.toDouble / buckets)): _*)
    val bounds = df.agg(
      percentile_approx(col(colA).cast("double"), probs, lit(10000)),
      percentile_approx(col(colB).cast("double"), probs, lit(10000))).head()
    def boundary(i: Int): Seq[Double] = bounds.getSeq[Double](i)
    // bucket id = #boundaries <= value (0..buckets-1), over a literal
    // boundary array — codegen'd, no join
    def bucketOf(c: String, bs: Seq[Double]) =
      size(filter(
        array(bs.map(lit): _*),
        b => b <= col(c).cast("double"))).cast("long")
    def interleave(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
        acc
          .bitwiseOR(shiftleft(a.bitwiseAND(lit(1L << i)), i + 1))
          .bitwiseOR(shiftleft(b.bitwiseAND(lit(1L << i)), i))
      }
    val z = interleave(bucketOf(colA, boundary(0)), bucketOf(colB, boundary(1)))
    val staged = stagingPath(path)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(staged)
    // capture before the swap wipes the old indexes; rebuild over the
    // new layout (z-order is exactly when they pay off)
    val idx = StatsIndex.captureIndexes(spark, path)
    publish(spark, staged, path)
    if (!idx.isEmpty) StatsIndex.rebuildIndexes(spark, path, idx)
  }

  /** Sibling staging location for a full-rewrite-then-swap of `target`.
    * Inside the parent dir (rename must not cross filesystems), named
    * so directory readers of the parent can't mistake it for data. */
  def stagingPath(target: String): String = target + ".__staging__"

  /** Publishes a fully written `stagedPath` at `targetPath` by rename —
    * the filesystem fallback for atomic table commit. At every instant
    * a complete copy exists on disk: before the swap the old target is
    * live; between the two renames it sits at `<target>.__old__`
    * (recoverable after a crash); after, the staged copy is live and
    * the old one is dropped. Rename is atomic on HDFS and POSIX
    * filesystems; object stores without atomic rename should use a
    * table format (Delta/Iceberg) whose MERGE/OPTIMIZE replaces this
    * whole path-swap pattern. */
  def publish(spark: org.apache.spark.sql.SparkSession,
      stagedPath: String, targetPath: String): Unit = {
    val target = new org.apache.hadoop.fs.Path(targetPath)
    val staged = new org.apache.hadoop.fs.Path(stagedPath)
    val old = new org.apache.hadoop.fs.Path(targetPath + ".__old__")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(old)) fs.delete(old, true) // stale crash leftover
    if (fs.exists(target) && !fs.rename(target, old))
      throw new java.io.IOException(s"publish: cannot move $target aside")
    if (!fs.rename(staged, target)) {
      if (fs.exists(old)) fs.rename(old, target) // restore previous copy
      throw new java.io.IOException(s"publish: cannot promote $staged")
    }
    fs.delete(old, true)
  }
}
