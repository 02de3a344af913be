package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc plan/time profiler for local iteration (not part of the
  * library surface).
  *
  *  - `runMain graft.Prof scans` — every registry query's file-scan
  *    count per table (flags avoidable re-reads; localCheckpoint
  *    barriers legitimately hide their upstream scan).
  *  - `runMain graft.Prof time <variants>` — noop-sink timings.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.headOption.getOrElse("scans") match {
      case "scans" =>
        SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
          try {
            val df = fn(spark, dir)
            val perTable = df.queryExecution.sparkPlan.collect {
              case s: org.apache.spark.sql.execution.FileSourceScanExec =>
                s.relation.location.rootPaths.headOption
                  .map(_.getName).getOrElse("?")
            }.groupBy(identity).view.mapValues(_.size).toMap
            val multi = perTable.filter(_._2 > 1)
            if (multi.nonEmpty)
              println(s"MULTI  $name: ${perTable.mkString(", ")}")
          } catch { case e: Throwable => println(s"ERR    $name: ${e.getMessage}") }
        }
      case "time" =>
        def time(name: String)(df: => DataFrame): Unit = {
          def once: Double = {
            val t0 = System.nanoTime()
            df.write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          once
          println(f"$name%-40s ${math.min(once, once)}%8.3f s")
        }
        args.drop(1).foreach(n => time(n)(SparkEntry.queries(n)(spark, dir)))
      case "floor" =>
        // per-exec fixed-cost isolation: what does ONE table() call pay
        // (listing is session-cached; schema inference reads footers
        // per spark.read.parquet call), and what does a minimal
        // file-backed noop exec cost end to end?
        def ms[A](n: Int)(f: => A): Double = {
          f // warm
          val t0 = System.nanoTime(); (1 to n).foreach(_ => f)
          (System.nanoTime() - t0) / 1e6 / n
        }
        val rd = ms(40)(spark.read.parquet(s"$dir/lineitem.parquet").schema)
        val tb = ms(40)(graft.sources.ViewingData.table(spark, dir, "lineitem").schema)
        val ev = ms(40)(graft.sources.ViewingData.table(spark, dir, "events").schema)
        val ex = ms(10) {
          graft.sources.ViewingData.table(spark, dir, "region")
            .select(col("r_regionkey"))
            .write.format("noop").mode("overwrite").save()
        }
        println(f"FLOOR read.parquet(lineitem).schema: $rd%.1f ms; table(lineitem): $tb%.1f ms; table(events): $ev%.1f ms; trivial exec: $ex%.1f ms")
      case "icws" =>
        // signature-build isolation (r12: the dim-join rewrite)
        val docs = graft.sources.ViewingData.table(spark, dir, "documents")
          .repartition(spark.sparkContext.defaultParallelism)
          .select(col("doc_id"), col("text")).localCheckpoint()
        def once(): Double = {
          val t0 = System.nanoTime()
          graft.operators.Icws.signatures(docs, "doc_id", "text", 16)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once()
        println(f"ICWS signatures: ${(1 to 3).map(_ => once()).min}%.3f s")
        graft.operators.Icws.signatures(docs, "doc_id", "text", 16)
          .explain("formatted")
      case "compactsweep" =>
        // Probe cost vs batch-dir fragmentation (r11: the streaming
        // loops' in-loop compaction claim) — seed an ICWS band index,
        // append N tiny batches, time the incremental probe on the
        // fragmented layout, compact, time again on the folded one.
        import graft.operators.IcwsDelta
        import org.apache.spark.sql.functions.col
        val n = args.lift(1).map(_.toInt).getOrElse(40)
        val base = java.nio.file.Files.createTempDirectory("compactsweep").toString
        val idx = s"$base/idx"
        val docs = graft.sources.ViewingData.table(spark, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
          .localCheckpoint()
        val standing = docs.filter(col("doc_id") % 4 =!= 0)
        val delta = docs.filter(col("doc_id") % 4 === 0).localCheckpoint()
        IcwsDelta.seedBatch(standing, "doc_id", "text", idx)
        // fragment: n slivers of the standing corpus re-appended as
        // micro-batches (content irrelevant — dir/file count is the
        // variable under test)
        (0 until n).foreach { i =>
          IcwsDelta.writeBatch(
            standing.filter(col("doc_id") % (4L * n) === 4L * i + 1),
            "doc_id", "text", idx, i.toLong)
        }
        def probeSec(): Double = {
          val t0 = System.nanoTime()
          IcwsDelta.incrementalCandidates(delta, "doc_id", "text",
              IcwsDelta.readIndex(spark, idx))
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        def batchDirs() = new java.io.File(idx).listFiles()
          .count(f => f.isDirectory && f.getName.startsWith("batch="))
        probeSec() // warm
        val frag = (1 to 3).map(_ => probeSec()).min
        val dirsBefore = batchDirs()
        IcwsDelta.compactIndex(spark, idx)
        val compacted = (1 to 3).map(_ => probeSec()).min
        val dirsAfter = batchDirs()
        println(f"COMPACTSWEEP icws: $dirsBefore%d dirs ${frag}%.2f s -> $dirsAfter%d dirs ${compacted}%.2f s")
    }
    spark.stop()
  }
}
