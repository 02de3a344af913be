package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.LakeWriter

/** Z-order clustering (LakeWriter.zorderBy): per-file min/max ranges
  * must narrow on BOTH clustered columns — that narrowing IS file
  * skipping, since parquet stat pruning drops a file whenever the
  * predicate misses its [min,max]. Baseline: a plain sort clusters
  * only its leading column and leaves the other un-prunable. */
class ZOrderSpec extends SparkTestBase {

  /** Mean per-file normalized range width of `c` across part files. */
  private def meanSpread(dir: String, c: String): Double = {
    val whole = spark.read.parquet(dir)
      .agg(min(col(c).cast("double")), max(col(c).cast("double"))).head()
    val (lo, hi) = (whole.getDouble(0), whole.getDouble(1))
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files.length > 1, s"need multiple files in $dir")
    val spreads = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col(c).cast("double")), max(col(c).cast("double"))).head()
      (r.getDouble(1) - r.getDouble(0)) / (hi - lo)
    }
    spreads.sum / spreads.length
  }

  test("z-order narrows both dimensions; sort narrows only the first") {
    val ev = graft.sources.ViewingData.table(spark, Sf, "events")
      .select("event_id", "user_id", "value")
    val zdir = Files.createTempDirectory("zorder").toString + "/t"
    val sdir = Files.createTempDirectory("sorted").toString + "/t"
    ev.write.parquet(zdir)
    val before = ev.agg(bit_xor(xxhash64(col("event_id"), col("user_id")))).head.getLong(0)

    LakeWriter.zorderBy(spark, zdir, "user_id", "value", nFiles = 16)
    ev.repartitionByRange(16, col("user_id")).sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(sdir)

    // rewrite preserves content exactly
    val after = spark.read.parquet(zdir)
      .agg(bit_xor(xxhash64(col("event_id"), col("user_id")))).head.getLong(0)
    assert(after == before)

    val zU = meanSpread(zdir, "user_id"); val zV = meanSpread(zdir, "value")
    val sU = meanSpread(sdir, "user_id"); val sV = meanSpread(sdir, "value")
    info(f"spreads: z=($zU%.3f,$zV%.3f) sorted=($sU%.3f,$sV%.3f)")
    // sort: leading column tightly clustered, second column mostly
    // un-prunable (spans well over half the range per file)
    assert(sU < 0.2, s"sorted leading spread $sU")
    assert(sV > 0.6, s"sorted second column should span most of the range, got $sV")
    // z-order: BOTH columns narrow enough that stat pruning bites
    assert(zU < 0.4, s"z-order user_id spread $zU")
    assert(zV < 0.4, s"z-order value spread $zV")
    assert(zV < sV * 0.6, s"z-order must beat sort on the non-leading dim: $zV vs $sV")
  }

  test("quantile buckets balance files under heavy skew") {
    // min/max-linear bucketing would dump almost every row of a
    // power-law column into one bucket; quantile boundaries must keep
    // the files row-balanced regardless
    val dir = Files.createTempDirectory("zskew").toString + "/t"
    graft.sources.ViewingData.table(spark, Sf, "events")
      .select(col("event_id"), col("user_id"),
        pow(col("value"), 4).as("skewed"))
      .write.parquet(dir)
    LakeWriter.zorderBy(spark, dir, "user_id", "skewed", nFiles = 8)
    val counts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(f => spark.read.parquet(f.getAbsolutePath).count())
    assert(counts.length > 4, counts.mkString(","))
    assert(counts.max.toDouble / counts.min <= 3.0,
      s"files must stay row-balanced under skew: ${counts.mkString(",")}")
  }

  test("stat pruning: point predicates on either column touch a minority of files") {
    val zdir = Files.createTempDirectory("zorder2").toString + "/t"
    graft.sources.ViewingData.table(spark, Sf, "events")
      .select("event_id", "user_id", "value").write.parquet(zdir)
    LakeWriter.zorderBy(spark, zdir, "user_id", "value", nFiles = 16)
    val files = new java.io.File(zdir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    def overlapping(c: String, v: Double): Int = files.count { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col(c).cast("double")), max(col(c).cast("double"))).head()
      r.getDouble(0) <= v && v <= r.getDouble(1)
    }
    val whole = spark.read.parquet(zdir)
      .agg(avg(col("user_id").cast("double")), avg(col("value"))).head()
    // point predicates land in the densest region (column means), the
    // worst case for a space-filling curve; both dims must still skip
    // files — a sorted layout skips NONE on its non-leading dim
    assert(overlapping("user_id", whole.getDouble(0)) <= files.length / 2,
      "a user_id point predicate must skip at least half the files")
    assert(overlapping("value", whole.getDouble(1)) <= files.length * 3 / 4,
      "a value point predicate must skip at least a quarter of the files")
  }
}
