package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned table directory — the reproducibility contract a
  * training pipeline needs from its corpus store (train against a
  * PINNED version while ingestion keeps committing; re-run a job
  * months later against the exact bytes it saw), provided over plain
  * parquet with the same rename-based atomicity as
  * [[LakeWriter.publish]]. Snowflake gets this from TIME TRAVEL /
  * zero-copy cloning; Delta/Iceberg from snapshot ids — this is that
  * contract's filesystem fallback, and on a lake those formats replace
  * it wholesale.
  *
  * Layout: `root/v=N/` per version plus `root/_latest` (a one-line
  * manifest holding N). A version directory is written STAGED and
  * renamed in before the manifest flips, and the manifest flip itself
  * is a rename — readers never observe a half-written version, and a
  * crash between the two renames leaves `_latest` on the previous
  * version with the new directory complete but unreferenced (the next
  * commit reuses the slot; `vacuum` reaps it).
  */
object Snapshots {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val VersionDir = "v=(\\d+)".r

  private def versionsOn(spark: SparkSession, root: String): Seq[Long] = {
    val p = new Path(root)
    val f = fs(spark, root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      // exact v=<digits> only: crash leftovers like v=2.__staging__ /
      // v=2.__old__ must not wedge the listing (they are precisely the
      // states the fallback recovers FROM)
      .collect { case s if s.isDirectory =>
        s.getPath.getName match {
          case VersionDir(n) => Some(n.toLong)
          case _ => None
        }
      }.flatten.sorted
  }

  /** Reads `_latest`; None for an empty/absent table. If the manifest
    * is missing but committed version directories exist (a legacy
    * delete+rename crash, or a store that lost the file), recovery
    * falls back to the newest listed directory — version dirs are
    * published atomically, so whatever the listing shows is complete.
    * With the overwrite-rename flip in [[commit]] the manifest is
    * otherwise never absent, even mid-flip. */
  def latestVersion(spark: SparkSession, root: String): Option[Long] = {
    val m = new Path(root, "_latest")
    val f = fs(spark, root)
    if (!f.exists(m)) versionsOn(spark, root).lastOption
    else {
      val in = f.open(m)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  /** Commits `df` as the next version and returns its number. The
    * version dir lands complete (staged + rename) BEFORE the manifest
    * flips, so concurrent readers of `read`/`readVersion` are never
    * torn; pinned readers of old versions are untouched. */
  def commit(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    // latestVersion already falls back to the directory listing when
    // the manifest is absent, so one call covers every recovery case
    val next = latestVersion(spark, root).getOrElse(0L) + 1
    val target = s"$root/v=$next"
    val staged = LakeWriter.stagingPath(target)
    df.write.mode("overwrite").parquet(staged)
    LakeWriter.publish(spark, staged, target)
    val f = fs(spark, root)
    // durable commit timestamp (epoch millis) for the AT(TIMESTAMP =>)
    // read path — written before the manifest flip, so any version the
    // manifest can reference has a record; a crash-orphaned record is
    // overwritten when the slot is reused (create overwrite=true)
    val rec = f.create(new Path(root, s"_commits/$next"), true)
    try rec.write(System.currentTimeMillis().toString.getBytes("UTF-8"))
    finally rec.close()
    val tmp = new Path(root, s"_latest.tmp.$next")
    val out = f.create(tmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    val manifest = new Path(root, "_latest")
    // Flip with an OVERWRITE rename: one atomic operation, so a
    // concurrent reader always sees either the old or the new manifest
    // and a crash can never lose it (delete-then-rename had a window
    // where _latest was absent). Schemes without FileContext fall back
    // to delete+rename; latestVersion()'s listing fallback covers the
    // residual window there.
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        manifest.toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(f.makeQualified(tmp), f.makeQualified(manifest),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        f.delete(manifest, false)
        if (!f.rename(tmp, manifest))
          throw new java.io.IOException(s"snapshot commit: cannot flip $manifest")
    }
    next
  }

  /** Latest committed snapshot. */
  def read(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root, latestVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed snapshot at $root")))

  /** A pinned snapshot — the reproducible-training read path. */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame =
    spark.read.parquet(s"$root/v=$version")

  /** Snowflake table-STREAM / `CHANGES` semantics over the snapshot
    * layer: the row-level delta between two committed versions, each
    * row tagged `__op` = 'insert' | 'delete' (an update appears as the
    * delete of the old row plus the insert of the new one — exactly
    * Snowflake's default stream encoding). Multiset semantics
    * (exceptAll both ways), so duplicate-row cardinality changes are
    * deltas too. Consume-once workflows persist the version they last
    * read as their offset — the same watermark discipline as
    * task_control, with the snapshot id as the cursor. */
  def changes(spark: SparkSession, root: String, fromVersion: Long,
      toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val from = readVersion(spark, root, fromVersion)
    val to = readVersion(spark, root, toVersion)
    to.exceptAll(from).withColumn("__op", lit("insert"))
      .unionByName(from.exceptAll(to).withColumn("__op", lit("delete")))
  }

  /** Commit wall-clock of a version (epoch millis). Versions committed
    * before timestamp records existed fall back to the version dir's
    * modification time — best effort, same caveat as Snowflake's own
    * retention-period edge. */
  def commitTimeMillis(spark: SparkSession, root: String, version: Long): Option[Long] = {
    val f = fs(spark, root)
    val rec = new Path(root, s"_commits/$version")
    if (f.exists(rec)) {
      val in = f.open(rec)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    } else {
      val dir = new Path(root, s"v=$version")
      if (f.exists(dir)) Some(f.getFileStatus(dir).getModificationTime) else None
    }
  }

  /** Snowflake `AT (TIMESTAMP => t)` resolution: the version that was
    * latest at `atMillis` — the newest COMMITTED version whose commit
    * time is <= the asked instant. None if the table didn't exist yet.
    * Only manifest-reachable versions participate: a crash-orphaned
    * complete-but-unreferenced slot was never readable and must not
    * become readable retroactively. */
  def versionAt(spark: SparkSession, root: String, atMillis: Long): Option[Long] = {
    val latest = latestVersion(spark, root).getOrElse(return None)
    // newest-first: the common case (a recent instant) reads ONE
    // commit record, not one per retained version
    versionsOn(spark, root).filter(_ <= latest).reverse
      .find(v => commitTimeMillis(spark, root, v).exists(_ <= atMillis))
  }

  /** The table as it stood at `atMillis` — `SELECT … AT(TIMESTAMP =>)`.
    * Re-running a months-old job with its original as-of instant reads
    * the exact bytes it saw, regardless of how many commits landed
    * since. */
  def readAt(spark: SparkSession, root: String, atMillis: Long): DataFrame =
    readVersion(spark, root, versionAt(spark, root, atMillis).getOrElse(
      throw new java.util.NoSuchElementException(
        s"no snapshot at $root existed at t=$atMillis")))

  /** Snowflake `AT`-clause restore: re-commits `version`'s content as
    * the NEW latest version. History stays append-only — the bad
    * versions remain pinned and auditable (vacuum retires them later),
    * readers mid-flight on them are untouched, and the rollback is
    * itself a version that can be rolled back. Returns the new
    * version number. */
  def rollbackTo(spark: SparkSession, root: String, version: Long): Long =
    commit(readVersion(spark, root, version), root)

  /** Drops versions older than the newest `keep`, never the manifest's
    * current version, plus any unreferenced crash leftovers beyond it. */
  def vacuum(spark: SparkSession, root: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "must keep at least the current version")
    val current = latestVersion(spark, root)
    val all = versionsOn(spark, root)
    val keepSet = (all.takeRight(keep) ++ current).toSet
    val drop = all.filterNot(keepSet.contains)
    val f = fs(spark, root)
    drop.foreach { v =>
      f.delete(new Path(root, s"v=$v"), true)
      f.delete(new Path(root, s"_commits/$v"), false)
    }
    drop
  }

  /** Snowflake `DATA_RETENTION_TIME` semantics: retire versions no
    * time-travel query inside the retention window can still reach.
    * `readAt(t)` for any t >= cutoff must keep resolving, and the
    * version in effect AT the cutoff instant is the newest one
    * committed BEFORE it — so that boundary version survives along
    * with everything committed since. (Dropping every version older
    * than the cutoff — the obvious reading — silently breaks
    * `readAt(cutoff)` itself.) The manifest's current version is
    * always kept, whatever its age. Returns the dropped versions. */
  def vacuumOlderThan(spark: SparkSession, root: String,
      cutoffMillis: Long): Seq[Long] = {
    val current = latestVersion(spark, root)
    val all = versionsOn(spark, root)
    val times = all.map(v => v -> commitTimeMillis(spark, root, v)).toMap
    val boundary = all.reverse.find(times(_).exists(_ <= cutoffMillis))
    val keepSet = (all.filter(times(_).forall(_ > cutoffMillis)) ++
      boundary ++ current).toSet
    val drop = all.filterNot(keepSet.contains)
    val f = fs(spark, root)
    drop.foreach { v =>
      f.delete(new Path(root, s"v=$v"), true)
      f.delete(new Path(root, s"_commits/$v"), false)
    }
    drop
  }
}
