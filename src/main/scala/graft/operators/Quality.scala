package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality rules over a frame: audit counts per rule and a
  * valid/invalid split with violation reasons — the expectations
  * pattern (dbt tests / Deequ constraints) as plain DataFrame ops.
  *
  * Scale: `audit` is ONE pass — every rule becomes a conditional-sum
  * aggregate, map-side combined, no per-rule scans. `split` evaluates
  * the rules once into an array column and partitions by its
  * emptiness; both frames derive from the same scan (no double read
  * when the source caches or the sink supports multi-write).
  */
object Quality {

  private val Reserved = Set("__total", "rule", "violations", "total")

  /** One row per rule: (rule, violations, total). */
  def audit(df: DataFrame, rules: Map[String, Column]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    require(!rules.keys.exists(Reserved),
      s"rule names ${Reserved.mkString("/")} collide with output columns")
    val aggs = rules.toSeq.map { case (name, ok) =>
      sum(when(!coalesce(ok, lit(false)), 1L).otherwise(0L)).as(name)
    }
    val counts = df.agg(aggs.head, aggs.tail :+ count(lit(1)).as("__total"): _*)
    counts.unpivot(
        Array(col("__total")), rules.keys.toSeq.map(col).toArray, "rule", "violations")
      .select(col("rule"), col("violations"), col("__total").as("total"))
  }

  /** Adds `violated` (array of failed rule names); a row is valid iff
    * the array is empty. NULL rule results count as violations —
    * unknown is not clean. */
  def withViolations(df: DataFrame, rules: Map[String, Column]): DataFrame =
    df.withColumn("violated",
      filter(
        array(rules.toSeq.map { case (name, ok) =>
          when(coalesce(ok, lit(false)), lit(null).cast("string")).otherwise(lit(name))
        }: _*),
        c => c.isNotNull))

  /** (valid rows without the marker column, invalid rows with it). */
  def split(df: DataFrame, rules: Map[String, Column]): (DataFrame, DataFrame) = {
    val marked = withViolations(df, rules)
    (marked.filter(size(col("violated")) === 0).drop("violated"),
      marked.filter(size(col("violated")) > 0))
  }

  /** COPY INTO `ON_ERROR = CONTINUE` semantics (reference: the stage
    * file-format's tolerance + ingest-dag.sql's TRY_TO_DATE): each
    * required cast is attempted per row; a row where any NON-NULL raw
    * value fails its cast is quarantined with the failing columns as
    * `reject_reasons` instead of being dropped or silently nulled.
    * NULL raw input is NOT an error — Snowflake loads it as NULL
    * (`NULLIF` hive sentinels arrive exactly that way).
    *
    * `casts`: (outputName, rawCol, castedCol) — a Seq, not a Map, so
    * reason order is deterministic. Returns (typed valid frame with
    * each cast applied under outputName, quarantine frame carrying the
    * untouched raw columns + reasons). Both frames are projections of
    * the same marked plan — one scan when the sink supports
    * multi-write, and every try_cast is codegen'd, so the reject path
    * costs nothing over the happy path at 100 TB. */
  def tryIngest(raw: DataFrame, casts: Seq[(String, Column, Column)])
      : (DataFrame, DataFrame) = {
    val marked = markRejects(raw, casts)
    val valid = marked.filter(size(col("reject_reasons")) === 0)
      .drop("reject_reasons")
    val typed = casts.foldLeft(valid) {
      case (df, (name, _, casted)) => df.withColumn(name, casted)
    }
    (typed, marked.filter(size(col("reject_reasons")) > 0))
  }

  /** COPY INTO `VALIDATION_MODE = RETURN_ERRORS` semantics: dry-run
    * the load and return ONE ROW PER CAST ERROR — (id columns,
    * `error_column`, `raw_value`) — writing nothing. Snowflake's form
    * reports (file, line, error); file/line are meaningless for a
    * columnar frame, so the row identity columns take their role.
    * The plan is the same single-scan try_cast projection as
    * [[tryIngest]] with an explode of the failure array — valid rows
    * produce an empty array and vanish at the generator, so at 100 TB
    * the dry-run costs one scan and emits only the (rare) errors. */
  def validationErrors(raw: DataFrame, casts: Seq[(String, Column, Column)],
      idCols: Seq[Column]): DataFrame = {
    require(casts.nonEmpty, "validationErrors needs at least one required cast")
    val errs = filter(
      array(casts.map { case (name, rawCol, casted) =>
        when(rawCol.isNotNull && casted.isNull,
          struct(lit(name).as("error_column"), rawCol.cast("string").as("raw_value")))
          .otherwise(lit(null))
      }: _*),
      e => e.isNotNull)
    raw.select(idCols :+ explode(errs).as("err"): _*)
      .select(idCols :+ col("err.error_column") :+ col("err.raw_value"): _*)
  }

  /** The single-pass marking half of [[tryIngest]]: adds
    * `reject_reasons` (names of failed NON-NULL casts, in `casts`
    * order) without splitting the frame — for summaries or sinks that
    * route on the column in one scan. */
  def markRejects(raw: DataFrame, casts: Seq[(String, Column, Column)]): DataFrame = {
    require(casts.nonEmpty, "markRejects needs at least one required cast")
    raw.withColumn("reject_reasons",
      filter(
        array(casts.map { case (name, rawCol, casted) =>
          when(rawCol.isNull || casted.isNotNull, lit(null).cast("string"))
            .otherwise(lit(name))
        }: _*),
        c => c.isNotNull))
  }

  /** Dynamic data MASKING (Snowflake CREATE MASKING POLICY — the
    * expression-level half of the governance plane the engine CAN
    * enforce; the GRANT half is A10's documented non-goal): each
    * policy maps a column to its redacted form, applied only when
    * `unmaskedWhen` is false. Pure projection — masking runs at scan
    * speed inside whole-stage codegen, and because it rewrites the
    * plan's output columns (not a view on top), a masked frame can be
    * handed to ANY downstream operator with no way to reach through
    * to the raw values. Non-policy columns pass through untouched;
    * naming a column absent from the frame is an analysis error (a
    * typo must not silently leave a column unmasked). */
  def masked(df: DataFrame, policies: Map[String, Column],
      unmaskedWhen: Column): DataFrame = {
    val missing = policies.keySet -- df.columns.toSet
    require(missing.isEmpty,
      s"masking policies name absent columns: ${missing.mkString(", ")}")
    policies.foldLeft(df) { case (acc, (c, redacted)) =>
      acc.withColumn(c,
        when(unmaskedWhen, col(c)).otherwise(redacted))
    }
  }
}
