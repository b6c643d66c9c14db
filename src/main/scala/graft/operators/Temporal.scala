package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal joins for event/transcript analytics. */
object Temporal {

  /** AS-OF join: for every left row, attach the values of the LATEST right row
    * with `ts_right <= ts_left` for the same key (point-in-time lookup; left
    * rows with no prior right row get nulls). Spark has no native ASOF
    * operator, so this composes built-ins — preference (a) of the custom-
    * operator ladder — into the scale-right plan: tag and UNION the two sides,
    * ONE exchange on the key, sort within the key window by (ts, side) with
    * right rows first at equal timestamps (ties are inclusive: a right row at
    * exactly ts_left matches, like DuckDB's `a.ts >= b.ts`), and carry the
    * last non-null right values forward with last(ignoreNulls). No per-row
    * range probe, no broadcast, no skewed band join: cost is one shuffle +
    * one linear window pass, the same shape as any keyed window at 100TB.
    *
    * `right` must carry `key`, `tsCol`, and `valueCols`; the attached columns
    * are named `$prefix<valueCol>`. Multiple right rows at the same (key, ts)
    * are ambiguous by definition (same as SQL ASOF) — callers dedup first.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsCol: String,
      valueCols: Seq[String],
      prefix: String = "asof_"
  ): DataFrame = {
    require(valueCols.nonEmpty, "asofJoin needs at least one value column")
    val leftCols = left.columns.toSeq
    val lAligned = left.select(
      leftCols.map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")) :+
        lit(1).as("__side"): _*)
    val rAligned = right.select(
      leftCols.map { c =>
        if (c == key) col(key)
        else if (c == tsCol) col(tsCol)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++ valueCols.map(c => col(c).as(s"__r_$c")) :+ lit(0).as("__side"): _*)
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lAligned.union(rAligned)
      .select(
        leftCols.map(col) ++
          valueCols.map(c => last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"$prefix$c")) :+
          col("__side"): _*)
      .where(col("__side") === 1)
      .drop("__side")
  }

  /** RANGE (interval-containment) join: pair each event row with every interval
    * of the same key whose [startCol, endCol] contains the event's ts
    * (inclusive bounds). The naive conditional join degenerates to a per-key
    * nested loop in Spark; instead both sides are binned into `bucketSec`-wide
    * time buckets — an interval EXPLODES to every bucket it overlaps, the join
    * runs on (key, bucket) equi-keys, and the exact containment predicate
    * prunes after the hash join. An event lives in exactly one bucket, so each
    * (event, interval) pair joins at most once (no dedup pass). At 100TB this
    * is a shuffle-on-key hash join with bounded row amplification
    * ceil(len/bucket)+1 per interval; pick bucketSec near the typical interval
    * length to keep it ~2x.
    *
    * Output: every matched pair, event columns + the interval's columns
    * (callers aggregate). Interval columns other than key/start/end must not
    * collide with event column names.
    */
  def rangeJoin(
      events: DataFrame,
      intervals: DataFrame,
      key: String,
      tsCol: String,
      startCol: String,
      endCol: String,
      bucketSec: Long = 3600L
  ): DataFrame = {
    val e = events.withColumn("__ebucket", floor(unix_timestamp(col(tsCol)) / bucketSec))
    val i = intervals
      .withColumn("__ibucket", explode(sequence(
        floor(unix_timestamp(col(startCol)) / bucketSec),
        floor(unix_timestamp(col(endCol)) / bucketSec))))
      .withColumnRenamed(key, "__ikey")
    e.join(i, col("__ebucket") === col("__ibucket") && col(key) === col("__ikey"))
      .where(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__ebucket", "__ibucket", "__ikey")
  }
}
