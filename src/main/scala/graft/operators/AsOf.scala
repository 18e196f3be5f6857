package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join — for each left row, the single nearest
  * right row per key at-or-before (backward) or at-or-after (forward)
  * the left time, optionally within a tolerance. Spark has no built-in;
  * the scalable formulation is union + window, NOT a range join: tag
  * both sides, sort each key's timeline once, and carry the latest
  * (resp. next) right payload forward with last_value(ignoreNulls). One
  * shuffle on the key, no per-pair range explosion — at 100 TB the
  * range-join formulation materializes |left|×|right-per-key| rows,
  * this one |left|+|right|.
  *
  * Backward matches DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND
  * r.t <= l.t` semantics (ties on equal times take the right row);
  * forward is the mirror (`r.t >= l.t`), the pandas merge_asof
  * `direction='forward'` analog, and tolerance mirrors merge_asof's.
  * Among right rows DUPLICATED on (key, time), the lexicographically
  * greatest carried payload wins — a defined rule (engines' native ASOF
  * joins pick arbitrarily there; cross-engine parity needs the same
  * dedupe on both sides, e.g. QUALIFY row_number ... ORDER BY payload
  * DESC NULLS LAST = 1 in SQL).
  */
object AsOf {

  /** Left as-of join.
    * @param left/right inputs; all left columns are kept
    * @param key equality key column name (present on both sides)
    * @param leftTime/rightTime event-time columns (same type)
    * @param rightCols right payload columns to carry (renamed `asof_*`)
    * @param direction "backward" (nearest r.t ≤ l.t, default) or
    *                  "forward" (nearest r.t ≥ l.t)
    * @param tolerance max |l.t − r.t| for a match, in the time column's
    *                  double-cast units (seconds for timestamps);
    *                  out-of-tolerance matches become nulls
    */
  def asofJoinLeft(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String,
                   rightCols: Seq[String],
                   direction: String = "backward",
                   tolerance: Option[Double] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asofJoinLeft direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    // the right payload travels as ONE struct so the carried columns
    // always come from the same right row (per-column carry could mix
    // rows when individual payload fields are null); the matched right
    // time rides along for the tolerance check
    val rightStructType = org.apache.spark.sql.types.StructType(
      right.schema(rightTime).copy(name = "__asof_rt") +:
        rightCols.map(c => right.schema(c).copy(name = c)))
    val l = left.select(
      (col(key).as("_k") +: col(leftTime).as("_t") +: lit(1).as("_side") +:
        lit(null).cast(rightStructType).as("_r") +:
        leftCols.map(c => col(c).as(s"_l_$c"))): _*)
    // null right times never match under ASOF semantics (the comparison
    // is unknown); unfiltered they'd sort first and leak their payload
    // into every left row lacking a nearer match
    val rStruct = struct((col(rightTime).as("__asof_rt") +: rightCols.map(col)): _*)
    val r = right.filter(col(rightTime).isNotNull).select(
      (col(key).as("_k") +: col(rightTime).as("_t") +: lit(0).as("_side") +:
        rStruct.as("_r") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c"))): _*)
    // tag order: right rows sort before left rows at equal instants so a
    // simultaneous right row is visible to the left row in BOTH
    // directions. Among right rows tied on (key, time) the payload sorts
    // ascending, so last_value carries the LEXICOGRAPHICALLY GREATEST
    // payload — a defined, engine-independent rule an oracle can
    // replicate (a hash tiebreak is deterministic but arbitrary: another
    // engine's ASOF would make a different arbitrary pick). Left rows
    // carry a null _r and are never payload-compared across sides
    // (_side orders first).
    val timeOrd = if (direction == "backward") col("_t").asc else col("_t").desc
    val w = Window.partitionBy(col("_k"))
      .orderBy(timeOrd, col("_side").asc, col("_r").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val bounded = tolerance match {
      case Some(tol) =>
        carried.withColumn("_r",
          when(abs(col("_t").cast("double") -
            col("_r").getField("__asof_rt").cast("double")) <= tol, col("_r")))
      case None => carried
    }
    bounded.select(leftCols.map(c => col(s"_l_$c").as(c)) ++
      rightCols.map(c => col("_r").getField(c).as(s"asof_$c")): _*)
  }
}
