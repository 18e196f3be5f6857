package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join — for each left row, the single right row
  * with the greatest right time ≤ the left time, per key. Spark has no
  * built-in; the scalable formulation is union + window, NOT a range
  * join: tag both sides, sort each key's timeline once, and carry the
  * latest right payload forward with last_value(ignoreNulls). One
  * shuffle on the key, no per-pair range explosion — at 100 TB the
  * range-join formulation materializes |left|×|right-per-key| rows,
  * this one |left|+|right|.
  *
  * Matches DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND r.t <= l.t`
  * semantics (ties on equal times take the right row, sorted last).
  */
object AsOf {

  /** Left as-of join.
    * @param left/right inputs; all left columns are kept
    * @param key equality key column name (present on both sides)
    * @param leftTime/rightTime event-time columns (same type)
    * @param rightCols right payload columns to carry (renamed as-is)
    */
  def asofJoinLeft(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String,
                   rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag: right rows sort before left rows at equal instants so a
    // simultaneous right row is visible to the left row (r.t <= l.t)
    // the right payload travels as ONE struct so the carried columns
    // always come from the same right row (per-column carry could mix
    // rows when individual payload fields are null)
    val rightStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c).copy(name = c)))
    val l = left.select(
      (col(key).as("_k") +: col(leftTime).as("_t") +: lit(1).as("_side") +:
        lit(null).cast(rightStructType).as("_r") +:
        leftCols.map(c => col(c).as(s"_l_$c"))): _*)
    // null right times never match under ASOF semantics (r.t <= l.t is
    // unknown); unfiltered they'd sort first and leak their payload into
    // every left row lacking an earlier match
    val r = right.filter(col(rightTime).isNotNull).select(
      (col(key).as("_k") +: col(rightTime).as("_t") +: lit(0).as("_side") +:
        struct(rightCols.map(col): _*).as("_r") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c"))): _*)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col(s"_l_$c").as(c)) ++
        rightCols.map(c => col("_r").getField(c).as(s"asof_$c")): _*)
  }
}
