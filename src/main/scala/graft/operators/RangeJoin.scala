package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) joins — Spark has no built-in range-join strategy,
  * and the naive formulation (`ON p.t BETWEEN i.s AND i.e`) plans as a
  * broadcast-nested-loop / cartesian filter: O(|points|·|intervals|)
  * comparisons per key. The scalable shape is BUCKETIZATION: quantize
  * time at a `grain`, explode each interval to the buckets it covers,
  * equi-join points to interval-buckets on (key, bucket), then apply
  * the exact containment predicate. Cost:
  *
  *  - interval fan-out is bounded: len/grain + 1 rows per interval
  *    (pick grain ≈ median interval length; pathological intervals are
  *    the same skew risk as occupancy — cap/split upstream);
  *  - the join is a plain hash equi-join keyed on (key, bucket) —
  *    shuffles scale linearly, no nested loop anywhere;
  *  - each (point, interval) candidate pair appears exactly once (a
  *    point lives in exactly ONE bucket), so no post-join distinct.
  */
object RangeJoin {

  /** Inner point-in-interval join: every (point, interval) pair with
    * `start <= t <= end`, equality on `key` first. Inputs: `points`
    * with long column `tCol`; `intervals` with long `startCol`/`endCol`
    * (µs, ms — any consistent unit). All columns of both sides are
    * kept (names must not collide). */
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
                      tCol: String, startCol: String, endCol: String,
                      grain: Long): DataFrame = {
    require(grain > 0, "grain must be positive")
    val p = points.withColumn("_bkt", floor(col(tCol) / grain))
    val iv = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("_bkt", explode(sequence(
        floor(col(startCol) / grain), floor(col(endCol) / grain))))
    p.join(iv, Seq(key, "_bkt"))
      .filter(col(tCol) >= col(startCol) && col(tCol) <= col(endCol))
      .drop("_bkt")
  }
}
