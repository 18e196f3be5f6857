package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Contiguous global row numbering at scale — the distributed
  * ROW_NUMBER() OVER (ORDER BY …). The naive window form funnels the
  * whole table through ONE task (an unpartitioned window), which is
  * the first thing that dies at 100 TB; `monotonically_increasing_id`
  * is distributed but leaves holes between partitions. This operator
  * produces the dense 1-based rank of every row in the total order
  * with no single-task stage and no extra full-data shuffle beyond
  * the range sort itself:
  *
  *   1. range-partition + sort by the order key (the one unavoidable
  *      shuffle — it IS the total order);
  *   2. per-partition local index, free from
  *      `monotonically_increasing_id`'s bit layout
  *      (pid · 2³³ + row-in-partition);
  *   3. per-partition row counts (metadata-scale: |partitions| rows)
  *      → exclusive prefix sums → broadcast back as offsets;
  *   4. id = offset(pid) + local + 1, a codegen'd projection.
  *
  * The sorted table is materialized ONCE (persisted at DISK_ONLY —
  * no executor-memory pressure, same local-disk footprint the sort's
  * shuffle files already paid) and BOTH the counts pass and the
  * output pass read that single materialization. This is load-bearing
  * for correctness, not a cache optimization: Spark's RangePartitioner
  * seeds its reservoir sample from the RDD id, so two independent
  * physical executions of the same range sort can draw DIFFERENT
  * boundaries once partitions exceed the per-partition sample size —
  * offsets computed from one execution applied to the other's
  * partitions would silently duplicate and drop ids. Pinning one
  * physical plan pins one partitioner instance: even a lost-block
  * recompute re-executes the SAME plan (its shuffle dependency and
  * bounds are fixed per instance), so the two passes provably agree.
  * The blocks are released by Spark's context cleaner when the result
  * is garbage-collected; callers looping over many id assignments can
  * force it earlier via `result.unpersist()`-equivalent on their side.
  * Contract: the order columns must totally order the rows (make the
  * last one a unique id); partitions may hold up to 2³³ rows, the id
  * generator's own bound.
  */
object Ids {

  /** Add a dense 1-based `idName` column ranking rows by `orderCols`
    * (ties forbidden by contract — append a unique key). Output rows
    * equal the input rows; result is deterministic and equal to
    * ROW_NUMBER() OVER (ORDER BY orderCols). */
  def withSequentialIds(df: DataFrame, orderCols: Seq[String],
                        idName: String = "seq_id",
                        numPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "order by at least one column")
    val spark = df.sparkSession
    val n =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val keys = orderCols.map(col)
    // ONE materialization of the sort — both passes below must see the
    // same partitioning (see the object doc: range bounds are sampled
    // per physical execution, so a re-executed sort is NOT guaranteed
    // to reproduce them)
    val sorted = df.repartitionByRange(n, keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("_gid_mid", monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // mid = pid << 33 | local-row-index: both components recoverable
    val pid   = shiftright(col("_gid_mid"), 33)
    val local = col("_gid_mid").bitwiseAND(lit((1L << 33) - 1))
    // pass 1 (materializes the persisted sort): |partitions| counts —
    // metadata scale, like the equi-depth histogram's boundary pass
    val counts = sorted.groupBy(pid.as("_gid_pid"))
      .agg(count(lit(1)).as("_gid_n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2).init)
    val offsetDf = spark.createDataFrame(offsets.toIndexedSeq)
      .toDF("_gid_pid", "_gid_off")
    // pass 2: read the SAME materialization, attach the offset, project
    sorted
      .join(broadcast(offsetDf), pid === col("_gid_pid"))
      .withColumn(idName, col("_gid_off") + local + lit(1L))
      .drop("_gid_mid", "_gid_pid", "_gid_off")
  }
}
