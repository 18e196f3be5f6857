package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, hash, lit, pmod}

/** Partitioned parquet table layout — the engine's scale-out
  * counterpart to the reference's JSONL date partitions
  * (lib/dataset.ts layout, generalized):
  *
  *  - directory partitioning on low-cardinality keys → partition
  *    PRUNING: a filtered read never lists, opens, or schedules
  *    non-matching directories (visible as `PartitionFilters` in the
  *    scan node);
  *  - `sortWithinPartitions` on the query keys → clustered row groups,
  *    so parquet min/max statistics skip row groups inside each file
  *    (`PushedFilters` actually bite instead of scanning everything);
  *  - `maxRecordsPerFile` bounds file size so a skewed partition key
  *    cannot produce one giant unsplittable-for-listing file.
  *
  * Write-side cost: one shuffle, keyed on (partition keys, salt) where
  * salt = hash(sort keys) mod `filesPerPartition` — each task writes at
  * most one file per partition value (no small-files explosion), while
  * up to `filesPerPartition` tasks share each partition value's rows.
  * Salting the shuffle key is what keeps the write DISTRIBUTED: keyed
  * on the partition columns alone, write parallelism is capped at the
  * number of distinct partition VALUES — a 4-value key funnels a 100 TB
  * write through 4 tasks (~25 TB each). `filesPerPartition` bounds the
  * file count per directory exactly, so the layout stays listable.
  */
object ParquetSink {

  def writeTable(df: DataFrame, path: String, partitionCols: Seq[String],
                 sortCols: Seq[String] = Nil,
                 maxRecordsPerFile: Long = 0L,
                 filesPerPartition: Int = 8): Unit = {
    require(partitionCols.nonEmpty, "writeTable needs at least one partition column")
    require(filesPerPartition >= 1, "filesPerPartition must be >= 1")
    // salt over the sort keys (or every non-partition column when no
    // sort keys are given) so rows with equal sort keys land in the
    // same file and the within-file clustering is preserved
    val saltSrc: Seq[Column] =
      (if (sortCols.nonEmpty) sortCols
       else df.columns.toSeq.filterNot(partitionCols.contains)).map(col)
    val shuffleKeys = partitionCols.map(col) ++
      (if (filesPerPartition > 1 && saltSrc.nonEmpty)
        Seq(pmod(hash(saltSrc: _*), lit(filesPerPartition)))
      else Nil)
    val clustered = df
      .repartition(shuffleKeys: _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
    val writer = clustered.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
    (if (maxRecordsPerFile > 0)
      writer.option("maxRecordsPerFile", maxRecordsPerFile)
    else writer).parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
