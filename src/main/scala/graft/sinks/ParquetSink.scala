package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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
  * Write-side cost: one shuffle (repartition on the partition keys) so
  * each task writes at most one file per partition value instead of
  * every task writing every partition (the small-files explosion).
  */
object ParquetSink {

  def writeTable(df: DataFrame, path: String, partitionCols: Seq[String],
                 sortCols: Seq[String] = Nil,
                 maxRecordsPerFile: Long = 0L): Unit = {
    require(partitionCols.nonEmpty, "writeTable needs at least one partition column")
    val clustered = df
      .repartition(partitionCols.map(col): _*)
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
