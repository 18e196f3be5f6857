package graft
/** Scratch plan/timing probe for local iteration: runs one named gated
  * query on a given sf dir and prints its executed plan. Not a test —
  * a `main` driven by hand while tuning operators. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_agg")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
