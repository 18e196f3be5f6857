package graft
import org.apache.spark.sql.SparkSession

/** Deliverable helper (guide §1.1/§7.2): write each named query's
  * `.explain("formatted")` physical plan to
  * `$SPARK_GRAFT_PLANS_DIR/<name>_<suffix>.txt`. Table-format queries
  * build their scratch tables while the frame is constructed, so the
  * captured plan is the final returned read — exactly what the bench
  * times with the noop sink. Not part of the driver contract.
  * Usage:
  *   SPARK_GRAFT_PLANS_DIR=plans/r14 SPARK_GRAFT_PLANS_SUFFIX=after \
  *     sbt "runMain graft.PlanDump q_mv_join,q_topn"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r14")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLANS_SUFFIX", "after")
    val names = args.headOption.map(_.split(",").toSeq).getOrElse(Nil)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.useIdInClassName", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.OpMetrics.install(spark)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
