package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the driver-generated synthetic star schema
  * (`/root/testdata/sf*`; see TESTDATA.md).
  *
  * All loads are plain parquet scans so Catalyst's predicate pushdown and
  * column pruning reach the file source (verify with
  * `.explain("formatted")` → `PushedFilters` / `ReadSchema`). At cluster
  * scale these would be partitioned tables (`…/dt=…/`) — `latest` mirrors
  * the reference's read-latest-partition discipline
  * (reference: src/normalize/io.ts:5-12).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4
    * rejects outright (PARQUET_TYPE_ILLEGAL). Read nanos as long
    * (legacy conf) and truncate to microseconds — the same truncation
    * DuckDB applies implicitly when casting ns→µs — so downstream
    * second/day-granularity logic agrees with the oracle.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  private val loaders: Map[String, (SparkSession, String) => DataFrame] = Map(
    "region" -> region _, "nation" -> nation _, "customer" -> customer _,
    "supplier" -> supplier _, "part" -> part _, "orders" -> orders _,
    "lineitem" -> lineitem _, "events" -> events _,
    "documents" -> documents _, "embeddings" -> embeddings _)

  /** Register every table as a temp view so the full corpus is
    * queryable from `spark.sql(...)` — `events` goes through the
    * ns-timestamp normalization, not a bare parquet read. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => loaders(n)(spark, sfDir).createOrReplaceTempView(n) }

  /** Latest lexicographic partition of a date-partitioned dataset dir —
    * the reference's "latest dataset date dir" (src/normalize/io.ts:5-12).
    * Driver-side FS listing; partition pruning then applies downstream.
    */
  def latestPartition(spark: SparkSession, baseDir: String): Option[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(baseDir),
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(baseDir)
    if (!fs.exists(p)) None
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .sorted(Ordering[String]).lastOption
  }
}
