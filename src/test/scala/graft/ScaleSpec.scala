package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-pattern operators: results must equal the naive formulation;
  * plans must show the shuffle structure the pattern promises. */
class ScaleSpec extends AnyFunSuite {
  import TestSpark._

  test("salted aggregation equals naive groupBy on a skewed key") {
    val ev = sources.Tables.events(spark, sf)
      // manufacture skew: fold most users onto one key
      .withColumn("k", when(col("user_id") < 40, lit(0L)).otherwise(col("user_id")))
    val naive = ev.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), math.round(r.getDouble(2) * 100)))
      .toMap
    val salted = operators.Scale.saltedAgg(ev, "k", "value", saltBuckets = 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), math.round(r.getDouble(2) * 100)))
      .toMap
    assert(salted == naive)
  }

  test("salted join equals plain join and spreads the hot key") {
    val fact = sources.Tables.lineitem(spark, sf).select(col("l_suppkey").as("k"),
      col("l_extendedprice").as("v"))
    val dim = sources.Tables.supplier(spark, sf).select(col("s_suppkey").as("k"),
      col("s_name"))
    val naive = fact.join(dim, Seq("k")).count()
    val salted = operators.Scale.saltedJoin(fact, dim, "k", saltBuckets = 8).count()
    assert(salted == naive)
  }

  test("AQE skew join splits an engineered hot band key, output equal to the non-AQE run") {
    // The failure mode a 100x scale-up of the minhash band join hits
    // first: one band value (a boilerplate-heavy signature) owns a
    // large share of rows, and its shuffle partition dwarfs the rest.
    // This test plants exactly that shape — (band_key, doc_id) tables
    // where one key holds ~30% of the left side — and demonstrates
    // AQE's OptimizeSkewedJoin splitting the hot partition at runtime,
    // with bit-identical output. Complements Scale.saltedJoin: salting
    // is for when the skew is KNOWN ahead (stable hot keys, or
    // non-join aggs AQE can't split); AQE handles the unknown-skew
    // case with zero code change — the production default for the
    // dedup band joins.
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // production defaults detect skew at 256 MB partitions; scale the
      // thresholds down so the same machinery fires on a test-sized
      // shuffle (the factor-over-median trigger is what's under test)
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "65536")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.shuffle.partitions", "32")
      val n = 60000
      // hot band: key 0 holds 30% of the probe side; the signature
      // payload is hash material (incompressible enough that the hot
      // partition's bytes actually register against the threshold).
      // NOTE the join must be the stage's LAST shuffle consumer: AQE
      // declines to split a skewed join whose output partitioning
      // feeds a same-key aggregate (the split would force an extra
      // shuffle) unless forceOptimizeSkewedJoin is set — checksums are
      // therefore computed driver-side here.
      val left = spark.range(n).select(
        when(col("id") % 10 < 3, 0L).otherwise(col("id") % 1024).as("bk"),
        col("id").as("new_id"), sha2(col("id").cast("string"), 256).as("sig"))
      val right = spark.range(1024).select(
        col("id").as("bk"), (col("id") + 1000000L).as("corpus_id"))
      def run(): Seq[(Long, Long, Long)] = {
        val joined = left.join(right, Seq("bk"))
          .select(col("bk"), col("new_id"), col("corpus_id"),
            length(col("sig")).as("sl"))
        val rows = joined.collect().map(r =>
          (r.getLong(0), r.getLong(1) + r.getLong(2) + r.getInt(3), 1L))
        val agg = rows.groupBy(_._1).map { case (k, vs) =>
          (k, vs.map(_._2).sum, vs.map(_._3).sum) }.toSeq.sortBy(_._1)
        // stash the executed plan for the skew assertion
        lastPlan = joined.queryExecution.executedPlan.collectFirst {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan
        }.getOrElse(fail("no AdaptiveSparkPlanExec in the executed plan"))
        agg
      }
      val withAqe = run()
      // QueryStage nodes are leaves (their plan hangs off a field, not
      // children), so assert on the rendered final plan: the SMJ must
      // carry the skew marker and the hot side's shuffle read must be
      // a skew-split one
      val rendered = lastPlan.toString
      assert(rendered.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire on the hot band:\n$rendered")
      assert(rendered.contains("skewed"),
        s"expected a skew-split AQEShuffleRead:\n$rendered")
      // equality: same data, skew handling off
      conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val without = run()
      assert(withAqe == without, "skew-split output must be identical")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
  @volatile private var lastPlan: org.apache.spark.sql.execution.SparkPlan = _

  test("bucketed table join on the bucket key avoids the shuffle") {
    // a fresh catalog won't overwrite an orphaned managed-table dir from
    // a previous JVM — clear locations first
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val o = sources.Tables.orders(spark, sf)
    operators.Scale.writeBucketed(o.select("o_orderkey", "o_totalprice"),
      "orders_b", "o_orderkey", buckets = 4)
    operators.Scale.writeBucketed(
      sources.Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", buckets = 4)
    val joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$p")
    assert(joined.count() == sources.Tables.lineitem(spark, sf).count())
  }
}
