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
