package graft.util

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import scala.jdk.CollectionConverters._

/** Collects `Dataset.observe(...)` metrics published by operators (e.g.
  * `jaccard_candidates` / `minhash_candidates` from the dedup family) so
  * Bench can surface pruning efficacy in the round artifact.
  *
  * Observed metrics ride the query's own execution — no extra job, no
  * second pass — and are delivered to [[QueryExecutionListener]]s on the
  * listener bus, which is asynchronous; [[await]] therefore polls until
  * the expected keys arrive (or the timeout lapses). Values are
  * last-write-wins per metric name, which is exactly the per-round bench
  * semantics (each gated query runs once).
  */
object OpMetrics {
  private val values = new ConcurrentHashMap[String, Long]()
  // weakly-keyed so the registry never pins a stopped SparkSession in
  // memory for the JVM lifetime
  private val installedIn = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Register the scraping listener on this session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (installedIn.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (row.schema.nonEmpty) row.get(0) match {
              case n: java.lang.Number => values.put(name, n.longValue())
              case _ => ()
            }
          }
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit = ()
      })
    }

  def snapshot: Map[String, Long] = values.asScala.toMap

  /** Driver-side publication for metrics that are not `observe()`able —
    * e.g. the round count of an iterative operator, known only when the
    * driver loop exits. Same last-write-wins semantics. */
  def publish(name: String, value: Long): Unit = values.put(name, value)

  /** Drop all collected values — call between bench runs / test cases so
    * [[await]] cannot be satisfied by a stale metric from a previous
    * execution in the same JVM. */
  def reset(): Unit = values.clear()

  /** Poll until every key in `keys` has a value or `timeoutMs` elapses
    * (listener delivery is async); returns the snapshot either way. */
  def await(keys: Set[String], timeoutMs: Long = 3000L): Map[String, Long] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!keys.subsetOf(values.keySet.asScala) &&
           System.nanoTime() < deadline) Thread.sleep(25L)
    snapshot
  }
}
