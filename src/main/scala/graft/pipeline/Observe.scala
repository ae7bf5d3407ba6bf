package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Free per-stage metrics for production pipelines — the reference
  * logs row counts at every ETL stage (extract n, gated n, loaded n);
  * recomputing them with `count()` doubles the work, and at 100 TB a
  * recount is a full extra scan.
  *
  * `observe()` rides the metrics on the SAME pass as accumulators
  * evaluated per-row during the action, then a
  * [[QueryExecutionListener]] collects them when the action
  * completes: zero extra jobs, exact values, any commutative
  * aggregate (counts, null counts, sums, min/max).
  */
object Observe {

  /** Tag a stage with named observations. Convenience wrapper over
    * `df.observe` with the common count/null-count shape.
    */
  def stage(df: DataFrame, name: String, extra: Seq[org.apache.spark.sql.Column] = Nil): DataFrame =
    df.observe(name, count(lit(1)).as("rows"), extra: _*)

  /** Collects every observation of every completed action. One
    * instance per session; metrics keyed (observationName -> column
    * -> value). Thread-safe for the listener-bus callbacks.
    */
  final class Collector extends QueryExecutionListener {
    private val seen = new java.util.concurrent.ConcurrentHashMap[String, Map[String, Any]]()

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        seen.put(name, row.schema.fieldNames.zip(row.toSeq).toMap)
      }

    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()

    def metrics(name: String): Option[Map[String, Any]] = Option(seen.get(name))
    def clear(): Unit = seen.clear()
  }

  /** Register a collector on the session's listener bus. */
  def attach(spark: SparkSession): Collector = {
    val c = new Collector
    spark.listenerManager.register(c)
    c
  }

  /** Reconciliation predicate: input rows == kept + gated — the E1
    * quality-gate accounting identity, checked from observations of
    * one pass, no recount.
    */
  def reconciles(c: Collector, input: String, kept: String, gated: String): Boolean =
    (for {
      i <- c.metrics(input).map(_("rows").asInstanceOf[Long])
      k <- c.metrics(kept).map(_("rows").asInstanceOf[Long])
      g <- c.metrics(gated).map(_("rows").asInstanceOf[Long])
    } yield i == k + g).getOrElse(false)
}
