package graft.plans

import org.apache.spark.sql.execution.ExplainMode

import graft.{SparkEntry, SparkSuite}

/** Whole-board physical-plan lint: mechanizes the audit that every
  * cross join on the board must be against an explicitly-broadcast
  * bounded side. A `crossJoin(broadcast(…))` plans as
  * BroadcastNestedLoopJoin; a cross join that LOST its broadcast (a
  * refactor dropping the hint, a threshold change, an optimizer rule
  * regression) plans as CartesianProduct — the all-pairs shuffle that
  * is never scale-correct on this board. One spec, every batch query,
  * so the invariant holds by construction instead of by per-round
  * review.
  *
  * Streaming queries are excluded (their builders run real
  * writeStream harnesses, not a plannable batch DataFrame); their
  * joins are covered by their own specs. */
class PlanLintSpec extends SparkSuite {

  test("no batch query plans a CartesianProduct") {
    val streaming = graft.queries.StreamQueries.all.keySet
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if !streaming(name)) {
      val plan = fn(spark, sfDir).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      if (plan.contains("CartesianProduct")) offenders += name
    }
    assert(offenders.isEmpty,
      s"queries planning an unbounded cartesian product: ${offenders.mkString(", ")}")
  }
}
