package graft.relational

import graft.{SparkEntry, SparkSuite}

/** q121's co-location invariant: the pair-expansion self-join reads the
  * bucketed table's co-located buckets directly — NO exchange below the
  * join; the only shuffles in the plan belong to the pair aggregate. */
class BucketedBasketSpec extends SparkSuite {

  test("self-join on the bucket key runs with zero exchange below the join") {
    val out = SparkEntry.queries("q121_basket_pairs")(spark, sfDir)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val idx = plan.indexOf("SortMergeJoin")
    assert(idx >= 0, s"expected the hinted SortMergeJoin, got:\n$plan")
    val joinSection = plan.substring(idx)
    assert(!joinSection.contains("Exchange"),
      s"bucketed join inputs must be shuffle-free, got:\n$joinSection")
    assert(plan.contains("Bucketed: true"),
      s"scans must read the bucketed layout:\n$plan")
  }
}
