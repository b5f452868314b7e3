package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair list — the
  * cluster-representative dedup stage (SCALING.md design note): pairs
  * (id1, id2) → one `canonical_id` (component minimum) per doc.
  *
  * Iterative min-label propagation on DataFrames: each round joins every
  * node's current label with its neighbors' labels and keeps the min.
  * Rounds needed = graph diameter ≈ O(log n) with doubling; dup groups
  * are stars (diameter ≤ 2), so this converges in 2-3 rounds. Each round
  * is one shuffle on id — no driver-side graph state; at 100 TB this is
  * the standard label-propagation loop (AQE handles the shrinking
  * frontier). Each round's labels are locally checkpointed so lineage
  * stays one-join deep: a straggler retry at round k replays one join,
  * not the whole k-round chain.
  */
object Clusters {

  /** pairs(id1, id2) → (id, canonical_id), one row per node appearing in
    * any pair. Deterministic: canonical = min id in the component. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    // undirected edge list, both directions
    val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .unionByName(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(false) // materialized by the firstSum action below
    // min-propagation only ever lowers labels, so the label sum is a
    // strictly-decreasing convergence witness: one cheap scalar agg per
    // round instead of a change-detection join
    val firstSum = labels.agg(sum(col("label"))).collect()(0)
    if (firstSum.isNullAt(0)) { // no pairs at all → no components
      edges.unpersist()
      return labels.select(col("id"), col("label").as("canonical_id"))
    }
    var prevSum = firstSum.getLong(0)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // every node adopts min(own label, neighbors' labels)
      val neighborLabels = edges
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("label", "nlabel"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("nlabel")).as("minNeighbor"))
      // lazy local checkpoint: the single convergence action below both
      // materializes this round's labels AND truncates lineage, so each
      // round is exactly one job and retries never recompute prior
      // rounds. Old rounds' checkpoint blocks are dropped by the
      // ContextCleaner once the superseded DataFrame is unreachable.
      val next = labels.join(neighborLabels, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("minNeighbor"), col("label"))).as("label"))
        .localCheckpoint(false)
      val nextSum = next.agg(sum(col("label"))).collect()(0).getLong(0)
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      iter += 1
    }
    edges.unpersist()
    labels.select(col("id"), col("label").as("canonical_id"))
  }
}
