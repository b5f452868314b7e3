package graft.olap

import graft.{SparkEntry, SparkSuite}
import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q126's contract: the distributed bin-packing plan must equal the naive
  * global-window derivation exactly, and the plan must be a valid
  * sequential compaction — contiguous bins, every input covered once,
  * bins (except possibly the last) filled to at least the target. */
class CompactionPlanSpec extends SparkSuite {

  test("distributed planner equals the naive global prefix-sum plan") {
    val fast = SparkEntry.queries("q126_compaction_plan")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val files = Tables.documents(spark, sfDir)
      .select(col("doc_id"), octet_length(col("text")).cast("long").as("bytes"))
    val target = math.max(files.agg(sum(col("bytes"))).head().getLong(0) / 32, 1L)
    // the naive single-partition window — fine at spec scale, the thing
    // the operator exists to avoid at corpus scale
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val slow = files.withColumn("cum", sum(col("bytes")).over(w))
      .withColumn("bin", expr(s"(cum - bytes) div $target"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bin_bytes"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("bin"))
      .collect().map(_.toSeq).toSeq
    assert(fast.nonEmpty && fast == slow,
      s"planner diverged from naive plan (sizes ${fast.size}/${slow.size})")
  }

  test("the plan is a valid sequential compaction") {
    val plan = SparkEntry.queries("q126_compaction_plan")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val files = Tables.documents(spark, sfDir)
      .select(col("doc_id"), octet_length(col("text")).cast("long").as("bytes"))
    val nFiles = files.count()
    val total = files.agg(sum(col("bytes"))).head().getLong(0)
    val target = math.max(total / 32, 1L)
    val maxFile = files.agg(max(col("bytes"))).head().getLong(0)
    assert(plan.map(_._2).sum == nFiles, "every input file lands in exactly one bin")
    assert(plan.map(_._3).sum == total, "bin bytes must sum to the corpus total")
    // doc spans are contiguous and ordered: bin k's last_doc < bin k+1's first_doc
    plan.sliding(2).foreach {
      case Array((_, _, _, _, lastA), (_, _, _, _, firstB)) =>
        assert(lastA < firstB, s"bins overlap: $lastA >= $firstB")
      case _ =>
    }
    // sequential fill: a bin closes only once it reached the target, so
    // every bin except the last holds >= target - (largest file - 1) bytes
    // and no bin exceeds target + largest file
    plan.dropRight(1).foreach { case (bin, _, bytes, _, _) =>
      assert(bytes + maxFile > target, s"bin $bin closed under-filled: $bytes")
    }
    plan.foreach { case (bin, _, bytes, _, _) =>
      assert(bytes < target + maxFile, s"bin $bin overfilled: $bytes")
    }
  }
}
