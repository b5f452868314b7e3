package graft.relational

import graft.{SparkEntry, SparkSuite}
import graft.core.Tables
import org.apache.spark.sql.functions._

/** q124's correctness contract, independent of the DuckDB gate: the
  * degree-oriented enumeration must agree with a NAIVE canonical-triple
  * implementation (no orientation — a different algorithm entirely), and
  * the orientation must actually bound the wedge work that makes the
  * operator survive hub nodes at 100×.
  */
class TriangleSpec extends SparkSuite {

  /** Brute-force per-node triangle counts via the canonical a<b<c triple
    * join over the same supported edge set — the oracle's derivation,
    * re-implemented in Spark with zero shared code with the query. */
  private def naive() = {
    val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey"))
    val a = li.select(col("l_orderkey"), col("l_partkey").as("p1"))
    val b = li.select(col("l_orderkey"), col("l_partkey").as("p2"))
    val edges = a.join(b, Seq("l_orderkey")).filter(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select(col("p1"), col("p2"))
    val e1 = edges.select(col("p1").as("x"), col("p2").as("y"))
    val e2 = edges.select(col("p1").as("x"), col("p2").as("z"))
    val e3 = edges.select(col("p1").as("y"), col("p2").as("z"))
    val tris = e1.join(e2, Seq("x")).filter(col("y") < col("z")).join(e3, Seq("y", "z"))
    tris.select(col("x").as("node"))
      .unionAll(tris.select(col("y").as("node")))
      .unionAll(tris.select(col("z").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }

  test("degree-oriented triangle counts equal the naive canonical-triple join") {
    val fast = SparkEntry.queries("q124_triangles")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val slow = naive().collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(fast.nonEmpty, "sf0.001 basket graph must contain triangles")
    assert(fast == slow, s"oriented=${fast.take(5)}... naive=${slow.take(5)}...")
  }

  test("orientation bounds out-degree by O(sqrt m): max out-deg well under max undirected deg") {
    // re-derive the oriented edge set from the raw tables (the query's
    // own result is per-node, so the probe rebuilds the orientation)
    val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey"))
    val a = li.select(col("l_orderkey"), col("l_partkey").as("p1"))
    val b = li.select(col("l_orderkey"), col("l_partkey").as("p2"))
    val edges = a.join(b, Seq("l_orderkey")).filter(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select(col("p1"), col("p2"))
    val und = edges.select(col("p1").as("u")).unionAll(edges.select(col("p2").as("u")))
      .groupBy(col("u")).agg(count(lit(1)).as("d"))
    val m = edges.count()
    val maxDeg = und.agg(max(col("d"))).head().getLong(0)
    val d1 = und.select(col("u").as("p1"), col("d").as("deg1"))
    val d2 = und.select(col("u").as("p2"), col("d").as("deg2"))
    val fwd = col("deg1") < col("deg2") ||
      (col("deg1") === col("deg2") && col("p1") < col("p2"))
    val outDeg = edges.join(d1, Seq("p1")).join(d2, Seq("p2"))
      .select(when(fwd, col("p1")).otherwise(col("p2")).as("src"))
      .groupBy(col("src")).agg(count(lit(1)).as("od"))
      .agg(max(col("od"))).head().getLong(0)
    // the theory bound is ~sqrt(2m); allow slack for the tie-break tail
    assert(outDeg <= math.ceil(3 * math.sqrt(2.0 * m)).toLong,
      s"orientation failed to cap out-degree: maxOut=$outDeg, m=$m, maxDeg=$maxDeg")
    assert(outDeg < maxDeg || maxDeg <= 4,
      s"oriented out-degree ($outDeg) should be below the raw hub degree ($maxDeg)")
  }
}
