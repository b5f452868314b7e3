package graft.vector

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.VectorFns

/** The Aggregator (UDAF) form of MMR must pick exactly what the
  * flatMapGroups form picks on real embeddings. */
class MmrAggregatorSpec extends SparkSuite {
  import MmrAggregator.Cand

  test("MmrAggregator parity with Mmr.mmrRerank on sf0.001 embeddings") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), VectorFns.asDouble(col("embedding")).as("v"))
      .withColumn("n", VectorFns.normL2(col("v")))
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("n").as("qn"))
    val scored = emb.crossJoin(broadcast(queries))
      .withColumn("rel", VectorFns.dot(col("qv"), col("v")) / (col("qn") * col("n")))
      .select(col("query_id"), col("vec_id"), col("rel"), col("v"))

    val agg = new MmrAggregator(k = 5, fetchK = 20, lambda = 0.5).toColumn
    val viaAgg = scored
      .as[(Long, Long, Double, Seq[Double])]
      .map { case (q, id, rel, v) => (q, Cand(id, rel, v.toArray)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("picks"))
      .flatMap { case (q, picks) => picks.map(p => (q, p.id, p.rank)) }
      .collect().toSet

    val viaGroups = Mmr.mmrRerank(
      emb.filter(col("vec_id") < 3).select(col("vec_id").as("query_id"), col("v").as("qvec")),
      emb.select(col("vec_id"), col("v").as("cvec")),
      k = 5, fetchK = 20, lambda = 0.5)
      .select("query_id", "vec_id", "mmr_rank")
      .as[(Long, Long, Int)].collect().toSet

    assert(viaAgg === viaGroups)
  }
}
