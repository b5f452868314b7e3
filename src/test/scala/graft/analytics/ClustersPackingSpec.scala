package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ClustersPackingSpec extends SparkSuite {

  test("connected components: stars, chains, and singletons resolve to min id") {
    import spark.implicits._
    // component A: chain 1-2-3-4 (diameter 3); component B: star 10-{11,12};
    // pair 20-21 alone
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L), (20L, 21L))
      .toDF("id1", "id2")
    val cc = Clusters.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc(1L) === 1L && cc(2L) === 1L && cc(3L) === 1L && cc(4L) === 1L)
    assert(cc(10L) === 10L && cc(11L) === 10L && cc(12L) === 10L)
    assert(cc(20L) === 20L && cc(21L) === 20L)
  }

  test("connected components: diameter-8 chain converges under the checkpointed loop") {
    import spark.implicits._
    // chain 0-1-2-...-8: min-label propagation needs several rounds, so
    // this exercises the per-round localCheckpoint lineage cut
    val pairs = (0L until 8L).map(i => (i, i + 1)).toDF("id1", "id2")
    val cc = Clusters.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(cc.size === 9)
    assert((0L to 8L).forall(cc(_) === 0L))
  }

  test("connected components: diameter > maxIter fails LOUDLY in strict mode") {
    import spark.implicits._
    // a 12-edge chain needs ~12 propagation rounds; maxIter=3 cannot
    // finish — the guard must throw, never return partial labels silently
    val pairs = (0L until 12L).map(i => (i, i + 1)).toDF("id1", "id2")
    val e = intercept[IllegalStateException] {
      Clusters.connectedComponents(pairs, maxIter = 3).count()
    }
    assert(e.getMessage.contains("did not converge"))
    // non-strict mode returns the partial propagation for diagnostics
    val partial = Clusters.connectedComponents(pairs, maxIter = 3, strict = false)
      .as[(Long, Long)].collect().toMap
    assert(partial.size === 13)
    assert(partial(12L) > 0L) // tail of the chain provably NOT fully propagated
  }

  test("star contraction: agrees with min-propagation on stars, chains, cliques") {
    import spark.implicits._
    val pairs = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L), (20L, 21L))
      ++ Seq((30L, 31L), (30L, 32L), (31L, 32L))) // triangle
      .toDF("id1", "id2")
    val viaProp = Clusters.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    val viaStar = Clusters.connectedComponentsStarContraction(pairs)
      .as[(Long, Long)].collect().toMap
    assert(viaStar === viaProp)
  }

  test("star contraction: deep chain converges in O(log² n) rounds where min-propagation cannot") {
    import spark.implicits._
    // a 60-edge chain has diameter 60: min-propagation with maxIter=10
    // provably fails (strict throws), star contraction finishes well
    // inside its default 25-round budget
    val chain = (0L until 60L).map(i => (i, i + 1)).toDF("id1", "id2")
    intercept[IllegalStateException] {
      Clusters.connectedComponents(chain, maxIter = 10).count()
    }
    val cc = Clusters.connectedComponentsStarContraction(chain, maxIter = 25)
      .as[(Long, Long)].collect().toMap
    assert(cc.size === 61)
    assert((0L to 60L).forall(cc(_) === 0L))
  }

  test("star contraction ≡ min-propagation on a seeded random graph") {
    import spark.implicits._
    // fixed-seed Erdős–Rényi-ish graph: 300 nodes, 220 random edges →
    // a mix of singleton-free components, chains, and merged blobs
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(220)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter { case (a, b) => a != b }
      .toDF("id1", "id2")
    val viaProp = Clusters.connectedComponents(pairs, maxIter = 60)
      .as[(Long, Long)].collect().toMap
    val viaStar = Clusters.connectedComponentsStarContraction(pairs)
      .as[(Long, Long)].collect().toMap
    assert(viaStar === viaProp)
    // sanity: labels are component minima (idempotent under re-labeling)
    assert(viaStar.values.toSet.subsetOf(viaStar.keySet))
    assert(viaStar.values.forall(m => viaStar(m) == m))
  }

  test("star contraction: empty pair list returns empty, no NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(Clusters.connectedComponentsStarContraction(empty).count() === 0)
  }

  test("dedup clusters on the exact-copy corpus: every cluster has size 2") {
    val out = graft.queries.PipelineQueries.dedupClusters(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) === 2L)) // doc + its offset copy
    assert(out.forall(_.getLong(0) < 1000000L)) // canonical is the original id
  }

  test("packing: bins respect capacity, every doc packed, deterministic") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("n_tokens", expr("size(filter(split(text, ' '), x -> x != ''))"))
      .select(col("doc_id"), col("n_tokens"))
    val packed = Packing.packFirstFit(spark, docs, capacity = 512, bucketSize = 100)
    val rows = packed.collect()
    assert(rows.forall(_.getLong(3) <= 512L)) // no bin over capacity
    val totalDocs = rows.map(_.getLong(2)).sum
    assert(totalDocs === docs.count())
    val totalTokens = rows.map(_.getLong(3)).sum
    assert(totalTokens === docs.agg(sum("n_tokens")).collect().head.getLong(0))
    // deterministic across runs and partitioning
    val again = Packing.packFirstFit(spark, docs.repartition(13), capacity = 512, bucketSize = 100)
    assert(packed.orderBy("bucket", "bin_id").collect().toSeq ===
      again.orderBy("bucket", "bin_id").collect().toSeq)
  }

  test("approx distinct: HLL relative error within the configured 2% rsd bound") {
    val out = graft.queries.PipelineQueries.approxDistinct(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getDouble(3) < 0.1), out.map(_.getDouble(3)).mkString(","))
  }
}
