package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011 — public algorithm): split a D-dim vector
  * into M subvectors, k-means each subspace to K centroids, and store each
  * vector as M single-byte codes. 64-d float embeddings (256 B) become
  * 8 B — the 32× compression that makes billion-vector (100 TB) corpora
  * searchable from executor memory, with asymmetric-distance (ADC) scoring
  * against a broadcast lookup table instead of the raw vectors.
  *
  * Everything here is DataFrame-native: the codebook is a dictionary-sized
  * DataFrame (M×K rows) that BROADCASTS through every join; training
  * shuffles only (id, m, code) triples, never payload vectors; per-round
  * `localCheckpoint` keeps the Lloyd-iteration lineage one join deep
  * (same discipline as Clusters). No driver-side vector math — at 100 TB
  * the training sample and the encode pass are the same distributed scan.
  *
  * Determinism: k-means is seeded from the first K vectors per subspace
  * (caller-chosen), ties in assignment break toward the lower code, and
  * elementwise centroid means are double sums over ≤ |cell| values —
  * reproducible run-to-run on fixed data (spec'd), though not
  * cross-engine portable (float k-means has no DuckDB mirror → the q38
  * registration is rows-only with a recall spec, like q36/q37).
  */
object Pq {

  /** Nearest-code assignment: `sub`(id, m, sv) × broadcast codebook
    * (m, code, cv) → (id, m, code). The argmin is a `min_by` hash agg —
    * partial aggregation collapses the K-way blowup map-side, so the
    * shuffle carries one row per (id, m).
    *
    * Ranking key: ‖c‖² − 2⟨x,c⟩ instead of ‖x−c‖² — the dropped ‖x‖² is
    * constant within each (id, m) group so the argmin is identical, the
    * dot is the allocation-free native expression (the zip_with form
    * allocates an 8-element array per point×centroid eval — the hot loop
    * of training), and ‖c‖² is precomputed once per codebook row. */
  def assign(sub: DataFrame, codebook: DataFrame): DataFrame =
    assignKeeping(sub, codebook).select(col("id"), col("m"), col("code"))

  private def assignKeeping(sub: DataFrame, codebook: DataFrame): DataFrame = {
    val cb = codebook.withColumn("cn2",
      expr("aggregate(cv, 0D, (acc, x) -> acc + x * x)"))
    sub.join(broadcast(cb), Seq("m"))
      .withColumn("d2",
        col("cn2") - lit(2.0d) * graft.functions.DotProductExpr.dotNative(col("sv"), col("cv")))
      .groupBy(col("id"), col("m"))
      // sv is functionally determined by the (id, m) key — `first` just
      // carries it through so training needs no join-back for the means
      .agg(expr("min_by(code, struct(d2, code))").as("code"),
        first(col("sv")).as("sv"))
  }

  /** `iters` Lloyd rounds from `init` (m, code, cv). Empty cells keep
    * their previous centroid so the codebook never shrinks. Returns
    * (m, code, cv) with exactly the init's (m, code) key set.
    *
    * r19: the codebook LIVES ON THE DRIVER between rounds — the MLlib
    * KMeans pattern, scale-safe because M×K is a bounded dictionary (128
    * rows here) independent of corpus size. Each round is then exactly
    * ONE distributed job (the means agg collect) against a broadcast
    * LocalRelation, where the previous DataFrame-resident loop paid a
    * lazy-localCheckpoint materialization plus a query-side
    * broadcast-build job per round (JobProfile r19: q39 ran 47 small
    * sequential jobs; the train ladder was a third of them). The means
    * ARITHMETIC is unchanged — same scaled-long distributed sums — so
    * the trained codebook and every downstream code are bit-identical
    * (PqSpec + the q38/q39 hash gate pin this). */
  def train(sub: DataFrame, init: DataFrame, iters: Int): DataFrame = {
    val spark = sub.sparkSession
    import org.apache.spark.sql.types._
    val cbSchema = StructType(Seq(StructField("m", IntegerType),
      StructField("code", IntegerType), StructField("cv", ArrayType(DoubleType))))
    def toDf(rows: Seq[(Int, Int, Seq[Double])]): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (m, c, v) =>
          org.apache.spark.sql.Row(m, c, v) }, 1), cbSchema)
    // driver-resident codebook: (m, code) → cv, insertion-ordered by init
    var cb: Seq[(Int, Int, Seq[Double])] = init
      .select(col("m").cast("int"), col("code").cast("int"), col("cv"))
      .collect().toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    // subvector width is a codebook property — read it off the (bounded,
    // driver-resident) init instead of threading a parameter
    val dsub = cb.head._3.length
    for (_ <- 1 to iters) {
      val assigned = assignKeeping(sub, toDf(cb))
      // elementwise mean per cell, ONE hash aggregate: dsub per-position
      // scaled-long sums + a count per (m, code) group (r19 — the prior
      // posexplode + two-level groupBy shuffled dsub× the rows through
      // an extra exchange for the same sums).
      // the mean's SUM runs over SCALED LONGS so it is exact and therefore
      // order-insensitive — a double sum's value depends on shuffle-merge
      // arrival order, which would make the trained codebook (and every
      // downstream code) jitter run-to-run. Inputs quantize to 2⁻³⁴
      // (≈6e-11 — far below any k-means-meaningful difference) and the
      // integer adds run at double-sum speed (a DECIMAL sum measured
      // +1.2 s/iteration at the 16×-docs rung). |x| ≤ 1 after
      // normalization ⇒ overflow headroom is 2²⁹ (~537 M) members per
      // cell; beyond that, shard cells or fall back to DECIMAL.
      val scale = 17179869184L // 2^34
      val sums = (0 until dsub).map(p =>
        sum(expr(s"cast(round(sv[$p] * $scale) as bigint)")).as(s"s$p"))
      val means = assigned
        .groupBy(col("m"), col("code"))
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
        .map { r =>
          val n = r.getLong(2)
          (r.getInt(0), r.getInt(1)) ->
            (0 until dsub).map(p => r.getLong(3 + p) / (n * scale.toDouble))
        }.toMap
      // empty cells keep their previous centroid (the old left-join +
      // coalesce, now a bounded driver-side map lookup)
      cb = cb.map { case (m, c, cv) => (m, c, means.getOrElse((m, c), cv)) }
    }
    toDf(cb)
  }

  /** Per-id code arrays in subspace order: (id, codes ARRAY<INT>). */
  def encode(sub: DataFrame, codebook: DataFrame): DataFrame =
    assign(sub, codebook)
      .groupBy(col("id"))
      .agg(expr("transform(array_sort(collect_list(struct(m, code))), s -> s.code)").as("codes"))
}
