package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PqNearestExpr

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011 — public algorithm): split a D-dim vector
  * into M subvectors, k-means each subspace to K centroids, and store each
  * vector as M single-byte codes. 64-d float embeddings (256 B) become
  * 8 B — the 32× compression that makes billion-vector (100 TB) corpora
  * searchable from executor memory, with asymmetric-distance (ADC) scoring
  * against a broadcast lookup table instead of the raw vectors.
  *
  * The codebook is a BOUNDED DICTIONARY (M×K = 128 rows here), corpus-size
  * independent, so it lives on the driver (the MLlib KMeans pattern, r19)
  * and — r20 — rides into every distributed pass as a LITERAL inside
  * [[graft.functions.PqNearestExpr]] instead of a broadcast join: nearest-
  * code assignment is a narrow per-row argmin (no join, no K-way row
  * blowup, no min_by exchange), each Lloyd round is exactly ONE
  * distributed hash-aggregate job, and the encode pass is pure map work —
  * at 100 TB it pipelines into whatever scan feeds it. Training shuffles
  * only bounded (m, code, sums) aggregates, never payload vectors.
  *
  * Determinism: k-means is seeded from the first K vectors per subspace
  * (caller-chosen), ties in assignment break toward the lower code, and
  * centroid means are exact scaled-long sums (order-insensitive) —
  * reproducible run-to-run on fixed data (spec'd), and bit-identical to
  * the r18 join+min_by form (the q38/q39 oracle hash gate pins this).
  */
object Pq {

  /** Driver-resident codebook rows: (m, code, cv). */
  type Codebook = Seq[(Int, Int, Seq[Double])]

  private def cbSchema = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField("m", IntegerType),
      StructField("code", IntegerType), StructField("cv", ArrayType(DoubleType))))
  }

  /** Codebook → single-partition DataFrame (for persistence / join use). */
  def codebookDf(spark: SparkSession, cb: Codebook): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(cb.map { case (m, c, v) =>
        org.apache.spark.sql.Row(m, c, v) }, 1), cbSchema)

  /** Collect a bounded codebook DataFrame to the driver. */
  def collectCodebook(codebook: DataFrame): Codebook =
    codebook.select(col("m").cast("int"), col("code").cast("int"), col("cv"))
      .collect().toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))

  /** Nearest-code assignment: `sub`(id, m, sv) × codebook → (id, m, code).
    * A narrow map — the argmin runs per row against the literal codebook
    * (ranking key ‖c‖² − 2⟨x,c⟩; the dropped ‖x‖² is constant within each
    * (id, m) group so the argmin is identical to full ‖x−c‖²). */
  def assign(sub: DataFrame, codebook: DataFrame): DataFrame =
    assignCb(sub, collectCodebook(codebook))

  private def assignCb(sub: DataFrame, cb: Codebook): DataFrame =
    sub.select(col("id"), col("m"),
      PqNearestExpr.nearest(col("m"), col("sv"), cb).as("code"))

  /** `iters` Lloyd rounds from `init` (m, code, cv); DataFrame form for
    * callers that persist the codebook. See [[trainCodebook]]. */
  def train(sub: DataFrame, init: DataFrame, iters: Int): DataFrame =
    codebookDf(sub.sparkSession, trainCodebook(sub, init, iters))

  /** `iters` Lloyd rounds from `init`. Empty cells keep their previous
    * centroid so the codebook never shrinks. Returns the driver-resident
    * codebook with exactly the init's (m, code) key set.
    *
    * Each round is ONE distributed job: a narrow literal-codebook argmin
    * (no broadcast build, no assignment exchange — r20) feeding one hash
    * aggregate whose shuffle carries dsub scaled-long sums + a count per
    * (m, code) cell — 128 rows of partials regardless of corpus size.
    * (r19 measured the predecessor ladder: a lazy-localCheckpoint
    * materialization + a query-side broadcast-build job per round; r18's
    * posexplode + two-level groupBy additionally shuffled dsub× the rows.)
    *
    * The means' SUMs run over SCALED LONGS so they are exact and therefore
    * order-insensitive — a double sum's value depends on shuffle-merge
    * arrival order, which would make the trained codebook (and every
    * downstream code) jitter run-to-run. Inputs quantize to 2⁻³⁴
    * (≈6e-11 — far below any k-means-meaningful difference) and the
    * integer adds run at double-sum speed (a DECIMAL sum measured
    * +1.2 s/iteration at the 16×-docs rung). |x| ≤ 1 after
    * normalization ⇒ overflow headroom is 2²⁹ (~537 M) members per
    * cell; beyond that, shard cells or fall back to DECIMAL. */
  def trainCodebook(sub: DataFrame, init: DataFrame, iters: Int): Codebook = {
    var cb: Codebook = collectCodebook(init)
    require(cb.nonEmpty, "Pq.train: empty init codebook")
    // subvector width is a codebook property — read it off the (bounded,
    // driver-resident) init instead of threading a parameter
    val dsub = cb.head._3.length
    val scale = 17179869184L // 2^34
    val sums = (0 until dsub).map(p =>
      sum(expr(s"cast(round(sv[$p] * $scale) as bigint)")).as(s"s$p"))
    for (_ <- 1 to iters) {
      val means = sub
        .select(col("m"), PqNearestExpr.nearest(col("m"), col("sv"), cb).as("code"),
          col("sv"))
        .groupBy(col("m"), col("code"))
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
        .map { r =>
          val n = r.getLong(2)
          (r.getInt(0), r.getInt(1)) ->
            (0 until dsub).map { p =>
              if (r.isNullAt(3 + p))
                throw new IllegalStateException(
                  s"Pq.train: subvector shorter than dsub=$dsub at " +
                    s"(m=${r.getInt(0)}, code=${r.getInt(1)}, pos=$p) — " +
                    "ragged input vectors")
              r.getLong(3 + p) / (n * scale.toDouble)
            }
        }.toMap
      // empty cells keep their previous centroid (bounded driver-side map)
      cb = cb.map { case (m, c, cv) => (m, c, means.getOrElse((m, c), cv)) }
    }
    cb
  }

  /** Per-id code arrays in subspace order: (id, codes ARRAY<INT>) from the
    * exploded (id, m, sv) form — one exchange (the id regroup). Callers
    * that still hold the un-exploded vectors should prefer [[encodeV]]. */
  def encode(sub: DataFrame, codebook: DataFrame): DataFrame =
    assign(sub, codebook)
      .groupBy(col("id"))
      .agg(expr("transform(array_sort(collect_list(struct(m, code))), s -> s.code)").as("codes"))

  /** Per-id code arrays straight off the vectors: (id, v ARRAY<DOUBLE>) →
    * (id, codes ARRAY<INT>). Fully NARROW — the M per-subspace argmins run
    * inside one projection, so the encode pass needs no explosion, no
    * regroup, and no exchange at all (r20; the 100 TB shape: codes
    * pipeline out of the corpus scan). Code order is m-ascending, same as
    * [[encode]]'s array_sort assembly. */
  def encodeV(vecs: DataFrame, cb: Codebook, m: Int, dsub: Int): DataFrame =
    vecs.select(col("id"),
      transform(sequence(lit(0), lit(m - 1)), mm =>
        PqNearestExpr.nearest(mm,
          slice(col("v"), mm * lit(dsub) + lit(1), lit(dsub)), cb)).as("codes"))

  /** Per-query flattened ADC table: (id, v) → (query_id, dts) where
    * dts[m·K + code] = ‖sv_m − cv_(m,code)‖². Narrow projection against
    * the literal codebook — replaces the broadcast-join + regroup form
    * (r20). Layout matches the (m, code)-ascending array_sort assembly
    * the scoring expression indexes into (codes dense 0..K−1 per m, the
    * standing q38/q39 seeding contract). */
  def adcTable(vecs: DataFrame, cb: Codebook, k: Int, dsub: Int): DataFrame = {
    val sorted = cb.sortBy(t => (t._1, t._2))
    val cvLit = typedLit(sorted.map(_._3))
    vecs.select(col("id").as("query_id"),
      transform(sequence(lit(0), lit(sorted.length - 1)), i => {
        val mi = floor(i / lit(k)).cast("int")
        val sv = slice(col("v"), mi * lit(dsub) + lit(1), lit(dsub))
        val cv = element_at(cvLit, i + lit(1))
        // same fold order as the r19 join form's
        // aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)), 0D, +)
        aggregate(zip_with(sv, cv, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x)
      }).as("dts"))
  }
}
