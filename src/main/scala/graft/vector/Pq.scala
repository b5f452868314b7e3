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
    * their previous centroid (left-join + coalesce) so the codebook never
    * shrinks. Returns (m, code, cv) with exactly the init's (m, code)
    * key set. */
  def train(sub: DataFrame, init: DataFrame, iters: Int): DataFrame = {
    // the codebook is M×K rows (128 here) — coalesce(1) before each
    // checkpoint so its materialization is one task, not
    // shuffle.partitions near-empty ones (it broadcasts downstream
    // regardless; measured ~5-10% off q38 end-to-end at sf0.1/16×-docs)
    var cb = init.coalesce(1).localCheckpoint(false)
    for (_ <- 1 to iters) {
      val assigned = assignKeeping(sub, cb)
      // elementwise mean per cell: explode the dsub positions, average,
      // reassemble in position order — shuffles (m, code, pos, x) scalars
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
      val means = assigned
        .select(col("m"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("m"), col("code"), col("pos"))
        .agg((sum(expr(s"cast(round(x * $scale) as bigint)")) /
          (count(lit(1)) * lit(scale.toDouble))).as("mx"))
        .groupBy(col("m"), col("code"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, mx))), s -> s.mx)").as("ncv"))
      cb = cb.join(means, Seq("m", "code"), "left")
        .select(col("m"), col("code"), coalesce(col("ncv"), col("cv")).as("cv"))
        .coalesce(1)
        .localCheckpoint(false)
    }
    cb
  }

  /** Per-id code arrays in subspace order: (id, codes ARRAY<INT>). */
  def encode(sub: DataFrame, codebook: DataFrame): DataFrame =
    assign(sub, codebook)
      .groupBy(col("id"))
      .agg(expr("transform(array_sort(collect_list(struct(m, code))), s -> s.code)").as("codes"))
}
