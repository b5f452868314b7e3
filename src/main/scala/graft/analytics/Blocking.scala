package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Caching._

/** Bounded candidate generation for blocking-based near-dup detection.
  *
  * A within-block self-join is quadratic in block size. Block keys chosen
  * for recall (first-k-token prefix, coarse cluster label) have unbounded
  * size in the wild: a boilerplate-heavy corpus collapses thousands of
  * docs into one hot block and the pair join explodes. Guard: count rows
  * per block and deterministically hash-salt blocks over `maxBlock` rows
  * into ~`maxBlock`-sized sub-blocks, so pair generation is O(m·maxBlock)
  * per hot block instead of O(m²).
  *
  * Two primitives with different contracts:
  *
  *  - [[saltOversized]] CAPS pair generation at O(m·maxBlock) per hot
  *    block by dropping cross-sub-block pairs — right for candidate
  *    generation where a banded-LSH path (q32/q36) owns recall, wrong
  *    for any operator whose oracle is the complete pair set.
  *  - [[selfPairs]] keeps the complete O(m²) pair output (that IS the
  *    operator's semantic result) and caps TASK size instead, splitting
  *    a hot block into balanced sub-block-pair join tasks. This is what
  *    the exact-pair operators (q31/q34/q77/q112) use.
  */
object Blocking {

  /** Separator between block key and salt. U+0001 cannot appear in any
    * block key this engine produces (token prefixes and cluster labels are
    * printable), so a genuine key like "x#0" can never merge with hot-block
    * "x" sub-block 0 — cross-block candidate pairs are impossible. */
  private val SaltSep = "\u0001"

  /** Adds a `salted_block` STRING column to `df`. Blocks with ≤ maxBlock
    * rows keep their key verbatim; larger blocks are split into
    * ceil(n/maxBlock) hash-salted sub-blocks (`key<U+0001>salt`). Deterministic:
    * the salt is a pure function of the id column, independent of
    * partitioning. Cost: one count agg + one (AQE-broadcastable) join on
    * the block key — no per-block window, so no hot single-task sort.
    */
  def saltOversized(df: DataFrame, blockCol: String, idCol: String,
                    maxBlock: Int): DataFrame = {
    require(maxBlock > 0, "maxBlock must be positive")
    val counts = df.groupBy(col(blockCol)).agg(count(lit(1)).as("_block_n"))
    df.join(counts, Seq(blockCol))
      .withColumn("_nsub",
        ceil(col("_block_n") / lit(maxBlock.toDouble)).cast("int"))
      .withColumn("salted_block",
        when(col("_nsub") <= 1, col(blockCol).cast("string"))
          .otherwise(concat(col(blockCol).cast("string"), lit(SaltSep),
            pmod(hash(col(idCol)), col("_nsub")).cast("string"))))
      .drop("_block_n", "_nsub")
  }

  /** All unordered within-block row pairs, skew-BALANCED but LOSSLESS.
    *
    * `saltOversized` caps a hot block's pair generation by dropping
    * cross-sub-block pairs — a recall trade that is right for candidate
    * generation with an LSH fallback, and wrong for operators whose
    * CONTRACT is the complete thresholded pair set (q31's oracle is the
    * plain block equi-join; the sf100 sweep caught the 25,519-pair gap
    * the moment a rung block crossed the cap). The fix is to cap TASK
    * size, not output: a block of n rows splits into s = ceil(n/maxBlock)
    * sub-blocks, and each unordered sub-block pair (i ≤ j) becomes its
    * own join task of ≤ maxBlock² candidate pairs. A row in sub-block g
    * replicates to tasks (g, j) for j ≥ g on the left and (i, g) for
    * i ≤ g on the right — s+1 copies per row, O(n·s) replication against
    * the O(n²/2) pair output that is the operator's semantic result.
    * Every unordered pair appears in exactly one task: same-sub pairs in
    * (g, g) deduped by the id filter, cross-sub pairs in (min, max) with
    * the sides fixed by membership — so no distinct pass is needed.
    *
    * Output: two struct columns `_1`/`_2` holding the full input row
    * (block key included, original type) for the lower-`idCol` and
    * higher-`idCol` member of each pair. Deterministic: sub-block assignment is a pure
    * function of `idCol`, independent of partitioning. */
  def selfPairs(df: DataFrame, blockCol: String, idCol: String,
                maxBlock: Int): DataFrame = {
    require(maxBlock > 0, "maxBlock must be positive")
    val payload = df.columns // block key included: callers project it typed
    val counts = df.groupBy(col(blockCol)).agg(count(lit(1)).as("_block_n"))
    val based = df.join(counts, Seq(blockCol))
      .withColumn("_s", ceil(col("_block_n") / lit(maxBlock.toDouble)).cast("int"))
      .withColumn("_g", pmod(hash(col(idCol)), col("_s")))
      .select(col(blockCol).cast("string").as("_blk"), col("_s"), col("_g"),
        struct(payload.map(col): _*).as("_row"))
      // both replication sides read this subtree; without the cache the
      // caller's (often expensive) feature columns compute twice
      // (session-lifetime contract: see graft.core.Caching)
      .planCache()
    val aSide = based
      .withColumn("_j", explode(sequence(col("_g"), col("_s") - 1)))
      .select(concat(col("_blk"), lit(SaltSep), col("_g"), lit(":"), col("_j")).as("_task"),
        col("_g").as("_ga"), col("_row").as("_l"))
    val bSide = based
      .withColumn("_i", explode(sequence(lit(0), col("_g"))))
      .select(concat(col("_blk"), lit(SaltSep), col("_i"), lit(":"), col("_g")).as("_task"),
        col("_g").as("_gb"), col("_row").as("_r"))
    val lo = col("_l")(idCol) < col("_r")(idCol)
    aSide.join(bSide, Seq("_task"))
      // same-sub tasks carry both orientations: keep one. Cross-sub tasks
      // carry each pair once with fixed sides: keep all.
      .filter(col("_ga") < col("_gb") || lo)
      .select(when(lo, col("_l")).otherwise(col("_r")).as("_1"),
        when(lo, col("_r")).otherwise(col("_l")).as("_2"))
  }

  /** Diagnostic: per-block row counts above the cap — what a pipeline
    * would log before salting kicks in (no silent truncation). */
  def oversizedBlocks(df: DataFrame, blockCol: String, maxBlock: Int): DataFrame =
    df.groupBy(col(blockCol)).agg(count(lit(1)).as("block_n"))
      .filter(col("block_n") > maxBlock)
      .orderBy(desc("block_n"), col(blockCol))
}
