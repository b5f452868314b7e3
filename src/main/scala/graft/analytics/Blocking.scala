package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  * The trade is recall: pairs straddling two sub-blocks of a hot block are
  * not generated here — the banded-LSH queries (q32/q36) are the
  * documented unbounded-scale path for those. Blocks at or under the cap
  * are left byte-identical (`salted_block == block`), so results on
  * well-blocked data — including every driver oracle at sf0.01/sf0.1,
  * where the largest block is 218 rows — are unchanged.
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

  /** Diagnostic: per-block row counts above the cap — what a pipeline
    * would log before salting kicks in (no silent truncation). */
  def oversizedBlocks(df: DataFrame, blockCol: String, maxBlock: Int): DataFrame =
    df.groupBy(col(blockCol)).agg(count(lit(1)).as("block_n"))
      .filter(col("block_n") > maxBlock)
      .orderBy(desc("block_n"), col(blockCol))
}
