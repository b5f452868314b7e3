package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ARRAY<FLOAT|DOUBLE>` columns, built from
  * codegen'd higher-order functions (`zip_with` + `aggregate`) so the hot
  * path stays inside whole-stage codegen — no UDF boxing, no Python.
  *
  * Semantics mirror the reference's cosine distance pinned at
  * `/root/reference/app.py:87` (`Distance.COSINE`); dimensionality is
  * data-driven (the driver's `embeddings` table is 64-d, the reference's
  * store was 1024-d — see SURVEY.md D3).
  *
  * All arithmetic is forced to DOUBLE so results are reproducible across
  * engines (the DuckDB oracle computes in double too).
  */
object VectorFns {

  /** Cast every element to double — do this once per side before any n×m
    * similarity join so per-pair work is pure double FMA. */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Hot-path dot: native codegen expression (no intermediate array).
    * Callers must pass ARRAY<DOUBLE> (see [[asDouble]]). Produces the same
    * left-to-right summation as [[dotHof]] and the DuckDB oracle. */
  def dot(a: Column, b: Column): Column = DotProductExpr.dotNative(a, b)

  /** Reference HOF form (codegen'd but allocates the zipped array). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def normL2(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x * x))

  /** cosine(a, b) = dot / (|a|·|b|). Prefer [[dot]] over pre-normalized
    * vectors (see [[l2Normalize]]) in joins: norms are then computed n+m
    * times instead of n·m times. */
  def cosine(a: Column, b: Column): Column =
    safeCosine(dot(a, b), normL2(a), normL2(b))

  /** Cosine from precomputed parts, defined as 0 for zero-norm vectors —
    * matching the JVM-side Mmr.cosine and avoiding DIVIDE_BY_ZERO under
    * Spark 4's default ANSI mode when a corpus contains an all-zero
    * embedding. */
  def safeCosine(dotCol: Column, n1: Column, n2: Column): Column = {
    val denom = n1 * n2
    when(denom === 0.0d, lit(0.0d)).otherwise(dotCol / denom)
  }

  /** Scale to unit length; cosine of two unit vectors is a plain dot.
    *
    * The norm is evaluated as an argument of `array_repeat` — OUTSIDE the
    * element lambda. The tempting `transform(v, x => x / normL2(v))`
    * re-derives the norm per element (lambda bodies are not subject to
    * subexpression elimination), turning normalization O(d²) per row —
    * measured 11.7 s vs 0.9 s materializing 80 k 64-d vectors. */
  def l2Normalize(v: Column): Column = {
    // nullif+coalesce keeps the O(d) norm fold single-evaluation — a
    // when/otherwise pair would run it twice (conditional branches are
    // outside common-subexpression elimination)
    val n = coalesce(nullif(normL2(v), lit(0.0d)), lit(1.0d))
    zip_with(v, array_repeat(n, size(v)), (x, nn) => x.cast("double") / nn)
  }
}
