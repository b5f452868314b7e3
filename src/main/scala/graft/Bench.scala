package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: times every registered query at the given SF
  * and prints ONE JSON line for the driver. Runs the primary config from
  * SPARK_GRAFT_CPUS (driver passes 32), then — because BASELINE.md's pass
  * bar is local[4]/shuffle.partitions=4 — also records a local[4] total so
  * the 2×-of-baseline comparison is apples-to-apples. */
object Bench {
  private def run(cpus: String, sfDir: String): (Double, Seq[(String, Double)], Seq[String]) = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up outside the timed loop: pays JVM/codegen/parquet-reader
    // startup once so the alphabetically-first query's number reflects the
    // query, not session spin-up (entry() runs the flagship on sf0.001)
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => () }
    // a crashed query must not masquerade as a fast one: record its name in
    // `errors` so the driver can tell a speedup from a regression-to-failure
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case _: Throwable => errors += name }
      name -> (System.nanoTime() - t0) / 1e9
    }
    spark.stop()
    (results.map(_._2).sum, results, errors.toSeq)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (total, results, errors) = run(cpus, sfDir)
    val extra =
      if (cpus != "4") { val (t4, _, _) = run("4", sfDir); s""","local4_total":$t4""" }
      else ""
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir","cpus":"$cpus"$extra}""")
  }
}
