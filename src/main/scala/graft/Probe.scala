package graft

import org.apache.spark.sql.SparkSession

/** Builder-side one-off query timer: run named queries against an SF dir
  * and print rowcount + wall seconds for each (cache cleared between).
  * Used for quiet-box rung probes where Bench's full board or VerifyRung's
  * parquet dump would be overkill.
  *
  * Usage: runMain graft.Probe <sfDir> <queryName> [queryName...] */
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "28")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { q =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, args(0)).count()
      println(f"PROBE $q rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
