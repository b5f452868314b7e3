package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dedicated warm-median probe for a query subset — the
  * SCALING.md rung methodology (N reps back-to-back in one session,
  * cache cleared per rep so each pays its own sketch/cache builds,
  * median reported; rep 1 is the cold run and is printed separately,
  * excluded from the median).
  *
  * Usage: runMain graft.Probe <q1,q2,...> <sfDir> [reps]
  * Env: SPARK_GRAFT_CPUS (default 32). Output: one JSON line.
  */
object Probe {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.length % 2 == 1) s(s.length / 2) else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val dir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val out = names.map { name =>
      val fn = SparkEntry.queries(name)
      val times = (0 to reps).map { _ => // rep 0 = cold, excluded below
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val m = median(times.tail)
      println(f"[probe] $name cold=${times.head}%.3fs warm_median=$m%.3fs " +
        s"(${times.tail.map(t => f"$t%.2f").mkString(",")})")
      name -> m
    }
    val qs = out.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
    println(s"""{"probe":$qs,"sf":"$dir","cpus":"$cpus","reps":$reps}""")
    spark.stop()
  }
}
