package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a registered query warm (2nd run in-session) and dump
  * its formatted physical plan. Usage: runMain graft.Profile <name> <sfDir> [explain] */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val t0 = System.nanoTime()
    fn(spark, dir).count()
    val cold = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()
    val t1 = System.nanoTime()
    fn(spark, dir).count()
    val warm = (System.nanoTime() - t1) / 1e9
    println(f"[profile] $name cold=$cold%.3fs warm=$warm%.3fs")
    if (args.contains("explain")) fn(spark, dir).explain("formatted")
    spark.stop()
  }
}
