package graft

import org.apache.spark.sql.SparkSession

/** One-off: does q116's self-join reuse the band exchange at a given SF? */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = SparkEntry.queries(args(1))(spark, args(0))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    println("REUSE=" + plan.contains("ReusedExchange") +
      " MapElements=" + "MapElements".r.findAllIn(plan).size)
    spark.stop()
  }
}
