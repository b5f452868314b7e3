package graft
import org.apache.spark.sql.SparkSession
/** Builder-owned local-iteration dump — NOT driver surface (the driver
  * runs [[Verify]], which dumps every query unconditionally).
  *
  * `runMain graft.VerifyDev <sfDir> <outDir> q74,q75` writes only the
  * queries whose name contains one of the comma-separated substrings,
  * for fast oracle_check loops on a single operator. */
object VerifyDev {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, only) = args
    val pats = only.split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.queries.filter { case (name, _) =>
      pats.exists(name.contains) }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify-dev] $name failed: ${e.getMessage}")
      }
    }
    // filtered oracle_sql.json so scripts/oracle_check.py runs the same
    // subset (same escape discipline as Verify)
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter { case (k, _) => selected.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
