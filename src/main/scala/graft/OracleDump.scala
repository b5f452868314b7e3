package graft

/** Builder tool: write the FULL registered oracle_sql.json to a directory
  * WITHOUT running any query — lets the sf100 sweep start concurrently
  * with a VerifyRung dump (which only writes the json at dump end). No
  * SparkSession. Usage: runMain graft.OracleDump <outDir> */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    new java.io.File(outDir).mkdirs()
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outDir, "oracle_sql.json"), json)
    println(s"wrote ${SparkEntry.oracleSql.size} oracles to $outDir/oracle_sql.json")
  }
}
