package graft

/** Dev-only: dump SparkEntry.oracleSql to a JSON file without
  * starting Spark, for fast DuckDB-side iteration on SQL mirrors.
  */
object MirrorDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql.json")
    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c => c.toString
      }
    val json = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ",\n", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"wrote ${SparkEntry.oracleSql.size} to $out")
  }
}
