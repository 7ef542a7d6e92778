package graft
import org.apache.spark.sql.SparkSession

/** One-shot generator for the frozen flagship golden file
  * (src/test/resources/golden/flagship.csv). Re-run only when the
  * flagship semantics intentionally change; the committed file is the
  * regression gate for exact tile/AOI/kNN assignment stability.
  */
object GoldenDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = SparkEntry.entry(spark)
    val dir = new java.io.File("src/test/resources/golden")
    dir.mkdirs()
    val rows = out.collect()
    val header = out.columns.mkString(",")
    val body = rows.map(_.toSeq.map(String.valueOf).mkString(",")).mkString("\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("src/test/resources/golden/flagship.csv"),
      header + "\n" + body + "\n")
    println(s"golden dumped: ${rows.length} rows")
    spark.stop()
  }
}
