package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.geo
import graft.index.cells

/** Prints the physical plans of the load-bearing queries so the
  * pushdown / pruning / broadcast / codegen shape can be audited
  * (and regression-checked) without a notebook.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"

    println("==== A: filter+projection pushdown on lineitem scan")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_quantity")
      .explain("formatted")

    println("==== B: image pipeline scan (bytes column must be pruned)")
    val img = sources.ImageTable.generate(spark, 100, 2)
    img.write.mode("overwrite").parquet("/tmp/audit_img")
    spark.read.parquet("/tmp/audit_img")
      .withColumn("ord", substring(col("image_id"), 5, 12).cast("long"))
      .withColumn("lat", SparkEntry.latRad(col("ord"))) // shared overflow-safe position hash
      .withColumn("lon", SparkEntry.lonRad(col("ord")))
      .select(col("image_id"), cells.cellAt(geo.nvec(col("lat"), col("lon")), 8).as("tile"))
      .explain("formatted")

    println("==== C: distance join (broadcast + codegen shape)")
    val c = spark.read.parquet(s"$dir/customer.parquet")
      .withColumn("n", geo.nvecDeg((col("c_custkey") % 170 - 85).cast("double"),
        (col("c_custkey") % 360 - 180).cast("double")))
      .select("c_custkey", "n")
    val s2 = spark.read.parquet(s"$dir/supplier.parquet")
      .withColumn("s_n", geo.nvecDeg((col("s_suppkey") % 160 - 80).cast("double"),
        (col("s_suppkey") % 350 - 175).cast("double")))
      .select("s_suppkey", "s_n")
    operators.SpatialJoins.distanceJoin(c, s2, "n", "s_n", 1000e3, broadcastRight = true)
      .explain("formatted")
    spark.stop()
  }
}
