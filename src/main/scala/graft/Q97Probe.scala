package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.geo
import graft.index.cells

/** Scratch stage-timing probe for the q97 route-cross plan (dev only). */
object Q97Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.SpatialJoins

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q97probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val a = SparkEntry.routeTableDense(spark, sfDir)
    val b = a.select(col("r_id").as("b_id"), col("verts").as("b_verts"))
    val maxPiece = 500e3 / graft.geo.Ellipsoids.MeanEarthRadius
    val coverAngle = math.min(math.Pi, maxPiece * (1.0 + 1e-9))
    val level = sys.env.getOrElse("Q97_LEVEL", {
      val discArea = 2.0 * math.Pi * (1.0 - math.cos(coverAngle))
      val l = (0.5 * (math.log(96.0 * 4.0 * math.Pi / (6.0 * discArea)) /
        math.log(2.0))).ceil.toInt
      math.max(2, math.min(26, l)).toString
    }).toInt
    println(s"[q97probe] level=$level maxPiece=$maxPiece")
    def pc(i: Int) = element_at(col("__p"), i)
    val coverA = a.select(col("r_id"),
        explode(cells.corridorPieces(col("verts"), maxPiece)).as("__p"))
      .select(col("r_id"), pc(1).cast("int").as("__aseg"),
        explode(cells.capCells(geo.vec(pc(8), pc(9), pc(10)), level, coverAngle)).as("__cell"))
    val keyB = b.select(col("b_id"),
        explode(cells.corridorPieces(col("b_verts"), maxPiece)).as("__p"))
      .select(col("b_id"), pc(1).cast("int").as("__bseg"),
        cells.cellAt(geo.vec(pc(8), pc(9), pc(10)), level).as("__cell"))
    t("coverA rows")(println("  n=" + coverA.count()))
    t("keyB rows")(println("  n=" + keyB.count()))
    val cand = coverA.join(keyB, "__cell").filter(col("r_id") < col("b_id"))
    t("cand rows")(println("  n=" + cand.count()))
    val dd = cand.select(col("r_id"), col("__aseg"), col("b_id"), col("__bseg"))
      .dropDuplicates("r_id", "__aseg", "b_id", "__bseg")
    t("dedup seg-pair rows")(println("  n=" + dd.count()))
    def segsOf(df: org.apache.spark.sql.DataFrame, idCol: String, vertsCol: String, tag: String) =
      df.select(col(idCol),
        explode(cells.corridorPieces(col(vertsCol), math.Pi)).as("__p"))
        .select(col(idCol), pc(1).cast("int").as(s"__${tag}seg"),
          pc(2).as(s"__${tag}ax"), pc(3).as(s"__${tag}ay"), pc(4).as(s"__${tag}az"),
          pc(5).as(s"__${tag}bx"), pc(6).as(s"__${tag}by"), pc(7).as(s"__${tag}bz"))
    val joined = dd
      .join(segsOf(a, "r_id", "verts", "a"), Seq("r_id", "__aseg"))
      .join(segsOf(b, "b_id", "b_verts", "b"), Seq("b_id", "__bseg"))
    val crossed = joined.filter(cells.segsCross(
      geo.vec(col("__aax"), col("__aay"), col("__aaz")),
      geo.vec(col("__abx"), col("__aby"), col("__abz")),
      geo.vec(col("__bax"), col("__bay"), col("__baz")),
      geo.vec(col("__bbx"), col("__bby"), col("__bbz"))))
    t("crossed rows")(println("  n=" + crossed.count()))
    val out = crossed.select(col("r_id"), col("b_id")).dropDuplicates("r_id", "b_id")
    t("final rows")(println("  n=" + out.count()))
    spark.stop()
  }
}
