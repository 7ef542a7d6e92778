package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch stage-timing probe for the q65 neardup-resolve plan. */
object Q65Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q65probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (_ <- 1 to 2) {
      val sigs = SparkEntry.tSpread(spark, sfDir, "documents")
        .select(col("doc_id"), Dedup.simHashMd5(col("text")).as("fp"))
      t("sigs (md5 simhash)")(noop(sigs))
      val pairs = Dedup.hammingNearDups(sigs, "doc_id", "fp",
          maxDist = 3, bits = 60, bands = 6)
        .select("id_a", "id_b")
      t("pairs (banded join)")(noop(pairs))
      val out = Dedup.keepComponentRepresentatives(sigs, "doc_id", pairs, "id_a", "id_b")
        .select(col("doc_id")).orderBy("doc_id")
      t("full resolve")(noop(out))
    }
    spark.stop()
  }
}
