package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Hash-basis cost split for the near-dup gates (q45/q65/q74 shapes):
  * the ORACLE basis fingerprints with the DuckDB-replayable md5
  * simhash, which dominates those gates' times; production pipelines
  * use the fnv64 fast basis (same banded join, same resolution).
  * This main times BOTH on the same documents table so gate cost is
  * never mistaken for operator cost — results recorded in
  * BENCH/BASELINE.md and BENCH/basis_bench.json.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.BasisBench"
  */
object BasisBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    def fp(basis: String) = basis match {
      case "md5" => Dedup.simHashMd5(col("text"))
      case _ => Dedup.simHashFast(col("text"))
    }
    def pairs(basis: String): DataFrame =
      Dedup.hammingNearDups(
        docs.select(col("doc_id"), fp(basis).as("fp")),
        "doc_id", "fp", maxDist = 3, bits = if (basis == "md5") 60 else 64,
        bands = if (basis == "md5") 6 else 4)
    val shapes: Seq[(String, String => DataFrame)] = Seq(
      "q45_pairs" -> (b => pairs(b)),
      "q65_resolve" -> { b =>
        val sigs = docs.select(col("doc_id"), fp(b).as("fp"))
        Dedup.keepComponentRepresentatives(sigs, "doc_id",
          pairs(b).select("id_a", "id_b"), "id_a", "id_b")
          .select("doc_id")
      },
      "q74_joint" -> { b =>
        val sigs = docs.select(col("doc_id"), fp(b).as("fp"), col("text"))
        Dedup.jointNearDups(sigs, "doc_id", "fp", "text",
          maxDist = 3, minJaccard = 0.975,
          bits = if (b == "md5") 60 else 64,
          bands = if (b == "md5") 6 else 4)
      })
    val out = for ((name, build) <- shapes; basis <- Seq("md5", "fast")) yield {
      build(basis).write.format("noop").mode("overwrite").save() // warm
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        build(basis).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      (name, basis, runs.min)
    }
    def num(t: Double) = String.format(java.util.Locale.ROOT, "%.3f", t)
    val json = "{" + out.map { case (n, b, t) => s""""${n}_$b":${num(t)}""" }
      .mkString(",") + s""","sf":"$sfDir","cpus":$cpus}"""
    println("BASIS " + json)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("BENCH"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH/basis_bench.json"), json + "\n")
    spark.stop()
  }
}
