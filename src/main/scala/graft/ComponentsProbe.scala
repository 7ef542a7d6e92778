package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Adversarial-diameter convergence probe for the distributed
  * connected-components path: `SPARK_GRAFT_COMP_ROWS` nodes (default
  * 16M) arranged as 16 CHAINS — the minimum label sits at one end, so
  * min-label propagation must traverse the full million-node
  * diameter. The 1-hop + pointer-jump round structure must converge
  * in ~log2(diameter) rounds (a plain 1-hop loop would need
  * diameter rounds = never); the probe REQUIRES the round count to
  * stay within log2(diameter) + 3 and every label to be exact.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.ComponentsProbe"
  */
object ComponentsProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rows = sys.env.getOrElse("SPARK_GRAFT_COMP_ROWS", "16000000").toLong
    val chains = 16L
    val chainLen = rows / chains
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // chain c holds ids [c*chainLen, (c+1)*chainLen); edges link
    // consecutive ids, so component(c) = c*chainLen for every member
    val edges = spark.range(0, rows, 1, cpus.toInt * 4)
      .filter(pmod(col("id") + 1, lit(chainLen)) =!= 0)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val t0 = System.nanoTime()
    val comp = Dedup.connectedComponents(edges, "a", "b")
    val bad = comp.filter(col("component") =!=
      floor(col("node") / chainLen) * chainLen).count()
    val n = comp.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val iters = Dedup.lastIterations.get()
    comp.unpersist()
    val bound = (math.log(chainLen.toDouble) / math.log(2.0)).ceil.toInt + 3
    require(bad == 0L, s"$bad nodes mislabeled")
    // a small COMP_ROWS smoke run can land under the driver
    // union-find threshold, which never touches lastIterations (-1);
    // the round bound only applies when the distributed path ran
    if (iters >= 0)
      require(iters > 0 && iters <= bound,
        s"pointer doubling must converge in <= $bound rounds for diameter " +
          s"$chainLen, took $iters")
    println(f"PROBE components rows=$rows chains=$chains diameter=$chainLen " +
      f"nodes=$n rounds=${if (iters < 0) "local" else iters.toString}%s " +
      f"bound=$bound sec=$sec%.1f")
    spark.stop()
  }
}
