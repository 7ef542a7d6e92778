package graft.operators

import org.apache.spark.sql.catalyst.util.ArrayData

/** Static entry points for `StaticInvoke` codegen over the similarity
  * operators (object without companion class => static forwarders).
  */
object SimilarityKernels {
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]

  private def planes(dim: Int, bits: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((dim, bits),
      _ => Array.tabulate(bits)(s => Similarity.hyperplane(s, dim)))

  /** Sign-bit signature of `vec` (array<float>) against `bits` fixed
    * deterministic hyperplanes. Identical arithmetic to the
    * builtin-composed form it replaces: per-plane left fold of
    * float-to-double products in element order, sign test >= 0.
    */
  def lshSignature(vec: ArrayData, dim: Int, bits: Int): Long = {
    val n = math.min(dim, vec.numElements())
    val ps = planes(dim, bits)
    var sig = 0L
    var b = 0
    while (b < bits) {
      val h = ps(b)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += vec.getFloat(i).toDouble * h(i); i += 1 }
      if (acc >= 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}
