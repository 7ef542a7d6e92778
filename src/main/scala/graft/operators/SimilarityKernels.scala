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

  /** Index of the nearest centroid by cosine (centroids L2-normalized
    * on the fly; ties broken toward the lower index).
    */
  def ivfAssign(vec: ArrayData, centroidsFlat: ArrayData, dim: Int): Int = {
    val n = math.min(dim, vec.numElements())
    val k = centroidsFlat.numElements() / dim
    var vn = 0.0
    var i = 0
    while (i < n) { val x = vec.getDouble(i); vn += x * x; i += 1 }
    val vd = math.sqrt(vn) + java.lang.Double.MIN_NORMAL
    var best = 0
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      var dot = 0.0; var cn = 0.0
      var j = 0
      while (j < n) {
        dot += vec.getDouble(j) * centroidsFlat.getDouble(c * dim + j)
        j += 1
      }
      // centroid norm over ALL dim components (bit-identical to the
      // interleaved form when the vector is full length): truncating
      // it to a short vector's length would silently skew every
      // similarity instead of just zero-padding the missing entries —
      // and diverge from the oracle mirror, which norms the full
      // centroid
      j = 0
      while (j < dim) {
        val cv = centroidsFlat.getDouble(c * dim + j)
        cn += cv * cv
        j += 1
      }
      val sim = dot / (vd * (math.sqrt(cn) + java.lang.Double.MIN_NORMAL))
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    best
  }

  /** The nProbe nearest centroid indices by cosine, best first. */
  def ivfProbes(vec: ArrayData, centroidsFlat: ArrayData, dim: Int,
                nProbe: Int): ArrayData = {
    val n = math.min(dim, vec.numElements())
    val k = centroidsFlat.numElements() / dim
    val sims = new Array[Double](k)
    var vn = 0.0
    var i = 0
    while (i < n) { val x = vec.getDouble(i); vn += x * x; i += 1 }
    val vd = math.sqrt(vn) + java.lang.Double.MIN_NORMAL
    var c = 0
    while (c < k) {
      var dot = 0.0; var cn = 0.0
      var j = 0
      while (j < n) {
        dot += vec.getDouble(j) * centroidsFlat.getDouble(c * dim + j)
        j += 1
      }
      j = 0 // full-dim centroid norm — see ivfAssign
      while (j < dim) {
        val cv = centroidsFlat.getDouble(c * dim + j)
        cn += cv * cv
        j += 1
      }
      sims(c) = dot / (vd * (math.sqrt(cn) + java.lang.Double.MIN_NORMAL))
      c += 1
    }
    val idx = (0 until k).sortBy(c0 => (-sims(c0), c0)).take(math.min(nProbe, k))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(idx.toArray)
  }

  /** Sign-bit signature of `vec` (array<double>; float inputs cast
    * exactly by the caller's declared type) against `bits` fixed
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
      while (i < n) { acc += vec.getDouble(i) * h(i); i += 1 }
      if (acc >= 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}
