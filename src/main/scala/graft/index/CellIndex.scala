package graft.index

import graft.geo.Vec3

/** S2-style cube-face quadtree cell index over the unit sphere.
  *
  * A position's n-vector is centrally projected onto the unit cube;
  * the face plus quantized (i, j) coordinates at a quadtree level form
  * a 64-bit cell id. Parent/child/ring arithmetic is exact integer
  * math, which is why this layout (rather than hexagonal H3) backs the
  * join operators (SURVEY.md M3; north_rule "H3/S2-style indexing").
  *
  * Id layout (MSB to LSB):
  * {{{
  *   [ 4 bits unused ][ 3 bits face ][ 5 bits level ][ 26 bits i ][ 26 bits j ]
  * }}}
  * Levels 0..26. At level L each face splits into 2^L x 2^L cells.
  * Ids are non-negative, so they sort and hash cleanly as Longs.
  */
object CellIndex {
  val MaxLevel = 26

  /** Worst-case (face corner) angular compression of the gnomonic
    * projection: 1 unit of u maps to at least this many radians.
    * d(theta)/du at a corner is sqrt(2)/3 ~= 0.4714.
    */
  val MinAngularPerUnit: Double = math.sqrt(2.0) / 3.0

  /** Minimum angular width [rad] of any cell at `level`. */
  def minCellAngle(level: Int): Double =
    (2.0 / (1L << level)) * MinAngularPerUnit

  /** Largest level whose cells are at least `angleRad` wide everywhere
    * (so a 1-ring around a point's cell covers a disc of that radius).
    */
  def levelForRadius(angleRad: Double): Int = {
    var level = MaxLevel
    while (level > 0 && minCellAngle(level) < angleRad) level -= 1
    level
  }

  /** Face index 0..5: +x -x +y -y +z -z by largest |component|. */
  @inline def faceOf(x: Double, y: Double, z: Double): Int = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    if (ax >= ay && ax >= az) { if (x >= 0) 0 else 1 }
    else if (ay >= az) { if (y >= 0) 2 else 3 }
    else { if (z >= 0) 4 else 5 }
  }

  /** Face-local (u, v) in [-1, 1] of the central projection. */
  def faceUV(face: Int, x: Double, y: Double, z: Double): (Double, Double) =
    face match {
      case 0 => (y / x, z / x)
      case 1 => (z / -x, y / -x)
      case 2 => (z / y, x / y)
      case 3 => (x / -y, z / -y)
      case 4 => (x / z, y / z)
      case _ => (y / -z, x / -z)
    }

  @inline private def ijOf(uv: Double, scale: Int): Int = {
    val c = ((uv + 1.0) * 0.5 * scale).toInt
    if (c < 0) 0 else if (c >= scale) scale - 1 else c
  }

  /** Cell id of the unit direction (x, y, z) at `level`. */
  def cellAt(x: Double, y: Double, z: Double, level: Int): Long = {
    val face = faceOf(x, y, z)
    val (u, v) = faceUV(face, x, y, z)
    val scale = 1 << level
    pack(face, level, ijOf(u, scale), ijOf(v, scale))
  }

  @inline def pack(face: Int, level: Int, i: Int, j: Int): Long =
    (face.toLong << 57) | (level.toLong << 52) | (i.toLong << 26) | j.toLong

  @inline def faceOf(id: Long): Int = ((id >> 57) & 0x7).toInt
  @inline def levelOf(id: Long): Int = ((id >> 52) & 0x1f).toInt
  @inline def iOf(id: Long): Int = ((id >> 26) & 0x3ffffff).toInt
  @inline def jOf(id: Long): Int = (id & 0x3ffffff).toInt

  /** Parent cell at `level - steps`. */
  def parent(id: Long, steps: Int = 1): Long = {
    val level = levelOf(id)
    val newLevel = math.max(0, level - steps)
    val shift = level - newLevel
    pack(faceOf(id), newLevel, iOf(id) >> shift, jOf(id) >> shift)
  }

  /** The 4 children one level down. */
  def children(id: Long): Array[Long] = {
    val level = levelOf(id)
    require(level < MaxLevel)
    val f = faceOf(id); val i = iOf(id) << 1; val j = jOf(id) << 1
    Array(pack(f, level + 1, i, j), pack(f, level + 1, i + 1, j),
      pack(f, level + 1, i, j + 1), pack(f, level + 1, i + 1, j + 1))
  }

  /** Center direction (not normalized) of a cell. */
  def centerXYZ(id: Long): Vec3 = {
    val level = levelOf(id)
    val scale = 1 << level
    val u = (iOf(id) + 0.5) * 2.0 / scale - 1.0
    val v = (jOf(id) + 0.5) * 2.0 / scale - 1.0
    dirOf(faceOf(id), u, v)
  }

  /** 3D direction through face-local (u, v); valid for |u|,|v| > 1 too
    * (lands on the neighboring face), making ring generation
    * face-crossing-safe.
    */
  def dirOf(face: Int, u: Double, v: Double): Vec3 = face match {
    case 0 => Vec3(1, u, v)
    case 1 => Vec3(-1, v, u)
    case 2 => Vec3(v, 1, u)
    case 3 => Vec3(u, -1, v)
    case 4 => Vec3(u, v, 1)
    case _ => Vec3(v, u, -1)
  }

  /** Distinct cells of the (2k+1)^2 block centered on `id`'s cell.
    * In-face neighbors are exact integer steps; blocks hanging over a
    * face edge are resolved by reprojecting jittered sample directions
    * (4 samples per overhanging cell) onto the neighbor face. Sorted
    * ascending for determinism, so downstream `explode` output is
    * reproducible.
    */
  def ring(id: Long, k: Int): Array[Long] = {
    val level = levelOf(id); val face = faceOf(id)
    val scale = 1 << level
    val step = 2.0 / scale
    val i0 = iOf(id); val j0 = jOf(id)
    val out = new java.util.TreeSet[java.lang.Long]()
    val jit = Array(0.27, 0.73) // quarter-ish offsets inside the cell
    var di = -k
    while (di <= k) {
      var dj = -k
      while (dj <= k) {
        val ii = i0 + di; val jj = j0 + dj
        if (ii >= 0 && ii < scale && jj >= 0 && jj < scale) {
          out.add(pack(face, level, ii, jj))
        } else {
          // overhanging cell: sample 4 interior points, reproject
          var a = 0
          while (a < 2) {
            var b = 0
            while (b < 2) {
              val u = (ii + jit(a)) * step - 1.0
              val v = (jj + jit(b)) * step - 1.0
              val d = dirOf(face, u, v)
              out.add(cellAt(d.x, d.y, d.z, level))
              b += 1
            }
            a += 1
          }
        }
        dj += 1
      }
      di += 1
    }
    val arr = new Array[Long](out.size)
    var idx = 0
    val it = out.iterator()
    while (it.hasNext) { arr(idx) = it.next(); idx += 1 }
    arr
  }
}
