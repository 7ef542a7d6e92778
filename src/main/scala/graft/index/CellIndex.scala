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
    *
    * NOTE: this bound only holds ON the face (|u|,|v| <= 1). Ring
    * blocks that overhang a face edge compress further, so join
    * coverage proofs must use [[coverageLowerBound]] /
    * [[ringCoverageRad]], which account for the extended block.
    */
  val MinAngularPerUnit: Double = math.sqrt(2.0) / 3.0

  /** Minimum angular width [rad] of any on-face cell at `level`
    * (legacy mid-face heuristic; see note on [[MinAngularPerUnit]]).
    */
  def minCellAngle(level: Int): Double =
    (2.0 / (1L << level)) * MinAngularPerUnit

  /** Largest level whose on-face cells are at least `angleRad` wide
    * (legacy; join code uses [[levelForRadiusSafe]]).
    */
  def levelForRadius(angleRad: Double): Int = {
    var level = MaxLevel
    while (level > 0 && minCellAngle(level) < angleRad) level -= 1
    level
  }

  /** Safe lower bound [rad] on the coverage a k-ring block guarantees
    * for ANY query position inside the center cell, including blocks
    * overhanging face edges/corners where the gnomonic compresses
    * below the on-face minimum.
    *
    * Derivation: the block is bounded by 4 planes u = const / v =
    * const through the origin. For a query at extended coords
    * (u0, v0) with |u0|,|v0| <= 1 and a plane at c with |c - u0| >=
    * k*step, the angular distance point->plane is
    * asin(|c - u0| / (sqrt(1+u0^2+v0^2) * sqrt(1+c^2)))
    * >= asin(k*step / (sqrt(3) * sqrt(1+(1+k*step)^2))).
    * Blocks that wrap the whole face (2k+1 >= scale) enumerate every
    * cell, so they cover the full sphere.
    */
  def coverageLowerBound(level: Int, k: Int): Double = {
    val scale = 1 << level
    if (2 * k + 1 >= scale) return math.Pi
    val step = 2.0 / scale
    val m = 1.0 + k * step
    math.asin(math.min(1.0, k * step / (math.sqrt(1.0 + m * m) * math.sqrt(3.0))))
  }

  /** Largest level (>= minLevel) at which a k-ring block provably
    * covers `angleRad` for every query position, or -1 if no
    * non-wrapping level does (the cube-face block bound saturates
    * near ~0.26 rad; beyond that candidate sets are a constant
    * fraction of the sphere and callers should cross-join).
    */
  def levelForRadiusSafe(angleRad: Double, k: Int = 1, minLevel: Int = 2): Int = {
    var level = MaxLevel
    while (level >= minLevel) {
      val scale = 1 << level
      if (2 * k + 1 < scale && coverageLowerBound(level, k) >= angleRad) return level
      level -= 1
    }
    -1
  }

  /** Exact per-query coverage [rad] of the k-ring block around the
    * cell containing unit vector (x, y, z) at `level`: the minimum
    * angular distance from the point to the block's 4 bounding
    * great-circle planes (and to the face hemisphere boundary). Any
    * point within this angle of the query is guaranteed to fall in a
    * cell enumerated by [[ring]](cellAt(x,y,z,level), k).
    */
  def ringCoverageRad(x: Double, y: Double, z: Double, level: Int, k: Int): Double = {
    val scale = 1 << level
    if (2 * k + 1 >= scale) return math.Pi
    val step = 2.0 / scale
    val face = faceOf(x, y, z)
    val (u, v) = faceUV(face, x, y, z)
    val i0 = ijOf(u, scale); val j0 = ijOf(v, scale)
    val uLo = (i0 - k) * step - 1.0
    val uHi = (i0 + k + 1) * step - 1.0
    val vLo = (j0 - k) * step - 1.0
    val vHi = (j0 + k + 1) * step - 1.0
    val w = faceW(face); val ua = faceU(face); val va = faceV(face)
    // plane {p . (axis - c*w) = 0}; |axis - c*w| = sqrt(1 + c^2)
    def planeDist(ax: Vec3, c: Double): Double = {
      val d = (x * ax.x + y * ax.y + z * ax.z) - c * (x * w.x + y * w.y + z * w.z)
      math.asin(math.min(1.0, math.abs(d) / math.sqrt(1.0 + c * c)))
    }
    val hemi = math.asin(math.min(1.0, math.max(0.0, x * w.x + y * w.y + z * w.z)))
    math.min(hemi,
      math.min(math.min(planeDist(ua, uLo), planeDist(ua, uHi)),
        math.min(planeDist(va, vLo), planeDist(va, vHi))))
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

  /** Corner ring of a cell as flat [x0,y0,z0,...] unit n-vectors
    * (counter-clockwise) — directly consumable by the
    * point-in-polygon kernel. Lives here (not in the raster operator)
    * because it is pure cell geometry; Raster/vectorize delegate.
    */
  def cellCornersFlat(id: Long): Array[Double] = {
    val level = levelOf(id)
    val scale = 1 << level
    val step = 2.0 / scale
    val u0 = iOf(id) * step - 1.0
    val v0 = jOf(id) * step - 1.0
    val face = faceOf(id)
    val corners = Seq((u0, v0), (u0 + step, v0), (u0 + step, v0 + step), (u0, v0 + step))
    corners.flatMap { case (u, v) =>
      val c = graft.geo.VecMath.unit(dirOf(face, u, v))
      Seq(c.x, c.y, c.z)
    }.toArray
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

  /** Safe lower bound [rad] on the angular distance from unit vector
    * (x, y, z) to any point of `cell` (0 when the point may lie in or
    * touch the cell): the largest violated bounding-plane angle, plus
    * the face-hemisphere constraint. Never overestimates, so a disc
    * cover built from it can only over-include cells.
    */
  def cellMinDistLB(id: Long, x: Double, y: Double, z: Double): Double = {
    val level = levelOf(id)
    val scale = 1 << level
    val step = 2.0 / scale
    val face = faceOf(id)
    val u0 = iOf(id) * step - 1.0; val u1 = u0 + step
    val v0 = jOf(id) * step - 1.0; val v1 = v0 + step
    val w = faceW(face); val ua = faceU(face); val va = faceV(face)
    val pw = x * w.x + y * w.y + z * w.z
    // plane u = c with the cell on the {>= c} (sideGE) or {<= c} side;
    // positive return = violation angle
    def viol(ax: Vec3, c: Double, sideGE: Boolean): Double = {
      val d = (x * ax.x + y * ax.y + z * ax.z) - c * pw
      val s = d / math.sqrt(1.0 + c * c)
      val signed = if (sideGE) -s else s
      if (signed > 0) math.asin(math.min(1.0, signed)) else 0.0
    }
    var lb = math.max(viol(ua, u0, sideGE = true), viol(ua, u1, sideGE = false))
    lb = math.max(lb, math.max(viol(va, v0, sideGE = true), viol(va, v1, sideGE = false)))
    if (pw < 0) lb = math.max(lb, math.asin(math.min(1.0, -pw)))
    lb
  }

  /** All cells at `level` intersecting (by the safe lower bound) the
    * spherical cap of radius `angleRad` around unit (x, y, z) —
    * exact disc cover for broadcast prefilters, computed by quadtree
    * DESCENT from the 6 faces (a child within the cap implies its
    * parent's true distance — hence its lower bound — is within the
    * cap, so pruning parents never loses needed cells). Cost is
    * O(cover size * level), valid at any level; sorted ascending.
    */
  def capCells(x: Double, y: Double, z: Double, level: Int,
               angleRad: Double): Array[Long] = {
    var frontier = Array.tabulate(6)(f => pack(f, 0, 0, 0))
      .filter(c => cellMinDistLB(c, x, y, z) <= angleRad)
    var l = 0
    while (l < level) {
      frontier = frontier.flatMap(children)
        .filter(c => cellMinDistLB(c, x, y, z) <= angleRad)
      l += 1
    }
    java.util.Arrays.sort(frontier)
    frontier
  }

  /** Face frame axes: dirOf(face, u, v) = faceW + u*faceU + v*faceV. */
  private[index] val faceW = Array(Vec3(1, 0, 0), Vec3(-1, 0, 0), Vec3(0, 1, 0),
    Vec3(0, -1, 0), Vec3(0, 0, 1), Vec3(0, 0, -1))
  private[index] val faceU = Array(Vec3(0, 1, 0), Vec3(0, 0, 1), Vec3(0, 0, 1),
    Vec3(1, 0, 0), Vec3(1, 0, 0), Vec3(0, 1, 0))
  private[index] val faceV = Array(Vec3(0, 0, 1), Vec3(0, 1, 0), Vec3(1, 0, 0),
    Vec3(0, 0, 1), Vec3(0, 1, 0), Vec3(1, 0, 0))

  /** Every cell id at `level` (used when a ring block wraps its face;
    * callers keep levels small there — 6 * 4^level ids).
    */
  def allCells(level: Int): Array[Long] = {
    val scale = 1 << level
    val out = new Array[Long](6 * scale * scale)
    var idx = 0
    var f = 0
    while (f < 6) {
      var i = 0
      while (i < scale) {
        var j = 0
        while (j < scale) { out(idx) = pack(f, level, i, j); idx += 1; j += 1 }
        i += 1
      }
      f += 1
    }
    java.util.Arrays.sort(out)
    out
  }

  /** Distinct cells of the (2k+1)^2 block centered on `id`'s cell.
    * In-face neighbors are exact integer steps. Blocks hanging over a
    * face edge are resolved EXACTLY: each overhanging cell's 4 corner
    * directions are projected onto the neighbor face(s) they land on,
    * and every cell of the corner-projection bounding box is included.
    * The extended-uv -> neighbor-face map is a per-axis-monotone
    * rational function, so corner extremes bound the image exactly and
    * the box can only over-include (never miss) covered cells — the
    * property the join coverage proofs rely on. Blocks that wrap the
    * whole face (2k+1 >= scale) return [[allCells]]. Sorted ascending
    * for determinism, so downstream `explode` output is reproducible.
    */
  def ring(id: Long, k: Int): Array[Long] = {
    val level = levelOf(id); val face = faceOf(id)
    val scale = 1 << level
    if (2 * k + 1 >= scale) return allCells(level)
    val step = 2.0 / scale
    val i0 = iOf(id); val j0 = jOf(id)
    val out = new java.util.TreeSet[java.lang.Long]()
    var di = -k
    while (di <= k) {
      var dj = -k
      while (dj <= k) {
        val ii = i0 + di; val jj = j0 + dj
        if (ii >= 0 && ii < scale && jj >= 0 && jj < scale) {
          out.add(pack(face, level, ii, jj))
        } else {
          addOverhang(face, level, scale, step, ii, jj, out)
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

  /** In-memory bottom-up sibling-group compaction of a cell set down
    * to (but not past) `floor`: every complete 4-sibling group at a
    * level > floor merges to its parent, recursively. Input must be
    * distinct and ancestor-free (no cell containing another — the
    * same precondition as the distributed [[CellSetOps.compact]],
    * whose per-ancestor-group rounds call this). Output order is
    * unspecified (callers treat covers as sets).
    *
    * Cost: O(n · levels) hash operations, no allocation proportional
    * to the subtree — safe for the ≤ Σ_{d=1..chunk} 4^d ≈ 87k cells
    * an ancestor-free group can hold at chunk = 8.
    */
  def compactLocal(cs: Array[Long], floor: Int): Array[Long] = {
    if (cs.length < 4) return cs
    import scala.collection.mutable
    // bucket by level; only levels > floor participate in merging
    val byLevel = Array.fill(MaxLevel + 1)(null: mutable.LongMap[Unit])
    var maxL = 0
    var i = 0
    while (i < cs.length) {
      val l = levelOf(cs(i))
      if (byLevel(l) == null) byLevel(l) = mutable.LongMap.empty[Unit]
      byLevel(l).update(cs(i), ())
      if (l > maxL) maxL = l
      i += 1
    }
    var l = maxL
    while (l > floor) {
      val set = byLevel(l)
      if (set != null && set.nonEmpty) {
        val counts = mutable.LongMap.empty[Int]
        set.foreachKey { c =>
          val p = parent(c, 1)
          counts.update(p, counts.getOrElse(p, 0) + 1)
        }
        counts.foreach { case (p, n) =>
          if (n == 4) {
            // input distinctness ⇒ count 4 means all 4 children present
            children(p).foreach(set.remove)
            if (byLevel(l - 1) == null) byLevel(l - 1) = mutable.LongMap.empty[Unit]
            byLevel(l - 1).update(p, ())
          }
        }
      }
      l -= 1
    }
    val out = Array.newBuilder[Long]
    var lv = 0
    while (lv <= maxL) {
      if (byLevel(lv) != null) byLevel(lv).foreachKey(out += _)
      lv += 1
    }
    out.result()
  }

  /** Add every cell possibly covered by the off-face cell (ii, jj) of
    * `face` (extended indices). Requires the overhang to stay within
    * one face width (guaranteed by the 2k+1 < scale wrap guard), so
    * all corner directions have positive components toward every face
    * any corner lands on.
    */
  private def addOverhang(face: Int, level: Int, scale: Int, step: Double,
                          ii: Int, jj: Int,
                          out: java.util.TreeSet[java.lang.Long]): Unit = {
    val u0 = ii * step - 1.0; val u1 = (ii + 1) * step - 1.0
    val v0 = jj * step - 1.0; val v1 = (jj + 1) * step - 1.0
    val corners = Array(dirOf(face, u0, v0), dirOf(face, u0, v1),
      dirOf(face, u1, v0), dirOf(face, u1, v1))
    var seen = 0 // bitmask of target faces already handled
    var ci = 0
    while (ci < 4) {
      val g = faceOf(corners(ci).x, corners(ci).y, corners(ci).z)
      if ((seen & (1 << g)) == 0) {
        seen |= 1 << g
        var uLo = Double.MaxValue; var uHi = -Double.MaxValue
        var vLo = Double.MaxValue; var vHi = -Double.MaxValue
        var cj = 0
        while (cj < 4) {
          val c = corners(cj)
          val (u, v) = faceUV(g, c.x, c.y, c.z)
          if (u < uLo) uLo = u
          if (u > uHi) uHi = u
          if (v < vLo) vLo = v
          if (v > vHi) vHi = v
          cj += 1
        }
        val eps = 1e-12
        def lo(c: Double): Int = {
          val raw = math.floor((c + 1.0) / step - eps).toInt
          if (raw < 0) 0 else if (raw >= scale) scale - 1 else raw
        }
        def hi(c: Double): Int = {
          val raw = math.floor((c + 1.0) / step + eps).toInt
          if (raw < 0) 0 else if (raw >= scale) scale - 1 else raw
        }
        var i = lo(uLo)
        val iMax = hi(uHi)
        while (i <= iMax) {
          var j = lo(vLo)
          val jMax = hi(vHi)
          while (j <= jMax) { out.add(pack(g, level, i, j)); j += 1 }
          i += 1
        }
      }
      ci += 1
    }
  }
}
