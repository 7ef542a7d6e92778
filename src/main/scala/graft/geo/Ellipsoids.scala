package graft.geo

/** Reference ellipsoid (semi-major axis [m], flattening, name).
  * Registry mirrors the reference library's 20-entry table + synonyms
  * (reference: src/envector/util.py:39-96).
  */
final case class Ellipsoid(a: Double, f: Double, name: String) {
  /** b = a(1-f), semi-minor (polar) radius. */
  def b: Double = Ellipsoids.polarRadius(a, f)
  /** e^2 = f(2-f) first eccentricity squared. */
  def e2: Double = f * (2.0 - f)
  /** e'^2 = e^2/(1-e^2) second eccentricity squared. */
  def e2m: Double = { val e = e2; e / (1.0 - e) }
  /** n = f/(2-f) third flattening. */
  def n: Double = f / (2.0 - f)
}

object Ellipsoids {
  def polarRadius(a: Double, f: Double): Double = a * (1.0 - f)
  def eccentricity2(f: Double): (Double, Double) = {
    val e2 = f * (2.0 - f); (e2, e2 / (1.0 - e2))
  }
  def thirdFlattening(f: Double): Double = f / (2.0 - f)

  val byId: Map[Int, Ellipsoid] = Map(
    1 -> Ellipsoid(6377563.3960, 1.0 / 299.3249646, "Airy 1858"),
    2 -> Ellipsoid(6377340.189, 1.0 / 299.3249646, "Airy Modified"),
    3 -> Ellipsoid(6378160.0, 1.0 / 298.25, "Australian National"),
    4 -> Ellipsoid(6377397.155, 1.0 / 299.1528128, "Bessel 1841"),
    5 -> Ellipsoid(6378249.145, 1.0 / 293.465, "Clarke 1880"),
    6 -> Ellipsoid(6377276.345, 1.0 / 300.8017, "Everest 1830"),
    7 -> Ellipsoid(6377304.063, 1.0 / 300.8017, "Everest Modified"),
    8 -> Ellipsoid(6378166.0, 1.0 / 298.3, "Fisher 1960"),
    9 -> Ellipsoid(6378150.0, 1.0 / 298.3, "Fisher 1968"),
    10 -> Ellipsoid(6378270.0, 1.0 / 297, "Hough 1956"),
    11 -> Ellipsoid(6378388.0, 1.0 / 297,
      "Hayford/International ellipsoid 1924/European Datum 1950/ED50"),
    12 -> Ellipsoid(6378245.0, 1.0 / 298.3, "Krassovsky 1938"),
    13 -> Ellipsoid(6378145.0, 1.0 / 298.25, "NWL-9D / WGS 66"),
    14 -> Ellipsoid(6378160.0, 1.0 / 298.25, "South American 1969 / SAD69"),
    15 -> Ellipsoid(6378136.0, 1.0 / 298.257, "Soviet Geod. System 1985"),
    16 -> Ellipsoid(6378135.0, 1.0 / 298.26, "WGS 72"),
    17 -> Ellipsoid(6378206.4, 1.0 / 294.9786982138, "Clarke 1866 / NAD27"),
    18 -> Ellipsoid(6378137.0, 1.0 / 298.257223563, "GRS80 / WGS84 / NAD83"),
    // DELIBERATE PARITY BUG: entry 19 stores the INVERSE flattening
    // un-inverted (298.257... instead of 1/298.257...), faithfully
    // reproducing the reference's own registry defect (util.py:59).
    // Selecting "ETRS89" there yields b = a(1-f) < 0 and nonsense
    // geodesics — same here, by fidelity. Do NOT "fix" this into
    // disagreement with the reference; use entry 18 (GRS80) for a
    // correct ETRS89-compatible ellipsoid.
    19 -> Ellipsoid(6378137.0, 298.257222101, "ETRS89 / EUREF89"),
    20 -> Ellipsoid(6377492.0176, 1 / 299.15281285, "NGO1948")
  )

  private val synonyms: Map[String, Int] = Map(
    "airy1858" -> 1, "airymodified" -> 2, "australiannational" -> 3,
    "bessel" -> 4, "bessel1841" -> 4, "clarke1880" -> 5, "everest1830" -> 6,
    "everestmodified" -> 7, "fisher1960" -> 8, "fisher1968" -> 9,
    "hough1956" -> 10, "hough" -> 10, "hayford" -> 11, "international" -> 11,
    "internationalellipsoid1924" -> 11, "europeandatum1950" -> 11,
    "ed50" -> 11, "krassovsky" -> 12, "krassovsky1938" -> 12, "nwl-9d" -> 13,
    "wgs66" -> 13, "southamerican1969" -> 14, "sad69" -> 14,
    "sovietgeod.system1985" -> 15, "wgs72" -> 16, "clarke1866" -> 17,
    "nad27" -> 17, "grs80" -> 18, "wgs84" -> 18, "nad83" -> 18,
    "euref89" -> 19, "etrs89" -> 19, "ngo1948" -> 20)

  def apply(name: String): Ellipsoid = {
    val key = name.toLowerCase.replace(" ", "").takeWhile(_ != '/')
    byId(synonyms(key))
  }

  val WGS84: Ellipsoid = byId(18)
  /** Mean Earth radius used by the spherical kernels [m]. */
  val MeanEarthRadius: Double = 6371009.0
}
