package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join: attach to each left row the single
  * right row whose time is nearest at-or-before it (`backward`),
  * nearest at-or-after it (`forward`), or nearest in either direction
  * (`nearest`), within the same key and an optional tolerance — the
  * pandas `merge_asof` / DuckDB `ASOF JOIN` operator.
  *
  * Spark-first shape: ONE union + ONE cumulative window per direction
  * over the key partition — a single hash shuffle on the key and a
  * per-partition sort, so cost is O((|L|+|R|) log) regardless of how
  * wide the time tolerance is. The naive relational form (range join
  * + rank) fans out every left row to all in-range right rows first,
  * which at 100 TB with a wide tolerance is quadratic; this form
  * never materializes candidates at all.
  *
  * Determinism with duplicate right timestamps per key: the matched
  * right row's carried values are packed into one struct which ALSO
  * terminates the window ordering, so among equal-time right rows the
  * field-wise-greatest struct wins — deterministic without any extra
  * pre-aggregation shuffle.
  *
  * Contracts:
  *  - right rows with a null time never match; left rows with a null
  *    time get a null match.
  *  - `tolerance`/`nearest` need a numeric time column (they subtract
  *    times); plain `backward`/`forward` without tolerance work on
  *    any orderable type (timestamps included).
  *  - output = every left row (left-outer semantics) plus, for the
  *    matched right row, `rightPrefix + rightTime` and
  *    `rightPrefix + c` for each non-key non-time right column.
  */
object AsOfJoin {

  def asOfJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTime: String, rightTime: String,
               direction: String = "backward",
               tolerance: Option[Double] = None,
               rightPrefix: String = "r_"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    require(keyCols.nonEmpty, "asOfJoin needs at least one key column")
    val valueCols = right.columns.filterNot(c => keyCols.contains(c) || c == rightTime)
    // fail fast on silent column corruption: internal staging names
    // would be overwritten by withColumn, and a left column equal to
    // a prefixed output name would duplicate in the final select
    // (ambiguous far from the call site)
    val reserved = Seq("__t", "__rv", "__isL", "__pick")
    val clash = left.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"asOfJoin: left columns ${clash.mkString(", ")} collide with internal names $reserved")
    val outClash = (valueCols :+ rightTime).map(rightPrefix + _).filter(left.columns.contains)
    require(outClash.isEmpty,
      s"asOfJoin: output columns ${outClash.mkString(", ")} already exist on the left side — " +
        "pass a different rightPrefix")

    // right side: keys + unified time + packed carry struct
    val rv = struct(col(rightTime).as("__rt") +: valueCols.map(c => col(c).as(c)): _*)
    val r0 = right
      .filter(col(rightTime).isNotNull)
      .select(keyCols.map(col) :+ col(rightTime).as("__t") :+ rv.as("__rv"): _*)
      .withColumn("__isL", lit(0))
    val l0 = left
      .withColumn("__t", col(leftTime))
      .withColumn("__rv", lit(null).cast(r0.schema("__rv").dataType))
      .withColumn("__isL", lit(1))
    val all = l0.unionByName(r0, allowMissingColumns = true)

    // cumulative pick windows: right rows sort BEFORE the left row at
    // equal time (__isL asc), so an exactly-simultaneous right row is
    // matched by both directions; __rv closes the ordering so ties on
    // (key, time) resolve to the max struct deterministically
    val part = Window.partitionBy(keyCols.map(col): _*)
    def cum(w: org.apache.spark.sql.expressions.WindowSpec) =
      last(col("__rv"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val pickB = cum(part.orderBy(col("__t").asc, col("__isL").asc, col("__rv").asc))
    val pickF = cum(part.orderBy(col("__t").desc, col("__isL").asc, col("__rv").asc))

    def within(pick: Column, back: Boolean): Column = tolerance match {
      case None => pick
      case Some(tol) =>
        val gap = if (back) col("__t") - pick.getField("__rt")
                  else pick.getField("__rt") - col("__t")
        when(gap <= lit(tol), pick)
    }

    val picked = direction match {
      case "backward" => within(pickB, back = true)
      case "forward"  => within(pickF, back = false)
      case "nearest"  =>
        val b = within(pickB, back = true)
        val f = within(pickF, back = false)
        // tie at equal gap -> backward (the pandas convention)
        when(b.isNull, f).when(f.isNull, b)
          .when(col("__t") - b.getField("__rt") <= f.getField("__rt") - col("__t"), b)
          .otherwise(f)
    }
    // a null left time must never match (the desc window would
    // otherwise put it after every right row)
    val guarded = when(col("__t").isNotNull, picked)

    val outCols = left.columns.map(col) ++
      ((rightPrefix + rightTime, "__rt") +: valueCols.map(c => (rightPrefix + c, c)))
        .map { case (out, field) => col("__pick").getField(field).as(out) }
    // window BEFORE the left-rows filter — the pick must see right rows
    all.withColumn("__pick", guarded)
      .filter(col("__isL") === 1)
      .select(outCols: _*)
  }
}
