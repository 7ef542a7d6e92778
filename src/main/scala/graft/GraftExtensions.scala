package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.GraftSqlBridge

/** Session-extension entry point: activate with
  * `spark.sql.extensions=graft.GraftExtensions` (spark-submit /
  * cluster deployments) to get the SQL geodesy functions without any
  * driver-side registration call. The same builders back
  * `GeoFunctions.register` for programmatic sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GeoFunctions.registry.foreach { case (name, (arity, builder)) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GeoFunctions", name),
        (exprs: Seq[Expression]) => {
          require(exprs.length == arity,
            s"$name expects $arity arguments, got ${exprs.length}")
          GraftSqlBridge.expressionEager(builder(exprs.map(GraftSqlBridge.column)))
        }))
    }
  }
}
