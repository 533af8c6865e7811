package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expr.{FarmFingerprint, FloatVecDot}

/** Cluster-deployment registration of the engine's native expressions:
  * `--conf spark.sql.extensions=graft.GraftExtensions` makes
  * `farm_fingerprint` and `vec_dot` available to EVERY session and SQL
  * client on the cluster (JDBC/Thrift included) with no driver-side
  * `register()` call. The per-session `register()` helpers on the
  * expression objects remain for embedded use; both paths bind the same
  * Expression classes, so plans and codegen are identical.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** The injected function descriptions — shared by the extension and the
    * registration spec so the SQL surface under test is exactly what a
    * `spark.sql.extensions` deployment gets.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("farm_fingerprint"),
      new ExpressionInfo(classOf[FarmFingerprint].getName, "farm_fingerprint"),
      (exprs: Seq[Expression]) => FarmFingerprint(exprs.head)),
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => FloatVecDot(exprs.head, exprs(1))))
}
