package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native Catalyst expression for uuid5 (RFC 4122 name-based, URL namespace) —
  * the reference's document-identity function (discovery.py:158-160).
  *
  * A custom Expression with `doGenCode` keeps the call inside whole-stage
  * codegen (a Scala UDF would break the codegen span and pay
  * serialization/encoder overhead per row on the 10^12-row build path).
  */
case class Uuid5Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Uuid5.uuid5(v.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Uuid5.uuid5($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): Uuid5Expr =
    copy(child = newChild)
  override def prettyName: String = "uuid5"
}

object Uuid5Expr {
  /** Column-level entry point (Spark 4 Column↔Expression bridge). Non-string
    * inputs are cast here — like [[CosineSimExpr]]'s entry point — so a
    * bigint column fails into a clean cast at plan time instead of a
    * ClassCastException mid-job.
    */
  def uuid5(c: Column): Column =
    ColumnBridge.column(Uuid5Expr(ColumnBridge.expression(c.cast("string"))))
}
