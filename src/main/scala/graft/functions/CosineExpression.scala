package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native Catalyst expression for cosine similarity over two array<float>
  * embedding columns — the hot scalar of every ANN/near-dup/hybrid query
  * (SURVEY §2.11: "a native Catalyst Expression (with doGenCode) beats a
  * Scala UDF"). Stays inside whole-stage codegen: no Seq boxing, no encoder
  * round-trip per row, one fused loop over the raw float arrays.
  *
  * Arithmetic is IDENTICAL to [[graft.ops.Similarity.cosine]] (left-to-right
  * double accumulation over min-length, 0.0 on zero norms) so results are
  * bit-equal to the UDF it replaces and the DuckDB oracles stay green.
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  // children are array<float> by construction: the cosineSim entry point
  // casts both inputs (a no-op Cast for embedding columns, removed by the
  // optimizer; a real conversion for anything else)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    CosineSimExpr.cosine(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CosineSimExpr.cosine($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

object CosineSimExpr {

  /** Shared by interpreted eval and generated code (a static call keeps the
    * generated method tiny and JIT-friendly; the loop itself is branch-free).
    *
    * NULL ELEMENTS inside either array count as 0.0 (both Unsafe and generic
    * ArrayData read a null slot's float as 0), i.e. a null component simply
    * drops out of the dot product and norms. Embedding tables never contain
    * null components, but the semantic is defined rather than accidental —
    * note it differs from a naive `Seq[Float]` UDF, which would NPE.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Column-level entry point; inputs coerced to array<float>. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimExpr(
      ColumnBridge.expression(a.cast(ArrayType(FloatType))),
      ColumnBridge.expression(b.cast(ArrayType(FloatType)))))
}
