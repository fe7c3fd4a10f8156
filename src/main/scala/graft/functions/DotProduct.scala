package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen dot product over two ArrayType(DoubleType) columns.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0d, (acc,v) => acc+v)` — the same
  * left-to-right fold, hence bit-identical doubles — but compiles to a tight
  * primitive loop inside whole-stage codegen instead of allocating a zipped
  * array per row. This is the §7.3 "performance option" for the similarity
  * operators: the hot path of an O(pairs·dim) similarity join.
  *
  * Registered as the SQL function `graft_dot` (see VectorOps.ensureRegistered).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullable: Boolean = true

  /** Length mismatch → null, matching the zip_with/aggregate fold (zip_with
    * pads the shorter side with nulls, which nulls the sum). Elements are
    * assumed non-null (embedding vectors are complete by construction). */
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) null
    else {
      val n = a.numElements()
      var s = 0.0
      var i = 0
      while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
