package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen 64-bit SimHash majority vote over an ArrayType(LongType)
  * column of token hashes: output bit i is set iff MORE than half the input
  * hashes have bit i set (the classic +1/-1 vote with ties → 0).
  *
  * Semantically identical to the 64-term higher-order-function form
  * `(0 until 64).map(i => when(size(filter(th, h => (h >> i) & 1 =!= 0)) * 2
  * > size(th), 1L << i).otherwise(0L)).reduce(_ bitwiseOR _)` — but that
  * shape evaluates 64 interpreted lambda filters per row (higher-order
  * functions drop out of whole-stage codegen), re-scanning the hash array 64
  * times. This expression is one fused primitive loop: a single pass
  * accumulating 64 counters, then one majority reduction — the per-row cost
  * drops from 64 array scans with closure dispatch to n·64 bit ops in
  * JIT-compiled code.
  *
  * Registered as the SQL function `graft_simhash64` (VectorOps
  * .ensureRegistered) and via GraftExtensions for deployment.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  /** Declared input type: calling on anything but array<bigint> is a clean
    * analysis-time error instead of a ClassCastException deep inside execution
    * from ArrayData.getLong. (checkInputDataTypes rather than
    * ImplicitCastInputTypes because AbstractDataType is private[sql] in
    * Spark 4.1.2 and unnameable from this package.) */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 requires array<bigint>, got ${other.catalogString}")
  }

  /** Empty input → 0 (no bit has a strict majority), null input → null. */
  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val cnt = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = a.getLong(i)
      var b = 0
      while (b < 64) { cnt(b) += ((h >>> b) & 1L).toInt; b += 1 }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (2 * cnt(b) > n) sig |= 1L << b; b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |int[] $cnt = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $cnt[$b] += (int) (($h >>> $b) & 1L);
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if (2 * $cnt[$b] > $n) $sig |= 1L << $b;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
