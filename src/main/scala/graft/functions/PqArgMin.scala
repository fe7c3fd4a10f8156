package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native codegen PQ sub-centroid argmin: given an embedding array column,
  * a subspace offset, and a driver-trained sub-codebook (flattened row-major
  * `cb` of K×dim doubles with per-centroid squared norms), returns the
  * 1-BASED index of the centroid minimizing ‖c_k‖² − 2⟨x_m,c_k⟩ (the
  * per-vector ‖x_m‖² term is constant inside the argmin, so this ranks
  * exactly like squared L2). Ties keep the FIRST k — the codebook is ordered
  * by centroid id, so this is the oracle's ORDER BY d, c_id tie-break.
  *
  * The dot accumulates left-to-right from 0.0 — the same fold as
  * [[DotProduct]] and DuckDB's expanded product sum, hence bit-identical
  * doubles and identical winners in both engines.
  *
  * The codebook rides along as `IndexedSeq` fields (STRUCTURAL equality, so
  * two plans trained to the same codebook canonicalize equal and the
  * family-shared persist cache still hits) and is referenced from generated
  * code as a primitive double[] — the hot loop is allocation-free inside
  * whole-stage codegen. The earlier formulation (broadcast join + 16
  * min(struct) aggregates) sorted n×K struct rows per pass; this one is a
  * straight n-row projection.
  *
  * Registered as the SQL function `graft_pq_argmin`
  * (see VectorOps.ensureRegistered).
  */
case class PqArgMin(child: Expression, offset: Int,
    cb: IndexedSeq[Double], norms: IndexedSeq[Double]) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_pq_argmin"

  private val dim = cb.length / norms.length
  @transient private lazy val cbArr: Array[Double] = cb.toArray
  @transient private lazy val normArr: Array[Double] = norms.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    var best = Double.PositiveInfinity
    var bk = 0
    var k = 0
    while (k < normArr.length) {
      var s = 0.0
      var i = 0
      while (i < dim) { s += x.getDouble(offset + i) * cbArr(k * dim + i); i += 1 }
      val d = normArr(k) - 2.0 * s
      if (d < best) { best = d; bk = k }
      k += 1
    }
    bk + 1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val cbRef = ctx.addReferenceObj("pqCb", cbArr, "double[]")
      val nRef = ctx.addReferenceObj("pqNorms", normArr, "double[]")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bk = ctx.freshName("bk")
      s"""
         |double $best = Double.POSITIVE_INFINITY;
         |int $bk = 0;
         |for (int $k = 0; $k < $nRef.length; $k++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $s += $x.getDouble($offset + $i) * $cbRef[$k * $dim + $i];
         |  }
         |  double $d = $nRef[$k] - 2.0 * $s;
         |  if ($d < $best) { $best = $d; $bk = $k; }
         |}
         |${ev.value} = $bk + 1;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqArgMin =
    copy(child = newChild)
}
