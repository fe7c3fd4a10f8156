package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Vector math over ArrayType(FloatType) embedding columns, built from
  * codegen'd higher-order functions (no UDFs in the hot path).
  *
  * Determinism contract: every reduction is a left fold over doubles
  * (float→double casts are exact), which matches DuckDB's `list_aggregate
  * (…, 'sum')` ordering bit-for-bit — verified empirically. `sqrt` is IEEE
  * correctly-rounded in both engines, so cosine values hash-match.
  *
  * Scale note: for 100 TB one would add a custom Catalyst Expression with
  * `doGenCode` emitting a tight primitive loop (SURVEY.md §7.3); the
  * higher-order-function form keeps whole-stage codegen but allocates per
  * element. The SQL shape (and therefore results) would be identical.
  */
object VectorOps {
  /** Elementwise float→double (exact). */
  def embD(c: Column): Column = transform(c, x => x.cast(DoubleType))

  /** Registers the native codegen `graft_dot` in the session's function
    * registry (idempotent). Registry-based registration keeps us off the
    * version-sensitive Column(Expression) constructor. */
  def ensureRegistered(s: org.apache.spark.sql.SparkSession): Unit = {
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => {
        require(exprs.length == 2,
          s"graft_dot expects exactly 2 arguments, got ${exprs.length}")
        DotProduct(exprs.head, exprs(1))
      }, "built-in")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64", exprs => {
        require(exprs.length == 1,
          s"graft_simhash64 expects exactly 1 argument, got ${exprs.length}")
        SimHash64(exprs.head)
      }, "built-in")
    // graft_pq_argmin(emb, offset, cbFlat, norms): the offset/codebook/norm
    // arguments must be foldable literals — they are evaluated HERE, at
    // function-resolution time, and baked into the expression as plain
    // IndexedSeq fields (structural equality keeps cached-plan sharing).
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pq_argmin", exprs => {
        require(exprs.length == 4,
          s"graft_pq_argmin expects exactly 4 arguments, got ${exprs.length}")
        require(exprs.drop(1).forall(_.foldable),
          "graft_pq_argmin: offset, codebook, and norms must be foldable " +
            "literals (they are baked into the expression at resolution time)")
        val off = exprs(1).eval(null).asInstanceOf[Number].intValue
        val cb = exprs(2).eval(null).asInstanceOf[
          org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray.toIndexedSeq
        val norms = exprs(3).eval(null).asInstanceOf[
          org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray.toIndexedSeq
        require(norms.nonEmpty, "graft_pq_argmin: norms must be non-empty")
        require(cb.length % norms.length == 0,
          s"graft_pq_argmin: codebook length ${cb.length} not divisible by " +
            s"K=${norms.length}")
        PqArgMin(exprs(0), off, cb, norms)
      }, "built-in")
  }

  /** Dot product as a left fold: sum_i a_i*b_i (inputs already double).
    * Same value as `graft_dot`; kept as the portable fallback form. */
  def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Native codegen dot product (requires ensureRegistered on the session). */
  def dotFast(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def dot(a: Column, b: Column): Column = dotD(embD(a), embD(b))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a,b) = dot / (||a|| * ||b||), parenthesized to match the oracle. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** DuckDB SQL fragments mirroring the exact same fold shapes. */
  object Sql {
    def embD(c: String): String = s"CAST($c AS DOUBLE[])"
    def dotD(a: String, b: String): String =
      s"list_aggregate(list_transform(list_zip($a, $b), p -> p[1]*p[2]), 'sum')"
    def normD(a: String): String = s"sqrt(${dotD(a, a)})"
    def cosineD(a: String, b: String): String =
      s"(${dotD(a, b)} / (${normD(a)} * ${normD(b)}))"
  }
}
