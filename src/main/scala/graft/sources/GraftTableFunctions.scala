package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog-level `bucket` function — what unlocks STORAGE-PARTITIONED
  * JOINS on bucket-transformed kv tables (the Iceberg SystemFunctions
  * shape): Spark's V2ScanPartitioning resolves a scan-reported
  * `bucket(n, col)` transform by loading `bucket` from the table's
  * FunctionCatalog and binding it to the column type; two scans whose
  * bound functions share a `canonicalName` (and bucket count) are
  * key-compatible, so co-bucketed fact⋈fact joins plan with NO exchange
  * on either side — the shuffle eliminator identity partitioning cannot
  * give when the key's cardinality is too high to partition by value.
  *
  * `produceResult` computes the EXACT routing the writer uses
  * (murmur3 over the value's canonical string encoding,
  * [[GraftPartition.bucketOf]]) — if Spark ever evaluates the function
  * (partially-clustered distributions, pushed partition values), its
  * answer and the files' recorded tuples can never disagree. */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): graft_kv partition-transform bucket ordinal " +
      "(murmur3 over the canonical value encoding, floorMod n)"
  override def bind(inputType: StructType): BoundFunction = {
    // the V2 resolution path catches UnsupportedOperationException to
    // stand down / report a clean analysis error; require would escape
    // as a raw internal failure
    def reject(msg: String): Nothing =
      throw new UnsupportedOperationException(msg)
    if (inputType.fields.length != 2)
      reject(s"graft bucket(n, col) takes 2 arguments, got ${inputType.length}")
    if (inputType.fields(0).dataType != IntegerType)
      reject("graft bucket(n, col): n must be INT")
    val dt = inputType.fields(1).dataType
    if (!GraftKvSink.supported(dt))
      reject(s"graft bucket(n, col): unsupported column type ${dt.simpleString}")
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      // the cross-scan compatibility key: same type -> same routing
      override def canonicalName(): String =
        s"graft.bucket(${dt.catalogString})"
      override def isResultNullable: Boolean = true
      override def produceResult(input: InternalRow): Integer =
        if (input.isNullAt(1)) null // null routes to the "\\N" tuple
        else Int.box(GraftPartition.bucketOf(
          GraftKvSink.encodeValue(dt, input, 1), input.getInt(0)))
    }
  }
}
