package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Scalar function families + UDF/UDAF surface (SURVEY.md §2B rows B32–B38).
  *
  * Determinism notes: only exact scalar functions appear in judged outputs
  * (string ops, floor/ceil/abs/sqrt/sign/mod — sqrt is IEEE correctly-rounded;
  * no pow/ln/exp whose last ulp may differ between Java Math and libm).
  * Engine return-type drift (Spark ceil→LONG vs DuckDB ceil→DOUBLE, Spark
  * year→INT vs DuckDB year→BIGINT, …) is pinned by explicit casts on both
  * sides.
  */
object Scalars {

  /** B32: string family. */
  def scalarString(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"),
        upper(col("c_name")).as("up"),
        lower(col("c_mktsegment")).as("lo"),
        substring(col("c_name"), 1, 8).as("sub8"),
        length(col("c_name")).cast(IntegerType).as("name_len"),
        trim(concat(lit("  "), col("c_mktsegment"), lit(" "))).as("trimmed"),
        regexp_replace(col("c_name"), lit("0"), lit("#")).as("replaced"),
        instr(col("c_name"), "1").cast(IntegerType).as("pos1"),
        lpad(col("c_custkey").cast(StringType), 10, "0").as("padded"),
        size(split(col("c_name"), "#")).cast(IntegerType).as("n_parts"))
      .orderBy(col("c_custkey"))

  /** B33: math family (exact subset — see object doc). */
  def scalarMath(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        abs(col("o_totalprice") - 150000.0).as("abs_diff"),
        round(col("o_totalprice"), 0).as("rounded"),
        ceil(col("o_totalprice")).cast(LongType).as("ceiled"),
        floor(col("o_totalprice")).cast(LongType).as("floored"),
        sqrt(col("o_totalprice")).as("root"),
        (col("o_orderkey") % 7).as("mod7"),
        signum(col("o_totalprice") - 150000.0).cast(IntegerType).as("sgn"),
        greatest(col("o_totalprice"), lit(100000.0)).as("hi"),
        least(col("o_totalprice"), lit(100000.0)).as("lo"))
      .orderBy(col("o_orderkey"))

  /** B34: date/time family (UTC session TZ pinned by harness). */
  def scalarDatetime(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderdate"),
        year(col("o_orderdate")).cast(IntegerType).as("y"),
        month(col("o_orderdate")).cast(IntegerType).as("m"),
        dayofmonth(col("o_orderdate")).cast(IntegerType).as("dom"),
        date_trunc("month", col("o_orderdate")).cast(TimestampNTZType).as("month_start"),
        datediff(lit("1998-01-01").cast(DateType), col("o_orderdate").cast(DateType))
          .cast(IntegerType).as("days_to_98"),
        // judged as TIMESTAMP (DATE → pandas object cells, dtype mismatch)
        date_add(col("o_orderdate").cast(DateType), 30).cast(TimestampNTZType).as("plus30"),
        (dayofweek(col("o_orderdate")) - 1).cast(IntegerType).as("dow"))
      .orderBy(col("o_orderkey"))

  /** B35: array / higher-order functions over the embedding vectors. */
  def scalarArray(s: SparkSession, d: String): DataFrame = {
    val toD = (c: org.apache.spark.sql.Column) =>
      transform(c, x => x.cast(DoubleType))
    val foldSum = (c: org.apache.spark.sql.Column) =>
      aggregate(toD(c), lit(0.0), (acc, x) => acc + x)
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        size(col("embedding")).cast(IntegerType).as("dim"),
        element_at(col("embedding"), 1).cast(DoubleType).as("first_val"),
        foldSum(col("embedding")).as("sum_all"),
        foldSum(slice(col("embedding"), 1, 8)).as("sum_first8"),
        array_max(col("embedding")).cast(DoubleType).as("max_val"),
        size(filter(col("embedding"), x => x > 0f)).cast(IntegerType).as("n_pos"))
      .orderBy(col("vec_id"))
  }

  /** B36: JSON extraction from the events.props string column. */
  def scalarJson(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k").as("k"))
      .orderBy(col("event_id"))

  /** B36c (Spark 4 VARIANT): parse props into a VARIANT and extract typed
    * paths — the modern semi-structured column (binary-encoded once at
    * ingest; path access at query time reads the encoding instead of
    * re-parsing JSON text per row, the difference that matters at 100 TB).
    * variant_get casts inside the encoding, try_variant_get yields NULL on
    * a missing path, schema_of_variant exposes the inferred shape. The
    * oracle replays the same accesses with DuckDB's JSON extraction (the
    * shape column is the expected literal — a drift in Spark's variant
    * inference would hash-mismatch). */
  def scalarVariant(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("v", expr("parse_json(props)"))
      .select(col("event_id"),
        expr("variant_get(v, '$.k', 'int')").as("k_int"),
        expr("to_json(variant_get(v, '$.k', 'variant'))").as("k_txt"),
        expr("try_variant_get(v, '$.nope', 'string')").as("missing"),
        expr("schema_of_variant(v)").as("v_schema"))
      .orderBy(col("event_id"))

  /** B36b: map construction + map_keys/map_values/element access. */
  def scalarMap(s: SparkSession, d: String): DataFrame = {
    val k = from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
      .getField("k").cast(StringType)
    Tables.events(s, d)
      .withColumn("m", map(lit("type"), col("event_type"), lit("k"), k))
      .select(col("event_id"),
        element_at(col("m"), "type").as("type_via_map"),
        element_at(col("m"), "k").cast(IntegerType).as("k_via_map"),
        size(col("m")).cast(IntegerType).as("n_keys"),
        // stringified: an ARRAY output column crashes the driver's pandas sort
        concat_ws(",", sort_array(map_keys(col("m")))).as("keys_sorted"))
      .orderBy(col("event_id"))
  }

  /** B33 extension: bitwise operator family — and/or/xor/not, shifts,
    * popcount. Two's-complement BIGINT semantics agree across engines
    * (DuckDB's xor is a function, `^` there means power). */
  def scalarBitwise(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        col("event_id").bitwiseAND(lit(255L)).as("b_and"),
        col("event_id").bitwiseOR(lit(4096L)).as("b_or"),
        col("event_id").bitwiseXOR(lit(1365L)).as("b_xor"),
        bitwise_not(col("event_id")).as("b_not"),
        shiftleft(col("event_id"), 3).as("b_shl"),
        // arithmetic shift to match DuckDB's >> (they diverge on negatives;
        // shiftrightunsigned would only agree on non-negative inputs)
        shiftright(col("event_id"), 2).as("b_shr"),
        bit_count(col("event_id")).cast(IntegerType).as("b_cnt"))
      .orderBy(col("event_id"))

  /** B33/B6 extension: error-safe evaluation — try_cast yields NULL instead
    * of raising under ANSI mode, try_divide nulls division by zero. DuckDB
    * mirrors with TRY_CAST and NULLIF-guarded division. */
  def scalarTryCast(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("prio_num"),
        expr("try_cast(o_orderstatus AS INT)").as("bad_int"),
        expr("try_divide(o_totalprice, o_custkey % 7)").as("safe_div"))
      .orderBy(col("o_orderkey"))

  /** B37: Scala UDF surface (oracle = equivalent SQL expression). */
  def udfScalar(s: SparkSession, d: String): DataFrame = {
    val score = udf((name: String) => name.length * 2 + name.count(_ == '1'))
    Tables.customer(s, d)
      .select(col("c_custkey"), score(col("c_name")).cast(IntegerType).as("score"))
      .orderBy(col("c_custkey"))
  }

  /** B38: typed Aggregator UDAF — exact-buffer weighted average. */
  def udafCustom(s: SparkSession, d: String): DataFrame = {
    val wavg = udaf(graft.functions.WeightedAvg)
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scalar_string" -> (scalarString _),
    "scalar_math" -> (scalarMath _),
    "scalar_datetime" -> (scalarDatetime _),
    "scalar_array" -> (scalarArray _),
    "scalar_json" -> (scalarJson _),
    "scalar_bitwise" -> (scalarBitwise _),
    "scalar_trycast" -> (scalarTryCast _),
    "scalar_map" -> (scalarMap _),
    "scalar_variant" -> (scalarVariant _),
    "udf_scalar" -> (udfScalar _),
    "udaf_custom" -> (udafCustom _))

  val oracles: Map[String, String] = Map(
    "scalar_string" ->
      """SELECT c_custkey,
        | upper(c_name) AS up, lower(c_mktsegment) AS lo,
        | substring(c_name, 1, 8) AS sub8,
        | CAST(length(c_name) AS INTEGER) AS name_len,
        | trim('  ' || c_mktsegment || ' ') AS trimmed,
        | replace(c_name, '0', '#') AS replaced,
        | CAST(instr(c_name, '1') AS INTEGER) AS pos1,
        | lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
        | CAST(len(string_split(c_name, '#')) AS INTEGER) AS n_parts
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "scalar_math" ->
      """SELECT o_orderkey,
        | abs(o_totalprice - 150000.0) AS abs_diff,
        | round(o_totalprice, 0) AS rounded,
        | CAST(ceil(o_totalprice) AS BIGINT) AS ceiled,
        | CAST(floor(o_totalprice) AS BIGINT) AS floored,
        | sqrt(o_totalprice) AS root,
        | o_orderkey % 7 AS mod7,
        | CAST(sign(o_totalprice - 150000.0) AS INTEGER) AS sgn,
        | greatest(o_totalprice, 100000.0) AS hi,
        | least(o_totalprice, 100000.0) AS lo
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_datetime" ->
      """SELECT o_orderkey, o_orderdate,
        | CAST(year(o_orderdate) AS INTEGER) AS y,
        | CAST(month(o_orderdate) AS INTEGER) AS m,
        | CAST(day(o_orderdate) AS INTEGER) AS dom,
        | CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER) AS days_to_98,
        | CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS plus30,
        | CAST(dayofweek(o_orderdate) AS INTEGER) AS dow
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_array" ->
      """SELECT vec_id, label,
        | CAST(len(embedding) AS INTEGER) AS dim,
        | CAST(embedding[1] AS DOUBLE) AS first_val,
        | list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum') AS sum_all,
        | list_aggregate(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)), 'sum') AS sum_first8,
        | CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS max_val,
        | CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "scalar_trycast" ->
      """SELECT o_orderkey,
        | TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
        | TRY_CAST(o_orderstatus AS INTEGER) AS bad_int,
        | o_totalprice / nullif(o_custkey % 7, 0) AS safe_div
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_bitwise" ->
      """SELECT event_id,
        | event_id & 255 AS b_and,
        | event_id | 4096 AS b_or,
        | xor(event_id, 1365) AS b_xor,
        | ~event_id AS b_not,
        | event_id << 3 AS b_shl,
        | event_id >> 2 AS b_shr,
        | CAST(bit_count(event_id) AS INTEGER) AS b_cnt
        |FROM events ORDER BY event_id""".stripMargin,
    "scalar_json" ->
      """SELECT event_id, event_type,
        | CAST(regexp_extract(props, '-?\d+', 0) AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "scalar_variant" ->
      """SELECT event_id,
        | CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
        | CAST(json_extract(props, '$.k') AS VARCHAR) AS k_txt,
        | json_extract_string(props, '$.nope') AS missing,
        | 'OBJECT<k: BIGINT>' AS v_schema
        |FROM events ORDER BY event_id""".stripMargin,
    "scalar_map" ->
      """SELECT event_id,
        | m['type'][1] AS type_via_map,
        | CAST(m['k'][1] AS INTEGER) AS k_via_map,
        | CAST(cardinality(m) AS INTEGER) AS n_keys,
        | array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted
        |FROM (SELECT event_id,
        |        MAP {'type': event_type,
        |             'k': CAST(CAST(regexp_extract(props, '-?\d+', 0) AS INTEGER) AS VARCHAR)} AS m
        |      FROM events)
        |ORDER BY event_id""".stripMargin,
    "udf_scalar" ->
      """SELECT c_custkey,
        | CAST(length(c_name) * 2 + (length(c_name) - length(replace(c_name, '1', ''))) AS INTEGER) AS score
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "udaf_custom" ->
      """SELECT l_returnflag,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |   / CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS wavg_price,
        | count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
