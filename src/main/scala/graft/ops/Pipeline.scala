package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.VectorOps

/** Training-data-pipeline operators beyond the reference's own surface:
  * temporal joins over the event stream and corpus-preparation primitives
  * (deterministic sampling, sequence packing, embedding quantization).
  *
  * Scale design:
  *  - as-of join: the classic union-and-carry-forward formulation — ONE
  *    shuffle by user_id, no range-condition fan-out, state is a single
  *    carried row per partition ordering. This is the shape that survives a
  *    billion-user table (contrast: a correlated max-subquery re-scans).
  *  - range join: equi-key (user_id) sort-merge join with the time window as
  *    a residual range predicate — partitions by user, never cartesian.
  *  - stratified sample / packing: one shuffle by the stratum key; inside a
  *    stratum the order is defined by (md5, id) so re-runs are bit-stable.
  *    At 100 TB you shard strata (lang, shard_id) to bound partition size.
  *  - quantization: pure per-row map over codegen'd HOFs — no shuffle at all.
  *
  * Determinism rules follow graft.ops (integer math, IEEE-only float steps,
  * md5 as the only cross-engine hash, no ARRAY/DECIMAL in judged schemas).
  */
object Pipeline {

  /** As-of join: each purchase event picks the user's latest click at or
    * before it. Clicks are pre-deduplicated per (user, ts) with max(event_id)
    * so equal-timestamp ties are deterministic; at equal (ts) the click sorts
    * before the purchase (tag 0 < 1) making the bound inclusive — the same
    * semantics as DuckDB's `ASOF JOIN ... ON p.ts >= c.ts` (the oracle uses
    * the identical union+window formulation for version safety). */
  def joinAsof(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts")).agg(max(col("event_id")).as("c_id"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_id"))
    val tagged = clicks
      .select(col("user_id"), col("ts"), lit(0).as("tag"), col("c_id"),
        lit(null).cast(LongType).as("p_id"))
      .unionByName(purch.select(col("user_id"), col("ts"), lit(1).as("tag"),
        lit(null).cast(LongType).as("c_id"), col("p_id")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"), col("p_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_c_id", last(col("c_id"), ignoreNulls = true).over(w))
      .withColumn("last_c_ts",
        last(when(col("tag") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("p_id"), col("user_id"), col("ts").as("p_ts"),
        col("last_c_id").as("c_id"), col("last_c_ts").as("c_ts"))
      .orderBy(col("p_id"))
  }

  /** Range (interval) join: follow-on activity within one hour after each
    * purchase — quiet purchases keep a zero count.
    *
    * The equi-key is (user_id, hour_bucket), not user_id alone: a plain
    * per-user equi-join fans out to |user history|² rows before the range
    * residual filters them (quadratic in the busiest user's event count —
    * the classic interval-join blowup at scale). Bucketing by the window
    * length bounds the fan-out to events in the purchase's own and next
    * hour: each purchase explodes into its two covering buckets, each
    * follow event carries exactly one, so every in-window event matches
    * exactly once and no dedup is needed. Buckets are internal (integer
    * epoch-hour), never judged. Zero-count purchases are restored by a
    * second equi-join on the purchase id instead of the old outer join. */
  def joinRange(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    // TZ-independent epoch-hour of a TIMESTAMP_NTZ wall-clock value. The
    // obvious cast(TimestampType).cast(LongType)/3600 routes the NTZ value
    // through the SESSION timezone (the dayNtz hazard): under a DST zone an
    // event 1 wall-hour after a purchase can land in bucket b0+2 and silently
    // miss both explode buckets. days-since-epoch * 24 + wall-clock hour
    // never consults the session zone, and NTZ `+ INTERVAL 1 HOUR` advances
    // the wall clock by exactly one hour, so the two-bucket cover is sound
    // in any session timezone.
    val hourOf = (c: Column) =>
      datediff(c.cast(DateType), lit("1970-01-01").cast(DateType)).cast(LongType) * 24L +
        hour(c).cast(LongType)
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val follow = ev.select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("f_bkt", hourOf(col("ts")))
    val hits = purch
      .withColumn("b0", hourOf(col("p_ts")))
      .withColumn("bkt", explode(array(col("b0"), col("b0") + 1)))
      .join(follow,
        col("p_user") === col("user_id") && col("bkt") === col("f_bkt") &&
          col("ts") > col("p_ts") &&
          col("ts") <= col("p_ts") + expr("INTERVAL 1 HOUR"))
      .groupBy(col("p_id"))
      .agg(count(col("event_id")).as("hit_cnt"), sumS(col("value")).as("hit_sum"))
    purch.join(hits, Seq("p_id"), "left")
      .select(col("p_id"), col("p_user"),
        coalesce(col("hit_cnt"), lit(0L)).as("n_follow"),
        col("hit_sum").as("val_sum"))
      .orderBy(col("p_id"))
  }

  /** Deterministic stratified sample: fixed-size per-language sample keyed by
    * md5(doc_id:lang) — md5 is bit-identical in both engines, so the sample
    * is reproducible anywhere (the property that makes training-data ablation
    * studies comparable across runs). */
  def sampleStratified(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("hk"), col("doc_id"))
    Tables.documents(s, d)
      .withColumn("hk",
        md5(concat(col("doc_id").cast(StringType), lit(":"), col("lang"))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 20)
      .select(col("doc_id"), col("lang"), col("rk").cast(IntegerType).as("rk"),
        col("hk"))
      .orderBy(col("lang"), col("rk"))
  }

  /** Sequence packing: assign documents (ordered by doc_id within language)
    * to fixed token-budget bins via the exclusive running token count —
    * contiguous-fill packing, the window-expressible variant of greedy
    * first-fit used to batch LLM pretraining sequences. */
  def packSequences(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast(LongType).as("n_tok"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("prefix", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("bin", expr("prefix div 512"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_sum"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"), col("bin"))
  }

  /** Int8-style scalar quantization of the embedding column: per-vector
    * scale = max|x|/127, q_i = floor(x_i * 127 / max|x|). All steps (abs,
    * max, one multiply, one divide, floor) are IEEE-correctly-rounded in
    * both engines, so the codes are bit-identical; the vector itself is
    * emitted stringified (ARRAY columns are unjudgeable, see package doc). */
  def embedQuantize(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .withColumn("emb_d", VectorOps.embD(col("embedding")))
      .withColumn("m", array_max(transform(col("emb_d"), x => abs(x))))
    e.withColumn("q", transform(col("emb_d"), x =>
        when(col("m") === 0.0, lit(0L))
          .otherwise(floor(x * lit(127.0) / col("m")).cast(LongType))))
      .select(col("vec_id"),
        aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
        array_min(col("q")).as("q_min"),
        array_max(col("q")).as("q_max"),
        concat_ws(",", transform(col("q"), _.cast(StringType))).as("q_str"))
      .orderBy(col("vec_id"))
  }

  /** Mixture/weighted sampling: per-language keep probabilities applied via a
    * deterministic hash-threshold Bernoulli — the domain-mixing step of a
    * pretraining data pipeline (e.g. upsample en, downsample fr), made
    * reproducible by hashing instead of RNG. The keep decision compares the
    * md5 hex prefix LEXICOGRAPHICALLY against a per-lang threshold string
    * ('e6' keeps 230/256 ≈ 0.9), which both engines evaluate identically —
    * no hex→int conversion, no engine RNG. Pure map + one groupBy shuffle. */
  def sampleWeighted(s: SparkSession, d: String): DataFrame = {
    val thresh = when(col("lang") === "en", "e6") // ≈ 0.90
      .when(col("lang") === "es", "b3")           // ≈ 0.70
      .when(col("lang") === "zh", "80")           // = 0.50
      .when(col("lang") === "de", "4d")           // ≈ 0.30
      .otherwise("33")                            // fr ≈ 0.20
    Tables.documents(s, d)
      .withColumn("hk", substring(
        md5(concat(col("doc_id").cast(StringType), lit(":"), col("lang"), lit(":mix"))), 1, 2))
      .withColumn("keep", (col("hk") < thresh).cast(IntegerType))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"), sum(col("keep")).as("n_kept"))
      .withColumn("keep_ratio", ratioD(col("n_kept"), col("n_total")))
      .orderBy(col("lang"))
  }

  /** Deterministic train/val/test split: assignment by md5(doc_id:'split')
    * hex prefix — 80/10/10 by construction ('cd' = 205/256 ≈ .80,
    * 'e6' = 230/256 ≈ .90). A pure per-row map, so the split is reproducible
    * across runs, engines, and cluster sizes (no RNG, no sampling-order
    * dependence — the property that keeps a held-out set held out when the
    * corpus is re-partitioned or re-ingested); the report is one groupBy
    * shuffle. At 100 TB the same expression assigns every document in one
    * codegen'd pass, and downstream consumers read a split as a column
    * predicate (train = hk < 'cd') instead of materializing three copies. */
  def trainSplit(s: SparkSession, d: String): DataFrame = {
    val hk = substring(
      md5(concat(col("doc_id").cast(StringType), lit(":split"))), 1, 2)
    Tables.documents(s, d)
      .withColumn("split",
        when(hk < "cd", "train").when(hk < "e6", "val").otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_sum"))
      .orderBy(col("split"), col("lang"))
  }

  /** Corpus composition report: document and token share per (source, lang) —
    * the mixture table a pretraining pipeline publishes before choosing
    * domain weights (and the input sample_weighted's per-lang probabilities
    * would be derived from). Shares are exact-integer ratios (bit-stable);
    * the global totals come from an unpartitioned window over the TINY
    * aggregated grid (|sources| × |langs| rows), never over the corpus. */
  def corpusMix(s: SparkSession, d: String): DataFrame = {
    val g = Tables.documents(s, d)
      .withColumn("n_tok", size(split(col("text"), " ")).cast(LongType))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_sum"))
    val wAll = Window.partitionBy()
    g.withColumn("doc_share", ratioD(col("n_docs"), sum(col("n_docs")).over(wAll)))
      .withColumn("tok_share", ratioD(col("tok_sum"), sum(col("tok_sum")).over(wAll)))
      .orderBy(col("source"), col("lang"))
  }

  /** End-to-end curation pipeline — the composition every pretraining data
    * run executes, as ONE declarative plan Catalyst optimizes whole:
    * language-consistency filter (text_langid's heuristic must agree with
    * the declared lang) → quality gate (text_quality's score ≥ 0.6) →
    * exact dedup (keep the min-doc_id representative per normalized
    * bag-of-words group, dedup_exact's key) → deterministic train/val/test
    * assignment (train_split's md5 threshold) → per-(split, lang) manifest.
    * Every stage is a per-row map or one keyed window/aggregate: filters
    * PRECEDE the dedup window, so the exchange carries survivors only;
    * nothing here is an action between stages (contrast an imperative
    * pipeline materializing each step). Aggregates are integer-only — no
    * double summation whose partial-merge order could drift. */
  def curateCorpus(s: SparkSession, d: String): DataFrame = {
    val t = split(col("text"), " ")
    val guess = when(col("text").rlike("[一-鿿]"), "zh")
      .when(col("text").rlike("[äöüß]"), "de")
      .when(col("text").rlike("[áéíóúñ¿¡]"), "es")
      .when(col("text").rlike("[àâçèêëîïôùû]"), "fr")
      .otherwise("en")
    // text_quality's 0.5·(u/n) + 0.5·((n−s)/n) ≥ 0.6 as the EXACT integer
    // cross-multiplication 5·(n_uniq − n_stop) ≥ n_tok — the module rule
    // (thresholds never compare floats; a boundary-score doc was the one
    // place double rounding could diverge between engines).
    val qualityOk =
      (size(array_distinct(t)) - size(filter(t, x => x.isin(Text.StopWords: _*))))
        .cast(LongType) * 5 >= size(t).cast(LongType)
    val hk = substring(
      md5(concat(col("doc_id").cast(StringType), lit(":split"))), 1, 2)
    Tables.documents(s, d)
      .filter(guess === col("lang") && qualityOk)
      .withColumn("n_tok", size(t).cast(LongType))
      .withColumn("grp_min", min(col("doc_id")).over(
        Window.partitionBy(md5(concat_ws(" ", sort_array(t))))))
      .filter(col("doc_id") === col("grp_min"))
      .withColumn("split",
        when(hk < "cd", "train").when(hk < "e6", "val").otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_sum"),
        sum(col("n_tok")).as("tok_sum"))
      .orderBy(col("split"), col("lang"))
  }

  /** Time-series resample + forward fill: dense daily spine per user (their
    * own [first, last] day), daily aggregates left-joined onto it, gaps
    * carry the last observed value forward — the gap-filling step that makes
    * event streams trainable/joinable on a regular grid. Per-user spine is
    * generated from bounds (no global calendar broadcast); the fill is one
    * window over (user, day) — the same single shuffle the daily aggregate
    * already needs. */
  def resampleFfill(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val daily = ev.groupBy(col("user_id"), dayNtz(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_ev"), sumS(col("value")).as("val_sum"))
    val spine = ev.groupBy(col("user_id"))
      .agg(min(dayNtz(col("ts"))).as("d0"), max(dayNtz(col("ts"))).as("d1"))
      .select(col("user_id"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .withColumn("n_ev", coalesce(col("n_ev"), lit(0L)))
      .withColumn("val_ffill", last(col("val_sum"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("day"), col("n_ev"), col("val_ffill"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Eval-set decontamination — the GPT-3/PaLM-style rule, asymmetric where
    * the dedup family is symmetric: a TRAINING doc is contaminated if it
    * shares ANY 5-token shingle with any EVAL doc (eval = doc_id % 50 = 0,
    * standing in for a held-out benchmark set). Judged output is the
    * per-language decontamination manifest (n_train / n_contam / n_kept) a
    * data run reports before training. Scale shape: the only join is an
    * equality join on the shingle string — distributes by shingle, scales
    * with true overlap, never pairs docs; no broadcast hint (real eval sets
    * are small and AQE broadcasts them, but the shape must survive a large
    * one). Docs shorter than one shingle cannot be contaminated — mirrored
    * in the oracle. */
  def decontaminate(s: SparkSession, d: String): DataFrame = {
    val sh = Tables.documents(s, d)
      .withColumn("t", split(col("text"), " "))
      .filter(size(col("t")) >= 5)
      .select(col("doc_id"),
        explode(array_distinct(expr(
          "transform(sequence(1, size(t) - 4), i -> array_join(slice(t, i, 5), ' '))")))
          .as("sh"))
    val evalSh = sh.filter(col("doc_id") % 50 === 0).select(col("sh")).distinct()
    val contam = sh.filter(col("doc_id") % 50 =!= 0)
      .join(evalSh, "sh")
      .select(col("doc_id")).distinct()
      .withColumn("flag", lit(1))
    Tables.documents(s, d).filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"), col("lang"))
      .join(contam, Seq("doc_id"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_train"),
        sum(coalesce(col("flag"), lit(0))).cast(LongType).as("n_contam"))
      .withColumn("n_kept", col("n_train") - col("n_contam"))
      .orderBy(col("lang"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "decontaminate" -> (decontaminate _),
    "resample_ffill" -> (resampleFfill _),
    "join_asof" -> (joinAsof _),
    "join_range" -> (joinRange _),
    "sample_stratified" -> (sampleStratified _),
    "sample_weighted" -> (sampleWeighted _),
    "train_split" -> (trainSplit _),
    "corpus_mix" -> (corpusMix _),
    "curate_corpus" -> (curateCorpus _),
    "pack_sequences" -> (packSequences _),
    "embed_quantize" -> (embedQuantize _))

  val oracles: Map[String, String] = Map(
    "decontaminate" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 3),
        |           i -> array_to_string(t[i:i+4], ' ')))) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        |  WHERE len(t) >= 5),
        |ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0),
        |contam AS (SELECT DISTINCT sh.doc_id FROM sh JOIN ev USING (sh)
        |           WHERE sh.doc_id % 50 <> 0),
        |train AS (SELECT doc_id, lang FROM documents WHERE doc_id % 50 <> 0)
        |SELECT lang, count(*) AS n_train,
        |  CAST(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contam,
        |  count(*) - CAST(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM train LEFT JOIN contam c ON train.doc_id = c.doc_id
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "join_asof" ->
      """WITH clicks AS (SELECT user_id, ts, max(event_id) AS c_id
        |                FROM events WHERE event_type = 'click'
        |                GROUP BY user_id, ts),
        |tagged AS (
        |  SELECT user_id, ts, 0 AS tag, c_id, CAST(NULL AS BIGINT) AS p_id
        |  FROM clicks
        |  UNION ALL
        |  SELECT user_id, ts, 1 AS tag, NULL AS c_id, event_id AS p_id
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (
        |  SELECT *,
        |    last_value(c_id IGNORE NULLS) OVER win AS last_c_id,
        |    last_value(CASE WHEN tag = 0 THEN ts END IGNORE NULLS) OVER win AS last_c_ts
        |  FROM tagged
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, tag, p_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT p_id, user_id, ts AS p_ts, last_c_id AS c_id, last_c_ts AS c_ts
        |FROM w WHERE tag = 1 ORDER BY p_id""".stripMargin,
    "join_range" ->
      """SELECT p.event_id AS p_id, p.user_id AS p_user,
        | count(e.event_id) AS n_follow,
        | CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS val_sum
        |FROM events p LEFT JOIN events e
        |  ON p.user_id = e.user_id AND e.ts > p.ts
        | AND e.ts <= p.ts + INTERVAL 1 HOUR
        |WHERE p.event_type = 'purchase'
        |GROUP BY p_id, p_user ORDER BY p_id""".stripMargin,
    "resample_ffill" ->
      """WITH daily AS (SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |        count(*) AS n_ev,
        |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS val_sum
        |      FROM events GROUP BY 1, 2),
        |bounds AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily
        |           GROUP BY user_id),
        |spine AS (SELECT user_id,
        |            unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        |          FROM bounds),
        |j AS (SELECT s.user_id, s.day, coalesce(dl.n_ev, 0) AS n_ev, dl.val_sum
        |      FROM spine s LEFT JOIN daily dl
        |        ON s.user_id = dl.user_id AND s.day = dl.day)
        |SELECT user_id, day, n_ev,
        |  last_value(val_sum IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS val_ffill
        |FROM j ORDER BY user_id, day""".stripMargin,
    "sample_weighted" ->
      """WITH k AS (SELECT lang,
        |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':' || lang || ':mix'), 1, 2)
        |       < (CASE lang WHEN 'en' THEN 'e6' WHEN 'es' THEN 'b3' WHEN 'zh' THEN '80'
        |                    WHEN 'de' THEN '4d' ELSE '33' END)
        |       THEN 1 ELSE 0 END AS keep
        |  FROM documents)
        |SELECT lang, count(*) AS n_total, CAST(sum(keep) AS BIGINT) AS n_kept,
        | CAST(sum(keep) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS keep_ratio
        |FROM k GROUP BY lang ORDER BY lang""".stripMargin,
    "train_split" ->
      """WITH k AS (SELECT lang, n_chars,
        |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) < 'cd' THEN 'train'
        |       WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) < 'e6' THEN 'val'
        |       ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars_sum
        |FROM k GROUP BY split, lang ORDER BY split, lang""".stripMargin,
    "corpus_mix" ->
      """WITH g AS (SELECT source, lang, count(*) AS n_docs,
        |             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok_sum
        |           FROM documents GROUP BY source, lang)
        |SELECT source, lang, n_docs, tok_sum,
        |  CAST(n_docs AS DOUBLE) / CAST(sum(n_docs) OVER () AS DOUBLE) AS doc_share,
        |  CAST(tok_sum AS DOUBLE) / CAST(sum(tok_sum) OVER () AS DOUBLE) AS tok_share
        |FROM g ORDER BY source, lang""".stripMargin,
    "curate_corpus" ->
      s"""WITH q AS (
         |  SELECT doc_id, lang, n_chars, string_split(text, ' ') AS t,
         |    CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
         |         WHEN regexp_matches(text, '[äöüß]') THEN 'de'
         |         WHEN regexp_matches(text, '[áéíóúñ¿¡]') THEN 'es'
         |         WHEN regexp_matches(text, '[àâçèêëîïôùû]') THEN 'fr'
         |         ELSE 'en' END AS guess
         |  FROM documents),
         |kept AS (
         |  SELECT * FROM q WHERE guess = lang AND
         |    5 * (CAST(len(list_distinct(t)) AS BIGINT)
         |         - CAST(len(list_filter(t, x -> x IN (${Text.stopList}))) AS BIGINT))
         |      >= CAST(len(t) AS BIGINT)),
         |dedup AS (
         |  SELECT *, min(doc_id) OVER (PARTITION BY array_to_string(list_sort(t), ' ')) AS grp_min
         |  FROM kept),
         |final AS (
         |  SELECT doc_id, lang, n_chars, CAST(len(t) AS BIGINT) AS n_tok,
         |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) < 'cd' THEN 'train'
         |         WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) < 'e6' THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM dedup WHERE doc_id = grp_min)
         |SELECT split, lang, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS chars_sum,
         |  CAST(sum(n_tok) AS BIGINT) AS tok_sum
         |FROM final GROUP BY split, lang ORDER BY split, lang""".stripMargin,
    "sample_stratified" ->
      """WITH h AS (SELECT doc_id, lang,
        |             md5(CAST(doc_id AS VARCHAR) || ':' || lang) AS hk
        |           FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rk
        |      FROM h)
        |SELECT doc_id, lang, CAST(rk AS INTEGER) AS rk, hk
        |FROM r WHERE rk <= 20 ORDER BY lang, rk""".stripMargin,
    "pack_sequences" ->
      """WITH b AS (SELECT doc_id, lang,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |           FROM documents),
        |p AS (SELECT *, coalesce(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
        |      FROM b)
        |SELECT lang, CAST(prefix // 512 AS BIGINT) AS bin, count(*) AS n_docs,
        | CAST(sum(n_tok) AS BIGINT) AS tok_sum,
        | min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM p GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,
    "embed_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |m AS (SELECT vec_id, emb,
        |        list_max(list_transform(emb, x -> abs(x))) AS mx FROM e),
        |q AS (SELECT vec_id,
        |        list_transform(emb, x -> CASE WHEN mx = 0 THEN CAST(0 AS BIGINT)
        |          ELSE CAST(floor(x * 127.0 / mx) AS BIGINT) END) AS ql
        |      FROM m)
        |SELECT vec_id, CAST(list_aggregate(ql, 'sum') AS BIGINT) AS q_sum,
        | CAST(list_min(ql) AS BIGINT) AS q_min,
        | CAST(list_max(ql) AS BIGINT) AS q_max,
        | array_to_string(ql, ',') AS q_str
        |FROM q ORDER BY vec_id""".stripMargin)
}
