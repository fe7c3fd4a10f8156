package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{dayNtz}

/** Per-operator unit tests on tiny literal fixtures (FIXTURES.md plan):
  * join/agg null edges, window determinism, dedup fixture clusters,
  * similarity orderings, session-gap boundaries. */
class OpsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  // --- joins: null keys take the outer/anti path, never match (B10/B11) ---
  test("outer and semi/anti joins treat null keys as non-matching") {
    import spark.implicits._
    val l = Seq((Some(1), "a"), (Some(2), "b"), (None, "c")).toDF("k", "lv")
    val r = Seq((Some(1), "x"), (None, "y")).toDF("k", "rv")
    val outer = l.join(r, l("k") === r("k"), "left").collect()
    assert(outer.count(_.getAs[Any]("rv") == null) == 2) // k=2 and k=null
    assert(l.join(r, l("k") === r("k"), "left_semi").as[(Option[Int], String)]
      .collect().map(_._2).toSet == Set("a"))
    assert(l.join(r, l("k") === r("k"), "left_anti")
      .collect().map(_.getString(1)).toSet == Set("b", "c"))
  }

  test("aggregation over an all-null group yields null sum and zero count") {
    import spark.implicits._
    val df = Seq(("g1", Some(1.0)), ("g1", Some(2.0)), ("g2", None), ("g2", None))
      .toDF("g", "v")
    val out = df.groupBy("g").agg(
      sum(ops.dec(col("v"))).as("s"), count(col("v")).as("c"))
      .orderBy("g").collect()
    assert(out(0).getDecimal(1).doubleValue() == 3.0 && out(0).getLong(2) == 2)
    assert(out(1).get(1) == null && out(1).getLong(2) == 0)
  }

  test("running window sum is deterministic and exact over literal rows") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1L, 1, 0.1), (1L, 2, 0.2), (1L, 3, 0.3), (2L, 1, 1.0))
      .toDF("u", "seq", "v")
    val w = Window.partitionBy("u").orderBy("seq")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = df.select(col("u"), col("seq"),
        sum(ops.dec(col("v"))).over(w).cast("decimal(38,6)").as("rs"))
      .orderBy("u", "seq").collect()
    assert(out.map(_.getDecimal(2).toPlainString) ===
      Array("0.100000", "0.300000", "0.600000", "1.000000"))
  }

  // --- dedup fixture: exact dup + near dup + distinct (FIXTURES.md d) ---
  test("dedup_exact collapses bag-of-words duplicates to min doc_id") {
    val out = ops.Dedup.dedupExact(spark, FixtureData.docsDir(spark)).collect()
    val reps = out.map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(reps(0L) == 2L)            // docs 0 and 1 collapse, rep = 0
    assert(!reps.contains(1L))
    assert(reps(2L) == 1L && reps(3L) == 1L && reps(4L) == 1L)
  }

  test("dedup_minhash and ngram_jaccard find the planted near-dup pair") {
    val d = FixtureData.docsDir(spark)
    val mh = ops.Dedup.dedupMinhash(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.contains((0L, 1L)))      // identical token sets
    assert(mh.contains((0L, 2L)) && mh.contains((1L, 2L))) // 7/9 jaccard ≈ 0.78
    assert(!mh.exists(p => p._1 == 3L || p._2 == 3L))
    val jac = ops.Dedup.dedupNgramJaccard(spark, d)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap
    assert(jac((0L, 1L)) == 1.0)
    assert(math.abs(jac((0L, 2L)) - 7.0 / 9.0) < 1e-12)
  }

  test("simhash flags only the identical-token-set pair at distance 0") {
    val out = ops.Dedup.dedupSimhash(spark, FixtureData.docsDir(spark))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(out((0L, 1L)) == 0)
  }

  // --- >63-token vocabulary: tokenMasks must fall back to the array path —
  // the path a real (web-scale) corpus always takes, which the 31-token
  // driver fixtures never exercise ---
  test("dedup family agrees with brute force on a >63-token vocabulary") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fix_bigvocab").toString
    def w(i: Int) = f"w$i%02d"
    val docTok: Map[Long, Set[String]] = Map(
      0L -> (0 until 20).map(w).toSet,
      1L -> (0 until 20).map(w).toSet,                          // exact twin of 0
      2L -> ((0 until 15) ++ (40 until 45)).map(w).toSet,       // jac vs 0 = 15/25 = 0.6
      3L -> (45 until 60).map(w).toSet,
      4L -> (60 until 70).map(w).toSet,
      5L -> (20 until 30).map(w).toSet,                         // subset of doc 6
      6L -> (18 until 40).map(w).toSet)
    docTok.toSeq.sortBy(_._1)
      .map { case (id, ts) => (id, ts.toSeq.sorted.mkString(" "), "en", s"s$id", 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ids = docTok.keys.toSeq.sorted

    // exact-Jaccard expectation (>= 0.6 with the size-ratio precheck)
    val expJac = (for {
      a <- ids; b <- ids if a < b
      na = docTok(a).size; nb = docTok(b).size
      if math.min(na, nb) * 10 >= math.max(na, nb) * 6
      inter = (docTok(a) & docTok(b)).size
      if inter * 10 >= (na + nb - inter) * 6
    } yield (a, b)).toSet
    val gotJac = ops.Dedup.dedupNgramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotJac == expJac, s"jaccard: got $gotJac expected $expJac")

    // containment expectation (probe side %5, inter/min >= 0.8)
    val expCont = (for {
      a <- ids if a % 5 == 0; b <- ids if a < b
      inter = (docTok(a) & docTok(b)).size
      if inter * 10 >= math.min(docTok(a).size, docTok(b).size) * 8
    } yield (a, b)).toSet
    val gotCont = ops.Dedup.dedupContainment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotCont == expCont, s"containment: got $gotCont expected $expCont")

    // minhash LSH expectation from an INDEPENDENT plain-Scala reimplementation
    // of the md5 Kirsch-Mitzenmacher family (md5 hex slices, mod 1e9+7)
    val P = 1000000007L
    def md5hex(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val sigs: Map[Long, IndexedSeq[Long]] = docTok.map { case (id, ts) =>
      val hs = ts.toSeq.map { t =>
        val m = md5hex(t)
        (java.lang.Long.parseLong(m.substring(0, 14), 16) % P,
          java.lang.Long.parseLong(m.substring(14, 28), 16) % P)
      }
      id -> (0 until 16).map(i => hs.map { case (h1, h2) => (h1 + i * h2) % P }.min)
    }
    def bands(id: Long) = (0 until 4).map(b => sigs(id).slice(b * 4, b * 4 + 4).mkString(","))
    val expMh = (for {
      a <- ids; b <- ids if a < b
      if (0 until 4).exists(k => bands(a)(k) == bands(b)(k))   // band collision
      inter = (docTok(a) & docTok(b)).size
      na = docTok(a).size; nb = docTok(b).size
      if inter * 10 >= (na + nb - inter) * 7                   // exact verify
    } yield (a, b)).toSet
    val gotMh = ops.Dedup.dedupMinhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotMh == expMh, s"minhash: got $gotMh expected $expMh")
    assert(gotMh.contains((0L, 1L)))   // identical sets always collide + verify
  }

  test("dedup_components_lsh refines the exact-Jaccard components") {
    val d = FixtureData.docsDir(spark)
    val exact = ops.Dedup.dedupComponents(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val lsh = ops.Dedup.dedupComponentsLsh(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(lsh.keySet == exact.keySet)    // every doc labeled, incl. singletons
    assert(lsh(0L) == lsh(1L))            // identical token sets always collide
    // LSH edges are verified at the same >=0.6 bar, so they are a SUBSET of
    // the exact edge set: LSH components can only refine the exact partition,
    // never merge docs across two exact components
    for ((x, cx) <- lsh; (y, cy) <- lsh if cx == cy)
      assert(exact(x) == exact(y), s"lsh merged $x and $y across exact components")
  }

  // --- similarity fixture: known cosine ordering (FIXTURES.md e) ---
  test("sim_topk ranks same-direction before diagonal before orthogonal") {
    val out = ops.Similarity.simTopk(spark, FixtureData.embDir(spark))
      .filter(col("q_id") === 0).orderBy("rank").collect()
    assert(out.map(_.getLong(2)).take(2) === Array(1L, 3L)) // cos 1.0 then 0.707
    assert(math.abs(out(0).getDouble(3) - 1.0) < 1e-15)
    assert(out.map(_.getLong(2)).last == 2L)                // orthogonal last
  }

  test("native DotProduct matches the higher-order-function fold bitwise") {
    import spark.implicits._
    functions.VectorOps.ensureRegistered(spark)
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextFloat()), Array.fill(64)(rnd.nextFloat())))
    val df = rows.toDF("a", "b")
      .withColumn("ad", functions.VectorOps.embD(col("a")))
      .withColumn("bd", functions.VectorOps.embD(col("b")))
    val cmp = df.select(
      functions.VectorOps.dotD(col("ad"), col("bd")).as("hof"),
      functions.VectorOps.dotFast(col("ad"), col("bd")).as("native")).collect()
    assert(cmp.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("native SimHash64 matches the higher-order majority vote bitwise") {
    import spark.implicits._
    functions.VectorOps.ensureRegistered(spark)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)(Seq.fill(rnd.nextInt(30) + 1)(rnd.nextLong())) :+
      Seq.empty[Long]
    val df = rows.toDF("th")
    val n = size(col("th"))
    val hof = (0 until 64).map { i =>
      when(size(filter(col("th"),
          h => shiftright(h, i).bitwiseAND(lit(1L)) =!= 0L)) * 2 > n,
        shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    val cmp = df.select(hof.as("hof"),
      call_function("graft_simhash64", col("th")).as("native")).collect()
    assert(cmp.forall(r => r.getLong(0) == r.getLong(1)))
  }

  // --- session windows: gap boundary is strict (FIXTURES.md c) ---
  test("session_window splits at exactly the 30-minute gap") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fix_ev").toString
    val rows = Seq(
      (1L, ts("2024-01-01T10:00:00Z"), 1L, "view", 1.0, "{\"k\": 1}"),
      (2L, ts("2024-01-01T10:10:00Z"), 1L, "view", 1.0, "{\"k\": 2}"),
      (3L, ts("2024-01-01T11:00:00Z"), 1L, "view", 1.0, "{\"k\": 3}"),
      (4L, ts("2024-01-01T10:00:00Z"), 2L, "click", 1.0, "{\"k\": 4}"),
      (5L, ts("2024-01-01T10:30:00Z"), 2L, "click", 1.0, "{\"k\": 5}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    df_write(rows, s"$dir/events.parquet")
    val out = ops.Events.session(spark, dir).collect()
    val byUser = out.groupBy(_.getLong(0))
    assert(byUser(1L).length == 2)     // 10:00+10:10 merge; 11:00 is separate
    // Spark merges an event landing exactly at the session end (inclusive
    // boundary): 10:00 and 10:30 form ONE session ending 11:00.
    assert(byUser(2L).length == 1)
    assert(byUser(2L).head.getTimestamp(2).toInstant == Instant.parse("2024-01-01T11:00:00Z"))
    val s1 = byUser(1L).minBy(_.getTimestamp(1).getTime)
    assert(s1.getTimestamp(2).toInstant == Instant.parse("2024-01-01T10:40:00Z"))
  }

  private def df_write(df: org.apache.spark.sql.DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(path)

  test("multimodal decode stub is deterministic and shape-preserving") {
    val a = ops.Similarity.fakeDecode(7L, "hello world".getBytes("UTF-8"))
    val b = ops.Similarity.fakeDecode(7L, "hello world".getBytes("UTF-8"))
    assert(a == b && a.n_bytes == 11 && a.width == 12)
  }

  // --- full outer join: unmatched rows survive from BOTH sides (B10) ---
  test("full outer join keeps unmatched rows of both inputs") {
    val out = ops.Relational.joinOuterFull(spark, sf("sf0.001")).collect()
    val leftOnly = out.count(_.isNullAt(2))   // customer with no big order
    val rightOnly = out.count(_.isNullAt(1))  // big order, customer below bar
    assert(leftOnly > 0 && rightOnly > 0)
    assert(out.forall(!_.isNullAt(0)))        // coalesced key never null
    // key is unique and sorted
    val keys = out.map(_.getLong(0))
    assert(keys.distinct.length == keys.length && (keys sameElements keys.sorted))
  }

  // --- as-of join: inclusive bound, no future clicks, null for clickless ---
  test("join_asof picks the latest click at-or-before each purchase") {
    val dir = FixtureData.eventsDir(spark)
    val out = ops.Pipeline.joinAsof(spark, dir).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(out(3L).contains(2L)) // equal-ts click joins (inclusive bound)
    assert(out(5L).isEmpty)      // user 2 has no clicks -> null
  }

  test("join_range counts only follow-on events inside the hour") {
    val dir = FixtureData.eventsDir(spark)
    val out = ops.Pipeline.joinRange(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(5L) == 1L) // the view 15 min later
    assert(out(3L) == 1L) // click at 11:00 is within (10:00, 11:00]
  }

  // --- packing: exclusive prefix determines the bin, budget boundary exact ---
  test("pack_sequences assigns bins by the exclusive running token count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fix_pack").toString
    // 300-token docs: bins of 512 → docs 0,1 land in bins 0,0? prefix of doc1
    // is 300 (<512 → bin 0), doc2 prefix 600 → bin 1
    val mk = (n: Int) => Seq.fill(n)("w").mkString(" ")
    Seq((0L, mk(300), "en", "s", 1L), (1L, mk(300), "en", "s", 1L),
      (2L, mk(300), "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ops.Pipeline.packSequences(spark, dir).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == Map(0L -> 2L, 1L -> 1L)) // bin0: docs 0+1, bin1: doc 2
  }

  // --- quantization: extremes hit exactly ±127/range, zero vector safe ---
  test("embed_quantize maps the max-magnitude coordinate to exactly 127") {
    val dir = FixtureData.embDir(spark)
    val rows = ops.Pipeline.embedQuantize(spark, dir).collect()
    val byId = rows.map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(byId(0L).split(",").head == "127")   // (1,0,0,0) -> 127,0,0,0
    assert(byId(3L).split(",").take(2).toSeq == Seq("127", "127"))
  }

  // --- containment: subset-in-superset pairs that symmetric Jaccard dilutes ---
  test("dedup_containment scores subset pairs by the smaller set") {
    val out = ops.Dedup.dedupContainment(spark, FixtureData.docsDir(spark))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    assert(out((0L, 1L)) == 1.0)                      // identical bags
    assert(math.abs(out((0L, 2L)) - 7.0 / 8.0) < 1e-15) // 7 shared of 8
    assert(!out.keySet.exists(_._2 == 3L))            // unrelated doc excluded
  }

  // --- minhash emits each candidate pair exactly once (first-match band) ---
  test("dedup_minhash pair list is duplicate-free without a distinct") {
    val pairs = ops.Dedup.dedupMinhash(spark, FixtureData.docsDir(spark))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length == pairs.length)
  }

  // --- frame sampler: geometry from byte length, every 4th frame ---
  test("sampleFrames geometry and stride follow the 16-byte/4-stride contract") {
    val r = ops.Similarity.sampleFrames(7L, Array.fill[Byte](100)(1))
    assert(r.n_bytes == 100 && r.n_frames == 7 && r.n_sampled == 2) // frames 0,4
    val empty = ops.Similarity.sampleFrames(8L, Array.emptyByteArray)
    assert(empty.n_frames == 0 && empty.n_sampled == 0 && empty.checksum == 0L)
    // checksum covers exactly frames 0 and 4 (bytes 0-15 and 64-79)
    val bytes = Array.tabulate[Byte](100)(i => i.toByte)
    val manual = ((0 until 16) ++ (64 until 80)).foldLeft(0L)(
      (acc, i) => (acc * 31 + (bytes(i) & 0xff)) % 1000000007L)
    assert(ops.Similarity.sampleFrames(9L, bytes).checksum == manual)
  }

  // --- shingle dedup: order-sensitive where bag-of-words dedup is not ---
  test("dedup_shingle matches exact copies but not scrambled bags") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fix_shg").toString
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 46L),
      (1L, "theta eta zeta epsilon delta gamma beta alpha", "en", "s", 46L), // scrambled bag
      (2L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 46L), // exact copy of 0
      (3L, "alpha beta gamma delta epsilon zeta eta iota", "en", "s", 45L))  // 1-token edit
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = ops.Dedup.dedupShingle(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(pairs((0L, 2L)) == 1.0)          // identical text → jac 1
    assert(!pairs.contains((0L, 1L)))       // scrambled bag shares no shingle
    // 0 vs 3: 5 of 6 shingles shared → jac 5/7 ≥ 0.7 (if a band collides,
    // which the exact-verify makes safe either way)
    pairs.get((0L, 3L)).foreach(j => assert(math.abs(j - 5.0 / 7.0) < 1e-15))
    // bag-of-words minhash DOES pair the scrambled docs — the contrast that
    // motivates shingling
    val mh = ops.Dedup.dedupMinhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.contains((0L, 1L)))
  }

  // --- repetition: known duplicate-trigram ratio ---
  test("text_repetition computes the duplicate-trigram ratio exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fix_rep").toString
    Seq((0L, "a b c a b c a b c", "en", "s", 17L),   // 7 trigrams, 3 distinct
      (1L, "w x y z", "en", "s", 7L),                 // 2 trigrams, both unique
      (2L, "p q", "en", "s", 3L))                     // too short: dropped
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ops.Text.textRepetition(spark, dir).collect()
    assert(out.length == 2)
    val r0 = out.find(_.getLong(0) == 0L).get
    assert(r0.getInt(2) == 7 && r0.getInt(3) == 3)
    assert(math.abs(r0.getDouble(4) - (1.0 - 3.0 / 7.0)) < 1e-15)
    assert(r0.getInt(5) == 1)                          // flagged repetitive
    assert(out.find(_.getLong(0) == 1L).get.getInt(5) == 0)
  }

  // --- funnel: stages count only when strictly ordered ---
  test("events_funnel requires strict stage ordering per user") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fix_fun").toString
    val rows = Seq(
      (1L, ts("2024-01-01T09:00:00Z"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01T10:00:00Z"), 1L, "click", 1.0, "{}"),
      (3L, ts("2024-01-01T11:00:00Z"), 1L, "purchase", 1.0, "{}"), // full funnel
      (4L, ts("2024-01-01T09:00:00Z"), 2L, "click", 1.0, "{}"),
      (5L, ts("2024-01-01T10:00:00Z"), 2L, "view", 1.0, "{}"),     // click BEFORE view
      (6L, ts("2024-01-01T09:00:00Z"), 3L, "view", 1.0, "{}"))     // view only
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = ops.Events.eventsFunnel(spark, dir).collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 3)   // n_users, n_view
    assert(r.getLong(2) == 1 && r.getLong(3) == 1)   // strict ordering filters user 2
  }

  // --- upsert: matched keys replaced, new keys inserted, counts add up ---
  test("merge_upsert replaces matched keys and inserts new ones") {
    val d = sf("sf0.001")
    val base = Tables.orders(spark, d)
    val n = base.count()
    val n13 = base.filter(col("o_orderkey") % 13 === 0).count()
    val n7 = base.filter(col("o_orderkey") % 7 === 0).count()
    val out = ops.KeyRange.mergeUpsert(spark, d).collect()
    assert(out.map(_.getLong(1)).sum == n + n13)     // inserts only grow by new keys
    assert(out.find(_.getString(0) == "X").get.getLong(1) == n7) // replaced rows
    assert(out.find(_.getString(0) == "N").get.getLong(1) == n13) // inserted rows
  }

  // --- multi-probe ANN: the extra cell/bucket can only add (or keep) hits
  //     (a displacing candidate has higher cosine, so it is itself truth) ---
  test("multi-probe recall is per-query >= single-probe for BOTH indexes") {
    for ((name, df) <- Seq(
        "ivf" -> ops.Similarity.annRecallIvf(spark, sf("sf0.001")),
        "lsh" -> ops.Similarity.annRecall(spark, sf("sf0.001")))) {
      val rows = df.collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getLong(1) <= r.getLong(2),
          s"$name q=${r.getLong(0)}: n_hit1=${r.getLong(1)} > n_hit2=${r.getLong(2)}")
      }
    }
  }

  // --- late-drop: the two-phase (per-hour + prefix) watermark equals the
  //     naive single global window, and lateness is genuinely exercised ---
  test("stream_late_drop matches a naive global-window watermark") {
    val d = sf("sf0.001")
    val out = ops.Events.streamLateDrop(spark, d)
    // Naive twin computed right here: one global arrival-order window.
    val wAll = Window.orderBy(col("arr"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = Tables.events(spark, d)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .withColumn("jm", expr("CAST(conv(substring(md5(concat('j:', " +
        "CAST(event_id AS STRING))), 1, 4), 16, 10) AS BIGINT) % 31"))
      .withColumn("arr", expr("timestampadd(MINUTE, jm, ts)"))
      .withColumn("wm_src", max(col("ts")).over(wAll))
      .withColumn("late", col("wm_src").isNotNull &&
        col("ts") < expr("timestampadd(MINUTE, -10, wm_src)"))
      .groupBy(dayNtz(col("ts")).as("w_day"), col("event_type"))
      .agg(sum(when(col("late"), 0L).otherwise(1L)).as("n_kept"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_late"))
      .select(col("w_day"), col("event_type"), col("n_kept"), col("n_late"))
    assert(out.select("w_day", "event_type", "n_kept", "n_late")
      .exceptAll(naive).isEmpty && naive.exceptAll(
        out.select("w_day", "event_type", "n_kept", "n_late")).isEmpty)
    val tot = out.agg(sum("n_kept"), sum("n_late")).collect().head
    assert(tot.getLong(0) + tot.getLong(1) ==
      Tables.events(spark, d).count())            // every event accounted for
    assert(tot.getLong(1) > 0, "jittered replay produced no late rows")
  }

  // --- rate limit: no (user, day) ever admits more than the quota ---
  test("stream_rate_limit admits at most 3 per user-day and conserves rows") {
    val d = sf("sf0.001")
    val ev = Tables.events(spark, d)
    val out = ops.Events.streamRateLimit(spark, d).collect()
    val admitted = out.map(_.getLong(1)).sum
    val throttled = out.map(_.getLong(2)).sum
    assert(admitted + throttled == ev.count())
    assert(throttled > 0, "quota never binds on this data")
    // independently: sum over keys of min(count, 3) == admitted
    val perKey = ev.groupBy(col("user_id"), dayNtz(col("ts")))
      .agg(count(lit(1)).as("n"))
      .agg(sum(least(col("n"), lit(3L)))).collect().head.getLong(0)
    assert(perKey == admitted)
  }

  // --- PQ-ADC: a real approximation (not secretly exact) that still finds
  //     a usable share of the true top-3 at a 16× memory compression ---
  test("ann_recall_pq recall is meaningfully between 0 and 1") {
    val rows = ops.Similarity.annRecallPq(spark, sf("sf0.001")).collect()
    assert(rows.length == 64)                  // one row per sampled query
    rows.foreach { r =>
      val rec = r.getDouble(2)
      assert(rec >= 0.0 && rec <= 1.0, s"q=${r.getLong(0)}: recall=$rec")
    }
    val mean = rows.map(_.getDouble(2)).sum / rows.length
    assert(mean > 0.15, s"mean recall collapsed: $mean")
    assert(mean < 0.999, s"PQ should be lossy, got mean recall $mean")
  }

  // --- decontamination: eval 5-gram overlap flags train docs ---
  test("decontaminate flags train docs sharing a 5-shingle with the eval set") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fix_decon").toString
    Seq(
      (0L, "q w e r t y u", "en", "s", 13L),   // eval doc (0 % 50 == 0)
      (1L, "z q w e r t z", "en", "s", 13L),   // shares "q w e r t" -> contaminated
      (2L, "a b c d e f g", "en", "s", 13L),   // clean
      (3L, "q w e r", "en", "s", 7L))          // < 5 tokens: cannot be contaminated
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = ops.Pipeline.decontaminate(spark, dir).collect().head
    assert(r.getString(0) == "en")
    assert(r.getLong(1) == 3 && r.getLong(2) == 1 && r.getLong(3) == 2)
  }

  // --- deterministic HLL: estimate lands within the m=256 error regime ---
  test("agg_hll_distinct estimates within 10% of the exact count") {
    val rows = ops.Relational.aggHllDistinct(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getDouble(3); val exact = r.getLong(4).toDouble
      assert(math.abs(est - exact) / exact < 0.10,
        s"${r.getString(0)}: est=$est exact=$exact")
    }
  }

  // --- BPE: left-to-right non-overlapping merges ("aaa" merges ONCE) ---
  test("text_bpe_merges counts positional pairs and merges non-overlapping") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fix_bpe").toString
    // "aaa": pair (a,a) at two positions but only ONE merge fires per word;
    // round 2 must then see (aa, a) — the state after a correct L2R fold
    Seq((0L, "aaa aaa xy xy xy", "en", "s", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ops.Text.textBpeMerges(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // round 1: (a,a) cnt 4 (2 positions x freq 2) beats (x,y) cnt 3
    assert(out(0) == ((1, "a", "a", "aa", 4L)))
    // round 2: non-overlap left the words as [aa, a] -> (aa, a) cnt 2 loses
    // to (x, y) cnt 3; a double-merge bug would have consumed "aaa" whole
    assert(out(1) == ((2, "x", "y", "xy", 3L)))
    assert(out(2) == ((3, "aa", "a", "aaa", 2L)))
  }

  // --- chunking: window/stride geometry on a doc longer than one window ---
  test("text_chunk emits 128-token windows at stride 96 with 32-token overlap") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fix_chunk").toString
    val words300 = (1 to 300).map(i => s"w$i").mkString(" ")
    Seq((0L, words300, "en", "s", words300.length.toLong),
      (1L, "a b c", "en", "s", 5L)) // short doc: exactly one chunk
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ops.Text.textChunk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val doc0 = out.filter(_._1 == 0L)
    assert(doc0.map(c => (c._2, c._3, c._4)).toSeq ==
      Seq((0L, 1L, 128L), (1L, 97L, 128L), (2L, 193L, 108L)))
    assert(doc0.map(_._5).distinct.length == 3) // distinct content hashes
    assert(out.filter(_._1 == 1L).map(c => (c._2, c._3, c._4)).toSeq ==
      Seq((0L, 1L, 3L)))
  }

  // --- levenshtein candidates: the rarest-2 token filter loses no pair ---
  test("text_levenshtein prefix-filtered candidates equal the quadratic join") {
    for (d <- Seq(sf("sf0.001"), sf("sf0.01"))) {
      val filtered = ops.Text.textLevenshtein(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val quadratic = ops.Text.textLevenshteinQuadratic(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(filtered == quadratic, s"$d: ${filtered.size} vs ${quadratic.size}")
    }
  }

  // --- and the KNOWN boundary of that filter, pinned on an adversarial
  // fixture: a same-length pair within edit distance 4 whose rarest-2 probe
  // tokens appear in NO other document. No token-overlap bound is sound for
  // edit distance (10 edits can rewrite every rare token), so the rarest-2
  // filter DROPS this pair — by declared design, mirrored by the oracle.
  // This test fails the moment the boundary moves, so the docstring's
  // honesty note stays true. ---
  test("text_levenshtein boundary: disjoint-rare-token near pair is dropped by design") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_lev_adv").toString
    val rows = Seq(
      // probe (doc_id % 5 == 0): rarest-2 = xx, yy (df 1 each; shared* df 4)
      (0L, "xx yy shared1 shared2 shared3", "en", "s0", 29L),
      // within lev 4 of the probe, same length — but zz/ww share no rare token
      (1L, "zz ww shared1 shared2 shared3", "en", "s1", 29L),
      // filler raising df(shared*) to 4; 40-char prefixes keep them lev > 10
      // AND length-residual > 5 from docs 0/1
      (2L, "shared1 shared2 shared3 qqqqqqq wwwwwww eeeeeee", "en", "s2", 47L),
      (3L, "shared1 shared2 shared3 rrrrrrr ttttttt uuuuuuu", "en", "s3", 47L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")
    val quadratic = ops.Text.textLevenshteinQuadratic(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val filtered = ops.Text.textLevenshtein(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(quadratic == Set((0L, 1L))) // the pair IS within the threshold...
    assert(filtered.isEmpty)           // ...and the declared filter drops it
  }

  // --- vocabulary head: Zipf rank with deterministic tie-break ---
  test("text_vocab ranks by count desc then term asc") {
    val out = ops.Text.textVocab(spark, FixtureData.docsDir(spark)).collect()
    assert(out.head.getString(0) == "alpha" && out.head.getLong(1) == 3)
    val ranks = out.map(_.getInt(2))
    assert(ranks sameElements (1 to out.length))
  }

  // --- exact-moment stats agree with the native estimator numerically ---
  test("agg_stats matches native var_samp to relative 1e-9") {
    val d = sf("sf0.001")
    val ours = ops.Relational.aggStats(spark, d).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val native = Tables.orders(spark, d).groupBy(col("o_orderstatus"))
      .agg(var_samp(col("o_totalprice"))).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ours.keySet == native.keySet)
    ours.foreach { case (k, v) =>
      assert(math.abs(v - native(k)) / native(k) < 1e-9, s"$k: $v vs ${native(k)}")
    }
  }

  test("agg_corr/agg_regression match native corr/regr_* to relative 1e-9") {
    val d = sf("sf0.001")
    def close(a: Double, b: Double, tag: String): Unit =
      assert(math.abs(a - b) / math.max(math.abs(b), 1e-12) < 1e-9, s"$tag: $a vs $b")
    val corrOurs = ops.Relational.aggCorr(spark, d).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val corrNat = Tables.lineitem(spark, d).groupBy(col("l_returnflag"))
      .agg(covar_pop(col("l_quantity"), col("l_discount")),
        covar_samp(col("l_quantity"), col("l_discount")),
        corr(col("l_quantity"), col("l_discount"))).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(corrOurs.keySet == corrNat.keySet)
    corrOurs.foreach { case (k, (cp, cs, co)) =>
      close(cp, corrNat(k)._1, s"$k covar_pop")
      close(cs, corrNat(k)._2, s"$k covar_samp")
      close(co, corrNat(k)._3, s"$k corr")
    }
    val regOurs = ops.Relational.aggRegression(spark, d).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val regNat = Tables.lineitem(spark, d).groupBy(col("l_returnflag"))
      .agg(regr_slope(col("l_extendedprice"), col("l_quantity")),
        regr_intercept(col("l_extendedprice"), col("l_quantity"))).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    regOurs.foreach { case (k, (sl, in)) =>
      close(sl, regNat(k)._1, s"$k slope")
      close(in, regNat(k)._2, s"$k intercept")
    }
  }

  // --- resample: gap days appear with zero count and carried-forward value ---
  test("resample_ffill fills gap days and carries the last value forward") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fix_rs").toString
    Seq(
      (1L, ts("2024-01-01T10:00:00Z"), 1L, "view", 2.5, "{}"),
      (2L, ts("2024-01-04T10:00:00Z"), 1L, "view", 7.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ops.Pipeline.resampleFfill(spark, dir).collect()
    assert(out.length == 4)                           // dense Jan 1-4 spine
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 0L, 0L, 1L))
    assert(out.map(_.getDouble(3)).toSeq == Seq(2.5, 2.5, 2.5, 7.0)) // ffill
  }

  // --- retention: cohort = first active day, day-0 is the cohort size ---
  test("events_retention counts returning users per cohort day-offset") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fix_ret").toString
    Seq(
      (1L, ts("2024-01-01T09:00:00Z"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01T11:00:00Z"), 1L, "click", 1.0, "{}"), // same day: once
      (3L, ts("2024-01-02T09:00:00Z"), 1L, "view", 1.0, "{}"),  // back on day 1
      (4L, ts("2024-01-01T09:00:00Z"), 2L, "view", 1.0, "{}"),  // day 0 only
      (5L, ts("2024-01-02T09:00:00Z"), 3L, "view", 1.0, "{}"))  // later cohort
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ops.Events.eventsRetention(spark, dir).collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).toLocalDate.toString,
        r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("2024-01-01", 0L)) == (2L, 1.0))   // cohort size 2
    assert(out(("2024-01-01", 1L)) == (1L, 0.5))   // one of two returned
    assert(out(("2024-01-02", 0L)) == (1L, 1.0))   // user 3's own cohort
    assert(out.size == 3)
  }

  // --- split: deterministic, disjoint, and ~80/10/10 ---
  test("train_split partitions every doc deterministically near 80/10/10") {
    val d = sf("sf0.001")
    val out = ops.Pipeline.trainSplit(spark, d).collect()
    val bySplit = out.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    val total = Tables.documents(spark, d).count()
    assert(bySplit.values.sum == total)            // disjoint + exhaustive
    assert(bySplit("train").toDouble / total > 0.7 &&
      bySplit("train").toDouble / total < 0.9)
    assert(bySplit("val") > 0 && bySplit("test") > 0)
    val again = ops.Pipeline.trainSplit(spark, d).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  // --- curation pipeline: every stage must bite ---
  test("curate_corpus drops lang-mismatch, low-quality, and duplicate docs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fix_cur").toString
    Seq(
      (0L, "alpha beta gamma delta epsilon", "en", "s", 30L), // kept
      (1L, "epsilon delta gamma beta alpha", "en", "s", 30L), // bag-dup of 0
      (2L, "the the the the", "en", "s", 15L),                // quality 0.125
      (3L, "voilà une phrase différente", "en", "s", 27L),    // guess fr != en
      (4L, "omega psi chi phi", "en", "s", 17L))              // kept
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ops.Pipeline.curateCorpus(spark, dir).collect()
    assert(out.map(_.getLong(2)).sum == 2)            // docs 0 and 4 survive
    assert(out.map(_.getLong(3)).sum == 30L + 17L)    // chars_sum
    assert(out.map(_.getLong(4)).sum == 5L + 4L)      // tok_sum
  }

  // --- mix report: shares are exact ratios over the aggregated grid ---
  test("dedup_blocks flags cross-doc repeated 16-token blocks only") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_blocks").toString
    val shared = (1 to 16).map(i => s"w$i").mkString(" ") // one full block
    val rows = Seq(
      (0L, shared + " solo0 tail0", "en", "s0", 100L), // block0 shared, block1 unique
      (1L, shared + " solo1 tail1", "en", "s1", 100L), // shares block0 with doc 0
      (2L, (1 to 20).map(i => s"z$i").mkString(" "), "en", "s2", 100L)) // all unique
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")
    val out = ops.Dedup.dedupBlocks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out(0) == ((0L, 2L, 1L, 0.5))) // 2 blocks, the shared one repeated
    assert(out(1) == ((1L, 2L, 1L, 0.5)))
    assert(out(2) == ((2L, 2L, 0L, 0.0))) // 20 tokens → 2 blocks, none repeated
  }

  test("export_sharded covers every doc across its 8 hash shards") {
    val d = sf("sf0.001")
    val m = ops.KeyRange.exportSharded(spark, d).collect()
    assert(m.map(_.getLong(0)).toSet == (0L to 7L).toSet) // every shard written
    assert(m.map(_.getLong(1)).sum == Tables.documents(spark, d).count())
    // md5 sharding balances within a loose factor at 500 docs
    val counts = m.map(_.getLong(1))
    assert(counts.max <= counts.min * 3, counts.mkString(","))
  }

  test("corpus_mix shares sum to 1 and counts cover the corpus") {
    val d = sf("sf0.001")
    val out = ops.Pipeline.corpusMix(spark, d).collect()
    val total = Tables.documents(spark, d).count()
    assert(out.map(_.getLong(2)).sum == total)
    assert(math.abs(out.map(_.getDouble(4)).sum - 1.0) < 1e-9)
    assert(math.abs(out.map(_.getDouble(5)).sum - 1.0) < 1e-9)
  }

  // --- grouping sets: per-set grouping_id values and subtotal consistency ---
  test("grouping sets emits exactly the three declared sets") {
    val out = ops.Relational.aggGroupingSets(spark, sf("sf0.001")).collect()
    val gids = out.map(_.getInt(5)).toSet
    // (r_name,n_name) -> mktsegment bit = 1; (r_name) -> 3; (c_mktsegment) -> 6
    assert(gids == Set(1, 3, 6))
    val cntTotal = out.filter(_.getInt(5) == 3).map(_.getLong(3)).sum
    val detail = out.filter(_.getInt(5) == 1).map(_.getLong(3)).sum
    assert(cntTotal == detail) // region subtotals equal sum of nation detail
  }

  test("observe() ships data-quality metrics with the export write") {
    // the production pattern for validating a training-data export WITHOUT
    // a second scan: observe() attaches aggregates to the write's own pass
    // and a QueryExecutionListener receives them when the job commits
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.get("export_quality").foreach(seen.add)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_observe").toString
      val docs = Tables.documents(spark, sf("sf0.001"))
      docs.observe("export_quality",
          org.apache.spark.sql.functions.count(lit(1)).as("n_rows"),
          sum(when(col("text").isNull || length(col("text")) === 0, 1L)
            .otherwise(0L)).as("n_empty"),
          min(col("n_chars")).as("min_chars"))
        .write.mode("overwrite").parquet(dir)
      // listener delivery is async on the listener bus — poll briefly
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(!seen.isEmpty, "observed metrics never arrived")
      val m = seen.peek()
      assert(m.getLong(0) == docs.count())
      assert(m.getLong(1) == 0L) // the fixture has no empty documents
      assert(m.getAs[Number](2).longValue() ==
        docs.agg(min(col("n_chars"))).head().getAs[Number](0).longValue())
    } finally spark.listenerManager.unregister(listener)
  }

  test("agg_countmin_hh estimates never undercount and rank the true top term") {
    val out = ops.Text.aggCountminHh(spark, sf("sf0.001")).collect()
    assert(out.length == 20)
    // CMS one-sided error: min over d row counters can only OVER-estimate
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3), s"undercount at ${r.getString(1)}")
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3))
    }
    // ranks are 1..20 by (estimate desc, term)
    assert(out.map(_.getInt(0)).toSeq == (1 to 20))
    val ests = out.map(r => (r.getLong(2), r.getString(1)))
    assert(ests.sortBy { case (e, t) => (-e, t) }.toSeq == ests.toSeq)
    // the top-ranked term's EXACT count is the corpus max: with d=4
    // independent rows the argmax survives the sketch at this scale
    val exactTop = ops.Text.textVocab(spark, sf("sf0.001"))
      .filter(org.apache.spark.sql.functions.col("rank") === 1)
      .collect().head.getString(0)
    assert(out.head.getString(1) == exactTop)
  }

  // --- fuzzy join: the deletion-neighborhood candidates lose no pair ---
  test("join_fuzzy equals the brute-force quadratic levenshtein join") {
    import spark.implicits._
    val names = Tables.customer(spark, sf("sf0.001"))
      .filter(col("c_custkey") < 400).select(col("c_name").as("name"))
    val fast = ops.Text.fuzzyPairs(names).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val a = names.toDF("name_a")
    val b = names.toDF("name_b")
    val slow = a.crossJoin(b)
      .filter(col("name_a") < col("name_b") &&
        levenshtein(col("name_a"), col("name_b")) === 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(fast == slow && fast.nonEmpty, s"${fast.size} vs ${slow.size}")
  }

  test("join_fuzzy catches insert/delete/substitute pairs, drops transpositions") {
    import spark.implicits._
    val vocab = Seq("spark", "sparks", "stark", "spork", "sprak", "park",
      "clank", "blank").toDF("name")
    val pairs = ops.Text.fuzzyPairs(vocab).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(
      ("spark", "sparks"), // insertion
      ("park", "spark"),   // deletion
      ("spark", "stark"), ("spark", "spork"), // substitution
      ("blank", "clank")))
    // transposition "sprak" is levenshtein distance 2 from "spark": the
    // deletion neighborhood proposes it, the exact verify rejects it
    assert(!pairs.exists(p => p._1 == "sprak" || p._2 == "sprak"))
  }

  // --- secondary index: index-probe path == full-scan predicate ---
  test("secondary_index matches the full-scan predicate and broadcasts the key set") {
    val viaIndex = ops.KeyRange.secondaryIndex(spark, sf("sf0.001"))
    val direct = Tables.orders(spark, sf("sf0.001"))
      .filter(col("o_custkey").isin(7L, 42L, 101L))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
    val got = viaIndex.collect().map(_.toSeq).toSet
    assert(got == direct.collect().map(_.toSeq).toSet && got.nonEmpty)
    // the base-table lookup must be a broadcast semi join, never a shuffle
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
  }

  // --- pagerank: distributed result equals exact in-memory fixed-point ---
  test("graph_pagerank matches an exact scala fixed-point computation") {
    val got = SparkEntry.queries("graph_pagerank")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val e0 = Tables.lineitem(spark, sf("sf0.001"))
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1) + 1000000L))
    val edges = e0 ++ e0.map(_.swap)
    val deg = edges.groupBy(_._1).map { case (s, es) => (s, es.length.toLong) }
    var pr = deg.keys.map(n => (n, 1000000L)).toMap
    for (_ <- 1 to 2) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        (dst, es.map { case (src, _) => pr(src) / deg(src) }.sum)
      }
      pr = pr.keys.map(n => (n, 150000L + 850L * in.getOrElse(n, 0L) / 1000L)).toMap
    }
    val expected = pr.toSeq.sortBy { case (n, r) => (-r, n) }.take(20)
    assert(got == expected)
  }

  // --- recursive CTE: depth histogram equals the arithmetic ground truth ---
  test("sql_recursive_cte depth histogram matches scala-computed ancestor walk") {
    val got = SparkEntry.queries("sql_recursive_cte")(spark, sf("sf0.001"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val anchors = Tables.part(spark, sf("sf0.001"))
      .filter(col("p_size") >= 48).select(col("p_partkey"))
      .collect().map(_.getLong(0))
    assert(anchors.nonEmpty)
    val expected = anchors.flatMap { k =>
      Iterator.iterate(k)(_ / 2).takeWhile(_ >= 1).zipWithIndex.map {
        case (_, depth) => (depth, k)
      } ++ (if (k == 0L) Seq((0, k)) else Nil)
    }
    // anchor rows at depth 0 exist even for node 0 (no recursion: node>1 gate)
    val byDepth = expected.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (depth, rows) =>
        (depth, rows.length.toLong, rows.map(_._2).min, rows.map(_._2).max)
    }
    assert(got.toSeq == byDepth)
  }
}
