package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Text-analysis operators over the documents table (SURVEY.md §2C row C4 +
  * the mandated language-ID / quality / token-count / fingerprint set).
  *
  * Determinism: token statistics are integers; every ratio is int→double with
  * one IEEE division; the tf-idf weight uses a rational BM25-flavored idf
  * (N−df+0.5)/(df+0.5) instead of ln(N/df) because log implementations may
  * differ in the last ulp across engines. The fingerprint is a rolling
  * polynomial hash mod 1e9+7 — a left fold expressible identically in both
  * dialects (no engine hash function involved).
  */
object Text {

  private def toks(c: Column): Column = split(c, " ")

  /** C4a: per-document token statistics. */
  def textTokens(s: SparkSession, d: String): DataFrame = {
    val t = toks(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size(t).cast(IntegerType).as("n_tok"),
        size(array_distinct(t)).cast(IntegerType).as("n_uniq"),
        aggregate(transform(t, x => length(x).cast(LongType)), lit(0L), (a, x) => a + x)
          .as("tok_chars"))
      .withColumn("avg_tok_len", ratioD(col("tok_chars"), col("n_tok")))
      .orderBy(col("doc_id"))
  }

  /** C4b: tf-idf with rational idf over the full corpus (df computed on all
    * docs; output restricted to doc_id < 50 to keep the judged result tight). */
  def textTfidf(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tok = docs.select(col("doc_id"), explode(toks(col("text"))).as("term"))
    val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tok.distinct().groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    // No broadcast hint on `df`: the document-frequency table is
    // vocabulary-sized (billions of terms at 100 TB). Let the term join
    // shuffle — AQE still picks a broadcast join when the table is small.
    // The count table `n` is one row; broadcasting it is always right.
    tf.join(df, "term").join(broadcast(n))
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        (((col("n") - col("df")).cast(DoubleType) + lit(0.5)) /
          (col("df").cast(DoubleType) + lit(0.5)) * col("tf").cast(DoubleType))
          .as("tfidf"))
      .orderBy(col("doc_id"), col("term"))
  }

  /** C4c: BM25 RANKED RETRIEVAL — keyword queries scored against the whole
    * corpus with the full Okapi shape (rational idf × the k1/b length-
    * normalized tf saturation; k1=1.2, b=0.75), top-5 docs per query. The
    * idf stays the log-free rational (N−df+0.5)/(df+0.5) per the house
    * determinism rule; per-term scores round to DECIMAL(18,6) BEFORE the
    * per-doc sum so the aggregate is order-free (float sums commute only
    * in decimal), and the rank orders by that exact decimal with doc_id
    * tiebreak. Scale shape: the tiny query-term relation broadcasts into
    * the tf table (the only corpus-sized join is tf⋈dl on doc_id), df is
    * pre-filtered to query terms before it ever joins — the classic
    * impact-ordered retrieval plan, no all-terms scoring. */
  def searchBm25(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val queries = Seq(
      (1L, "spark table join"),
      (2L, "stream window sort"),
      (3L, "customer order merge batch")).toDF("query_id", "qtext")
    val qt = queries.select(col("query_id"),
      explode(toks(col("qtext"))).as("term"))
    val tok = docs.select(col("doc_id"), explode(toks(col("text"))).as("term"))
    val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val dfq = tok.distinct().groupBy(col("term")).agg(count(lit(1)).as("df"))
      .join(broadcast(qt.select(col("term")).distinct()), "term")
    val st = docs.agg(count(lit(1)).as("n"))
      .crossJoin(tok.agg(count(lit(1)).as("tot")))
    val avgdl = col("tot").cast(DoubleType) / col("n").cast(DoubleType)
    val idf = (col("n").cast(DoubleType) - col("df").cast(DoubleType) + lit(0.5)) /
      (col("df").cast(DoubleType) + lit(0.5))
    val norm = col("tf").cast(DoubleType) * lit(2.2) /
      (col("tf").cast(DoubleType) +
        lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast(DoubleType) / avgdl))
    val scored = tf.join(broadcast(qt), "term")
      .join(broadcast(dfq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(st))
      .select(col("query_id"), col("doc_id"),
        (idf * norm).cast(DecimalType(18, 6)).as("sc"))
    val agg = scored.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("sc")).as("sc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sc").desc, col("doc_id"))
    agg.withColumn("rank", row_number().over(w).cast(IntegerType))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("sc").cast(DoubleType).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** C4 extension — corpus-level unigram-LM rarity scoring (the CCNet/Gopher
    * perplexity-filter shape, log-free): each token is weighted by the
    * corpus's inverse unigram probability total/freq(term); a doc's score is
    * the mean weight over its tokens. High score = rare-token-heavy text,
    * low = common filler — the signal a perplexity filter thresholds on,
    * expressed rationally (house determinism rule: no transcendental calls,
    * whose last ulp differs across engines). The inverse probability stays
    * EXACT as the integer (total·10⁶) div freq; the per-doc sum is a BIGINT
    * both engines agree on bit-for-bit, and only the final mean is ONE IEEE
    * division. Headroom: at 10¹² corpus tokens the scaled weight of a
    * singleton term is 10¹⁸ < 2⁶³ — fine for per-doc sums; a corpus beyond
    * that drops the scale factor a digit. Scale shape: one explode + one
    * vocabulary-keyed shuffle join (no broadcast hint — the vocabulary is
    * corpus-sized at 100 TB; AQE broadcasts small cases itself) + one
    * doc-keyed groupBy. Output restricted to doc_id < 50 like text_tfidf. */
  def textUnigramScore(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), explode(toks(col("text"))).as("term"))
    val freq = tok.groupBy(col("term")).agg(count(lit(1)).as("freq"))
    val total = tok.agg(count(lit(1)).as("total"))
    tok.join(freq, "term").join(broadcast(total))
      .withColumn("inv", expr("(total * 1000000) div freq"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_tok"), sum(col("inv")).as("inv_sum"))
      .filter(col("doc_id") < 50)
      .withColumn("rarity", ratioD(col("inv_sum"), col("n_tok") * lit(1000000L)))
      .orderBy(col("doc_id"))
  }

  private[ops] val StopWords = Seq("the", "a", "of", "to", "and", "in", "is")

  /** C4c: quality scoring — length/stopword/uniqueness signals. */
  def textQuality(s: SparkSession, d: String): DataFrame = {
    val t = toks(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size(t).cast(IntegerType).as("n_tok"),
        size(array_distinct(t)).cast(IntegerType).as("n_uniq"),
        size(filter(t, x => x.isin(StopWords: _*))).cast(IntegerType).as("n_stop"))
      .withColumn("uniq_ratio", ratioD(col("n_uniq"), col("n_tok")))
      .withColumn("stop_ratio", ratioD(col("n_stop"), col("n_tok")))
      .withColumn("quality",
        lit(0.5) * col("uniq_ratio") + lit(0.5) * (lit(1.0) - col("stop_ratio")))
      .withColumn("short_flag", (col("n_chars") < 100).cast(IntegerType))
      .orderBy(col("doc_id"))
  }

  /** C4d: language-ID via character-class heuristic (marker chars per lang;
    * deterministic, honest about its accuracy which is reported per lang). */
  def textLangid(s: SparkSession, d: String): DataFrame = {
    val guess = when(col("text").rlike("[一-鿿]"), "zh")
      .when(col("text").rlike("[äöüß]"), "de")
      .when(col("text").rlike("[áéíóúñ¿¡]"), "es")
      .when(col("text").rlike("[àâçèêëîïôùû]"), "fr")
      .otherwise("en")
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), guess.as("guess"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("guess") === col("lang"), 1L).otherwise(0L)).as("n_hit"))
      .withColumn("acc", ratioD(col("n_hit"), col("n_docs")))
      .orderBy(col("lang"))
  }

  /** C4f: token n-grams — bigram counts per language (zip of shifted token
    * slices; top of the distribution is deterministic via count-then-key
    * ordering). */
  def textNgrams(s: SparkSession, d: String): DataFrame = {
    val t = toks(col("text"))
    val bigrams = zip_with(
      slice(t, lit(1), size(t) - 1),
      slice(t, lit(2), size(t) - 1),
      (a, b) => concat(a, lit("_"), b))
    Tables.documents(s, d)
      .filter(size(t) >= 2)
      .select(col("lang"), explode(bigrams).as("bigram"))
      .groupBy(col("lang"), col("bigram"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 5)
      .orderBy(col("lang"), col("bigram"))
  }

  /** C4g: Levenshtein near-dup candidates — edit distance ≤ 10 over 40-char
    * prefixes, sampled probe set (a_id % 5 = 0), length residual ±5.
    *
    * Candidate generation is the df-ranked token machinery of the exact-
    * Jaccard family (Dedup.ngramJaccardPairsPrefix — the All-Pairs/PPJoin
    * shape): each probe doc emits its 2 globally-RAREST prefix tokens
    * (document frequency ascending, ties by term — a total order shared by
    * all docs), the index side emits every prefix token, and candidates come
    * from an equality join on (term, lang). That key distributes by token,
    * never by the 5-value lang block — the r6 (lang)-block join paired each
    * language quadratically before any residual pruned (the last candidate
    * generator with that shape; first to fall over at 100×).
    *
    * Honesty note: unlike the Jaccard prefix filter, NO token-overlap bound
    * is sound for edit distance at k=10 over 40 chars (10 edits can touch
    * every token of a ≤9-token prefix), so rarest-2 sharing is the DECLARED
    * candidate semantics, replayed verbatim by the DuckDB oracle — the hash
    * match is exact by construction at every scale. Equivalence to the full
    * quadratic threshold join is asserted empirically in OpsSpec at two
    * SFs (zero pairs missed; measured 3.8× candidate pruning at sf0.1). */
  def textLevenshtein(s: SparkSession, d: String): DataFrame = {
    val t = Tables.documents(s, d).select(col("doc_id"), col("lang"),
      col("n_chars"), substring(col("text"), 1, 40).as("prefix"))
    val tok = t.select(col("doc_id"), col("lang"),
      explode(array_distinct(split(col("prefix"), " "))).as("term"))
    // vocabulary-sized df statistic; no broadcast hint (AQE broadcasts at
    // test scale, a web-scale vocabulary must shuffle)
    val dfreq = tok.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("term"))
    val probe = tok.join(dfreq, "term")
      .withColumn("rnk", row_number().over(wRank))
      .filter(col("rnk") <= 2 && col("doc_id") % 5 === 0)
      .select(col("term"), col("lang"), col("doc_id").as("a_id"))
    val full = tok.select(col("term"), col("lang"), col("doc_id").as("b_id"))
    val cand = probe.join(full, Seq("term", "lang"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    cand
      .join(t.select(col("doc_id").as("a_id"), col("n_chars").as("a_n_chars"),
        col("prefix").as("a_prefix")), "a_id")
      .join(t.select(col("doc_id").as("b_id"), col("n_chars").as("b_n_chars"),
        col("prefix").as("b_prefix")), "b_id")
      .filter(abs(col("a_n_chars") - col("b_n_chars")) <= 5 &&
        levenshtein(col("a_prefix"), col("b_prefix")) <= 10)
      .select(col("a_id"), col("b_id"),
        levenshtein(col("a_prefix"), col("b_prefix")).cast(LongType).as("lev"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** The full quadratic threshold join textLevenshtein's candidates stand in
    * for — OpsSpec asserts set-equality against it at two SFs. Not judged
    * (the (lang)-block pairing is exactly the shape the candidate generator
    * exists to avoid). */
  private[graft] def textLevenshteinQuadratic(s: SparkSession, d: String): DataFrame = {
    val t = Tables.documents(s, d).select(col("doc_id"), col("lang"),
      col("n_chars"), substring(col("text"), 1, 40).as("prefix"))
    val a = t.toDF(t.columns.toIndexedSeq.map("a_" + _): _*).filter(col("a_doc_id") % 5 === 0)
    val b = t.toDF(t.columns.toIndexedSeq.map("b_" + _): _*)
    a.join(b, col("a_lang") === col("b_lang") && col("a_doc_id") < col("b_doc_id") &&
        abs(col("a_n_chars") - col("b_n_chars")) <= 5 &&
        levenshtein(col("a_prefix"), col("b_prefix")) <= 10)
      .select(col("a_doc_id").as("a_id"), col("b_doc_id").as("b_id"),
        levenshtein(col("a_prefix"), col("b_prefix")).cast(LongType).as("lev"))
  }

  /** C4 extension: FUZZY EQUALITY JOIN at edit distance 1 via the deletion
    * neighborhood (FastSS / SymSpell family): two strings are within one
    * edit iff they share an element of {s} ∪ {s minus one char}, so the
    * quadratic levenshtein join collapses to an EQUALITY join on deletion
    * variants — O(n·len) candidate rows instead of O(n²) comparisons — and
    * the exact `levenshtein = 1` check runs only on candidates (the
    * neighborhood is lossless for distance ≤ 1: substitutions share the
    * variant deleting the differing position; insert/delete pairs share the
    * shorter string itself). The oracle is the brute-force quadratic join,
    * so candidate-generation completeness is hash-gated. */
  def joinFuzzy(s: SparkSession, d: String): DataFrame =
    fuzzyPairs(Tables.customer(s, d).filter(col("c_custkey") < 400)
      .select(col("c_name").as("name")))
      .orderBy(col("name_a"), col("name_b"))

  /** Core of [[joinFuzzy]]: all unordered pairs from a `name` column at
    * levenshtein distance exactly 1, via deletion-variant equality join +
    * exact verification. Factored out so the spec can drive it over
    * adversarial vocabularies (unequal lengths, transpositions). */
  private[graft] def fuzzyPairs(names: DataFrame): DataFrame = {
    val dels = transform(sequence(lit(1), length(col("name"))), i =>
      concat(col("name").substr(lit(1), i - 1),
        col("name").substr(i + 1, length(col("name")))))
    val variants = names.distinct().select(col("name"),
      explode(array_distinct(concat(array(col("name")), dels))).as("v"))
    val va = variants.toDF("name_a", "v")
    val vb = variants.toDF("name_b", "v")
    va.join(vb, "v")
      .filter(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b")).distinct()
      .filter(levenshtein(col("name_a"), col("name_b")) === 1)
  }

  /** C4e: rolling-hash document fingerprint (polynomial fold mod 1e9+7). */
  def textFingerprint(s: SparkSession, d: String): DataFrame = {
    val codes = transform(toks(col("text")),
      x => (ascii(x) * 131 + length(x)).cast(LongType))
    Tables.documents(s, d)
      .select(col("doc_id"),
        aggregate(codes, lit(0L), (acc, c) => (acc * 31 + c) % 1000000007L).as("fp"))
      .orderBy(col("doc_id"))
  }

  /** C4a': BPE-ish token counting — the subword-flavored variant beside the
    * whitespace count: runs of letters, runs of digits, and every other
    * non-space character as its own token (CJK text therefore counts per
    * character, the way byte-level BPE fragments it). Same regex subset in
    * both engines. */
  def textTokensBpe(s: SparkSession, d: String): DataFrame = {
    val pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(regexp_extract_all(col("text"), lit(pat), lit(0)))
          .cast(IntegerType).as("n_bpe"),
        size(split(col("text"), " ")).cast(IntegerType).as("n_ws"))
      .withColumn("frag_ratio", ratioD(col("n_bpe"), col("n_ws")))
      .orderBy(col("doc_id"))
  }

  /** C4h: redaction scrub — the PII-removal shape of a training-data
    * pipeline: regex-replace a sensitive-token class, count the hits. The
    * pattern stays inside the syntax subset Java regex and RE2 agree on
    * (alternation + \b word boundaries); DuckDB needs the 'g' flag to match
    * Spark's replace-all default. */
  def textRedact(s: SparkSession, d: String): DataFrame = {
    val pat = "\\b(key|hash|value)\\b"
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(pat), lit(0)))
          .cast(IntegerType).as("n_redact"),
        substring(regexp_replace(col("text"), pat, "<X>"), 1, 80).as("head"))
      .orderBy(col("doc_id"))
  }

  /** C4i: corpus vocabulary head — term frequencies ranked Zipf-style, top
    * 50. The tokenizer-construction primitive (BPE step 0 is exactly this
    * count). Scale shape: one explode + hash groupBy; the rank window runs
    * AFTER `.limit`, so it orders 50 rows, never the full vocabulary (the
    * top-50 itself is a TakeOrdered over the aggregated vocab — no global
    * sort of billions of terms). */
  def textVocab(s: SparkSession, d: String): DataFrame = {
    val top = Tables.documents(s, d)
      .select(explode(toks(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(50)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("term"))
    top.withColumn("rank", row_number().over(w).cast(IntegerType))
      .orderBy(col("rank"))
  }

  /** Sketch family #2 (beside Relational.aggHllDistinct's cardinality
    * sketch): Count-Min heavy hitters over the corpus token stream. d=4
    * deterministic md5 hash rows × w=256 buckets; every counter is a plain
    * bucket COUNT (map-combinable groupBy), and a term's estimate is the
    * MIN over its 4 row counters — the classic CMS upper bound, so
    * cms_est ≥ exact_n always (the overcount column is the collision mass,
    * asserted non-negative in OpsSpec). At 100 TB the counter table is
    * 1024 longs NO MATTER the corpus size — that is the point of the
    * sketch; the probe side joins distinct terms against the broadcast
    * counters, so the only big shuffles are the two token groupBys. The
    * md5 bucketing replays character-for-character in DuckDB. */
  def aggCountminHh(s: SparkSession, d: String): DataFrame = {
    val terms = Tables.documents(s, d)
      .select(explode(toks(col("text"))).as("term"))
    val js = 0 until 4
    def hashes() =
      explode(array(js.map(j => struct(lit(j).as("j"),
        substring(md5(concat(lit(s"$j:"), col("term"))), 1, 2).as("bucket"))): _*))
    val counters = terms
      .select(col("term"), hashes().as("h"))
      .groupBy(col("h.j").as("j"), col("h.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
    val exact = terms.groupBy(col("term")).agg(count(lit(1)).as("exact_n"))
    val probes = exact
      .select(col("term"), col("exact_n"), hashes().as("h"))
      .select(col("term"), col("exact_n"),
        col("h.j").as("j"), col("h.bucket").as("bucket"))
    val est = probes.join(broadcast(counters), Seq("j", "bucket"))
      .groupBy(col("term"), col("exact_n"))
      .agg(min(col("c")).as("cms_est"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cms_est").desc, col("term"))
    est.withColumn("rank", row_number().over(w).cast(IntegerType))
      .filter(col("rank") <= 20)
      .select(col("rank"), col("term"), col("cms_est"), col("exact_n"),
        (col("cms_est") - col("exact_n")).as("overcount"))
      .orderBy(col("rank"))
  }

  /** C4j: repetition filter — duplicate-trigram ratio per document (the
    * Gopher-style "repeated n-gram fraction" quality rule). Trigrams are
    * built by an index fold (sequence + element_at) identically in both
    * dialects; the ratio is one IEEE divide. Pure per-row map, no shuffle. */
  def textRepetition(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("t", toks(col("text")))
      .filter(size(col("t")) >= 3)
      .withColumn("tri", expr(
        "transform(sequence(1, size(t)-2), i -> concat(element_at(t,i),'_',element_at(t,i+1),'_',element_at(t,i+2)))"))
      .select(col("doc_id"), col("lang"),
        size(col("tri")).cast(IntegerType).as("n_tri"),
        size(array_distinct(col("tri"))).cast(IntegerType).as("n_uniq_tri"))
      .withColumn("dup_ratio", lit(1.0) - ratioD(col("n_uniq_tri"), col("n_tri")))
      .withColumn("rep_flag", (col("dup_ratio") > 0.2).cast(IntegerType))
      .orderBy(col("doc_id"))

  /** C4k: context-window chunking — split each document into fixed-size
    * token windows (size 128, stride 96 → 32-token overlap), the step that
    * turns variable-length documents into training-context rows (overlap
    * preserves cross-boundary context; pack_sequences then bins the
    * chunks). Pure per-row explode + narrow map: NO shuffle until the
    * output sort — at 100 TB this is a map-only stage. All chunk geometry
    * is integer arithmetic; the chunk is identified by an md5 over its
    * joined tokens so the oracle needs no array column (driver-side pandas
    * cannot hash arrays). Short docs yield exactly one chunk. */
  def textChunk(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .withColumn("t", toks(col("text")))
      .withColumn("n", size(col("t")))
      // 1 + ceil(max(n-128,0)/96), in exact integer arithmetic (div is
      // integral division; / would be IEEE and round)
      .withColumn("n_chunks", expr("1L + ((greatest(n - 128, 0) + 95) div 96)"))
      .withColumn("k", explode(expr("sequence(0L, n_chunks - 1)")))
      .withColumn("start", (col("k") * 96 + 1).cast(IntegerType))
      .withColumn("len", least(lit(128), col("n") - col("start") + 1))
      .select(col("doc_id"), col("k").as("chunk_id"),
        col("start").cast(LongType).as("start_tok"),
        col("len").cast(LongType).as("n_tok"),
        md5(concat_ws(" ", slice(col("t"), col("start"), col("len")))).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** C4l: BPE merge learning — the first K = 3 merge rounds of byte-pair
    * encoding over the corpus (Sennrich et al. 2016, the public tokenizer-
    * construction algorithm): count adjacent symbol pairs weighted by word
    * frequency, merge the most frequent pair left-to-right non-overlapping,
    * repeat. Judged output = the merge table (round, pair, merged, count) —
    * the artifact a tokenizer trainer ships.
    *
    * Determinism: argmax ties break (count desc, left, right); the merge is
    * a positional fold with an explicit skip flag, expressed with the SAME
    * CASE structure in both engines (CASE branches evaluate lazily, so the
    * i+1 lookahead never reads past the array under ANSI). Scale shape: BPE
    * learns over the WORD-FREQUENCY table, not the corpus — corpus size
    * touches only the initial word count (one shuffle); each round is
    * vocabulary-sized work plus one driver-side 1-row argmax (the same
    * scalar-action-per-iteration pattern dedup_components uses). Real
    * trainers run 30k+ rounds of exactly this per-round shape. */
  def textBpeMerges(s: SparkSession, d: String): DataFrame = {
    val words = Tables.documents(s, d)
      .select(explode(toks(col("text"))).as("w"))
      // guard empty tokens (double spaces): sequence(1, 0) DESCENDS in
      // Spark, which would fabricate a ("", "") pair for zero-length words
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .withColumn("syms",
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
    var cur = words.select(col("w"), col("freq"), col("syms"))
    val rounds = (1 to 3).map { r =>
      val best = cur
        .withColumn("p", explode(expr(
          "zip_with(slice(syms, 1, size(syms) - 1), slice(syms, 2, size(syms) - 1), (a, b) -> named_struct('l', a, 'r', b))")))
        .groupBy(col("p.l").as("l_sym"), col("p.r").as("r_sym"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l_sym"), col("r_sym")).limit(1)
        .select(lit(r).as("round"), col("l_sym"), col("r_sym"),
          concat(col("l_sym"), col("r_sym")).as("merged"), col("cnt"))
        .localCheckpoint()
      cur = cur.crossJoin(broadcast(best.select(col("l_sym"), col("r_sym"), col("merged"))))
        .withColumn("syms", expr(
          """aggregate(
            |  sequence(1, size(syms)),
            |  named_struct('out', slice(syms, 1, 0), 'skip', false),
            |  (acc, i) -> CASE
            |    WHEN acc.skip THEN named_struct('out', acc.out, 'skip', false)
            |    WHEN i = size(syms)
            |      THEN named_struct('out', array_append(acc.out, element_at(syms, i)), 'skip', false)
            |    WHEN element_at(syms, i) = l_sym AND element_at(syms, i + 1) = r_sym
            |      THEN named_struct('out', array_append(acc.out, merged), 'skip', true)
            |    ELSE named_struct('out', array_append(acc.out, element_at(syms, i)), 'skip', false)
            |  END,
            |  acc -> acc.out)""".stripMargin))
        .select(col("w"), col("freq"), col("syms"))
        .localCheckpoint()
      best
    }
    rounds.reduce(_ unionByName _).orderBy(col("round"))
  }

  /** B39: generator / UDTF surface — posexplode over the token stream. */
  def generatorExplode(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("pos", "term")))
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"), col("term"))
      .orderBy(col("doc_id"), col("pos"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "generator_explode" -> (generatorExplode _),
    "text_ngrams" -> (textNgrams _),
    "text_levenshtein" -> (textLevenshtein _),
    "join_fuzzy" -> (joinFuzzy _),
    "text_chunk" -> (textChunk _),
    "text_bpe_merges" -> (textBpeMerges _),
    "text_tokens" -> (textTokens _),
    "text_tfidf" -> (textTfidf _),
    "search_bm25" -> (searchBm25 _),
    "text_unigram_score" -> (textUnigramScore _),
    "text_quality" -> (textQuality _),
    "text_langid" -> (textLangid _),
    "text_fingerprint" -> (textFingerprint _),
    "text_redact" -> (textRedact _),
    "text_tokens_bpe" -> (textTokensBpe _),
    "text_vocab" -> (textVocab _),
    "text_repetition" -> (textRepetition _),
    "agg_countmin_hh" -> (aggCountminHh _))

  private[ops] val stopList = StopWords.map(w => s"'$w'").mkString(", ")

  /** One BPE round in DuckDB: pair counts → argmax → positional merge fold.
    * The fold state is a single VARCHAR — skip-flag char + space-joined
    * output symbols (symbols can never contain a space: words are space-
    * split) — because DuckDB 1.0.0's list_reduce does not carry LIST-typed
    * struct fields across iterations (verified: scalar fields accumulate,
    * list fields reset to the last append). The fold list is range(0, n+1)
    * as VARCHAR so element 0 doubles as the init state "0" (empty output,
    * skip off); list_reduce seeds the accumulator from the first element. */
  private def bpeRoundCtes(r: Int): String =
    s"""pairs$r AS (
       |  SELECT syms[i] AS l_sym, syms[i+1] AS r_sym, sum(freq) AS cnt
       |  FROM (SELECT freq, syms, unnest(range(1, len(syms))) AS i FROM cur$r)
       |  GROUP BY 1, 2),
       |best$r AS (SELECT $r AS round, l_sym, r_sym, l_sym || r_sym AS merged,
       |             CAST(cnt AS BIGINT) AS cnt
       |           FROM pairs$r ORDER BY cnt DESC, l_sym, r_sym LIMIT 1),
       |cur${r + 1} AS (
       |  SELECT w, freq,
       |    string_split(substr(list_reduce(
       |      list_transform(range(0, len(syms) + 1), ii -> CAST(ii AS VARCHAR)),
       |      (acc, x) -> CASE
       |        WHEN acc[1:1] = '1' THEN '0' || acc[2:]
       |        WHEN CAST(x AS INTEGER) = len(syms)
       |          THEN '0' || acc[2:] || ' ' || syms[CAST(x AS INTEGER)]
       |        WHEN syms[CAST(x AS INTEGER)] = b.l_sym
       |             AND syms[CAST(x AS INTEGER) + 1] = b.r_sym
       |          THEN '1' || acc[2:] || ' ' || b.merged
       |        ELSE '0' || acc[2:] || ' ' || syms[CAST(x AS INTEGER)]
       |      END), 3), ' ') AS syms
       |  FROM cur$r, best$r b)""".stripMargin

  val oracles: Map[String, String] = Map(
    "generator_explode" ->
      """SELECT doc_id, CAST(u.p[2] - 1 AS BIGINT) AS pos, u.p[1] AS term FROM
        |  (SELECT doc_id, unnest(list_zip(string_split(text, ' '),
        |           range(1, len(string_split(text, ' ')) + 1))) AS p
        |   FROM documents WHERE doc_id < 20) u
        |ORDER BY doc_id, pos""".stripMargin,
    "text_ngrams" ->
      """SELECT lang, bigram, count(*) AS cnt FROM
        |  (SELECT lang, unnest(list_transform(
        |     list_zip(t[1:len(t)-1], t[2:len(t)]), p -> p[1] || '_' || p[2])) AS bigram
        |   FROM (SELECT lang, string_split(text, ' ') AS t FROM documents)
        |   WHERE len(t) >= 2)
        |GROUP BY lang, bigram HAVING count(*) >= 5
        |ORDER BY lang, bigram""".stripMargin,
    "text_levenshtein" ->
      """WITH t AS (SELECT doc_id, lang, n_chars, substring(text, 1, 40) AS prefix
        |           FROM documents),
        |tok AS (SELECT doc_id, lang,
        |          unnest(list_distinct(string_split(prefix, ' '))) AS term FROM t),
        |dfreq AS (SELECT term, count(*) AS df FROM tok GROUP BY term),
        |ranked AS (SELECT tok.doc_id, tok.lang, tok.term,
        |             row_number() OVER (PARTITION BY tok.doc_id
        |                                ORDER BY dfreq.df, tok.term) AS rnk
        |           FROM tok JOIN dfreq USING (term)),
        |probe AS (SELECT doc_id, lang, term FROM ranked
        |          WHERE rnk <= 2 AND doc_id % 5 = 0),
        |cand AS (SELECT DISTINCT p.doc_id AS a_id, b.doc_id AS b_id
        |         FROM probe p JOIN tok b ON p.term = b.term AND p.lang = b.lang
        |         WHERE p.doc_id < b.doc_id)
        |SELECT a_id, b_id, CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS lev
        |FROM cand JOIN t a ON cand.a_id = a.doc_id
        |          JOIN t b ON cand.b_id = b.doc_id
        |WHERE abs(a.n_chars - b.n_chars) <= 5
        |  AND levenshtein(a.prefix, b.prefix) <= 10
        |ORDER BY a_id, b_id""".stripMargin,
    // brute-force quadratic truth: any deletion-neighborhood miss or false
    // survivor hash-mismatches here
    "join_fuzzy" ->
      """WITH c AS (SELECT c_name FROM customer WHERE c_custkey < 400)
        |SELECT a.c_name AS name_a, b.c_name AS name_b
        |FROM c a JOIN c b ON a.c_name < b.c_name
        |WHERE levenshtein(a.c_name, b.c_name) = 1
        |ORDER BY name_a, name_b""".stripMargin,
    "text_bpe_merges" ->
      s"""WITH words AS (
         |  SELECT w, count(*) AS freq FROM
         |    (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE w <> '' GROUP BY w),
         |cur1 AS (SELECT w, freq,
         |  list_transform(range(1, length(w) + 1), i -> w[i:i]) AS syms FROM words),
         |${bpeRoundCtes(1)},
         |${bpeRoundCtes(2)},
         |${bpeRoundCtes(3)}
         |SELECT round, l_sym, r_sym, merged, cnt FROM best1
         |UNION ALL SELECT * FROM best2
         |UNION ALL SELECT * FROM best3
         |ORDER BY round""".stripMargin,
    "text_chunk" ->
      """WITH b AS (SELECT doc_id, string_split(text, ' ') AS t,
        |             len(string_split(text, ' ')) AS n FROM documents),
        |c AS (SELECT doc_id, t, n,
        |        unnest(range(0, 1 + ((greatest(n - 128, 0) + 95) // 96))) AS k
        |      FROM b)
        |SELECT doc_id, k AS chunk_id,
        |  CAST(k * 96 + 1 AS BIGINT) AS start_tok,
        |  CAST(least(128, n - (k * 96 + 1) + 1) AS BIGINT) AS n_tok,
        |  md5(array_to_string(t[(k * 96 + 1):(k * 96 + least(128, n - (k * 96 + 1) + 1))], ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id, lang, n_chars,
        | CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tok,
        | CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_uniq,
        | CAST(list_aggregate(list_transform(string_split(text, ' '), x -> CAST(length(x) AS BIGINT)), 'sum') AS BIGINT) AS tok_chars,
        | CAST(list_aggregate(list_transform(string_split(text, ' '), x -> CAST(length(x) AS BIGINT)), 'sum') AS DOUBLE)
        |   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_tok_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_unigram_score" ->
      """WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term FROM documents),
        |freq AS (SELECT term, count(*) AS freq FROM tok GROUP BY term),
        |tot AS (SELECT count(*) AS total FROM tok)
        |SELECT doc_id, lang, count(*) AS n_tok,
        | CAST(sum((total * 1000000) // freq) AS BIGINT) AS inv_sum,
        | CAST(sum((total * 1000000) // freq) AS DOUBLE)
        |   / CAST(count(*) * 1000000 AS DOUBLE) AS rarity
        |FROM tok JOIN freq USING (term) CROSS JOIN tot
        |WHERE doc_id < 50
        |GROUP BY doc_id, lang
        |ORDER BY doc_id""".stripMargin,
    "text_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term),
        |n AS (SELECT count(*) AS n FROM documents)
        |SELECT doc_id, tf.term AS term, tf, df,
        | (CAST(n - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) * CAST(tf AS DOUBLE) AS tfidf
        |FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
        |WHERE doc_id < 50
        |ORDER BY doc_id, term""".stripMargin,
    // identical arithmetic text: rational idf × k1/b tf-saturation, per-term
    // decimal rounding before the order-free per-doc sum, decimal-ordered
    // rank with doc_id tiebreak
    "search_bm25" ->
      """WITH q(query_id, qtext) AS (VALUES
        |  (1, 'spark table join'),
        |  (2, 'stream window sort'),
        |  (3, 'customer order merge batch')),
        |qt AS (SELECT query_id, unnest(string_split(qtext, ' ')) AS term FROM q),
        |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        |df AS (SELECT term, count(*) AS df
        |       FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term),
        |st AS (SELECT (SELECT count(*) FROM documents) AS n,
        |              (SELECT count(*) FROM tok) AS tot),
        |scored AS (
        |  SELECT qt.query_id, tf.doc_id,
        |    CAST((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
        |           / (CAST(df AS DOUBLE) + 0.5)
        |         * (CAST(tf AS DOUBLE) * 2.2
        |            / (CAST(tf AS DOUBLE)
        |               + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
        |                        / (CAST(tot AS DOUBLE) / CAST(n AS DOUBLE)))))
        |      AS DECIMAL(18,6)) AS sc
        |  FROM tf JOIN qt ON tf.term = qt.term
        |       JOIN df ON tf.term = df.term
        |       JOIN dl ON tf.doc_id = dl.doc_id
        |       CROSS JOIN st),
        |agg AS (SELECT query_id, doc_id, sum(sc) AS sc
        |        FROM scored GROUP BY query_id, doc_id),
        |r AS (SELECT query_id, doc_id, sc,
        |        row_number() OVER (PARTITION BY query_id
        |                           ORDER BY sc DESC, doc_id) AS rank
        |      FROM agg)
        |SELECT CAST(query_id AS BIGINT) AS query_id,
        |  CAST(rank AS INTEGER) AS rank, doc_id, CAST(sc AS DOUBLE) AS score
        |FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id, lang, n_chars,
        | CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tok,
        | CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_uniq,
        | CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stopList))) AS INTEGER) AS n_stop,
        | CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS uniq_ratio,
        | CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stopList))) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
        | 0.5 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE))
        |   + 0.5 * (1.0 - CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stopList))) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE)) AS quality,
        | CAST(n_chars < 100 AS INTEGER) AS short_flag
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      """WITH g AS (SELECT doc_id, lang,
        |  CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
        |       WHEN regexp_matches(text, '[äöüß]') THEN 'de'
        |       WHEN regexp_matches(text, '[áéíóúñ¿¡]') THEN 'es'
        |       WHEN regexp_matches(text, '[àâçèêëîïôùû]') THEN 'fr'
        |       ELSE 'en' END AS guess
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN guess = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |  CAST(sum(CASE WHEN guess = lang THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS acc
        |FROM g GROUP BY lang ORDER BY lang""".stripMargin,
    "text_tokens_bpe" ->
      """SELECT doc_id, lang,
        | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_bpe,
        | CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws,
        | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS DOUBLE)
        |   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS frag_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_redact" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '\b(key|hash|value)\b')) AS INTEGER) AS n_redact,
        | substring(regexp_replace(text, '\b(key|hash|value)\b', '<X>', 'g'), 1, 80) AS head
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_vocab" ->
      """WITH v AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |c AS (SELECT term, count(*) AS cnt FROM v GROUP BY term),
        |r AS (SELECT term, cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rank FROM c)
        |SELECT term, cnt, CAST(rank AS INTEGER) AS rank
        |FROM r WHERE rank <= 50 ORDER BY rank""".stripMargin,
    "text_repetition" ->
      """WITH b AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT doc_id, lang,
        |        list_transform(range(1, len(t)-1),
        |          i -> t[i] || '_' || t[i+1] || '_' || t[i+2]) AS tri
        |      FROM b WHERE len(t) >= 3)
        |SELECT doc_id, lang, CAST(len(tri) AS INTEGER) AS n_tri,
        |  CAST(len(list_distinct(tri)) AS INTEGER) AS n_uniq_tri,
        |  1.0 - CAST(len(list_distinct(tri)) AS DOUBLE) / CAST(len(tri) AS DOUBLE) AS dup_ratio,
        |  CAST((1.0 - CAST(len(list_distinct(tri)) AS DOUBLE) / CAST(len(tri) AS DOUBLE)) > 0.2 AS INTEGER) AS rep_flag
        |FROM g ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        | list_reduce(list_prepend(CAST(0 AS BIGINT),
        |   list_transform(string_split(text, ' '), x -> CAST(ascii(x)*131 + length(x) AS BIGINT))),
        |   (acc, c) -> (acc*31 + c) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "agg_countmin_hh" ->
      """WITH v AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |js AS (SELECT unnest([0, 1, 2, 3]) AS j),
        |h AS (SELECT term, j,
        |        substring(md5(CAST(j AS VARCHAR) || ':' || term), 1, 2) AS bucket
        |      FROM v CROSS JOIN js),
        |counters AS (SELECT j, bucket, count(*) AS c FROM h GROUP BY 1, 2),
        |exact AS (SELECT term, count(*) AS exact_n FROM v GROUP BY term),
        |p AS (SELECT term, exact_n, j,
        |        substring(md5(CAST(j AS VARCHAR) || ':' || term), 1, 2) AS bucket
        |      FROM exact CROSS JOIN js),
        |e AS (SELECT term, exact_n, min(c.c) AS cms_est
        |      FROM p JOIN counters c USING (j, bucket) GROUP BY term, exact_n),
        |r AS (SELECT term, cms_est, exact_n,
        |        row_number() OVER (ORDER BY cms_est DESC, term) AS rank FROM e)
        |SELECT CAST(rank AS INTEGER) AS rank, term, cms_est, exact_n,
        |  cms_est - exact_n AS overcount
        |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin)
}
