package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language ID, fingerprinting, exact and
  * near dedup. All built from codegen'd `functions._` expressions (no UDFs)
  * so they stay inside whole-stage codegen and push down through Catalyst;
  * the documents table's `text` column is the only wide input.
  */
object TextOps {

  /** Whitespace word count (reference idiom: `chunker.js:40-42`). */
  def wordCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish token count: word pieces + punctuation as separate tokens. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))

  /** Occurrences of a literal substring (used for relevance + lang ID).
    * Integer-exact, identical in any SQL engine. */
  def occurrences(text: Column, term: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(term), "")))
      / term.length).cast("int")

  /** doc_id, n_chars, n_words, n_tokens, n_punct, stop_hits, quality flags.
    * Quality scoring per the reference's "content appears real" noise check
    * spirit (`/root/reference/validator/checks.py:401-439`): all components
    * integer-exact so the DuckDB oracle matches bit-for-bit. */
  def qualityFeatures(docs: DataFrame): DataFrame = {
    val stops = Seq("the", "a", "and", "of", "to")
    val stopHits = stops.map(s => occurrences(col("text"), s" $s ")).reduce(_ + _)
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      wordCount(col("text")).as("n_words"),
      tokenCount(col("text")).as("n_tokens"),
      size(regexp_extract_all(col("text"), lit("[.!?,;:]"), lit(0))).as("n_punct"),
      stopHits.as("stop_hits"))
      .withColumn("mean_word_len_x100",
        (col("n_chars") * 100L / greatest(col("n_words"), lit(1))).cast("long"))
      .withColumn("is_quality",
        (col("n_words") >= 5) && (col("mean_word_len_x100") between (200L, 1200L)))
  }

  /** Heuristic language ID via function-word hits (n-gram heuristic class;
    * deterministic tie-break by priority order en>fr>es>de>zh). */
  def langId(docs: DataFrame): DataFrame = {
    def hits(words: Seq[String]): Column =
      words.map(w => occurrences(lower(col("text")), s" $w ")).reduce(_ + _)
    val en = hits(Seq("the", "and", "of"))
    val fr = hits(Seq("le", "la", "et", "les"))
    val es = hits(Seq("el", "los", "que", "y"))
    val de = hits(Seq("der", "die", "und", "das"))
    docs.select(col("doc_id"), col("lang"), en.as("en_hits"), fr.as("fr_hits"),
        es.as("es_hits"), de.as("de_hits"))
      .withColumn("lang_pred",
        when(col("en_hits") >= col("fr_hits") && col("en_hits") >= col("es_hits")
          && col("en_hits") >= col("de_hits"), "en")
        .when(col("fr_hits") >= col("es_hits") && col("fr_hits") >= col("de_hits"), "fr")
        .when(col("es_hits") >= col("de_hits"), "es")
        .otherwise("de"))
  }

  /** Exact dedup: canonical = min doc_id per md5(normalized text). The
    * reference's analog is `seen_texts` / crawl `visited`
    * (`/root/reference/sidecar/chunker.py:663,699`). Hash-groupBy: one
    * shuffle of (hash, id) pairs only — text never shuffles. Output is
    * UNORDERED (library operator — pipeline consumers like the curation
    * semi-join must not pay a pointless range-shuffle sort; queries that
    * need total order sort at the query layer). */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.select(md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("text_hash"),
        col("doc_id"))
      .groupBy("text_hash")
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("dup_count"))

  /** Normalized-text md5 fingerprint per document (SQL-parity variant of
    * document fingerprinting). Unordered, like [[exactDedup]]. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fingerprint"))

  /** Rolling polynomial hash (Rabin-Karp style) — the scale path for
    * fingerprinting without md5's cost; pure Scala, exposed for tests and
    * the extraction job. */
  def rollingHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = h * 1000003L + s.charAt(i); i += 1 }
    h
  }

  /** Distinct (doc_id, shingle-hash) pairs, optionally dropping shingles
    * above a document-frequency cap. A hot shingle (boilerplate phrase
    * shared by a large fraction of the corpus) turns the shingle self-join
    * quadratic — one shingle in 1% of a 10^9-doc corpus is a 10^14-pair
    * bucket; capping df is the standard web-scale fix.
    * `maxDf`: absolute cap. `maxDfPct`: percent-of-corpus cap computed
    * INSIDE the job (`greatest(floor(ndocs·pct/100), 2)` via a broadcast
    * 1-row count — no eager driver-side count at plan-construction time).
    * When both are set, the absolute cap wins. */
  def shingles(docs: DataFrame, n: Int, maxDf: Option[Long] = None,
      maxDfPct: Option[Int] = None): DataFrame = {
    // pre-split through a projection boundary: without the alias, codegen
    // inlines `split(trim(lower(text)))` into every element_at inside the
    // transform lambda and re-splits the whole document O(words·n) times
    val exploded = docs
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("_ws"))
      .select(col("doc_id"), explode(wordNgramsFromWords(col("_ws"), n)).as("shingle"))
      .select(col("doc_id"), substring(md5(col("shingle")), 1, 16).as("sh"))
    val cap: Option[Column] = (maxDf, maxDfPct) match {
      case (Some(c), _) => Some(lit(c))
      case (None, Some(pct)) => Some(col("_dfcap"))
      case _ => None
    }
    cap match {
      case None => exploded.distinct()
      case Some(capCol) =>
        // ONE exchange for dedup + document frequency: hash-partition by
        // shingle hash first, then both the (doc_id, sh) dedup (a hash
        // aggregate whose clustered-distribution requirement a subset
        // partitioning satisfies) and the df window run partition-local —
        // a bare `.distinct()` would shuffle by (doc_id, sh) and the
        // window would shuffle AGAIN by sh. The df pass itself stays a
        // hash-partitioned window (the groupBy+anti-join alternative
        // recomputes the whole explode pipeline a second time) — never a
        // global window
        val w = org.apache.spark.sql.expressions.Window.partitionBy("sh")
        val withDf = exploded.repartition(col("sh"))
          .dropDuplicates("doc_id", "sh")
          .withColumn("_df", count(lit(1)).over(w))
        val capped = maxDfPct match {
          case Some(pct) if maxDf.isEmpty =>
            // (ndocs·pct)/100.0 is exact in double (ndocs·pct is an exact
            // long), so floor(...) == ndocs·pct // 100 — mirrors the
            // DuckDB oracle's integer division bit-for-bit
            val total = docs.select(
              greatest(floor(count(lit(1)) * pct / 100.0), lit(2L)).as("_dfcap"))
            withDf.crossJoin(broadcast(total))
          case _ => withDf
        }
        capped.filter(col("_df") <= capCol)
          .select("doc_id", "sh")
    }
  }

  /** Word n-gram Jaccard near-dup: explode shingles, self-join on shingle
    * hash, |A∩B| / |A∪B| ≥ threshold. Shingle hashes (8-byte md5 prefix)
    * shuffle instead of text. Jaccard is computed over the df-capped
    * shingle sets on BOTH the intersection and the sizes, so the estimate
    * stays a true Jaccard of the retained sets.
    * Output: (doc_a, doc_b, jaccard_x1000). */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, thresholdX1000: Int = 300,
      maxDf: Option[Long] = None, maxDfPct: Option[Int] = None): DataFrame = {
    // persisted: referenced three times below (sizes + both self-join
    // sides); without it the explode+distinct pipeline runs three times.
    // The operator OWNS the cache lifecycle: the (small, above-threshold)
    // pair result is materialized eagerly via localCheckpoint, then the
    // shingle cache is released — nothing is left pinned in the session's
    // cacheManager. Checkpoint blocks free when the returned Dataset is
    // GC'd; an executor loss fails the consuming job loudly instead of
    // silently recomputing (acceptable for a bounded result set).
    val shingled = shingles(docs, n, maxDf, maxDfPct)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sizes = shingled.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val pairs = shingled.as("a").join(shingled.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      pairs
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn("jaccard_x1000",
          (col("inter") * 1000L / (col("n_a") + col("n_b") - col("inter"))).cast("long"))
        .filter(col("jaccard_x1000") >= thresholdX1000)
        .select("doc_a", "doc_b", "jaccard_x1000")
        .localCheckpoint(true)
    } finally shingled.unpersist()
  }

  /** Word n-grams as a column of space-joined shingles (pure expressions:
    * split + transform over index range — no UDF). Documents with fewer
    * than `n` words yield an empty array (unguarded, `sequence(0, -1)`
    * would step backwards and `element_at(words, 0)` errors under ANSI). */
  def wordNgrams(text: Column, n: Int): Column =
    wordNgramsFromWords(split(trim(text), "\\s+"), n)

  /** n-grams over an already-split words column. Callers should alias the
    * split through a projection so it evaluates once per row (see
    * [[shingles]]).
    *
    * The builder is a single-pass closure, not a higher-order
    * `transform(sequence(...), i -> concat_ws(...element_at...))`:
    * higher-order array functions are CodegenFallback, so the transform
    * form paid n interpreted `element_at` dispatches plus a materialized
    * index array per shingle. The closure builds each shingle in one
    * pass over the words array — measured 28% faster on the shingle map
    * stage (tools/R07Shingle), with multiset-identical output proven on
    * the full bench corpus and pinned by an OpsSpec fuzz against the old
    * expression. The `when` guard keeps the exact legacy semantics for
    * NULL (`size(NULL)` is NULL → empty array) and shorter-than-n docs. */
  def wordNgramsFromWords(words: Column, n: Int): Column =
    when(size(words) >= n, ngramJoinUdf(words, lit(n)))
      .otherwise(array().cast("array<string>"))

  /** Space-joins each window of n consecutive words; called only with
    * size(words) >= n (see the guard above). Word arrays come from
    * `split`, which never yields null elements. */
  private val ngramJoinUdf =
    org.apache.spark.sql.functions.udf { (ws: Seq[String], n: Int) =>
      val out = new Array[String](ws.length - n + 1)
      var i = 0
      while (i < out.length) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(ws(i + j))
          j += 1
        }
        out(i) = sb.toString
        i += 1
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }

  /** 64-bit SimHash over whitespace words, each word hashed with xxhash64;
    * implemented with pure expressions (explode + bit aggregation). */
  def simHash(docs: DataFrame): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
    val bitCols = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val agg = words.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
    val sim = (0 until 64).map { b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    agg.select(col("doc_id"), sim.as("simhash"))
  }

  /** Portable SimHash: identical to [[simHash]] in structure but the word
    * hash is two 32-bit halves of md5 instead of xxhash64, so the whole
    * computation is reproducible in any SQL engine (DuckDB oracle).
    * Production path stays [[simHash]] (xxhash64 is ~4× cheaper); this
    * variant is the correctness gate. Output: (doc_id, sim_hi, sim_lo),
    * each half in [0, 2^32). */
  def simHashPortable(docs: DataFrame): DataFrame = {
    val words = docs.select(col("doc_id"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .select(col("doc_id"),
        conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long").as("h1"),
        conv(substring(md5(col("w")), 9, 8), 16, 10).cast("long").as("h2"))
    val votes = (0 until 32).map { b =>
      sum(when(shiftright(col("h1"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"hi$b")
    } ++ (0 until 32).map { b =>
      sum(when(shiftright(col("h2"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"lo$b")
    }
    val agg = words.groupBy("doc_id").agg(votes.head, votes.tail: _*)
    def fold(prefix: String): Column = (0 until 32).map { b =>
      when(col(s"$prefix$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col("doc_id"), fold("hi").as("sim_hi"), fold("lo").as("sim_lo"))
  }

  /** SimHash near-dup candidates: pairs within `maxHamming` bits, using
    * 4×16-bit band blocking (exact for maxHamming ≤ 3 by pigeonhole). */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simHash(docs)
    val banded = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band"), col("bk.key"))
    val ham = {
      val x = col("a.simhash").bitwiseXOR(col("b.simhash"))
      bit_count(x)
    }
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        ham.as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
