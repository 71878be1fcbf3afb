package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Text-analysis function pack.
  *
  * The reference bundles the IK Analyzer solely to tokenize search keywords
  * for its DWS keyword job (reference `pom.xml:204-207`, SURVEY.md §2.H).
  * Here tokenization is a Column function built from codegen'd Spark SQL
  * primitives (no UDF on the hot path); a Unicode/CJK-aware variant and the
  * training-data-pipeline scorers (language-ID, quality, fingerprints) are
  * layered on top.
  */
object Text {

  /** Oracle-parity tokenizer: split on single spaces, drop empties.
    * Byte-for-byte equal to DuckDB `unnest(string_split(text, ' '))` with a
    * `word <> ''` guard, which is what the correctness oracle runs.
    */
  def tokens(text: Column): Column =
    filter(split(text, " ", -1), w => w =!= lit(""))

  /** Unicode-aware tokenizer: lowercases, treats each CJK ideograph as its
    * own token (the IK-analyzer role in the reference), splits the rest on
    * non-letter/digit runs. Pure SQL functions — stays in codegen.
    */
  def tokensUnicode(text: Column): Column = {
    // put a space around every CJK char, then split on non-alnum runs
    val spaced = regexp_replace(lower(text), "([\\u4e00-\\u9fff])", " $1 ")
    filter(split(spaced, "[^\\p{L}\\p{N}]+", -1), w => w =!= lit(""))
  }

  /** Token count over the oracle tokenizer. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-style pre-tokenization (the GPT-2 pattern family): English
    * contractions, space-prefixed letter runs, digit runs, punctuation
    * runs. Counts the text segments a byte-pair encoder would merge
    * within — a fast proxy for LLM token counts without a vocab. Pure
    * `regexp_extract_all`, stays in codegen. */
  private val bpePattern =
    "('(?:s|t|re|ve|m|ll|d))|( ?\\p{L}+)|( ?\\p{N}+)|( ?[^\\s\\p{L}\\p{N}]+)"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  def bpeTokenCount(text: Column): Column =
    size(bpeTokens(text)).cast("long")

  /** Mean token length in characters (spaces excluded), double division —
    * bit-identical across engines given identical inputs. Empty documents
    * yield null (try_divide) instead of an ANSI DIVIDE_BY_ZERO failure. */
  def avgTokenLen(text: Column): Column =
    try_divide(length(regexp_replace(text, " ", "")).cast("double"),
      size(tokens(text)).cast("double"))

  /** Ratio of stopword tokens; null for empty documents. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    try_divide(size(filter(toks, w => w.isin(stopwords.map(lit): _*)))
      .cast("double"), size(toks).cast("double"))
  }

  /** Composite quality score for training-data filtering: favors documents
    * with moderate token length and low stopword share. Deterministic,
    * expressible in ANSI SQL for the oracle.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column =
    round(
      least(lit(1.0), size(tokens(text)).cast("double") / lit(100.0)) *
        (lit(1.0) - stopwordRatio(text, stopwords)), 6)

  // ---------------------------------------------------------------------
  // PII redaction (pretraining hygiene)
  // ---------------------------------------------------------------------

  /** PII patterns, deliberately restricted to the regex subset that Java
    * regex and RE2 (the DuckDB oracle engine) interpret identically — no
    * lookaround, no backreferences, ASCII word boundaries only — so the
    * redaction is bit-for-bit portable. Public, so the oracle SQL is
    * built from the SAME strings (one source of truth). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  // phones anchored on the +CC prefix: digits/spaces/dashes, ≥8 digits
  // total — the prefix anchor keeps plain numbers and IPs out
  val phonePattern = "\\+\\d[\\d -]{6,}\\d"

  /** Scrub emails, IPv4 addresses, and +CC phone numbers from text —
    * the pretraining PII hygiene pass. Order matters and is part of the
    * contract: emails first (an email must not have its dotted host
    * half-eaten by the IP rule), then IPs, then phones (whose character
    * class could otherwise swallow pieces of either). A pure codegen'd
    * `regexp_replace` chain — narrow map, no UDF, no shuffle. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")

  /** Per-kind PII match counts (audit metric next to the scrub). Counted
    * on the SAME staged text the redaction chain sees, so counts and
    * redactions can never disagree. */
  def piiCounts(text: Column): (Column, Column, Column) = {
    val afterEmail = regexp_replace(text, emailPattern, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, ipv4Pattern, "<IP>")
    (size(regexp_extract_all(text, lit(emailPattern), lit(0))).cast("long"),
      size(regexp_extract_all(afterEmail, lit(ipv4Pattern), lit(0))).cast("long"),
      size(regexp_extract_all(afterIp, lit(phonePattern), lit(0))).cast("long"))
  }

  /** Content fingerprint (exact-dup detection): md5 of the raw text.
    * Same builtin exists in DuckDB → direct oracle parity. */
  def fingerprint(text: Column): Column = md5(text)

  /** Canonical URL normalization — the crawl-dedup prep step (the same
    * page arrives as `HTTP://Host:80/p?utm_source=x&b=1&a=2#frag` and
    * `http://host/p?a=2&b=1`): lowercase scheme+host, strip the port
    * only when it is the SCHEME'S default (https→443, http→80 — an
    * `http://host:443` is a distinct origin and must not collapse),
    * drop the fragment, drop tracking params (`utm_*`, `ref=`), sort
    * surviving query params. Path case is PRESERVED (it is semantically
    * significant). Pure column-function composition — regexp extracts +
    * one higher-order filter/sort over the short param array; no UDF,
    * no shuffle. */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([^:]+)://", 1))
    val rawHost = lower(regexp_extract(url, "^[^:]+://([^/?#]+)", 1))
    val host =
      when(scheme === "https", regexp_replace(rawHost, ":443$", ""))
        .when(scheme === "http", regexp_replace(rawHost, ":80$", ""))
        .otherwise(rawHost)
    val path = regexp_extract(url, "^[^:]+://[^/?#]+([^?#]*)", 1)
    val kept = array_sort(filter(
      split(regexp_extract(url, "\\?([^#]*)", 1), "&"),
      p => !(startswith(p, lit("utm_")) || startswith(p, lit("ref=")))))
    val qs = array_join(kept, "&")
    concat(scheme, lit("://"), host, path,
      when(qs =!= "", concat(lit("?"), qs)).otherwise(lit("")))
  }

  /** Shannon entropy (bits) of the document's unigram token distribution
    * — the "natural-language-ness" quality signal: keyword-stuffed spam
    * and boilerplate repeat tokens and sit far below prose of the same
    * length. JVM UDF by design: ONE narrow pass over the token array
    * replaces the explode → (doc, token) count → per-doc re-aggregate
    * form, which shuffles every token twice at 100 TB. Each term is
    * `(c/n)·ln(n/c) ≥ 0` (no −0.0 drift on single-token docs) and the
    * DuckDB oracle mirrors the formula termwise; only summation order
    * differs, so queries round to 6 decimals. */
  val tokenEntropyUdf: UserDefinedFunction = udf { (toks: Seq[String]) =>
    if (toks == null || toks.isEmpty) 0.0
    else {
      val n = toks.size.toDouble
      var acc = 0.0
      toks.groupBy(identity).foreach { case (_, g) =>
        val c = g.size.toDouble
        acc += (c / n) * math.log(n / c)
      }
      acc / math.log(2.0)
    }
  }

  def tokenEntropy(text: Column): Column = tokenEntropyUdf(tokens(text))

  /** 64-bit rolling (polynomial) fingerprint over tokens:
    * h = Σ token_hash * 31^i  (mod 2^64). Order-sensitive, unlike md5 —
    * catches reorderings as different docs. JVM UDF: the arithmetic
    * wraps by design, which ANSI-mode SQL `*`/`+` (Spark 4 default)
    * rejects as overflow. */
  val rollingFingerprint64: UserDefinedFunction = udf { (toks: Seq[String]) =>
    if (toks == null) 0L
    else toks.foldLeft(0L)((acc, t) => acc * 31L + xxHash64String(t))
  }

  def rollingFingerprint(text: Column): Column =
    rollingFingerprint64(tokens(text))

  /** SimHash(64) over tokens: per-token md5-derived 64-bit hash
    * ([[md5Upper64]] — the engine-portable family); signature bit j is
    * the sign of Σ_tokens (bit_j(h)*2-1). Near-identical docs land
    * within a few hamming bits. Scala UDF (bit loops don't map to SQL
    * primitives cleanly), but every arithmetic step is DuckDB-
    * replayable (md5_number_upper + bit votes), which is what puts
    * q_dedup_simhash under the driver's hard oracle (round 12).
    */
  val simhash64: UserDefinedFunction = udf { (toks: Seq[String]) =>
    if (toks == null || toks.isEmpty) 0L
    else {
      val counts = new Array[Int](64)
      toks.foreach { t =>
        val h = md5Upper64(t)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      var sig = 0L
      var j = 0
      while (j < 64) { if (counts(j) > 0) sig |= (1L << j); j += 1 }
      sig
    }
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** md5-derived 64-bit pair of a UTF-8 string — the ENGINE-PORTABLE
    * hash family (round 12): `_1` equals DuckDB `md5_number_upper(s)`
    * (the little-endian uint64 of digest bytes [0,8)) and `_2` equals
    * `md5_number_lower(s)` (LE of bytes [8,16)), bit for bit, so a
    * DuckDB oracle can replay any hash-derived pipeline (MinHash
    * signatures, SimHash votes, band buckets) exactly. Values are the
    * raw two's-complement longs of those uint64s; mask with
    * `& Long.MaxValue` when a mod-2^63 non-negative form is needed
    * (`% 9223372036854775808` on the HUGEINT side). */
  def md5Pair64(s: String): (Long, Long) = {
    val md = md5Digest.get(); md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def le(off: Int): Long = {
      var h = 0L; var i = 7
      while (i >= 0) { h = (h << 8) | (d(off + i) & 0xFFL); i -= 1 }
      h
    }
    (le(0), le(8))
  }

  /** The `_1` half of [[md5Pair64]] — DuckDB `md5_number_upper`. */
  def md5Upper64(s: String): Long = md5Pair64(s)._1

  /** The `_2` half of [[md5Pair64]] — DuckDB `md5_number_lower`. */
  def md5Lower64(s: String): Long = md5Pair64(s)._2

  /** JVM-side xxHash64 matching Spark's `xxhash64` builtin (seed 42),
    * so driver-side constants and executor-side columns agree. */
  def xxHash64String(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
  }

  // ---------------------------------------------------------------------
  // Language identification (n-gram heuristic)
  // ---------------------------------------------------------------------

  /** Tiny character-trigram profiles for a 5-language heuristic classifier.
    * Profiles are hand-picked high-frequency trigrams (public linguistic
    * knowledge); scoring = profile-hit count over the document's trigrams,
    * ties broken by fixed language order. CJK short-circuits on codepoint
    * range. Deterministic; verified in scalatest on crafted sentences.
    */
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng "),
    "fr" -> Seq(" de", "de ", " le", "le ", "es ", "ent", " la", "la ", "ion", "que"),
    "es" -> Seq(" de", "de ", " la", "la ", "os ", " el", "el ", "ión", "ent", "que"),
    "de" -> Seq("en ", " de", "der", "er ", "ie ", " di", "die", "sch", "ein", "ch "),
  )

  val langId: UserDefinedFunction = udf { (text: String) =>
    if (text == null || text.isEmpty) "und"
    else if (text.exists(c => c >= '一' && c <= '鿿')) "zh"
    else {
      val t = " " + text.toLowerCase + " "
      val grams = (0 to t.length - 3).map(i => t.substring(i, i + 3))
        .groupBy(identity).map { case (g, occ) => (g, occ.size) }
      val scored = langProfiles.map { case (lang, profile) =>
        (lang, profile.map(g => grams.getOrElse(g, 0)).sum)
      }
      val best = scored.maxBy(_._2)
      if (best._2 == 0) "und" else best._1
    }
  }

  // ---- BPE merge-pair vocabulary training -----------------------------

  /** One greedy left-to-right merge pass: every non-overlapping adjacent
    * (a, b) in the symbol sequence becomes the joined symbol — the
    * classic BPE merge step (Sennrich et al., "Neural Machine
    * Translation of Rare Words with Subword Units", ACL'16). */
  private[graft] def mergePair(syms: Seq[String], a: String,
                                   b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Train BPE merge rules over a (word, frequency) table — the one
    * tokenizer-pipeline stage frequency vocabs can't give you: LEARNING
    * the subword merges. Each round is ONE keyed aggregate over the
    * word-shape table (adjacent-pair counts weighted by word frequency,
    * map-side combined), a bounded `TakeOrdered(1)` argmax (ties pinned:
    * count desc, then pair lexicographic — engine-independent), and a
    * narrow per-row merge map. The loop state is the distinct-WORD table
    * (vocabulary-sized — Heaps' law, never corpus-row-sized: aggregate
    * to word counts FIRST, exactly like q_vocab_build), re-pinned by
    * `localCheckpoint` every few rounds on the `connectedComponents`
    * iterative-plan discipline so the lineage stays flat. Early-stops
    * when the best pair's count drops below `minCount` (the
    * observe-style convergence read — one tiny driver row per round,
    * never a data-scale collect).
    *
    * Words split to characters plus a `</w>` end-of-word marker (the
    * standard formulation — merges crossing the marker encode "end of
    * word" subwords). Returns the learned merges in order. */
  def bpeTrainMerges(words: org.apache.spark.sql.DataFrame, wordCol: String,
                     freqCol: String, k: Int, minCount: Long = 2L,
                     checkpointEvery: Int = 8,
                     initial: Seq[(String, String)] = Nil,
                     localMaxWords: Long = LocalBpeTrainMaxWords)
      : Seq[(String, String)] = {
    require(k >= 1, s"k must be positive, got $k")
    require(initial.size <= k,
      s"initial merge table (${initial.size}) already at/above target vocab $k")
    // `initial` replays an EXISTING merge table before training starts
    // (the extend side of the artifact lifecycle): state begins where
    // the persisted tokenizer left off, and only k - initial.size new
    // rounds run. Returns ONLY the newly learned merges.
    val toSyms = udf { (w: String) => bpeEncodeWord(w, initial) }
    var state = words
      .select(toSyms(col(wordCol)).as("syms"),
        col(freqCol).cast("long").as("freq"))
      .localCheckpoint(eager = true)
    // measured-size strategy pick (r17 — the Graph.LocalFixpointMaxEdges
    // discipline): every registry caller trains on a bounded vocabulary
    // head (≤4096 words), where each of the k rounds' census + argmax +
    // merge-map is pure scheduling overhead (~12 driver-round jobs over
    // ~4k rows). At or below the gate the whole fixpoint runs inside ONE
    // executor task with operation-identical arithmetic (exact long
    // sums, UTF-8-binary tie order — Spark's own string comparator) and
    // only the ≤k merge rows come back to the driver; above it, the
    // distributed per-round loop runs unchanged. Parity pinned in
    // FunctionsSpec (gate forced off ↔ on).
    if (state.count() <= localMaxWords)
      return bpeTrainMergesOneTask(state, k, minCount, initial.size)
    var lastCkpt = state
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = initial.size
    var done = false
    while (round < k && !done) {
      round += 1
      // adjacent pairs with multiplicity, weighted by word frequency;
      // the argmax is a bounded TakeOrdered — one row to the driver
      val best = state
        .select(col("freq"), explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1).as("a"),
          slice(col("syms"), lit(2), size(col("syms")) - 1).as("b"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(desc("cnt"), col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minCount) done = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        val applyMerge = udf { (syms: Seq[String]) => mergePair(syms, a, b) }
        state = state.select(applyMerge(col("syms")).as("syms"), col("freq"))
        if (round % checkpointEvery == 0) {
          state = state.localCheckpoint(eager = true)
          // the new checkpoint supersedes the previous one's blocks
          graft.operators.Checkpoints.drop(lastCkpt)
          lastCkpt = state
        }
      }
    }
    merges.toSeq
  }

  /** Word-count gate for [[bpeTrainMerges]]' single-task fixpoint: at or
    * below this many distinct word shapes the k training rounds run in
    * one executor task (the state is ≤ a few MB; each distributed round
    * would cost a full job of scheduling for ~4k rows of work). */
  private[graft] val LocalBpeTrainMaxWords = 100000L

  /** Spark's string ordering is UTF8String binary order (unsigned byte
    * compare of the UTF-8 encoding) — the one-task argmax tie-break must
    * replicate it exactly, NOT java.lang.String's UTF-16 char order
    * (they diverge on supplementary-plane code points). */
  private[graft] def utf8Less(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    a.length < b.length
  }

  /** The single-task path of [[bpeTrainMerges]]: all k rounds of
    * census → argmax → merge-map over the (syms, freq) state inside one
    * executor task. Operation-for-operation the distributed loop:
    * pair counts are exact long sums with multiplicity (the
    * arrays_zip(slice,slice) explode), the argmax orders by (count
    * desc, a, b) under UTF-8 binary string order, the merge map is the
    * shared [[mergePair]], and early-stop fires when the best count
    * drops below `minCount`. Not a driver collect of data: the state
    * stays on the executor; only the learned merge table (≤ k rows,
    * bounded by the vocab-size parameter) returns. */
  private def bpeTrainMergesOneTask(state: org.apache.spark.sql.DataFrame,
                                    k: Int, minCount: Long,
                                    startRound: Int): Seq[(String, String)] = {
    val ss = state.sparkSession
    import ss.implicits._
    state.select(col("syms"), col("freq")).as[(Seq[String], Long)]
      .coalesce(1).mapPartitions { it =>
        val words = it.map { case (s, f) => (s.toArray, f) }.toArray
        val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        var round = startRound
        var done = false
        while (round < k && !done) {
          round += 1
          val cnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
          words.foreach { case (syms, f) =>
            var i = 0
            while (i + 1 < syms.length) {
              val key = (syms(i), syms(i + 1))
              cnt(key) = cnt.getOrElse(key, 0L) + f
              i += 1
            }
          }
          if (cnt.isEmpty) done = true
          else {
            var best: ((String, String), Long) = null
            cnt.foreach { e =>
              if (best == null || e._2 > best._2 ||
                (e._2 == best._2 && (utf8Less(e._1._1, best._1._1) ||
                  (e._1._1 == best._1._1 && utf8Less(e._1._2, best._1._2)))))
                best = e
            }
            if (best._2 < minCount) done = true
            else {
              val (a, b) = best._1
              merges += ((a, b))
              var w = 0
              while (w < words.length) {
                words(w) = (mergePair(words(w)._1.toSeq, a, b).toArray,
                  words(w)._2)
                w += 1
              }
            }
          }
        }
        merges.iterator.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      }.collect() // bounded: the ≤ k learned merge rows, never data-sized
      .sortBy(_._1).map(t => (t._2, t._3)).toSeq
  }

  /** Apply learned merges to one word — the encode side of
    * [[bpeTrainMerges]]: split to chars + `</w>`, replay the merges in
    * training order. Returns the word's subword tokens. */
  def bpeEncodeWord(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.map(_.toString) :+ "</w>": Seq[String]) {
      case (syms, (a, b)) => mergePair(syms, a, b)
    }

  /** Column form of [[bpeEncodeWord]] — a narrow map with the merge
    * table riding the closure (k pairs, KBs). */
  def bpeEncode(merges: Seq[(String, String)]): UserDefinedFunction =
    udf { (w: String) => bpeEncodeWord(w, merges) }

  // ---- persisted merge-table artifact lifecycle -----------------------
  // The learned tokenizer is the derived structure a training pipeline
  // reuses MOST (every downstream encode job reads it), so it gets the
  // same write/apply/extend discipline as the fingerprint and IVF
  // indexes: train once, persist the ordered merge table, encode any
  // corpus against the artifact, extend in place when the corpus grows.
  // Layout: parquet (merge_rank ASC from 1, left_sym, right_sym) — the
  // rank order IS the tokenizer (BPE replays merges in training order),
  // so readers always sort by it rather than trusting file order.

  /** Train k merge rounds and persist the ordered merge table at `dir`
    * (overwrite — this is the train-once step). Returns the merges. */
  def bpeWriteMerges(words: org.apache.spark.sql.DataFrame, wordCol: String,
                     freqCol: String, k: Int, dir: String,
                     minCount: Long = 2L): Seq[(String, String)] = {
    val merges = bpeTrainMerges(words, wordCol, freqCol, k, minCount)
    writeMergeRows(words.sparkSession, merges, baseRank = 0,
      dir = dir, overwrite = true)
    merges
  }

  /** Load a persisted merge table in training order. The table is
    * k rows (the vocab budget) — driver-bounded by construction, like
    * the IVF centroid load. */
  def bpeReadMerges(spark: org.apache.spark.sql.SparkSession,
                    dir: String): Seq[(String, String)] =
    spark.read.parquet(dir)
      .select("merge_rank", "left_sym", "right_sym")
      .orderBy("merge_rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq

  /** Extend a persisted merge table to `k` total rules on a (grown)
    * corpus: the existing rules replay as training state and only the
    * NEW rounds run; new rows APPEND after the existing ranks, which
    * are never rewritten — ranks already shipped to encode jobs stay
    * valid (the fingerprint-index append discipline: cost proportional
    * to the new rounds, prefix immutable). Single writer per artifact
    * by contract. Returns the full extended merge table. */
  def bpeExtendMerges(words: org.apache.spark.sql.DataFrame, wordCol: String,
                      freqCol: String, k: Int, dir: String,
                      minCount: Long = 2L): Seq[(String, String)] = {
    val spark = words.sparkSession
    val existing = bpeReadMerges(spark, dir)
    val added = bpeTrainMerges(words, wordCol, freqCol, k, minCount,
      initial = existing)
    writeMergeRows(spark, added, baseRank = existing.size,
      dir = dir, overwrite = false)
    existing ++ added
  }

  // ---- persisted top-k token vocabulary ------------------------------

  /** The ranked top-`k` token vocabulary of a corpus — count-desc,
    * token-asc tie-break (the q_oov_rate / q_vocab_build selection,
    * fully deterministic). Returns (vocab_rank, w, cw), rank 1-based.
    * Scale shape: one narrow explode → vocabulary-bounded count (Heaps'
    * law — map-side partial agg first) → bounded top-k (limit-fused
    * TakeOrdered, never a global sort); the final rank stamp runs over
    * exactly k rows on one partition. */
  def vocabTopK(docs: org.apache.spark.sql.DataFrame, textCol: String,
                k: Int): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"vocab k must be positive, got $k")
    docs.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
      .orderBy(col("cw").desc, col("w")).limit(k)
      .coalesce(1)
      .withColumn("vocab_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cw").desc, col("w"))))
      .select("vocab_rank", "w", "cw")
  }

  /** Persist the corpus's top-`k` token vocabulary at `dir` — the
    * serving artifact an OOV gate/monitor reads per batch instead of
    * REFOLDING the corpus vocabulary every time (VERDICT r16 #6: the
    * ADVICE storage-cost note on q_oov_rate's per-run vocab fold, fixed
    * the [[bpeWriteMerges]] way). k rows, one file. Empty/short-text
    * corpora still produce a valid (possibly < k rows) artifact unless
    * they tokenize to NOTHING, in which case the empty-seed guard
    * applies (no dir — the cold-start contract of every seeder). */
  def writeVocab(docs: org.apache.spark.sql.DataFrame, textCol: String,
                 k: Int, dir: String): Unit = {
    // pin the ≤ k result rows before the empty-guard: an unpinned
    // `v.isEmpty` runs the FULL corpus vocabulary fold once and the
    // write below runs it again (r17 — measured double fold in
    // q_oov_artifact; guide §1.4's double-eval trap, action form)
    val v = vocabTopK(docs, textCol, k).localCheckpoint(eager = true)
    // unpersist when done (ADVICE r17): a long-lived session invoking
    // this seeder repeatedly must not accumulate ≤k-row storage blocks
    try {
      if (v.isEmpty) {
        graft.sources.IO.deleteDir(docs.sparkSession, dir); return
      }
      v.coalesce(1).write.mode("overwrite").parquet(dir)
    } finally graft.operators.Checkpoints.drop(v)
  }

  /** Load a persisted vocabulary. ≤ k rows — broadcast-sized at any
    * corpus scale (that is the point of a top-k vocab). */
  def readVocab(spark: org.apache.spark.sql.SparkSession,
                dir: String): org.apache.spark.sql.DataFrame =
    spark.read.parquet(dir).select("vocab_rank", "w", "cw")

  /** Extend a persisted vocabulary to `k` total entries over the SAME
    * corpus: ranks already written are IMMUTABLE (rank r's token is a
    * function of the corpus alone, so re-deriving the prefix reproduces
    * it bit-for-bit — asserted, not assumed) and only ranks
    * `existing+1 .. k` append — extend == retrain (ScalePathSpec law),
    * with ranks already shipped to scoring jobs staying valid (the
    * [[bpeExtendMerges]] prefix discipline). Extending over a GROWN
    * corpus is NOT supported: counts move and the ranking reshuffles —
    * retrain with [[writeVocab]] (the documented contract; the guard
    * below fails loudly on a drifted prefix instead of silently
    * shipping a vocabulary that is neither the old nor the new one). */
  def extendVocab(docs: org.apache.spark.sql.DataFrame, textCol: String,
                  k: Int, dir: String): Unit = {
    val spark = docs.sparkSession
    val existing = readVocab(spark, dir)
    val nOld = existing.count()
    require(k > nOld,
      s"extendVocab: target $k must exceed the $nOld entries present")
    val full = vocabTopK(docs, textCol, k).localCheckpoint(eager = true)
    // one computation feeds prefix check + append
    val drifted = full.filter(col("vocab_rank") <= nOld)
      .join(existing,
        Seq("vocab_rank", "w", "cw"), "left_anti").count()
    require(drifted == 0L,
      s"extendVocab: $drifted prefix ranks differ from the stored " +
        "vocabulary — the corpus has changed; retrain with writeVocab")
    full.filter(col("vocab_rank") > nOld)
      .coalesce(1).write.mode("append").parquet(dir)
  }

  /** Per-doc OOV fold against a PERSISTED vocabulary — the q_oov_rate
    * scoring with the vocab read from the artifact (≤ k rows,
    * broadcast) instead of refolded from the corpus: (id, n_tokens,
    * n_oov, oov_ppm exact HALF_UP). The shape a live monitor runs per
    * batch: one narrow explode + one broadcast join, zero corpus-sized
    * state. */
  def oovAgainstVocab(docs: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String, vocabDir: String)
      : org.apache.spark.sql.DataFrame = {
    val vocab = readVocab(docs.sparkSession, vocabDir)
      .select(col("w"), lit(1).as("__in"))
    docs.select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .join(broadcast(vocab), Seq("w"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm",
        graft.operators.Analytics.halfUpPpm(col("n_oov"), col("n_tokens")))
  }

  private def writeMergeRows(spark: org.apache.spark.sql.SparkSession,
                             merges: Seq[(String, String)], baseRank: Int,
                             dir: String, overwrite: Boolean): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => (baseRank + i + 1L, a, b) }
      .toDF("merge_rank", "left_sym", "right_sym")
      .coalesce(1) // k rows — one file, not one file per shuffle partition
      .write.mode(if (overwrite) "overwrite" else "append").parquet(dir)
  }
}
