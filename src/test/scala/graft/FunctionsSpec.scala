package graft

import org.apache.spark.sql.functions._
import graft.functions.{Text, Vectors}
import graft.operators.{Dedup, Similarity}

/** Unit tests for the function pack and the oracle-exempt sketch operators
  * (SURVEY.md §5.2: scalatest goldens replace the DuckDB oracle where the
  * op is approximate / hash-seeded by construction). */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: whitespace split drops empties, oracle parity") {
    val out = Seq("a b  c", "", " x ").toDF("text")
      .select(Text.tokens(col("text")).as("t")).as[Seq[String]].collect()
    assert(out(0) == Seq("a", "b", "c"))
    assert(out(1) == Seq.empty)
    assert(out(2) == Seq("x"))
  }

  test("tokensUnicode: CJK chars become single tokens, case folded") {
    val out = Seq("Hello 世界 Spark!").toDF("text")
      .select(Text.tokensUnicode(col("text")).as("t")).as[Seq[String]].collect()
    assert(out(0) == Seq("hello", "世", "界", "spark"))
  }

  test("empty documents and zero vectors degrade to null, never crash (ANSI guards)") {
    // empty doc: quality metrics yield null, not DIVIDE_BY_ZERO
    val q = Seq("").toDF("text").select(
      Text.avgTokenLen(col("text")).as("a"),
      Text.stopwordRatio(col("text"), Seq("the")).as("s"))
      .collect().head
    assert(q.isNullAt(0) && q.isNullAt(1))
    // zero vector: cosine yields null and ranks last, not DIVIDE_BY_ZERO
    val emb = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      Array(1.0f, 0.0f), 3).select("vec_id").as[Long].collect()
    assert(top.take(2).toSeq == Seq(0L, 2L), top.mkString(","))
  }

  test("BPE-style tokenizer: contractions, words, numbers, punctuation split") {
    val out = Seq("I can't pay $12.50!").toDF("text")
      .select(Text.bpeTokens(col("text")).as("t")).as[Seq[String]].head()
    assert(out == Seq("I", " can", "'t", " pay", " $", "12", ".", "50", "!"),
      out.mkString("|"))
    val n = Seq("hello world").toDF("text")
      .select(Text.bpeTokenCount(col("text"))).as[Long].head()
    assert(n == 2L)
  }

  test("quality score formula matches hand computation") {
    // 4 tokens, 1 stopword 'the', 11 chars sans spaces
    val r = Seq("the cat sat down").toDF("text")
      .select(Text.qualityScore(col("text"), Seq("the", "a")).as("q"))
      .as[Double].head()
    val expected = BigDecimal(math.min(1.0, 4.0 / 100.0) * (1.0 - 0.25))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r - expected) < 1e-9)
  }

  test("langId: heuristic hits crafted sentences, CJK short-circuit, und fallback") {
    val rows = Seq(
      "the king and the queen of the land",  // en
      "le chef de la maison est là",          // fr
      "la casa de el señor es grande",        // es
      "die kinder schauen den schönen garten", // de
      "这是一个中文句子",                        // zh
      "xqz").toDF("text")
      .select(Text.langId(col("text")).as("l")).as[String].collect()
    assert(rows(0) == "en"); assert(rows(1) == "fr"); assert(rows(2) == "es")
    assert(rows(3) == "de"); assert(rows(4) == "zh"); assert(rows(5) == "und")
  }

  test("simhash: duplicates collide, near-dups closer than disjoint docs") {
    val base = (1 to 200).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 199).map(i => s"tok$i").mkString(" ") + " other"
    val disjoint = (500 to 700).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, nearDup), (4L, disjoint))
      .toDF("id", "text")
    val sigs = df.select(col("id"), Text.simhash64(Text.tokens(col("text"))).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L), "identical docs must collide exactly")
    val near = java.lang.Long.bitCount(sigs(1L) ^ sigs(3L))
    val far = java.lang.Long.bitCount(sigs(1L) ^ sigs(4L))
    assert(near < far, s"near=$near must be < far=$far")
    assert(far > 10)
    // and the neighbor-count operator finds the exact duplicate
    val withNeighbors = graft.operators.Dedup
      .simhashWithNeighbors(df.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(withNeighbors(1L) >= 1L && withNeighbors(2L) >= 1L)
  }

  test("vec dot / cosine: codegen'd expression matches hand math") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, -5.0f, 6.0f)))
      .toDF("a", "b")
    val (d, c) = df.select(
      Vectors.dot(col("a"), col("b")).as("d"),
      Vectors.cosine(col("a"), col("b")).as("c")).as[(Double, Double)].head()
    assert(math.abs(d - 12.0) < 1e-12)
    val expectedC = 12.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(c - expectedC) < 1e-12)
  }

  test("jaroWinkler: codegen'd expression matches the DuckDB-probed goldens") {
    // expected doubles probed from DuckDB's jaro_winkler_similarity
    // (the oracle builtin) — classic textbook cases + the variant
    // discriminators: boost suppressed at jaro ≤ 0.7, prefix cap 4,
    // either-empty → 0, transposition halving
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("abc", "abc", 1.0),
      ("", "abc", 0.0),
      ("", "", 0.0),
      ("CRATE", "TRACE", 0.7333333333333334),
      ("abcdxxxxxx", "abcdyyyyyy", 0.6),
      ("ab", "abcdefghij", 0.7866666666666667),
      ("PENNSYLVANIA", "PENNCISYLVNIA", 0.8980186480186481),
      ("jellyfish", "smellyfish", 0.8962962962962964))
    val got = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(graft.functions.StringFns.jaroWinkler(col("a"), col("b")).as("jw"),
        graft.functions.StringFns.jaroWinkler(col("b"), col("a")).as("rev"))
      .as[(Double, Double)].collect()
    cases.zip(got).foreach { case ((a, b, want), (jw, rev)) =>
      assert(math.abs(jw - want) < 1e-12, s"$a / $b: got $jw want $want")
      assert(jw == rev, s"$a / $b: not symmetric")
    }
  }

  test("jaroWinkler == independent naive reference on random strings") {
    // independently-written reference: match sets via index lists, t
    // derived by pairing matched positions (not the production walk)
    def ref(s1: String, s2: String): Double = {
      val (l1, l2) = (s1.length, s2.length)
      if (l1 == 0 || l2 == 0) return 0.0
      val window = math.max(math.max(l1, l2) / 2 - 1, 0)
      val used = scala.collection.mutable.Set.empty[Int]
      val pairs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      for (i <- 0 until l1) {
        val hit = (math.max(0, i - window) to math.min(l2 - 1, i + window))
          .find(j => !used(j) && s1(i) == s2(j))
        hit.foreach { j => used += j; pairs += ((i, j)) }
      }
      val m = pairs.length
      if (m == 0) return 0.0
      val s2Order = pairs.map(_._2).sorted
      val mismatches = pairs.map(_._2).zip(s2Order)
        .count { case (got, want) => s2(got) != s2(want) }
      val jaro = (m.toDouble / l1 + m.toDouble / l2 +
        (m.toDouble - mismatches / 2) / m) / 3.0
      if (jaro <= 0.7) jaro
      else {
        val p = s1.zip(s2).take(4).takeWhile { case (a, b) => a == b }.length
        jaro + p * 0.1 * (1.0 - jaro)
      }
    }
    var x = 99L
    def nxt(m: Int): Int = {
      x = x * 6364136223846793005L + 1442695040888963407L
      math.floorMod(x, m.toLong).toInt
    }
    def word(): String = (0 until nxt(13)).map(_ => ('a' + nxt(4)).toChar).mkString
    val cases = (0 until 500).map(_ => (word(), word()))
    val got = cases.toDF("a", "b")
      .select(graft.functions.StringFns.jaroWinkler(col("a"), col("b")))
      .as[Double].collect()
    cases.zip(got).foreach { case ((a, b), jw) =>
      assert(jw == ref(a, b), s"'$a' / '$b': got $jw want ${ref(a, b)}")
    }
  }

  test("SQL extension: jaro_winkler usable from spark.sql; null-safe") {
    val v = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS jw").as[Double].head()
    assert(math.abs(v - 0.9611111111111111) < 1e-12)
    val n = spark.sql(
      "SELECT jaro_winkler(CAST(NULL AS STRING), 'x') AS jw").collect().head
    assert(n.isNullAt(0), "null in must be null out")
  }

  test("lsh signature: identical vectors share all bands; opposite vectors none") {
    val df = Seq(
      (1L, Array.fill(8)(1.0f)),
      (2L, Array.fill(8)(1.0f)),
      (3L, Array.fill(8)(-1.0f))).toDF("id", "v")
    val sigs = df.select(col("id"),
      Vectors.bandedSignatures(col("v"), bands = 4, planesPerBand = 8, dim = 8).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L).zip(sigs(3L)).forall { case (a, b) => a != b })
  }

  test("shingleSet: distinct n-grams, short docs empty") {
    val f = Dedup.shingleSet(3)
    val out = Seq("a b c d a b c d", "a b").toDF("text")
      .select(f(Text.tokens(col("text"))).as("s")).as[Seq[String]].collect()
    assert(out(0).toSet == Set("a b c", "b c d", "c d a", "d a b"))
    assert(out(0).length == out(0).distinct.length)
    assert(out(1) == Seq.empty)
  }

  test("minhash LSH: near-dup docs are candidates with high est_jaccard; disjoint docs are not") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 39).map(i => s"w$i").mkString(" ") + " x99"
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
    val pairs = Dedup.minhashCandidatePairs(sigs, "doc_id")
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists { case (a, b, j) => a == 1L && b == 2L && j > 0.6 })
    assert(!pairs.exists { case (a, b, _) => b == 3L || a == 3L })
  }

  test("minhash: shingle-less short docs are never near-dup candidates of each other") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "x y"),
      (4L, "w1 w2 w3 w4 w5")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
    // all four docs stay visible in the signature table…
    assert(sigs.select("doc_id").distinct().count() == 4)
    // …but the sub-shingle docs (1,2,3) produce zero candidate pairs
    assert(Dedup.minhashCandidatePairs(sigs, "doc_id").count() == 0)
  }

  test("minhash est_jaccard tracks exact jaccard on controlled overlap") {
    // two docs with ~0.8 shingle jaccard (high overlap → certain LSH candidate)
    val d1 = (1 to 30).map(i => s"w$i").mkString(" ")
    val d2 = (4 to 33).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val sh1 = (1 to 30).map(i => s"w$i").sliding(3).map(_.mkString(" ")).toSet
    val sh2 = (4 to 33).map(i => s"w$i").sliding(3).map(_.mkString(" ")).toSet
    val exact = sh1.intersect(sh2).size.toDouble / sh1.union(sh2).size
    val est = Dedup.minhashCandidatePairs(
      Dedup.minhashSignatures(docs, "doc_id", "text"), "doc_id")
      .as[(Long, Long, Double)].collect().headOption.map(_._3)
    // 32 hashes → σ ≈ sqrt(j(1-j)/32) ≈ 0.08; allow 3σ
    assert(est.isDefined, "near-dup pair must be an LSH candidate")
    assert(math.abs(est.get - exact) < 0.25,
      s"est ${est.get} vs exact $exact")
  }

  test("lshTopK: full recall on clustered embeddings, sane on random ones") {
    // clustered corpus — the actual near-dup/similarity use case: 10
    // clusters of 5 near-identical vectors; ANN must recover the query's
    // own cluster exactly.
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(10)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val rows = for (c <- 0 until 10; m <- 0 until 5) yield {
      val v = centers(c).map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      ((c * 5 + m).toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val q = Similarity.queryVector(emb, "vec_id", "embedding", 0L)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 5)
      .select("vec_id").as[Long].collect().toSet
    val ann = Similarity.lshTopK(emb, "vec_id", "embedding", q, 5)
      .select("vec_id").as[Long].collect().toSet
    assert(exact == Set(0L, 1L, 2L, 3L, 4L))
    assert(ann == exact, s"ANN must recover the cluster: $ann vs $exact")

    // random corpus (sf0.001 embeddings): ANN still returns k rows
    // including the query itself (recall on isotropic noise is inherently
    // weak — that is a property of LSH, not a bug).
    val real = graft.sources.Tables.embeddings(spark, sfDir)
    val qr = Similarity.queryVector(real, "vec_id", "embedding", 0L)
    val annReal = Similarity.lshTopK(real, "vec_id", "embedding", qr, 5)
      .select("vec_id").as[Long].collect().toSet
    assert(annReal.contains(0L) && annReal.size == 5)
  }

  test("ivfTopK: full recall on clustered embeddings; probes bound the scan") {
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val rows = for (c <- 0 until 8; m <- 0 until 6) yield {
      val v = centers(c).map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      ((c * 6 + m).toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val centroids = Similarity.ivfTrain(emb, "embedding", k = 8, iters = 10)
    val q = Similarity.queryVector(emb, "vec_id", "embedding", 0L)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 5)
      .select("vec_id").as[Long].collect().toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", q, 5, centroids,
      nprobe = 2).select("vec_id").as[Long].collect().toSet
    assert(ivf == exact, s"IVF must recover the cluster: $ivf vs $exact")
    // assignment is total and lists are bounded by k
    val lists = Similarity.ivfAssign(emb, "embedding", centroids)
      .select("ivf_list").as[Int].collect()
    assert(lists.length == 48 && lists.forall(l => l >= 0 && l < 8))
  }

  test("persisted IVF index: probe scan prunes to <= nprobe list partitions") {
    val rnd = new scala.util.Random(17)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val rows = for (c <- 0 until 8; m <- 0 until 6) yield {
      val v = centers(c).map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      ((c * 6 + m).toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val centroids = Similarity.ivfTrain(emb, "embedding", k = 8, iters = 10)
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx_").toString
    Similarity.ivfWriteIndex(emb, "embedding", centroids, dir)

    // the index is laid out one directory per inverted list
    val listDirs = new java.io.File(s"$dir/vectors").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("ivf_list="))
    assert(listDirs.length >= 4, s"want one dir per populated list: ${listDirs.length}")

    // partition pruning must reach the FileIndex: the probe scan's
    // physical plan selects <= nprobe of the list partitions (this is the
    // N -> N*nprobe/k claim as a plan property, not a comment)
    val q = Similarity.queryVector(emb, "vec_id", "embedding", 0L)
    val loaded = Similarity.ivfReadCentroids(spark, dir)
    assert(loaded.length == 8 && loaded.head.length == 64)
    val scan = Similarity.ivfProbeScan(spark, dir, q, loaded, nprobe = 2)
    val fileScans = scan.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(fileScans.nonEmpty, "expected a FileSourceScanExec leaf")
    val partsRead = fileScans.map(_.selectedPartitions.partitionCount).sum
    assert(partsRead <= 2,
      s"probe scan must touch <= nprobe=2 of ${listDirs.length} partitions, read $partsRead")

    // and the indexed query path preserves brute-force recall
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 5)
      .select("vec_id").as[Long].collect().toSet
    val ivf = Similarity.ivfTopKIndexed(spark, dir, "vec_id", "embedding", q,
      5, nprobe = 2).select("vec_id").as[Long].collect().toSet
    assert(ivf == exact, s"indexed IVF must recover the cluster: $ivf vs $exact")
  }

  test("ivfTrainDistributed: full-data trainer matches sampled trainer quality") {
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val rows = for (c <- 0 until 8; m <- 0 until 6) yield {
      val v = centers(c).map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      ((c * 6 + m).toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding").repartition(4)
    val centroids = Similarity.ivfTrainDistributed(emb, "embedding", k = 8, iters = 10)
    assert(centroids.length == 8 && centroids.forall(_.length == 64))
    // on well-separated clusters Lloyd's must land one centroid per
    // cluster: every cluster's 6 members share an ivf_list, and the 8
    // clusters use 8 distinct lists
    val assigned = Similarity.ivfAssign(emb, "embedding", centroids)
      .select("vec_id", "ivf_list").as[(Long, Int)].collect().toMap
    val listsPerCluster = (0 until 8).map { c =>
      (0 until 6).map(m => assigned((c * 6 + m).toLong)).toSet
    }
    assert(listsPerCluster.forall(_.size == 1),
      s"cluster split across lists: $listsPerCluster")
    assert(listsPerCluster.map(_.head).toSet.size == 8,
      s"clusters merged into one list: $listsPerCluster")
    // and the index built from it gives exact recall at nprobe=2
    val q = Similarity.queryVector(emb, "vec_id", "embedding", 0L)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 5)
      .select("vec_id").as[Long].collect().toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", q, 5, centroids,
      nprobe = 2).select("vec_id").as[Long].collect().toSet
    assert(ivf == exact, s"IVF must recover the cluster: $ivf vs $exact")
  }

  test("approx_count_distinct within 5% of exact at sf0.001") {
    val exact = Queries.q_agg_distinct(spark, sfDir)
      .select("event_type", "n_users").as[(String, Long)].collect().toMap
    val approx = Queries.q_agg_approx_distinct(spark, sfDir)
      .select("event_type", "approx_users").as[(String, Long)].collect().toMap
    approx.foreach { case (k, v) =>
      val e = exact.get(k)
      assert(e.isDefined, s"event_type $k in approx result but not exact")
      assert(math.abs(v - e.get) <= math.max(1L, (e.get * 0.05).toLong),
        s"$k: approx $v vs exact ${e.get}")
    }
  }

  test("vec_dot rejects length-mismatched vectors with a clear error") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(Vectors.dot(col("a"), col("b"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("length mismatch")), e.getMessage)
  }

  test("SQL extension: vec_dot / vec_cosine usable from spark.sql") {
    val d = spark.sql(
      "SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d").as[Double].head()
    assert(math.abs(d - 11.0) < 1e-12)
    // two instances in one codegen scope (fresh-local-name regression guard)
    val (d1, d2) = spark.sql(
      """SELECT vec_dot(array(1.0F), array(2.0F)) AS d1,
        |       vec_dot(array(3.0F), array(4.0F)) AS d2""".stripMargin)
      .as[(Double, Double)].head()
    assert(d1 == 2.0 && d2 == 12.0)
    val c = spark.sql(
      "SELECT vec_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c").as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
    // zero-norm vector → null, not an ANSI DIVIDE_BY_ZERO job failure
    val z = spark.sql(
      "SELECT vec_cosine(array(0.0F, 0.0F), array(1.0F, 0.0F)) AS z").collect().head
    assert(z.isNullAt(0))
  }

  test("TopKAggregator: bounded-heap grouped top-k matches the window-function query") {
    import org.apache.spark.sql.functions.{udaf, col, explode, posexplode, to_date, round => sround, sum => ssum}
    val topk = udaf(new graft.functions.TopKAggregator(3))
    val daily = graft.sources.Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"), col("user_id"))
      .agg(sround(ssum(col("value")), 2).as("spend"))
    val viaAgg = daily
      .groupBy("day")
      .agg(topk(col("spend"), col("user_id")).as("ids"))
      .select(col("day"), posexplode(col("ids")).as(Seq("pos", "user_id")))
      .select(col("day"), (col("pos") + 1).cast("long").as("rn"), col("user_id"))
      .as[(java.sql.Date, Long, Long)].collect().toSet
    val viaWindow = Queries.q_topk(spark, sfDir)
      .select("day", "rn", "user_id")
      .as[(java.sql.Date, Long, Long)].collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("embeddingNearDupPairs finds planted near-duplicate vectors") {
    val rnd = new scala.util.Random(3)
    val base = Array.fill(64)(rnd.nextGaussian().toFloat)
    val rows = Seq(
      (0L, base),
      (1L, base.map(x => x + 1e-4f)),                        // near-dup of 0
      (2L, Array.fill(64)(rnd.nextGaussian().toFloat)),      // unrelated
      (3L, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val emb = rows.toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDupPairs(emb, "vec_id", "embedding",
      minCosine = 0.98).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)), s"got $pairs")
  }

  test("semanticDedup: transitive embedding clusters collapse to the canonical id") {
    val rnd = new scala.util.Random(3)
    val base = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base2 = Array.fill(64)(rnd.nextGaussian().toFloat)
    val rows = Seq(
      (0L, base),
      (1L, base.map(x => x + 1e-4f)),   // ~0 → cluster {0,1,2} keeps 0
      (2L, base.map(x => x - 1e-4f)),
      (5L, base2),                       // pair {5,6} keeps 5
      (6L, base2.map(x => x + 1e-4f)),
      (9L, Array.fill(64)(rnd.nextGaussian().toFloat))) // singleton
    val emb = rows.toDF("vec_id", "embedding")
    val surv = Similarity.semanticDedup(emb, "vec_id", "embedding",
      minCosine = 0.98).select("vec_id").as[Long].collect().toSet
    assert(surv == Set(0L, 5L, 9L), s"got $surv")
  }

  test("rolling fingerprint: order-sensitive, md5 is not") {
    val df = Seq(("a b c", "c b a")).toDF("t1", "t2")
    val (r1, r2) = df.select(
      Text.rollingFingerprint(col("t1")).as("r1"),
      Text.rollingFingerprint(col("t2")).as("r2")).as[(Long, Long)].head()
    assert(r1 != r2)
  }

  test("connectedComponents: transitive clusters get the min-id label; keepCanonical keeps one per cluster") {
    // chain 1-2, 2-3 (one cluster via transitivity), pair 10-11, and a
    // long path 20-21-22-23-24 (propagation must walk the diameter)
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L))
      .toDF("id_a", "id_b")
    val labels = graft.operators.Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(3L) == 1L,
      s"chain must close transitively: $labels")
    assert(labels(10L) == 10L && labels(11L) == 10L)
    assert((20L to 24L).forall(labels(_) == 20L),
      s"5-hop path must converge: $labels")
    // canonical dedup: min-id member survives, unpaired docs survive
    val docs = (1L to 5L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val kept = graft.operators.Dedup.keepCanonical(
      docs, Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b"), "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L), s"keep 1 (canonical), 4, 5 (unpaired): $kept")
  }

  test("deterministicSplit: stable 80/10/10 partition; stratifiedSample rebalances classes") {
    import graft.operators.Sampling
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val split = Sampling.deterministicSplit(docs, "doc_id")
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val n = counts.values.sum.toDouble
    // md5 cells are uniform: 500 docs land within a loose tolerance of
    // the 204/26/26-cell design (binomial σ ≈ 0.018 at n=500; allow ~4σ)
    assert(math.abs(counts("train") / n - 204.0 / 256) < 0.08, counts.toString)
    assert(counts.keySet == Set("train", "val", "test"), counts.toString)
    // stability: re-running yields the identical assignment (no RNG state)
    val again = Sampling.deterministicSplit(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val first = split.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(first == again)
    // every split partitions the id space
    assert(first.size == n.toLong)

    // full-coverage edge: trainCells + valCells == 256 leaves NO test
    // cells ("100" has no 2-hex form — boundary must still compare right)
    val full = Sampling.deterministicSplit(docs, "doc_id", 230, 26)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(!full.contains("test") && full.keySet == Set("train", "val"), full.toString)

    // stratified downsampling: half the 'en' docs, all 'de', drop others
    val langs = docs.select("lang").distinct().as[String].collect().toSet
    assert(langs.contains("en"))
    val sampled = Sampling.stratifiedSample(docs, "lang",
      Map("en" -> 0.5, "de" -> 1.0))
    val byLang = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    val enTotal = docs.filter(col("lang") === "en").count().toDouble
    assert(byLang.keySet.subsetOf(Set("en", "de")), byLang.toString)
    assert(math.abs(byLang.getOrElse("en", 0L) / enTotal - 0.5) < 0.2,
      s"en downsampled to ~half: $byLang of $enTotal")
    if (langs.contains("de"))
      assert(byLang.getOrElse("de", 0L) ==
        docs.filter(col("lang") === "de").count(), "de kept whole")
  }

  test("writeShards: stable balanced shards that partition the input") {
    import graft.operators.Sampling
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "n_chars")
    val out = java.nio.file.Files.createTempDirectory("shards_").toString
    Sampling.writeShards(docs, "doc_id", out, numShards = 8)
    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard=")).map(_.getName)
    assert(dirs.toSet == (0 until 8).map(i => s"shard=$i").toSet, dirs.toSeq.toString)
    val back = spark.read.parquet(out)
    val n = docs.count()
    assert(back.count() == n, "shards partition the input")
    assert(back.select("doc_id").distinct().count() == n)
    // balance: xxhash64 is uniform; 500 rows over 8 shards stay within 2x
    val sizes = back.groupBy("shard").count().as[(Long, Long)].collect().map(_._2)
    assert(sizes.max < 2L * sizes.min, s"shard skew: ${sizes.toSeq}")
    // determinism: a re-run yields the identical membership
    val first = back.select("shard", "doc_id").as[(Long, Long)].collect().toSet
    Sampling.writeShards(docs, "doc_id", out, numShards = 8)
    val again = spark.read.parquet(out)
      .select("shard", "doc_id").as[(Long, Long)].collect().toSet
    assert(first == again)
  }

  test("decontaminate drops corpus docs sharing an n-gram with the probe set") {
    import spark.implicits._
    val probe = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "intro text then the quick brown fox jumps right out"), // 5-gram hit
      (2L, "a completely unrelated document about spark plans"),
      (3L, "quick brown fox jumps")                                // < n tokens
    ).toDF("doc_id", "text")
    val kept = graft.operators.Dedup
      .decontaminate(corpus, probe, "doc_id", "text", n = 5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 3L),
      s"doc 1 leaks 'the quick brown fox jumps'; 3 is sub-n-gram: $kept")
  }

  test("funnel3 enforces stage order + window; retention cohorts by first day") {
    import spark.implicits._
    import graft.operators.Analytics
    def ts(m: Long) = new java.sql.Timestamp(m)
    // u1: full ordered funnel; u2: click BEFORE view (ordering violated);
    // u3: purchase outside the 7-day window; u4: view only
    val ev = Seq(
      (1L, "view", ts(0L)), (1L, "click", ts(1000L)), (1L, "purchase", ts(2000L)),
      (2L, "click", ts(0L)), (2L, "view", ts(1000L)), (2L, "purchase", ts(2000L)),
      (3L, "view", ts(0L)), (3L, "click", ts(1000L)),
      (3L, "purchase", ts(8L * 24 * 3600 * 1000)),
      (4L, "view", ts(0L))
    ).toDF("user_id", "event_type", "ts")
    val r = Analytics.funnel3(ev, ("view", "click", "purchase"))
      .as[(Long, Long, Long)].collect().head
    assert(r == ((4L, 2L, 1L)), s"stage counts: $r")

    // u1 first active day 0, returns day 1; u2 first active day 1, returns day 3
    val day = 86400000L
    val ev2 = Seq((1L, ts(0L)), (1L, ts(day)), (2L, ts(day)), (2L, ts(3 * day)))
      .toDF("user_id", "ts")
    val ret = Analytics.retention(ev2)
      .orderBy("cohort_day", "day_offset")
      .select("day_offset", "n_users").as[(Long, Long)].collect().toSeq
    assert(ret == Seq((0L, 1L), (1L, 1L), (0L, 1L), (2L, 1L)), ret.toString)
  }

  test("VecLshSignature: structural equality, so identical signatures canonicalize") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    // two expressions built from two separately-allocated (equal) plane
    // matrices must compare equal — otherwise CSE treats every occurrence
    // as distinct and re-runs the full plane loop per occurrence
    val child = BoundReference(0, ArrayType(FloatType), nullable = false)
    val p1 = graft.functions.Vectors.hyperplanes(8, 4)
    val p2 = graft.functions.Vectors.hyperplanes(8, 4)
    assert(!(p1 eq p2))
    val e1 = graft.functions.VecLshSignature(child, p1, 4)
    val e2 = graft.functions.VecLshSignature(child, p2, 4)
    assert(e1 == e2 && e1.hashCode == e2.hashCode)
    assert(e1.semanticEquals(e2), "canonicalized forms must match")
    val different = graft.functions.VecLshSignature(child,
      p1.map(_.map(_ + 1.0)), 4)
    assert(e1 != different)
  }

  test("redactPii: pattern ordering and adjacency edge cases") {
    def red(s: String): String = Seq(s).toDF("text")
      .select(Text.redactPii(col("text")).as("r")).as[String].head()

    // emails run first: a dotted alphanumeric host must not be
    // half-eaten by the IP rule
    assert(red("mail a.b@c1.d2.co now") == "mail <EMAIL> now")
    // a numeric host is NOT an email (the TLD must be alphabetic) — the
    // IP rule then claims the dotted quad, leaving the local part
    assert(red("x@1.2.3.4") == "x@<IP>")
    // all three kinds adjacent, single-space separated
    assert(red("a@b.co 1.2.3.4 +1 555 0100") == "<EMAIL> <IP> <PHONE>")
    // a plain IP must not be swallowed by the phone rule (no + anchor)
    assert(red("call 10.0.0.7") == "call <IP>")
    // a phone's digit runs must not be re-matched as IPs (no dots)
    assert(red("+44 20 7946 0958") == "<PHONE>")
    // no PII → identity
    assert(red("just words 12 and 3.14") == "just words 12 and 3.14")
  }

  test("piiCounts agrees with the markers redactPii actually emits") {
    val texts = Seq(
      "a@b.co and c@d.org meet at 1.2.3.4",
      "x@1.2.3.4 then +1 555 0100 and +44 20 7946 0958",
      "clean text, no pii at all")
    val (nE, nI, nP) = Text.piiCounts(col("text"))
    val rows = texts.toDF("text")
      .select(Text.redactPii(col("text")).as("red"),
        nE.as("e"), nI.as("i"), nP.as("p"))
      .as[(String, Long, Long, Long)].collect()
    rows.foreach { case (red, e, i, p) =>
      def n(m: String) = m.r.findAllIn(red).length
      assert(e == n("<EMAIL>"), s"email count vs markers in: $red")
      assert(i == n("<IP>"), s"ip count vs markers in: $red")
      assert(p == n("<PHONE>"), s"phone count vs markers in: $red")
    }
  }

  test("mixSample: deterministic, stratum-routed, rate-monotone") {
    import graft.operators.Sampling
    val df = (1L to 1800L).map(i =>
      (i, Seq("en", "de", "fr")((i % 3).toInt))).toDF("id", "lang")

    val once = Sampling.mixSample(df, "lang", "id",
      Map("en" -> 0.5, "de" -> 0.0), defaultRate = 1.0)
    val twice = Sampling.mixSample(df, "lang", "id",
      Map("en" -> 0.5, "de" -> 0.0), defaultRate = 1.0)
    val ids = once.select("id").as[Long].collect().toSet
    assert(ids == twice.select("id").as[Long].collect().toSet,
      "membership must be a pure function of (id, rates)")

    // rate 0 drops the stratum entirely; defaultRate 1.0 keeps every
    // row of the unconfigured stratum (id % 3: 0 -> en, 1 -> de, 2 -> fr)
    assert(!ids.exists(_ % 3 == 1), "de (rate 0) fully dropped")
    assert((1L to 1800L).filter(_ % 3 == 2).forall(ids), "fr kept at default 1.0")

    // en at 0.5: md5 cells are uniform, 600 rows, sd ~ 12 — assert a
    // generous +-5 sd band, not exactness (the oracle pins exactness)
    val nEn = ids.count(_ % 3 == 0)
    assert(nEn > 240 && nEn < 360, s"en ~ half kept, got $nEn of 600")

    // monotone: the 0.25 sample is a subset of the 0.5 sample — same
    // cell, higher threshold
    val quarter = Sampling.mixSample(df, "lang", "id",
      Map("en" -> 0.25, "de" -> 0.0), defaultRate = 1.0)
      .select("id").as[Long].collect().toSet
    assert(quarter.filter(_ % 3 == 0).subsetOf(ids),
      "lower rate must select a subset of the higher rate")
  }

  test("weightedSamplePerKey: k per stratum, deterministic, weight-sensitive") {
    import graft.operators.Sampling
    // two strata; in 'a', ids 1-50 carry weight 1 and ids 51-55 weight
    // 10000 — an E-S key ln(u)/10000 is within (-1e-3, 0) unless u is
    // astronomically small, while 50 unit-weight keys spread over
    // (-inf, 0): the heavy five dominate the top-5 deterministically
    // under the fixed md5-derived uniforms
    val rows = (1L to 55L).map(i => ("a", i, if (i > 50) 10000.0 else 1.0)) ++
      (101L to 110L).map(i => ("b", i, 1.0))
    val df = rows.toDF("stratum", "id", "w")

    val pick = Sampling.weightedSamplePerKey(df, "stratum", "id", col("w"), k = 5)
    val byStratum = pick.select("stratum", "id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byStratum("a").size == 5 && byStratum("b").size == 5,
      s"exactly k per stratum: $byStratum")
    assert(byStratum("a") == Set(51L, 52L, 53L, 54L, 55L),
      s"heavy rows must win the sample: ${byStratum("a")}")

    val again = Sampling.weightedSamplePerKey(df, "stratum", "id", col("w"), k = 5)
      .select("stratum", "id").as[(String, Long)].collect().toSet
    assert(again == pick.select("stratum", "id")
      .as[(String, Long)].collect().toSet, "hash-derived => deterministic")

    // without replacement: k larger than the stratum returns every row once
    val all = Sampling.weightedSamplePerKey(df.filter(col("stratum") === "b"),
      "stratum", "id", col("w"), k = 100)
    assert(all.count() == 10 &&
      all.select("id").distinct().count() == 10)
  }

  test("md5Pair64/hashSeeded: the engine-portable hash contract (DuckDB md5_number_upper/lower)") {
    // independent little-endian BigInteger reference for the two uint64
    // halves of the md5 digest — the definition DuckDB's
    // md5_number_upper/lower implement, which the minhash/simhash
    // oracles replay; drift here silently breaks four hard-oracle ids
    for (s <- Seq("", "abc", "w1 w2 w3", "héllo äß", "0:1,2,3,4")) {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      def le(off: Int): Long =
        new java.math.BigInteger(1, d.slice(off, off + 8).reverse).longValue
      assert(Text.md5Pair64(s) == ((le(0), le(8))),
        s"md5Pair64 drifted for input '$s'")
    }
    // pinned vector, captured from DuckDB 1.0: md5_number_upper('abc'),
    // md5_number_lower('abc')
    assert(Text.md5Pair64("abc") ==
      ((java.lang.Long.parseUnsignedLong("12704604231530709392"),
        java.lang.Long.parseUnsignedLong("8250560606382298838"))))
    // the q_similarity_lsh oracle's hyperplane formula, pinned against a
    // DuckDB-captured value: CAST(md5_number_lower('graftlsh:0:0') %
    // 2049 AS BIGINT) - 1024 == 138 (md5_number_lower('graftlsh:0:0')
    // == 17950657206079494865)
    assert(Text.md5Lower64("graftlsh:0:0") ==
      java.lang.Long.parseUnsignedLong("17950657206079494865"))
    assert(graft.functions.Vectors.intHyperplanes(1, 1)(0)(0) == 138.0,
      "intHyperplanes drifted from the DuckDB oracle formula")
    // every component is an integer in [-1024, 1024] — the exactness
    // precondition of the lshTopKPortable integer-dot argument
    val hp = graft.functions.Vectors.intHyperplanes(32, 64)
    assert(hp.flatten.forall(x => x == math.rint(x) && math.abs(x) <= 1024.0))
    // hashSeeded = (upper + k * lower) mod 2^63 — wrapped-Long masking
    // must equal exact big-integer arithmetic for every seed
    val (a, b) = Text.md5Pair64("abc")
    val bigA = new java.math.BigInteger(java.lang.Long.toUnsignedString(a))
    val bigB = new java.math.BigInteger(java.lang.Long.toUnsignedString(b))
    val mod = java.math.BigInteger.valueOf(2).pow(63)
    for (k <- 0 until 32) {
      val want = bigA.add(bigB.multiply(java.math.BigInteger.valueOf(k)))
        .mod(mod).longValueExact()
      assert(Dedup.hashSeeded("abc", k) == want, s"hashSeeded drift at k=$k")
    }
  }

  test("MinHashUnion: grouped signature equals the signature of the unioned doc") {
    import graft.functions.Sketches
    // shingle n=1 => the signature sketches the token SET; min commutes
    // with union, so the aggregate of per-doc sigs must EXACTLY equal
    // the sig of one doc holding the union of tokens
    val mh = Dedup.minhashBanded(1, 32, 8)
    val parts = Seq(("g", "a b"), ("g", "c d"), ("g", "b c"))
      .toDF("grp", "text")
      .select(col("grp"), mh(Text.tokens(col("text"))).getField("_1").as("sig"))
    val grouped = parts.groupBy("grp")
      .agg(Sketches.minhashUnion(col("sig")).as("gsig"))
      .select("gsig").as[Seq[Long]].head()
    val whole = Seq("a b c d").toDF("text")
      .select(mh(Text.tokens(col("text"))).getField("_1").as("sig"))
      .as[Seq[Long]].head()
    assert(grouped == whole, "merge law: min of sigs == sig of union")
  }

  test("sigSimilarity estimates cross-group vocabulary Jaccard") {
    import graft.functions.Sketches
    // group A vocabulary t1..t40, group B t21..t60 spread over several
    // docs each: |A∩B| = 20, |A∪B| = 60, exact J = 1/3
    val docs = Seq(
      ("A", (1 to 20).map(i => s"t$i").mkString(" ")),
      ("A", (21 to 40).map(i => s"t$i").mkString(" ")),
      ("B", (21 to 45).map(i => s"t$i").mkString(" ")),
      ("B", (46 to 60).map(i => s"t$i").mkString(" "))).toDF("grp", "text")
    val mh = Dedup.minhashBanded(1, 32, 8)
    val grouped = docs
      .select(col("grp"), mh(Text.tokens(col("text"))).getField("_1").as("sig"))
      .groupBy("grp").agg(Sketches.minhashUnion(col("sig")).as("gsig"))
    val a = grouped.filter(col("grp") === "A").select(col("gsig").as("sa"))
    val b = grouped.filter(col("grp") === "B").select(col("gsig").as("sb"))
    val est = a.crossJoin(b)
      .select(Sketches.sigSimilarity(col("sa"), col("sb")).as("j"))
      .as[Double].head()
    // 32 hashes => sd ≈ sqrt(J(1-J)/32) ≈ 0.083; ±0.25 is a ±3-sd band
    assert(math.abs(est - 1.0 / 3.0) < 0.25, s"est $est vs exact 1/3")
    // identical groups estimate exactly 1
    val self = a.crossJoin(a.select(col("sa").as("sb")))
      .select(Sketches.sigSimilarity(col("sa"), col("sb")).as("j"))
      .as[Double].head()
    assert(self == 1.0)
  }

  test("fuzzyPairs: blocking, length pruning, threshold semantics match brute force") {
    val rows = Seq(
      (1L, "blue bolt", "b1"), (2L, "blue belt", "b1"),   // dist 1, same block
      (3L, "blue bolt", "b2"),                            // dup text, OTHER block
      (4L, "blue bolts", "b1"),                           // dist 1 from 1, len+1
      (5L, "red widget", "b1"), (6L, "green gadget", "b1"), // far apart
      (7L, "blu", "b1")                                   // len prune vs all
    ).toDF("id", "name", "blk")
    val got = Dedup.fuzzyPairs(rows, "id", "name", Seq("blk"), maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    // brute force within block
    val data = Seq((1L, "blue bolt", "b1"), (2L, "blue belt", "b1"),
      (3L, "blue bolt", "b2"), (4L, "blue bolts", "b1"),
      (5L, "red widget", "b1"), (6L, "green gadget", "b1"), (7L, "blu", "b1"))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, na, ba) <- data; (ib, nb, bb) <- data
      if ia < ib && ba == bb && lev(na, nb) <= 2
    } yield (ia, ib, lev(na, nb).toLong)).toSet
    assert(got == want, s"got $got want $want")
    // the cross-block exact dup must NOT pair (blocking semantics)
    assert(!got.exists { case (a, b, _) => Set(a, b) == Set(1L, 3L) })
    assert(got.contains((1L, 2L, 1L)) && got.contains((1L, 4L, 1L)))
  }

  test("normalizeUrl: goldens — case, ports, tracking params, param order, fragments") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // scheme+host lowercased, default port stripped, fragment dropped,
      // tracking params removed, survivors sorted
      ("HTTPS://Example.COM:443/Path/P?utm_source=x&b=2&a=1#frag",
        "https://example.com/Path/P?a=1&b=2"),
      // http default port, ref= tracking param
      ("http://HOST.com:80/p?ref=abc&z=1", "http://host.com/p?z=1"),
      // NON-default port preserved; path case preserved
      ("https://Host.com:8443/CaseSensitive", "https://host.com:8443/CaseSensitive"),
      // already canonical: fixpoint
      ("https://example.com/p?a=1", "https://example.com/p?a=1"),
      // all params are tracking → no query string at all
      ("https://example.com/p?utm_a=1&utm_b=2", "https://example.com/p"),
      // no query, no fragment
      ("https://example.com/p", "https://example.com/p"))
    val got = cases.map(_._1).toDF("url")
      .select(graft.functions.Text.normalizeUrl(col("url")).as("n"))
      .as[String].collect().toSeq
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"normalizeUrl($in) = $g, want $want")
    }
    // idempotence over the golden outputs (canonical is a fixpoint)
    val again = cases.map(_._2).toDF("url")
      .select(graft.functions.Text.normalizeUrl(col("url")).as("n"))
      .as[String].collect().toSeq
    assert(again == cases.map(_._2), "normalizeUrl must be idempotent")
  }

  test("tokenEntropy: hand-computed goldens and degenerate docs") {
    val out = Seq("a b a b", "a a a a", "a b c d", "", "x")
      .toDF("text")
      .select(round(Text.tokenEntropy(col("text")), 6).as("e"))
      .as[Double].collect()
    assert(out(0) == 1.0) // two tokens, p=1/2 each
    assert(out(1) == 0.0) // single repeated token
    assert(out(2) == 2.0) // four distinct, p=1/4 each
    assert(out(3) == 0.0) // empty doc
    assert(out(4) == 0.0) // single token
  }

  test("q_agg_distinct_hll: union-of-parts merge law and accuracy vs exact") {
    import org.apache.spark.sql.functions.{col, countDistinct, expr}
    // two fixtures (sf0.001: 15 users, sf0.01: 150) — the accuracy
    // band must hold as cardinality grows, not just on the toy fixture
    // (lgK=12 HLL: ~1.6% typical error, 5% is a generous envelope)
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")) {
      // merge law: HLL registers fold by max, so the union of per-day
      // sketches must estimate EXACTLY what one sketch over all rows does
      val viaUnion = Queries.q_agg_distinct_hll(spark, dir)
        .as[Long].collect().head
      val wholeSketch = graft.sources.Tables.events(spark, dir)
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"))
        .as[Long].collect().head
      assert(viaUnion == wholeSketch,
        s"per-day union estimate $viaUnion != whole-data sketch $wholeSketch ($dir)")
      val exact = graft.sources.Tables.events(spark, dir)
        .agg(countDistinct(col("user_id"))).as[Long].collect().head
      assert(math.abs(viaUnion - exact).toDouble / exact <= 0.05,
        s"estimate $viaUnion vs exact $exact ($dir)")
    }
  }

  test("q_distinct_hll_portable: accuracy band vs exact; both estimator branches exercised") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    // m = 256 → rsd = 1.04/√256 = 6.5%; 3x band = 19.5% — generous
    // enough that only a broken register fold (wrong rho, saturated
    // bucket arithmetic) lands outside, while the estimator's own noise
    // stays far inside. The merge law (per-day partial maxes merged ==
    // direct max) needs no spec: the ORACLE computes the direct form,
    // so the driver's hash compare proves it at every SF. The SF ladder
    // must exercise BOTH branches: sf0.01 (150 users/type) is below the
    // 2.5m = 640 linear-counting threshold, sf0.1 (1500) is above —
    // measured 2026-08-16: 142.01 vs 150 (5.3%), 1601.09 vs 1500 (6.7%).
    val bands = for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) yield {
      val est = Queries.q_distinct_hll_portable(spark, dir)
        .as[(String, Double)].collect().toMap
      val exact = graft.sources.Tables.events(spark, dir)
        .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
        .as[(String, Long)].collect().toMap
      assert(est.keySet == exact.keySet, s"group sets must agree ($dir)")
      exact.foreach { case (g, n) =>
        val relErr = math.abs(est(g) - n) / n
        assert(relErr <= 0.195,
          s"$g ($dir): portable-HLL estimate ${est(g)} vs exact $n — relErr $relErr")
      }
      est.values.max
    }
    // branch coverage: sf0.01 estimates sit in linear-counting range
    // (< 640), sf0.1 in the raw-HLL range (> 640)
    assert(bands.head < 640.0 && bands.last > 640.0,
      s"SF ladder no longer exercises both estimator branches: $bands")
  }

  test("q_distinct_bitmap: bitmap two-level path equals the exact distinct") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val viaBitmap = Queries.q_distinct_bitmap(spark, sfDir)
      .as[(String, Long)].collect().toMap
    val exact = graft.sources.Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(viaBitmap == exact, s"bitmap $viaBitmap != exact $exact")
  }

  // Two fixtures on purpose: the sf0.001 toy (15 users) AND sf0.01
  // (150 users). A capacity-32 sketch passed the toy and returned an
  // EMPTY relation at every realistic cardinality — Spark's
  // `approx_top_k_estimate` yields [] once the sketch saturates. The
  // larger fixture is the one that catches that class of bug.
  for (dir <- Seq(sfDir, "/root/testdata/sf0.01")) {
    test(s"q_topk_approx_sketch: merged daily sketches exact vs twin ($dir)") {
      import org.apache.spark.sql.functions.{col, desc}
      val got = Queries.q_topk_approx_sketch(spark, dir)
        .as[(Long, Long)].collect().toSeq
      // exact twin: global per-user counts, top-5 by (count desc, user_id)
      val exact = graft.sources.Tables.events(spark, dir)
        .groupBy("user_id").count()
        .orderBy(desc("count"), col("user_id")).limit(5)
        .as[(Long, Long)].collect().toSeq
      // the frequent-items sketch is EXACT while its capacity exceeds the
      // distinct-user count, and merging preserves that — so the two-level
      // sketch path must reproduce the exact top-5 verbatim
      val nUsers = graft.sources.Tables.events(spark, dir)
        .select("user_id").distinct().count()
      assert(nUsers <= Queries.TopKSketchCapacity,
        s"fixture outgrew sketch capacity: $nUsers users")
      assert(got.nonEmpty, "sketch estimate returned an empty relation (saturated?)")
      assert(got == exact, s"sketch $got vs exact $exact")
    }
  }

  test("q_knn_join: rank-1 is self and ranks agree with the window brute force") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{broadcast, col, desc, row_number}
    val got = Queries.q_knn_join(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    val probes = got.map(_._1).distinct
    assert(probes.length == 20 && got.length == 60)
    // each probe's nearest neighbor is itself (cosine 1.0, unique vectors)
    got.filter(_._2 == 1L).foreach { case (q, _, n) => assert(q == n) }
    // agreement with the window-sort formulation (same tie rule: cos desc, id)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val probesDf = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), col("vec_id"))
    val brute = emb.crossJoin(broadcast(probesDf))
      .select(col("query_id"), col("vec_id"),
        org.apache.spark.sql.functions.round(
          graft.functions.Vectors.cosine(col("embedding"), col("q_emb")), 12).as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("query_id"), col("rn"), col("vec_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got.toSet == brute)
  }

  test("bpeTrainMerges: classic corpus golden, driver reference parity, determinism, encode") {
    // the Sennrich et al. worked example: merges must start
    // (e,s) -> (es,t) -> (est,</w>) (count 9 from newest+widest)
    val corpus = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val words = corpus.toSeq.toDF("word", "freq")
    val merges = Text.bpeTrainMerges(words, "word", "freq", k = 8)
    assert(merges.take(3) == Seq(("e", "s"), ("es", "t"), ("est", "</w>")))

    // driver-side reference: identical algorithm and tie rule (count
    // desc, then pair lexicographic) over plain collections
    def ref(k: Int): Seq[(String, String)] = {
      var st: Seq[(Seq[String], Long)] =
        corpus.toSeq.map { case (w, f) => (w.map(_.toString) :+ "</w>", f) }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var done = false
      while (out.length < k && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        st.foreach { case (syms, f) =>
          syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
        }
        val best = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
        best match {
          case Some((pair, c)) if c >= 2 =>
            out += pair
            st = st.map { case (syms, f) =>
              (Text.mergePair(syms, pair._1, pair._2), f)
            }
          case _ => done = true
        }
      }
      out.toSeq
    }
    assert(merges == ref(8), s"got $merges want ${ref(8)}")

    // seeded-free determinism: a second distributed run is identical
    assert(Text.bpeTrainMerges(words, "word", "freq", k = 8) == merges)

    // encode replays the merges: an UNSEEN word built from learned
    // subwords segments onto them
    assert(Text.bpeEncodeWord("lowest", merges) == Seq("low", "est</w>"))

    // early stop: every surviving pair below minCount ends training
    val tiny = Seq(("ab", 1L)).toDF("word", "freq")
    assert(Text.bpeTrainMerges(tiny, "word", "freq", k = 5).isEmpty)

    // r17 one-task fixpoint parity: forcing the distributed per-round
    // loop (gate = 0) must produce the identical merge table the
    // single-task path (gate = default, exercised above) learned —
    // the Graph.pagerankOneTask parity discipline
    assert(Text.bpeTrainMerges(words, "word", "freq", k = 8,
      localMaxWords = 0L) == merges)
    // and with a seeded (extend) table on both paths
    val seeded = merges.take(2)
    assert(Text.bpeTrainMerges(words, "word", "freq", k = 8,
        initial = seeded, localMaxWords = 0L) ==
      Text.bpeTrainMerges(words, "word", "freq", k = 8, initial = seeded))
  }

  test("q_bpe_encode: fertility laws and dictionary-encode consistency") {
    // encode laws on the helper first: zero merges → chars+1 symbols;
    // each additional merge rule never increases a word's token count
    val corpus = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val words = corpus.toSeq.toDF("word", "freq")
    val merges = Text.bpeTrainMerges(words, "word", "freq", k = 8)
    for (w <- corpus.keys) {
      assert(Text.bpeEncodeWord(w, Nil).length == w.length + 1)
      val lens = merges.indices.map(i =>
        Text.bpeEncodeWord(w, merges.take(i + 1)).length)
      assert((Text.bpeEncodeWord(w, Nil).length +: lens)
        .sliding(2).forall(p => p(1) <= p(0)),
        s"token count must be monotone non-increasing in merges for '$w'")
    }
    // registry id: per-document fertility from the dictionary-encoded
    // join must equal a direct per-occurrence encode (golden cross-check
    // on the fixture), and fertility sits in (0, chars+1]
    val got = Queries.all.toMap.apply("q_bpe_encode")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.nonEmpty)
    assert(got.values.forall { case (nw, ns, f) =>
      nw > 0 && ns >= nw && f >= 1.0 }, // ≥1 token per word (the </w> floor)
      "subword count bounded below by word count")
    // direct recompute for a handful of docs via the same training run
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).limit(5)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val vocabHead = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(Text.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("word")).limit(4096)
    val m2 = Text.bpeTrainMerges(vocabHead, "word", "cnt", k = 12)
    for ((id, text) <- docs) {
      // the registry tokenizer verbatim (space-split, drop empties)
      val toks = text.split(" ", -1).filter(_.nonEmpty)
      val nSub = toks.map(w => Text.bpeEncodeWord(w, m2).length.toLong).sum
      got.get(id) match {
        // an empty/whitespace-only doc tokenizes to zero words and is
        // absent from the registry's explode→groupBy output — assert
        // that correspondence instead of throwing NoSuchElementException
        case None =>
          assert(toks.isEmpty,
            s"doc $id absent from registry output yet has ${toks.length} tokens")
        case Some((nw, ns, _)) =>
          assert(nw == toks.length.toLong,
            s"doc $id word count: registry $nw vs direct ${toks.length}")
          assert(ns == nSub, s"doc $id subwords: registry $ns vs direct $nSub")
      }
    }
  }
}
