package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only ANN scale probe: MEASURES the IVF pruning claim at a
  * vector count far above the fixtures. Builds a deterministic
  * synthetic embedding table (`nVecs` × `dim` floats around `nLists`
  * LCG cluster centers), trains/writes the partitioned IVF index, then
  * times `nQueries` probe queries (`ivfTopKIndexed`, partition-pruned
  * to `nprobe` of `nLists` lists) and computes recall@k against the
  * brute-force cosine top-k on a query subsample. Prints ONE JSON
  * line: build seconds, mean query seconds, recall. Usage:
  * runMain graft.tools.AnnScale [nVecs] [dim] [nLists] [nprobe]
  *
  * PQ mode (`runMain graft.tools.AnnScale pq [nVecs] …`) measures the
  * FUSED IVF-PQ path (round 12): build the fused index, compare the
  * on-disk probe surface (codes/ vs vectors/ bytes — the memory-bounded
  * ADC claim), time fused queries (`ivfPqTopK`: pruned code scan →
  * bounded re-rank) against plain `ivfTopKIndexed`, and report both
  * recalls vs brute force.
  *
  * PQ-DRIFT mode (`runMain graft.tools.AnnScale pqdrift [nVecs] …`)
  * is the fused twin of DRIFT: base fused index → `ivfPqAppendIndex`
  * of the drifted 25% batch (codes refreshed for touched lists only) →
  * fused-recall at the drift modes through the stale index →
  * `ivfPqRetrainIndex` (fresh coarse centroids + codebooks + full
  * re-encode behind the `_next`/swap discipline) → fused recall again —
  * the measured evidence that the fused maintenance verbs keep the
  * codes/vectors mirror AND that fused retrain recovers recall.
  *
  * DRIFT mode (`runMain graft.tools.AnnScale drift [nVecs] …`) measures
  * the append-drift story instead: build the base index, append a 25%
  * batch of vectors around NEW centers (bisectors of adjacent base
  * centers — the worst case for stale centroids: every drifted vector
  * scatters into one of two old lists), then report recall at the drift
  * modes through the STALE index, after `ivfRetrainIndex`, and through a
  * FRESH build on the combined corpus — the measured evidence for the
  * `ivfNeedsRetrain` trigger and the recall-preservation law.
  */
object AnnScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val driftMode = args.headOption.contains("drift")
    val pqDriftMode = args.headOption.contains("pqdrift")
    val pqMode = !pqDriftMode && args.headOption.contains("pq")
    val rest = if (driftMode || pqMode || pqDriftMode) args.drop(1) else args
    if (driftMode) { driftProbe(rest, cpus); return }
    if (pqDriftMode) { pqDriftProbe(rest, cpus); return }
    if (pqMode) { pqProbe(rest, cpus); return }
    val nVecs = if (rest.nonEmpty) rest(0).toInt else 1000000
    val dim = if (rest.length > 1) rest(1).toInt else 64
    val nLists = if (rest.length > 2) rest(2).toInt else 256
    val nprobe = if (rest.length > 3) rest(3).toInt else 8
    val k = 10
    val nQueries = 50
    val recallSample = 10
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // deterministic synthetic embeddings: LCG unit-ish vectors around
    // nLists cluster centers (ANN structure without RNG dependencies)
    def lcgVec(seed: Long, n: Int, scale: Float): Array[Float] = {
      var x = seed
      Array.fill(n) {
        x = x * 6364136223846793005L + 1442695040888963407L
        (math.floorMod(x, 2001L) - 1000L) / 1000f * scale
      }
    }
    val centers = Array.tabulate(nLists)(c => lcgVec(c * 7919L + 17L, dim, 1f))
    val bcCenters = spark.sparkContext.broadcast(centers)
    val emb = spark.range(nVecs.toLong).select(col("id"))
      .mapPartitions { it =>
        it.map { row =>
          val id = row.getLong(0)
          val c = (id % bcCenters.value.length).toInt
          val noise = lcgVec(id * 31L + 5L, bcCenters.value(c).length, 0.15f)
          val v = bcCenters.value(c).zip(noise).map { case (a, b) => a + b }
          (id, v)
        }
      }.toDF("vec_id", "embedding").localCheckpoint(true)

    val dir = java.nio.file.Files.createTempDirectory("ann_scale_").toString
    val tb0 = System.nanoTime()
    val centroids = graft.operators.Similarity
      .ivfTrainDistributed(emb, "embedding", k = nLists, iters = 5)
    graft.operators.Similarity.ivfWriteIndex(emb, "embedding", centroids, dir)
    val buildSec = (System.nanoTime() - tb0) / 1e9

    val queries = Array.tabulate(nQueries) { q =>
      val c = q % nLists
      centers(c).zip(lcgVec(q * 131L + 7L, dim, 0.1f)).map { case (a, b) => a + b }
    }
    val tq0 = System.nanoTime()
    val annResults = queries.map { qv =>
      graft.operators.Similarity.ivfTopKIndexed(spark, dir, "vec_id",
        "embedding", qv, k, nprobe).select("vec_id").as[Long].collect().toSet
    }
    val querySec = (System.nanoTime() - tq0) / 1e9 / nQueries

    // brute-force recall on a subsample: one pass per probe over the
    // checkpointed table (the honest baseline the index must reproduce)
    var hit = 0; var tot = 0
    (0 until recallSample).foreach { qi =>
      val qv = queries(qi)
      val brute = emb.select(col("vec_id"),
          graft.functions.Vectors.cosineTo(col("embedding"), qv).as("sim"))
        .orderBy(desc("sim"), col("vec_id")).limit(k)
        .select("vec_id").as[Long].collect().toSet
      hit += (annResults(qi) & brute).size
      tot += brute.size
    }
    val recall = math.round(hit.toDouble / tot * 1000) / 1000.0
    println(s"""{"metric":"ann_scale","vecs":$nVecs,"dim":$dim,"lists":$nLists,"nprobe":$nprobe,"cpus":$cpus,"build_sec":${math.round(buildSec * 10) / 10.0},"query_sec":${math.round(querySec * 1000) / 1000.0},"recall_at_$k":$recall}""")
    spark.stop()
  }

  private def pqProbe(args: Array[String], cpus: String): Unit = {
    val nVecs = if (args.nonEmpty) args(0).toInt else 1000000
    val dim = if (args.length > 1) args(1).toInt else 64
    val nLists = if (args.length > 2) args(2).toInt else 256
    val nprobe = if (args.length > 3) args(3).toInt else 8
    val m = if (args.length > 4) args(4).toInt else 8
    val kSub = if (args.length > 5) args(5).toInt else 256
    val refine = if (args.length > 6) args(6).toInt else 8
    val k = 10
    val nQueries = 50
    val recallSample = 10
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def lcgVec(seed: Long, n: Int, scale: Float): Array[Float] = {
      var x = seed
      Array.fill(n) {
        x = x * 6364136223846793005L + 1442695040888963407L
        (math.floorMod(x, 2001L) - 1000L) / 1000f * scale
      }
    }
    val centers = Array.tabulate(nLists)(c => lcgVec(c * 7919L + 17L, dim, 1f))
    val bcCenters = spark.sparkContext.broadcast(centers)
    val emb = spark.range(nVecs.toLong).select(col("id"))
      .mapPartitions { it =>
        it.map { row =>
          val id = row.getLong(0)
          val c = (id % bcCenters.value.length).toInt
          val noise = lcgVec(id * 31L + 5L, bcCenters.value(c).length, 0.15f)
          (id, bcCenters.value(c).zip(noise).map { case (a, b) => a + b })
        }
      }.toDF("vec_id", "embedding").localCheckpoint(true)

    val dir = java.nio.file.Files.createTempDirectory("ann_pq_").toString + "/idx"
    val tb0 = System.nanoTime()
    val centroids = graft.operators.Similarity
      .ivfTrainDistributed(emb, "embedding", k = nLists, iters = 5)
    graft.operators.Similarity.ivfPqWriteIndex(emb, "vec_id", "embedding",
      centroids, dim, dir, m, kSub,
      sampleSize = math.max(1024, 64 * kSub))
    val buildSec = (System.nanoTime() - tb0) / 1e9

    // the probe-surface claim, in bytes: what an ADC scan reads (codes)
    // vs what a raw-vector probe reads (vectors) for the same lists
    def dirBytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(p))
    }
    val codeBytes = dirBytes(s"$dir/codes")
    val vecBytes = dirBytes(s"$dir/vectors")

    val queries = Array.tabulate(nQueries) { q =>
      val c = q % nLists
      centers(c).zip(lcgVec(q * 131L + 7L, dim, 0.1f)).map { case (a, b) => a + b }
    }
    val tq0 = System.nanoTime()
    val fusedResults = queries.map { qv =>
      graft.operators.Similarity.ivfPqTopK(spark, dir, "vec_id", "embedding",
        qv, k, nprobe, refine).select("vec_id").as[Long].collect().toSet
    }
    val fusedSec = (System.nanoTime() - tq0) / 1e9 / nQueries
    val tp0 = System.nanoTime()
    val plainResults = queries.map { qv =>
      graft.operators.Similarity.ivfTopKIndexed(spark, dir, "vec_id",
        "embedding", qv, k, nprobe).select("vec_id").as[Long].collect().toSet
    }
    val plainSec = (System.nanoTime() - tp0) / 1e9 / nQueries

    // the r14 storage-locality gate: local vectors → the auto path must
    // take the warm (probe-once exact) route and cost ~plain, not fused
    val probedBytes = graft.operators.Similarity
      .probedVectorBytes(spark, dir, queries(0), nprobe)
    val ta0 = System.nanoTime()
    val autoResults = queries.map { qv =>
      graft.operators.Similarity.ivfPqTopKAuto(spark, dir, "vec_id",
        "embedding", qv, k, nprobe, refine)
        .select("vec_id").as[Long].collect().toSet
    }
    val autoSec = (System.nanoTime() - ta0) / 1e9 / nQueries
    val autoWarm = probedBytes <= (256L << 20)
    val autoAgrees =
      if (autoWarm) autoResults.sameElements(plainResults)
      else autoResults.sameElements(fusedResults)

    var fhit = 0; var phit = 0; var tot = 0
    (0 until recallSample).foreach { qi =>
      val qv = queries(qi)
      val brute = emb.select(col("vec_id"),
          graft.functions.Vectors.cosineTo(col("embedding"), qv).as("sim"))
        .orderBy(desc("sim"), col("vec_id")).limit(k)
        .select("vec_id").as[Long].collect().toSet
      fhit += (fusedResults(qi) & brute).size
      phit += (plainResults(qi) & brute).size
      tot += brute.size
    }
    def r3(x: Double): Double = math.round(x * 1000) / 1000.0
    println(s"""{"metric":"ann_pq","vecs":$nVecs,"dim":$dim,"lists":$nLists,"nprobe":$nprobe,"m":$m,"k_sub":$kSub,"refine":$refine,"cpus":$cpus,"build_sec":${math.round(buildSec * 10) / 10.0},"code_bytes":$codeBytes,"vector_bytes":$vecBytes,"probe_surface_cut":${r3(vecBytes.toDouble / codeBytes)},"fused_query_sec":${r3(fusedSec)},"plain_query_sec":${r3(plainSec)},"auto_query_sec":${r3(autoSec)},"auto_route":"${if (autoWarm) "warm" else "cold"}","probed_vector_bytes":$probedBytes,"auto_agrees_with_route":$autoAgrees,"recall_fused_at_$k":${r3(fhit.toDouble / tot)},"recall_plain_at_$k":${r3(phit.toDouble / tot)}}""")
    spark.stop()
  }

  private def pqDriftProbe(args: Array[String], cpus: String): Unit = {
    val nVecs = if (args.nonEmpty) args(0).toInt else 1000000
    val dim = if (args.length > 1) args(1).toInt else 64
    val nLists = if (args.length > 2) args(2).toInt else 256
    val nprobe = if (args.length > 3) args(3).toInt else 8
    val m = if (args.length > 4) args(4).toInt else 8
    val kSub = if (args.length > 5) args(5).toInt else 256
    val refine = if (args.length > 6) args(6).toInt else 8
    val k = 10
    val recallSample = 10
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def lcgVec(seed: Long, n: Int, scale: Float): Array[Float] = {
      var x = seed
      Array.fill(n) {
        x = x * 6364136223846793005L + 1442695040888963407L
        (math.floorMod(x, 2001L) - 1000L) / 1000f * scale
      }
    }
    val centers = Array.tabulate(nLists)(c => lcgVec(c * 7919L + 17L, dim, 1f))
    val driftCenters = Array.tabulate(nLists)(c =>
      centers(c).zip(centers((c + 1) % nLists)).map { case (a, b) => (a + b) / 2 })
    val bcC = spark.sparkContext.broadcast(centers)
    val bcD = spark.sparkContext.broadcast(driftCenters)
    def table(n: Int, idOffset: Long, bc: org.apache.spark.broadcast.Broadcast[Array[Array[Float]]]) =
      spark.range(n.toLong).select(col("id")).mapPartitions { it =>
        it.map { row =>
          val id = row.getLong(0)
          val c = (id % bc.value.length).toInt
          val noise = lcgVec(id * 31L + 5L, bc.value(c).length, 0.15f)
          (id + idOffset, bc.value(c).zip(noise).map { case (a, b) => a + b })
        }
      }.toDF("vec_id", "embedding")
    val emb = table(nVecs, 0L, bcC).localCheckpoint(true)
    val drift = table(nVecs / 4, nVecs.toLong, bcD).localCheckpoint(true)
    val full = emb.unionByName(drift).localCheckpoint(true)

    val dir = java.nio.file.Files.createTempDirectory("ann_pqdrift_").toString + "/idx"
    val centroids = graft.operators.Similarity
      .ivfTrainDistributed(emb, "embedding", k = nLists, iters = 5)
    graft.operators.Similarity.ivfPqWriteIndex(emb, "vec_id", "embedding",
      centroids, dim, dir, m, kSub, sampleSize = math.max(1024, 64 * kSub))
    val ta0 = System.nanoTime()
    graft.operators.Similarity.ivfPqAppendIndex(drift, "vec_id", "embedding", dir)
    val appendSec = (System.nanoTime() - ta0) / 1e9
    val triggered = graft.operators.Similarity.ivfNeedsRetrain(spark, dir, 1.5)

    val queries = Array.tabulate(recallSample) { q =>
      driftCenters(q % nLists).zip(lcgVec(q * 131L + 7L, dim, 0.1f))
        .map { case (a, b) => a + b }
    }
    // brute-force reference per query, computed ONCE and reused across
    // the stale reading, the retrained reading and the whole ladder
    val brute: Array[Set[Long]] = queries.map { qv =>
      full.select(col("vec_id"),
          graft.functions.Vectors.cosineTo(col("embedding"), qv).as("sim"))
        .orderBy(desc("sim"), col("vec_id")).limit(k)
        .select("vec_id").as[Long].collect().toSet
    }
    def fusedRecall(np: Int, rf: Int): Double = {
      var hit = 0; var tot = 0
      queries.zipWithIndex.foreach { case (qv, qi) =>
        val ann = graft.operators.Similarity.ivfPqTopK(spark, dir,
          "vec_id", "embedding", qv, k, np, rf)
          .select("vec_id").as[Long].collect().toSet
        hit += (ann & brute(qi)).size; tot += brute(qi).size
      }
      math.round(hit.toDouble / tot * 1000) / 1000.0
    }
    val staleRecall = fusedRecall(nprobe, refine)
    val tr0 = System.nanoTime()
    graft.operators.Similarity.ivfPqRetrainIndex(spark, dir, "vec_id",
      "embedding", k = nLists + nLists / 4, dim = dim, m = m, kSub = kSub,
      iters = 5)
    val retrainSec = (System.nanoTime() - tr0) / 1e9
    val retrainedRecall = fusedRecall(nprobe, refine)
    // the post-retrain LEVER LADDER (VERDICT r13 #4): recall at the
    // widened list count as nprobe/refine scale — the measured curve
    // behind the verb's documented defaults
    val ladder = (for (np <- Seq(nprobe, nprobe * 2, nprobe * 4, nprobe * 8);
                       rf <- Seq(refine, refine * 4))
      yield s""""np${np}_rf$rf":${fusedRecall(np, rf)}""").mkString(",")
    println(s"""{"metric":"ann_pq_drift","vecs":$nVecs,"drift_vecs":${nVecs / 4},"dim":$dim,"lists":$nLists,"nprobe":$nprobe,"m":$m,"k_sub":$kSub,"refine":$refine,"cpus":$cpus,"append_sec":${math.round(appendSec * 10) / 10.0},"retrain_sec":${math.round(retrainSec * 10) / 10.0},"trigger_fired_at_1.5":$triggered,"recall_fused_stale":$staleRecall,"recall_fused_retrained":$retrainedRecall,"retrained_ladder":{$ladder}}""")
    spark.stop()
  }

  private def driftProbe(args: Array[String], cpus: String): Unit = {
    val nVecs = if (args.nonEmpty) args(0).toInt else 1000000
    val dim = if (args.length > 1) args(1).toInt else 64
    val nLists = if (args.length > 2) args(2).toInt else 256
    val nprobe = if (args.length > 3) args(3).toInt else 8
    val k = 10
    val recallSample = 10
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def lcgVec(seed: Long, n: Int, scale: Float): Array[Float] = {
      var x = seed
      Array.fill(n) {
        x = x * 6364136223846793005L + 1442695040888963407L
        (math.floorMod(x, 2001L) - 1000L) / 1000f * scale
      }
    }
    val centers = Array.tabulate(nLists)(c => lcgVec(c * 7919L + 17L, dim, 1f))
    // drift centers: bisectors of adjacent base centers — every drifted
    // vector lands in one of TWO stale lists, noise deciding which
    val driftCenters = Array.tabulate(nLists)(c =>
      centers(c).zip(centers((c + 1) % nLists)).map { case (a, b) => (a + b) / 2 })
    val bcC = spark.sparkContext.broadcast(centers)
    val bcD = spark.sparkContext.broadcast(driftCenters)
    def table(n: Int, idOffset: Long, bc: org.apache.spark.broadcast.Broadcast[Array[Array[Float]]]) =
      spark.range(n.toLong).select(col("id")).mapPartitions { it =>
        it.map { row =>
          val id = row.getLong(0)
          val c = (id % bc.value.length).toInt
          val noise = lcgVec(id * 31L + 5L, bc.value(c).length, 0.15f)
          (id + idOffset, bc.value(c).zip(noise).map { case (a, b) => a + b })
        }
      }.toDF("vec_id", "embedding")
    val emb = table(nVecs, 0L, bcC).localCheckpoint(true)
    val drift = table(nVecs / 4, nVecs.toLong, bcD).localCheckpoint(true)
    val full = emb.unionByName(drift).localCheckpoint(true)

    val dir = java.nio.file.Files.createTempDirectory("ann_drift_").toString + "/idx"
    val centroids = graft.operators.Similarity
      .ivfTrainDistributed(emb, "embedding", k = nLists, iters = 5)
    graft.operators.Similarity.ivfWriteIndex(emb, "embedding", centroids, dir)
    val ta0 = System.nanoTime()
    graft.operators.Similarity.ivfAppendIndex(drift, "vec_id", "embedding", dir)
    val appendSec = (System.nanoTime() - ta0) / 1e9
    val sizes = graft.operators.Similarity.ivfListSizes(spark, dir)
      .select("n").as[Long].collect()
    val skew = sizes.max.toDouble / (sizes.sum.toDouble / sizes.length)
    val triggered = graft.operators.Similarity.ivfNeedsRetrain(spark, dir, 1.5)

    val queries = Array.tabulate(recallSample) { q =>
      driftCenters(q % nLists).zip(lcgVec(q * 131L + 7L, dim, 0.1f))
        .map { case (a, b) => a + b }
    }
    def recall(idxDir: String): Double = {
      var hit = 0; var tot = 0
      queries.foreach { qv =>
        val ann = graft.operators.Similarity.ivfTopKIndexed(spark, idxDir,
          "vec_id", "embedding", qv, k, nprobe)
          .select("vec_id").as[Long].collect().toSet
        val brute = full.select(col("vec_id"),
            graft.functions.Vectors.cosineTo(col("embedding"), qv).as("sim"))
          .orderBy(desc("sim"), col("vec_id")).limit(k)
          .select("vec_id").as[Long].collect().toSet
        hit += (ann & brute).size; tot += brute.size
      }
      math.round(hit.toDouble / tot * 1000) / 1000.0
    }
    val staleRecall = recall(dir)
    val tr0 = System.nanoTime()
    graft.operators.Similarity.ivfRetrainIndex(spark, dir, "embedding",
      k = nLists + nLists / 4, iters = 5)
    val retrainSec = (System.nanoTime() - tr0) / 1e9
    val retrainedRecall = recall(dir)
    val freshDir = java.nio.file.Files.createTempDirectory("ann_fresh_").toString + "/idx"
    val freshCents = graft.operators.Similarity
      .ivfTrainDistributed(full, "embedding", k = nLists + nLists / 4, iters = 5)
    graft.operators.Similarity.ivfWriteIndex(full, "embedding", freshCents, freshDir)
    val freshRecall = recall(freshDir)
    println(s"""{"metric":"ann_drift","vecs":$nVecs,"drift_vecs":${nVecs / 4},"dim":$dim,"lists":$nLists,"nprobe":$nprobe,"cpus":$cpus,"append_sec":${math.round(appendSec * 10) / 10.0},"retrain_sec":${math.round(retrainSec * 10) / 10.0},"skew_max_over_mean":${math.round(skew * 100) / 100.0},"trigger_fired_at_1.5":$triggered,"recall_stale":$staleRecall,"recall_retrained":$retrainedRecall,"recall_fresh":$freshRecall}""")
    spark.stop()
  }
}
