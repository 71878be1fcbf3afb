package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Dedup

/** Dev-only: stage-level timing of the heavy sketch queries. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", s"${2 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // named-query mode: `runMain graft.tools.Prof q_x q_y` times just those
    if (args.nonEmpty) {
      val qs = graft.Queries.all.toMap
      args.foreach { id =>
        val q = qs.getOrElse(id, sys.error(s"unknown query id $id"))
        time(s"$id (warm)")(q(spark, sfDir).count())
        time(id)(q(spark, sfDir).count())
      }
      spark.stop(); return
    }
    val docs = Tables.documents(spark, sfDir)
    time("docs.count")(docs.count())
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
      .localCheckpoint(eager = true)
    time("signature table")(sigs.count())
    val pairs = Dedup.minhashCandidatePairs(sigs, "doc_id")
    time("candidate pairs")(println("  pairs=" + pairs.count()))
    time("q_dedup_minhash")(graft.Queries.q_dedup_minhash(spark, sfDir).count())
    time("q_dedup_ngram")(graft.Queries.q_dedup_ngram(spark, sfDir).count())
    time("q_similarity_lsh")(graft.Queries.q_similarity_lsh(spark, sfDir).count())
    time("q_dedup_embed")(graft.Queries.q_dedup_embed(spark, sfDir).count())
    time("q_similarity_topk")(graft.Queries.q_similarity_topk(spark, sfDir).count())
    time("q_dedup_simhash")(graft.Queries.q_dedup_simhash(spark, sfDir).count())
    spark.stop()
  }
}
