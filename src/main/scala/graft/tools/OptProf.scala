package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Dedup
import graft.functions.Text

/** Dev-only (round 17 optimization): per-stage timing of the heavy
  * query pipelines plus candidate plan variants, consumed through the
  * noop sink (guide §1.4 — every column of every row computed, no
  * count-prune, no sink cost). Run: `sbt "runMain graft.tools.OptProf <mode>"`.
  */
object OptProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", s"${2 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mode = if (args.nonEmpty) args(0) else "ngram"

    def sweep(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[T](name: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime(); val r = f
      println(f"[optprof] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.sparkContext.setJobDescription(null)
      r
    }
    // repeat-min: strip first-use codegen/JIT like Bench's min-of-runs
    def timeMin(name: String, runs: Int = 3)(f: => Unit): Unit = {
      val samples = (1 to runs).map { _ =>
        sweep()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[optprof] $name%-44s min ${samples.min}%8.3f s  med ${samples.sorted.apply(runs / 2)}%8.3f s")
    }

    mode match {
      case "ngram" =>
        val docs = Tables.documents(spark, sfDir)
        val shRaw0 = time("shingle relation (ckpt)") {
          docs.select(col("doc_id").as("id"),
            explode(Dedup.shingleSet(3)(Text.tokens(col("text")))).as("sh_str"))
            .select(col("id"), xxhash64(col("sh_str")).as("sh"))
            .localCheckpoint(eager = true)
        }
        println("  shRaw rows = " + time("shRaw count")(shRaw0.count()))
        val hot = shRaw0.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") > 1000L).select("sh")
        println("  hot rows = " + time("hot census")(hot.count()))
        val sh = time("anti-join + ckpt") {
          shRaw0.join(broadcast(hot), Seq("sh"), "left_anti")
            .localCheckpoint(eager = true)
        }
        val sizes = sh.groupBy("id").agg(count(lit(1)).as("set_size"))
        time("sizes noop")(noop(sizes))
        val common = sh.as("a").join(sh.as("b"), Seq("sh"))
          .filter(col("a.id") < col("b.id"))
          .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .agg(count(lit(1)).as("common"))
        time("self-join common noop")(noop(common))
        timeMin("q_dedup_ngram full")(noop(
          graft.Queries.q_dedup_ngram(spark, sfDir)))
        timeMin("q_dedup_cluster full")(noop(
          graft.Queries.q_dedup_cluster(spark, sfDir)))
        timeMin("q_containment full")(noop(
          graft.Queries.q_containment(spark, sfDir)))
      case "unpivot" =>
        timeMin("q_unpivot current")(noop(
          graft.Queries.q_unpivot(spark, sfDir)))
        // variant: global sort on the NARROW input, then stack in
        // alphabetical measure order — same rows, same global order,
        // sort carries 1/3 of the rows (guide §2.3 shuffle fewer bytes)
        timeMin("q_unpivot sort-then-stack") {
          noop(Tables.lineitem(spark, sfDir)
            .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
              col("l_extendedprice"), col("l_discount"))
            .orderBy("l_orderkey", "l_linenumber")
            .select(col("l_orderkey"), col("l_linenumber"),
              expr("""stack(3,
                'discount', round(l_discount, 4),
                'extendedprice', round(l_extendedprice, 2),
                'quantity', round(l_quantity, 2)) AS (measure, val)""")))
        }
      case "jaro" =>
        val p0 = Tables.part(spark, sfDir)
          .select(col("p_partkey"), col("p_name"), col("p_brand"))
        val p = time("part ckpt")(p0.localCheckpoint(eager = true))
        val names = p.select(col("p_brand"), col("p_name")).distinct()
        println("  distinct names = " + time("names distinct count")(names.count()))
        val scored = names.select(col("p_brand"), col("p_name").as("__n_a"))
          .join(names.select(col("p_brand"), col("p_name").as("__n_b")),
            Seq("p_brand"))
          .withColumn("jw", round(graft.functions.StringFns.jaroWinkler(
            col("__n_a"), col("__n_b")), 6))
          .filter(col("jw") > 0.8)
        timeMin("scored (names^2 jw) noop")(noop(scored))
        timeMin("q_jaro_match full")(noop(
          graft.Queries.q_jaro_match(spark, sfDir)))
      case "basket" =>
        timeMin("q_basket_affinity current")(noop(
          graft.Queries.q_basket_affinity(spark, sfDir)))
        // variant: per-order pair generation via groupBy+collect_list
        // (one exchange on ok) instead of the self-join (two exchange
        // sides + join)
        timeMin("basket collect_list variant") {
          val items = Tables.lineitem(spark, sfDir)
            .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
            .distinct()
            .localCheckpoint(eager = true)
          val nOrders = items.agg(countDistinct(col("ok")).as("n_orders"))
          val supp = items.groupBy("pk").agg(count(lit(1)).as("n_pk"))
          val pairs = items.groupBy("ok")
            .agg(sort_array(collect_list(col("pk"))).as("pks"))
            .select(explode(expr(
              """flatten(transform(pks, (x, i) ->
                   transform(slice(pks, i + 2, size(pks)), y ->
                     struct(x AS part_a, y AS part_b))))""")).as("pr"))
            .select(col("pr.part_a"), col("pr.part_b"))
            .groupBy("part_a", "part_b")
            .agg(count(lit(1)).as("n_both"))
            .filter(col("n_both") >= 3)
          noop(pairs
            .join(supp.select(col("pk").as("part_a"), col("n_pk").as("n_pk_a")), Seq("part_a"))
            .join(supp.select(col("pk").as("part_b"), col("n_pk").as("n_pk_b")), Seq("part_b"))
            .crossJoin(broadcast(nOrders))
            .select(col("part_a"), col("part_b"), col("n_both"),
              round(col("n_both").cast("double") * col("n_orders") /
                (col("n_pk_a") * col("n_pk_b")), 6).as("lift"))
            .orderBy(desc("lift"), col("part_a"), col("part_b")))
        }
      case "ids" =>
        // noop-timed run of specific ids passed after the mode
        args.drop(1).foreach { id =>
          val fn = graft.Queries.all.toMap.apply(id)
          timeMin(id)(noop(fn(spark, sfDir)))
        }
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
