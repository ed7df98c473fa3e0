package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._

/** Dev main for round-19 optimization experiments: times isolated pieces
  * of the hot queries so each fix targets the measured cost, not a guess.
  * Not part of the driver contract.
  */
object DevR19 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = if (args.length > 1) args.tail.toSet else Set.empty[String]
    def on(k: String) = what.isEmpty || what.contains(k)
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      // match Bench's session (byte-targeted AQE coalescing)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      println(f"[r19] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.setJobDescription(null)
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // session warmup (codegen, shuffle machinery)
    spark.range(1000000).selectExpr("sum(id)").collect()

    if (on("q352plan")) {
      spark.sparkContext.setLogLevel("WARN")
      val li = Tables.lineitem(spark, dir)
      val z = li.withColumn("tie",
        col("l_orderkey") * 10 + col("l_linenumber"))
        .select(col("l_partkey"), col("l_suppkey"), col("tie"))
      val h = Layout.hilbertValue(z, "l_partkey", "l_suppkey", 16)
      println(h.queryExecution.executedPlan.toString.take(4000))
      time("hilbertValue noop")(noop(h))
      spark.sparkContext.setLogLevel("ERROR")
    }

    if (on("q352bits")) {
      val li = Tables.lineitem(spark, dir)
      val z = li.withColumn("tie",
        col("l_orderkey") * 10 + col("l_linenumber"))
        .select(col("l_partkey"), col("l_suppkey"), col("tie"))
      for (b <- Seq(2, 4, 8, 12, 16)) {
        val h = Layout.hilbertValue(
          z.select((col("l_partkey") % (1L << b)).as("x"),
            (col("l_suppkey") % (1L << b)).as("y"), col("tie")),
          "x", "y", b)
        time(s"hilbertValue bits=$b noop")(noop(h))
      }
    }

    if (on("q352")) {
      val li = Tables.lineitem(spark, dir)
      time("lineitem count")(li.count())
      val z = li.withColumn("tie",
        col("l_orderkey") * 10 + col("l_linenumber"))
        .select(col("l_partkey"), col("l_suppkey"), col("tie"))
      time("base projection noop")(noop(z))
      val h = Layout.hilbertValue(z, "l_partkey", "l_suppkey", 16)
      time("hilbertValue noop (1st)")(noop(h))
      time("hilbertValue noop (2nd)")(noop(h))
      val (ranked, total) =
        Layout.shardedRanksWithTotal(h, Seq("hval", "tie"))
      time("shardedRanks ranked noop")(noop(ranked))
      println(s"[r19] total=$total")
      time("q352 full (1st)")(
        SparkEntry.queries("q352_hilbert_census")(spark, dir).count())
      spark.catalog.clearCache()
      time("q352 full (2nd)")(
        SparkEntry.queries("q352_hilbert_census")(spark, dir).count())
      spark.catalog.clearCache()
    }

    if (on("q388parts")) {
      Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_v388")
      val e = spark.sql("""WITH li AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem_v388),
        px AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2)
        SELECT pa AS src, pb AS dst FROM px
        UNION SELECT pb, pa FROM px""")
        .persist()
      time("e count")(println("[r19] edges=" + e.count()))
      e.createOrReplaceTempView("e_v388")
      time("recursion only")(spark.sql("""WITH RECURSIVE
        seeds AS (SELECT DISTINCT src AS seed FROM e_v388 WHERE src < 10),
        bfs AS (
          SELECT seed, seed AS node, 0 AS hop FROM seeds
          UNION ALL
          SELECT b.seed, e.dst, b.hop + 1 FROM bfs b
            JOIN e_v388 e ON e.src = b.node
          WHERE b.hop < 3),
        mh AS (SELECT seed, node, min(hop) AS hop
          FROM bfs GROUP BY 1, 2)
        SELECT seed, CAST(hop AS BIGINT) AS hop, count(*) AS n_nodes
        FROM mh GROUP BY 1, 2 ORDER BY 1, 2""").count())
      e.unpersist()
    }

    if (on("q388")) {
      time("q388 full (1st)")(
        SparkEntry.queries("q388_recursive_reach")(spark, dir).count())
      spark.catalog.clearCache()
      time("q388 full (2nd)")(
        SparkEntry.queries("q388_recursive_reach")(spark, dir).count())
      spark.catalog.clearCache()
    }

    if (on("q375")) {
      val docs = Tables.documents(spark, dir)
      def res(r: Int) =
        docs.filter(col("doc_id") % 3 === r).select("doc_id")
      time("neardupIndexBuild")(
        Dedup.neardupIndexBuild(docs, res(0), "q375_neardup_index"))
      time("neardupIndexAppend")(
        Dedup.neardupIndexAppend(docs, res(1), "q375_neardup_index"))
      time("jaccardAgainstIndex count")(
        Dedup.jaccardAgainstIndex(docs, res(2), "q375_neardup_index")
          .count())
      spark.catalog.clearCache()
      time("q375 full (2nd)")(
        SparkEntry.queries("q375_neardup_index_refresh")(spark, dir).count())
      spark.catalog.clearCache()
    }

    if (on("q381")) {
      val emb = Similarity.clusteredEmbeddings(Tables.embeddings(spark, dir))
      def res(r: Int) =
        emb.filter(col("vec_id") % 3 === r).select("vec_id")
      time("ivfIndexBuild")(
        Similarity.ivfIndexBuild(emb, res(0), "q381_ivf_index"))
      time("ivfIndexAppend")(
        Similarity.ivfIndexAppend(emb, res(1), "q381_ivf_index"))
      spark.catalog.clearCache()
      time("q381 full (2nd)")(
        SparkEntry.queries("q381_ann_index_lifecycle")(spark, dir).count())
      spark.catalog.clearCache()
    }

    if (on("q375parts")) {
      val docs = Tables.documents(spark, dir)
      val hist = docs.filter(col("doc_id") % 3 === 0).select("doc_id")
      val sets = Dedup.shingleSets(
          docs.join(hist, Seq("doc_id"), "left_semi"), 3)
        .filter(size(col("shingles")) > 0)
      time("sets noop")(noop(sets))
      val cached = sets.persist()
      time("sets persist count")(cached.count())
      val items = cached.select(col("doc_id"),
        explode(col("shingles")).as("item"))
      val sizes = cached.select(col("doc_id"),
        size(col("shingles")).cast("long").as("__sz"))
      val dfc = items.groupBy("item").agg(count(lit(1)).as("__df"))
      time("dfc noop")(noop(dfc))
      time("writeBucketed dfc")(
        Bucketing.writeBucketed(dfc, "t_dfc", "item", 8))
      val frozen = spark.table("t_dfc")
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("__df0"), col("item"))
      val prefix = items.join(frozen, Seq("item"), "left")
        .withColumn("__df0", coalesce(col("__df"), lit(0L)))
        .withColumn("__pos",
          org.apache.spark.sql.functions.row_number().over(wDoc))
        .join(sizes, "doc_id")
        .filter(col("__pos") <=
          col("__sz") - expr("(200L * __sz + 999L) div 1000L") + 1)
        .select(col("doc_id"), col("item"))
      time("prefix noop")(noop(prefix))
      time("writeBucketed prefix")(
        Bucketing.writeBucketed(prefix, "t_prefix", "item", 8))
      cached.unpersist()
    }

    if (on("q381fit")) {
      graft.functions.GraftFunctions.register(spark)
      val e = Similarity.clusteredEmbeddings(Tables.embeddings(spark, dir))
      val hist = e
        .join(e.filter(col("vec_id") % 3 === 0).select("vec_id"),
          Seq("vec_id"), "left_semi")
        .select(col("vec_id").as("n_id"),
          Similarity.asDouble(col("embedding")).as("n_emb"))
        .persist()
      println("[r19] hist n=" + hist.count() +
        " parts=" + hist.rdd.getNumPartitions)
      val t0 = System.nanoTime()
      val init = graft.ml.KMeansVec.initFarthest(hist, "n_id", "n_emb",
        8, 42L)
      println(f"[r19] initFarthest: ${(System.nanoTime()-t0)/1e9}%.2f s")
      val t1 = System.nanoTime()
      val model = graft.ml.KMeansVec.fit(hist, "n_emb", 8, 42L,
        maxIter = 10, idCol = "n_id", farthestInit = true)
      println(f"[r19] fit total: ${(System.nanoTime()-t1)/1e9}%.2f s " +
        s"iters=${model.iterations}")
      hist.unpersist()
    }

    if (on("q264parts")) {
      val orders = Tables.orders(spark, dir)
      val li = Tables.lineitem(spark, dir)
      val cp = orders.select(col("o_orderkey"), col("o_custkey"))
        .join(li.select(col("l_orderkey"), col("l_partkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
        .distinct()
      time("cp noop")(noop(cp))
      val cpC = cp.persist()
      time("cp persist count")(println("[r19] cp=" + cpC.count()))
      val dfc = cpC.groupBy("part").agg(count(lit(1)).as("__df"))
      time("dfc collect-ish noop")(noop(dfc))
      cpC.unpersist()
      spark.catalog.clearCache()
      time("q264 full")(
        SparkEntry.queries("q264_customer_overlap")(spark, dir).count())
      spark.catalog.clearCache()
      time("q273 full")(
        SparkEntry.queries("q273_overlap_quantile_cap")(spark, dir).count())
      spark.catalog.clearCache()
    }

    if (on("q302sizes")) {
      graft.functions.GraftFunctions.register(spark)
      val docs = Tables.documents(spark, dir)
      val postings = docs.select(col("source"),
          explode(graft.functions.GraftFunctions.shingles(
            col("text"), 2)).as("word"))
        .distinct().persist()
      time("postings count (kernel)")(
        println("[r19] postings=" + postings.count()))
      var sel = postings.select("source").filter(lit(false))
      var cov = postings.select("word").filter(lit(false))
      for (step <- 1 to 5) {
        val gains = postings
          .join(sel, Seq("source"), "left_anti")
          .join(cov, Seq("word"), "left_anti")
          .groupBy("source").agg(count(lit(1)).as("gain"))
        val pick = gains
          .agg(min(struct((-col("gain")).as("ng"), col("source"))).as("m"))
          .filter(col("m").isNotNull)
          .select(col("m.source").as("source"))
          .persist()
        time(s"step $step pick")(pick.count())
        sel = sel.unionByName(pick)
        cov = cov.unionByName(
          postings.join(pick, Seq("source")).select("word"))
      }
      postings.unpersist()
    }

    if (on("q302")) {
      time("q302 full (1st)")(
        SparkEntry.queries("q302_greedy_source_cover")(spark, dir).count())
      spark.catalog.clearCache()
      time("q302 full (2nd)")(
        SparkEntry.queries("q302_greedy_source_cover")(spark, dir).count())
      spark.catalog.clearCache()
    }

    spark.stop()
  }
}
