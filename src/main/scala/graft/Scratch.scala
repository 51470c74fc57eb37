package graft

/** Ad-hoc profiling main (dev tool; not part of the driver contract).
  * Edit locally to time suspect subtrees — see git history for the
  * lambda-capture investigation it was built for.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // Bench-protocol replica for a named subset: warm pass, artifact
    // rebuild as its own row, then per-query isolated-cold timings
    // with the fitted-stats artifact retained (exactly Bench.scala).
    if (args.headOption.contains("scale4")) {
      // smoke + time the forced above-gate artifact_scale_* builders
      operators.LimeOps.clearStatsCache()
      t("artifact_lime_stats")(operators.LimeOps.limeStatsFit(spark, sfDir).count())
      spark.catalog.clearCache()
      t("artifact_scale_rank")(operators.Relational.winNtilePctrankFrom(
        Tables.customer(spark, sfDir), scalePath = true).count())
      spark.catalog.clearCache()
      t("artifact_scale_pagerank")(operators.EventOps.pagerankGated(spark, sfDir, 0).count())
      spark.catalog.clearCache()
      t("artifact_scale_mmr")(operators.LlmData.qSimMmrScale(spark, sfDir).count())
      spark.catalog.clearCache()
      t("artifact_scale_splime")(operators.LimeOps.spLimePickGated(spark, sfDir, 0).count())
      spark.stop(); return
    }
    if (args.headOption.contains("pairsphase")) {
      import org.apache.spark.sql.functions._
      // warm the JVM on the full build once, then phase-time a second
      // cold build (artifact + caches cleared)
      operators.LlmData.dedupPairs(spark, sfDir).count()
      operators.LlmData.clearDedupArtifacts()
      spark.catalog.clearCache()
      val sh = t("sh_build+cache") {
        val x = operators.LlmData.shingled(spark, sfDir)
          .select(col("doc_id"), col("shingles"), size(col("shingles")).as("sz")).cache()
        x.count(); x
      }
      val tokens = t("tokens_explode+cache") {
        val x = sh.select(col("doc_id"), col("sz"), explode(col("shingles")).as("sh")).cache()
        x.count(); x
      }
      t("gate_agg_2countDistinct") {
        tokens.agg(countDistinct(col("sh")).as("v"),
          countDistinct(col("doc_id")).as("nd")).head()
      }
      t("vocab_distinct_count")(tokens.select("sh").distinct().count())
      spark.catalog.clearCache()
      operators.LlmData.clearDedupArtifacts()
      t("full_artifact_text_pairs")(operators.LlmData.dedupPairs(spark, sfDir).count())
      spark.catalog.clearCache()
      t("cold_q_dedup_contain")(SparkEntry.queries("q_dedup_contain")(spark, sfDir).count())
      spark.stop(); return
    }
    if (args.headOption.contains("zorder")) {
      import org.apache.spark.sql.functions._
      // warm once via the artifact, then A/B the write pipeline shapes
      operators.LayoutOps.zorderedLineitem(spark, sfDir).count()
      operators.LayoutOps.clearLayoutArtifacts()
      spark.catalog.clearCache()
      val li = Tables.lineitem(spark, sfDir)
        .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
      val shipUs = unix_micros(col("l_shipdate"))
      val mm = li.agg(min(shipUs).as("dlo"), max(shipUs).as("dhi"),
        min(col("l_extendedprice")).as("plo"), max(col("l_extendedprice")).as("phi"))
      def bucket(c: org.apache.spark.sql.Column, lo: org.apache.spark.sql.Column,
                 hi: org.apache.spark.sql.Column) =
        ((c - lo).cast("double") / greatest((hi - lo).cast("double"), lit(1.0)) *
          lit(65535.0)).cast("long")
      def zed = li.crossJoin(broadcast(mm))
        .withColumn("z", operators.LayoutOps.zValue(
          bucket(shipUs, col("dlo"), col("dhi")),
          bucket(col("l_extendedprice"), col("plo"), col("phi"))))
      def noop(df: org.apache.spark.sql.DataFrame) =
        df.write.format("noop").mode("overwrite").save()
      t("z_compute_noop")(noop(zed))
      t("z_rangepart_sort_noop")(noop(
        zed.repartitionByRange(16, col("z")).sortWithinPartitions("z")))
      t("z_hashbucket_sort_noop")(noop(
        zed.withColumn("zb", shiftright(col("z"), 28))
          .repartition(16, col("zb")).sortWithinPartitions("z")))
      t("z_rangepart_sort_write")(
        zed.repartitionByRange(16, col("z")).sortWithinPartitions("z")
          .drop("dlo", "dhi", "plo", "phi", "z")
          .write.mode("overwrite").parquet("/tmp/zab_range"))
      t("z_hashbucket_sort_write")(
        zed.withColumn("zb", shiftright(col("z"), 28))
          .repartition(16, col("zb")).sortWithinPartitions("z")
          .drop("dlo", "dhi", "plo", "phi", "z", "zb")
          .write.mode("overwrite").parquet("/tmp/zab_hash"))
      t("z_rangepart32_sort_write")(
        zed.repartitionByRange(32, col("z")).sortWithinPartitions("z")
          .drop("dlo", "dhi", "plo", "phi", "z")
          .write.mode("overwrite").parquet("/tmp/zab_range32"))
      spark.stop(); return
    }
    if (args.headOption.contains("cooccurab")) {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      def st0 = {
        val byTs = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val cum = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(spark, sfDir)
          .withColumn("prev_ts", lag(col("ts"), 1).over(byTs))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              unix_micros(col("ts")) - unix_micros(col("prev_ts")) >= 30L * 60 * 1000000, 1)
              .otherwise(0))
          .withColumn("session_id", sum(col("new_session")).over(cum))
          .select("user_id", "session_id", "event_type").distinct()
      }
      def joinShape = {
        val st = st0.cache()
        st.select(col("user_id"), col("session_id"), col("event_type").as("type_a"))
          .join(st.select(col("user_id"), col("session_id"), col("event_type").as("type_b")),
            Seq("user_id", "session_id"))
          .filter(col("type_a") < col("type_b"))
          .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_ab"))
      }
      def inrowShape = {
        val st = st0.cache()
        st.groupBy("user_id", "session_id")
          .agg(sort_array(collect_list(col("event_type"))).as("ts"))
          .filter(size(col("ts")) > 1)
          .select(explode(expr(
            "flatten(transform(ts, (a, i) -> transform(slice(ts, i + 2, size(ts)), b -> struct(a AS type_a, b AS type_b))))")).as("p"))
          .select(col("p.type_a"), col("p.type_b"))
          .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_ab"))
      }
      // warm both
      joinShape.count(); inrowShape.count()
      for (i <- 1 to 2) {
        spark.catalog.clearCache()
        t(s"join_shape_$i")(joinShape.count())
        spark.catalog.clearCache()
        t(s"inrow_shape_$i")(inrowShape.count())
      }
      spark.stop(); return
    }
    if (args.headOption.contains("wscg")) {
      // simple-mode plans: the *(n) markers prove the kernel projections
      // fuse into WholeStageCodegen now that doGenCode replaced the
      // CodegenFallback seam
      args.tail.foreach { n =>
        spark.catalog.clearCache()
        println(s"===== $n =====")
        SparkEntry.queries(n)(spark, sfDir).explain()
      }
      spark.stop(); return
    }
    if (args.headOption.contains("wordagg")) {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(spark, sfDir)
        .withColumn("norm_text", lower(trim(col("text"))))
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .select("doc_id", "source", "norm_text")
      val wordsExpr = "filter(split(norm_text, ' '), x -> x != '')"
      def noop(df: org.apache.spark.sql.DataFrame) =
        df.write.format("noop").mode("overwrite").save()
      // warm
      noop(docs.select(col("doc_id"), col("source"), explode(expr(wordsExpr)).as("w"))
        .groupBy("doc_id", "source", "w").count())
      for (i <- 1 to 2) {
        t(s"tokenize_only_$i")(noop(docs.select(size(expr(wordsExpr)).as("n"))))
        t(s"explode_agg_docword_$i")(noop(
          docs.select(col("doc_id"), col("source"), explode(expr(wordsExpr)).as("w"))
            .groupBy("doc_id", "source", "w").count()))
        t(s"explode_agg_word_$i")(noop(
          docs.select(explode(expr(wordsExpr)).as("w")).groupBy("w").count()))
      }
      spark.stop(); return
    }
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count() catch { case _: Throwable => () }
    }
    operators.LimeOps.clearStatsCache()
    spark.catalog.clearCache()
    t("artifact_lime_stats")(operators.LimeOps.limeStatsFit(spark, sfDir).count())
    names.foreach { n =>
      spark.catalog.clearCache()
      t(s"cold_$n")(SparkEntry.queries(n)(spark, sfDir).count())
    }
    spark.stop()
  }
}
