package graft

import graft.operators.ScaleOps
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("saltedJoin matches the plain join on a skewed key") {
    val events = Tables.events(spark, dir).select("event_id", "user_id", "event_type")
    val users = events.groupBy("user_id").agg(count(lit(1)).as("user_events"))
    val plain = events.join(users, "user_id")
      .select("event_id", "user_events").orderBy("event_id").collect()
    val salted = ScaleOps.saltedJoin(events, users, "user_id", 8)
      .select("event_id", "user_events").orderBy("event_id").collect()
    assert(salted.length == plain.length)
    assert(salted.map(_.toString).toSeq == plain.map(_.toString).toSeq)
  }

  test("thetaRangeSalted: hot-key self-join matches unsalted, spreads the hot key") {
    val s = spark
    import s.implicits._
    // synthetic skew: user 1 owns 300 of 420 events (every theta-join
    // partition strategy that hashes only user_id puts all 300 in ONE
    // task); 1-minute spacing keeps the 5-min range condition selective
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val hot = (0 until 300).map(i => (i.toLong, 1L, new java.sql.Timestamp(base + i * 60000L)))
    val cold = (0 until 120).map(i => (1000L + i, 2L + (i % 40), new java.sql.Timestamp(base + i * 90000L)))
    val e = (hot ++ cold).toDF("event_id", "user_id", "ts")
    val salts = 8
    // unsalted reference via the same predicate, inline (qJoinThetaRange reads parquet)
    val a = e.select(col("event_id").as("a_id"), col("user_id").as("a_user"), col("ts").as("a_ts"))
    val b = e.select(col("event_id").as("b_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
    val unsalted = a.join(b, col("a_user") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 5 MINUTES"))
      .select(col("a_id"), col("b_id"),
        (unix_micros(col("b_ts")) - unix_micros(col("a_ts"))).as("gap_us"))
      .collect().map(_.toString).sorted.toSeq
    val salted = graft.operators.Relational.thetaRangeSalted(e, salts)
      .collect().map(_.toString).sorted.toSeq
    assert(unsalted.nonEmpty && salted == unsalted,
      s"salted result diverged (${salted.length} vs ${unsalted.length} rows)")
    // bounded partitions: the hot key's left side now hashes across
    // (user, salt) sub-keys — no sub-key holds more than ~2× the fair
    // 1/salts share, so no task rebuilds the whole hot key
    val spread = e.filter(col("user_id") === 1)
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(salts)).cast("int"))
      .groupBy("salt").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(spread.size == salts, s"hot key only reached ${spread.size}/$salts salts")
    val fair = 300.0 / salts
    assert(spread.values.max <= (2 * fair).ceil.toLong,
      s"salted sub-key still skewed: $spread")
  }

  test("saltedCount matches groupBy count") {
    val events = Tables.events(spark, dir)
    val plain = events.groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .orderBy("user_id").collect()
    val salted = ScaleOps.saltedCount(events, "user_id", 8)
      .orderBy("user_id").collect()
    assert(salted.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      plain.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("date-partitioned writes are partition-pruned on read") {
    val s = spark
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString + "/events_by_day"
    Tables.events(s, dir)
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(out)
    val oneDay = s.read.parquet(out).filter(col("day") === "2024-01-02")
    val scan = oneDay.queryExecution.executedPlan.collectLeaves().head.toString
    // the day predicate must land in PartitionFilters (pruning whole
    // directories), not in the row-level data filters
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1").contains("day"),
      s"day filter not pushed to partition pruning:\n$scan")
    val expected = Tables.events(s, dir)
      .filter(to_date(col("ts")) === "2024-01-02").count()
    assert(oneDay.count() == expected)
  }

  test("writePartitioned: one file per partition dir, rows sorted within") {
    val s = spark
    val out = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/events_by_type"
    ScaleOps.writePartitioned(
      Tables.events(s, dir).select("event_id", "ts", "user_id", "event_type"),
      out, "event_type", Seq("user_id", "ts"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
    assert(dirs.nonEmpty)
    // compaction: each hive partition holds exactly one data file
    // (one task per partition, under maxRecordsPerFile)
    dirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files")
    }
    val back = s.read.parquet(out)
    assert(back.count() == Tables.events(s, dir).count())
    // within-file sort supports row-group min/max pruning downstream
    val one = back.filter(col("event_type") === "click").select("user_id").collect().map(_.getLong(0))
    assert(one.sameElements(one.sorted))
  }

  test("bucketed co-located join runs without a shuffle exchange") {
    val s = spark
    val orders = Tables.orders(s, dir).select("o_orderkey", "o_totalprice")
    val lineitem = Tables.lineitem(s, dir).select("l_orderkey", "l_quantity")
    s.sql("DROP TABLE IF EXISTS b_orders")
    s.sql("DROP TABLE IF EXISTS b_lineitem")
    // each JVM gets a fresh in-memory catalog, so orphaned warehouse
    // dirs from a previous run must go too
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("b_orders")
    lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("b_lineitem")
    // disable broadcast so the join must pick a shuffle-free SMJ on
    // the matching bucket layout
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table("b_orders")
        .join(s.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == lineitem.count())
      // a same-key aggregate above the bucketed join also needs no
      // exchange, and results match the plain parquet join
      val bucketedAgg = s.table("b_lineitem")
        .join(s.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("qty"), max(col("o_totalprice")).as("top"))
      val aggPlan = bucketedAgg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"same-key aggregate over bucketed join still shuffles:\n$aggPlan")
      val plain = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("qty"), max(col("o_totalprice")).as("top"))
      assert(bucketedAgg.orderBy("l_orderkey").collect().map(_.toString).toSeq ==
        plain.orderBy("l_orderkey").collect().map(_.toString).toSeq)
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  // ===== forced-scale runs: the distributed/banded branches the
  // fixture gates never take, exercised at non-toy size every build
  // (round-4 verdict item 4) =====

  test("distributed connected components at 100k+ edges (forced zero driver budget)") {
    import graft.operators.LlmData
    val s = spark
    // 100k disjoint 2-node components (ids 2i—2i+1) plus one 256-node
    // chain (diameter 255 — the shape that needs pointer halving's
    // O(log d) rounds; naive propagation would take 255).
    val pairEdges = s.range(100000)
      .select((col("id") * 2).as("a_id"), (col("id") * 2 + 1).as("b_id"))
    val chainBase = 1000000L
    val chainEdges = s.range(255)
      .select((col("id") + chainBase).as("a_id"), (col("id") + chainBase + 1).as("b_id"))
    val edges = pairEdges.unionByName(chainEdges)
    val t0 = System.nanoTime()
    val out = LlmData.clusterPairs(edges, s, driverEdgeMax = 0).cache()
    val n = out.count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"distributed closure over ${100255} edges: $n vertices in $secs%.1f s")
    assert(n == 200256L)
    // every pair vertex landed in its own even-rooted 2-cluster...
    val badPairs = out.filter(col("doc_id") < 2 * 100000)
      .filter(col("cluster_id") =!= col("doc_id") - pmod(col("doc_id"), lit(2)) ||
        col("cluster_size") =!= 2)
      .count()
    assert(badPairs == 0, s"$badPairs pair vertices mis-clustered")
    // ...and the whole chain collapsed to its min label
    val chain = out.filter(col("doc_id") >= chainBase)
    assert(chain.filter(col("cluster_id") =!= chainBase || col("cluster_size") =!= 256)
      .count() == 0, "chain component mis-clustered")
    out.unpersist()
    assert(secs < 180, f"distributed closure too slow: $secs%.1f s")
  }

  test("LSH-banded embed path above the exact gate: 40k vectors, planted near-dups") {
    import graft.operators.LlmData
    val s = spark
    import s.implicits._
    // 40k (> EmbExactGate) deterministic gaussian vectors; ids < 2000
    // pair up as (base, base + 3% noise) — cosine ≈ 0.9995, squarely
    // in the production near-dup regime the τ=0.9 derivation serves.
    val nVecs = 40000
    val emb = s.range(nVecs).as[Long].mapPartitions(_.map { id =>
      val isDup = id < 2000 && id % 2 == 1
      val baseId = if (isDup) id - 1 else id
      val rnd = new java.util.Random(0xC0FFEE ^ baseId)
      val v = Array.fill(64)(rnd.nextGaussian())
      if (isDup) {
        val nr = new java.util.Random(0xBEEF ^ id)
        var i = 0
        while (i < 64) { v(i) += 0.03 * nr.nextGaussian(); i += 1 }
      }
      (id, v)
    }).toDF("vec_id", "v")
      .withColumn("nrm", sqrt(graft.functions.VectorExprs.dotF64(col("v"), col("v"))))
    val tables = LlmData.lshTablesFor(0.9, LlmData.EmbScaleBits, LlmData.EmbLshRecallTarget)
    val t0 = System.nanoTime()
    val found = LlmData.embNearDupLsh(emb, 0.9, LlmData.EmbScaleBits, tables.toInt, LlmData.EmbLshSeed)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"banded path over $nVecs vectors, $tables tables: ${found.size} pairs in $secs%.1f s")
    // miss probability per planted pair ≈ (1-p¹⁶)^36 ≈ 1e-31 at
    // cosine 0.9995 — all 1000 must surface
    val planted = (0 until 1000).map(i => (2L * i, 2L * i + 1)).toSet
    val missed = planted.diff(found)
    assert(missed.isEmpty, s"missed ${missed.size} planted near-identical pairs")
    assert(secs < 180, f"banded path too slow: $secs%.1f s")
  }

  test("banded text pair path above the exact gate: 50k docs, output equals exact") {
    import graft.operators.LlmData
    val s = spark
    import s.implicits._
    // 50k synthetic shingle sets; doc pairs (2i, 2i+1) for i < 1000
    // share 30 of their 32 shingles — Jaccard 30/34 ≈ 0.882, squarely
    // the near-dup regime. All other vocab is per-doc-unique, so the
    // EXACT pair set is precisely the 1000 planted pairs, and the
    // miss probability of the recall-derived banding (34 two-row
    // bands at τ=0.3) is (1 − 0.882²)^34 ≈ 5·10⁻²³ per pair —
    // deterministic equality in practice (and xxhash64 is seeded, so
    // no run-to-run flake either way).
    val nDocs = 50000
    val sh = s.range(nDocs).select(col("id").as("doc_id"),
      expr("""CASE WHEN id < 2000
              |  THEN concat(
              |    transform(sequence(0, 29), j -> concat('p', CAST(id DIV 2 AS STRING), '_', CAST(j AS STRING))),
              |    transform(sequence(0, 1),  j -> concat('u', CAST(id AS STRING), '_', CAST(j AS STRING))))
              |  ELSE transform(sequence(0, 31), j -> concat('u', CAST(id AS STRING), '_', CAST(j AS STRING)))
              |END""".stripMargin).as("shingles"))
      .withColumn("sz", size(col("shingles")))
    val exact = LlmData.jaccardPairs(sh, 0.3, s)
      .collect().map(_.toString).sorted.toSeq
    val t0 = System.nanoTime()
    val banded = LlmData.textPairsBanded(sh, 0.3, s)
      .collect().map(_.toString).sorted.toSeq
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"banded text path over $nDocs docs: ${banded.length} pairs in $secs%.1f s")
    assert(exact.length == 1000, s"exact oracle should be the planted set, got ${exact.length}")
    assert(banded == exact, "banded pair graph diverged from the exact pair graph")
    assert(secs < 180, f"banded text path too slow: $secs%.1f s")
    // and the artifact routing honors the gate: above it, textPairs
    // takes the banded path (same planted output); at harness scale it
    // stays exact (oracle semantics — CORRECTNESS is unchanged)
    val routed = LlmData.textPairs(sh, 0.3, s, nDocs = nDocs.toLong, exactGate = 1000L)
      .collect().map(_.toString).sorted.toSeq
    assert(routed == exact, "textPairs above-gate routing diverged")
    assert(LlmData.TextExactGate > 500L,
      "harness-scale corpora must stay on the exact (oracle) path")
  }

  test("incremental embed dedup: LSH path finds exactly the new-involving planted pairs") {
    import graft.operators.LlmData
    val s = spark
    import s.implicits._
    // 50k vectors; 1000 planted near-identical CROSS-boundary pairs
    // (i, 49000+i) for i < 1000 — old half, new half (T = 48999) —
    // plus 100 planted OLD×OLD pairs (2000+2j, 2000+2j+1) that the
    // incremental screen must NOT emit
    val nVecs = 50000
    val t = 48999L
    val emb = s.range(nVecs).as[Long].map { id =>
      val isCrossNew = id >= 49000 && id < 49000 + 1000
      val isOldDup = id >= 2000 && id < 2200 && id % 2 == 1
      val baseId = if (isCrossNew) id - 49000
        else if (isOldDup) id - 1 else id
      val rnd = new java.util.Random(0xC0FFEE ^ baseId)
      val v = Array.fill(64)(rnd.nextGaussian())
      if (isCrossNew || isOldDup) {
        val nr = new java.util.Random(0xBEEF ^ id)
        var i = 0
        while (i < 64) { v(i) += 0.03 * nr.nextGaussian(); i += 1 }
      }
      (id, v)
    }.toDF("vec_id", "v")
      .withColumn("nrm", sqrt(graft.functions.VectorExprs.dotF64(col("v"), col("v"))))
      .cache()
    val found = LlmData.embIncrementalPairs(emb, t, 0.9, s, nVecs)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val planted = (0 until 1000).map(i => (i.toLong, 49000L + i)).toSet
    assert(planted.diff(found).isEmpty,
      s"missed ${planted.diff(found).size} planted cross-boundary pairs")
    assert(!found.exists { case (a, b) => b <= t },
      s"old-by-old pairs leaked into the incremental screen: " +
        s"${found.filter(_._2 <= t).take(3)}")
    // and it equals the full LSH graph's new-involving filter — the
    // contract the harness-scale oracle proves on the exact path
    val full = LlmData.embNearDupLsh(emb, 0.9, LlmData.EmbScaleBits,
        LlmData.lshTablesFor(0.9, LlmData.EmbScaleBits, LlmData.EmbLshRecallTarget).toInt,
        LlmData.EmbLshSeed)
      .filter(col("b_id") > t)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(found == full, "incremental LSH diverged from the filtered full LSH graph")
    emb.unpersist()
  }

  test("incremental dedup: banded and exact paths equal the filtered full pair graph") {
    import graft.operators.LlmData
    val s = spark
    // the 50k banded-path corpus (groups of planted near-dups at
    // j ≈ 0.88 in ids 0..1999): shard boundary T = 1000 puts half the
    // planted pairs in the "new" range — pairs (2i, 2i+1) with
    // 2i+1 > 1000, i.e. i >= 500 — plus nothing old×old may surface
    val nDocs = 50000
    val t = 1000L
    val sh = s.range(nDocs).select(col("id").as("doc_id"),
      expr("""CASE WHEN id < 2000
              |  THEN concat(
              |    transform(sequence(0, 29), j -> concat('p', CAST(id DIV 2 AS STRING), '_', CAST(j AS STRING))),
              |    transform(sequence(0, 1),  j -> concat('u', CAST(id AS STRING), '_', CAST(j AS STRING))))
              |  ELSE transform(sequence(0, 31), j -> concat('u', CAST(id AS STRING), '_', CAST(j AS STRING)))
              |END""".stripMargin).as("shingles"))
      .withColumn("sz", size(col("shingles")))
    val full = LlmData.jaccardPairs(sh, 0.3, s)
      .filter(col("b_id") > t)
      .collect().map(_.toString).sorted.toSeq
    assert(full.length == 500, s"expected 500 new-involving planted pairs, got ${full.length}")
    val exact = LlmData.incrementalPairs(sh, t, 0.3, s, nDocs, exactGate = Long.MaxValue)
      .collect().map(_.toString).sorted.toSeq
    assert(exact == full, "exact incremental path diverged from the filtered full graph")
    val banded = LlmData.incrementalPairs(sh, t, 0.3, s, nDocs, exactGate = 0L)
      .collect().map(_.toString).sorted.toSeq
    assert(banded == full, "banded incremental path diverged from the filtered full graph")
  }

  test("banded recall AT tau: measured recall on worst-case pairs meets the derived 0.95 target") {
    import graft.operators.LlmData
    val s = spark
    // The ScaleOps equality pins run at j ≈ 0.88, where banded
    // detection is effectively certain — they validate correctness,
    // not the RECALL DERIVATION. This fixture sits every planted pair
    // at EXACTLY Jaccard τ = 0.3, the S-curve midpoint where
    // mhBandsFor's guarantee is weakest: 26 shingles per doc, pairs
    // (2i, 2i+1) share 12 → j = 12/(52−12) = 0.3 exactly. Per-pair
    // detection with T = 34 two-row bands is 1 − (1 − 0.3²)³⁴ ≈
    // 0.9595, so the derived ≥ 0.95 floor must hold empirically —
    // and the minhash is seed-fixed, so the measured recall is a
    // DETERMINISTIC property of the fixture, not a flaky sample.
    val nPairs = 2000
    val nDocs = 20000
    val sh = s.range(nDocs).select(col("id").as("doc_id"),
      expr(s"""CASE WHEN id < ${2 * nPairs}
              |  THEN concat(
              |    transform(sequence(0, 11), j -> concat('p', CAST(id DIV 2 AS STRING), '_', CAST(j AS STRING))),
              |    transform(sequence(0, 13), j -> concat('u', CAST(id AS STRING), '_', CAST(j AS STRING))))
              |  ELSE transform(sequence(0, 25), j -> concat('u', CAST(id AS STRING), '_', CAST(j AS STRING)))
              |END""".stripMargin).as("shingles"))
      .withColumn("sz", size(col("shingles")))
    val exact = LlmData.jaccardPairs(sh, 0.3, s)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size == nPairs,
      s"exact oracle should be exactly the planted at-τ pairs, got ${exact.size}")
    val banded = LlmData.textPairsBanded(sh, 0.3, s)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // no false positives: banded candidates re-verify exactly
    assert(banded.subsetOf(exact), s"banded emitted ${banded.diff(exact).size} non-pairs")
    val recall = banded.size.toDouble / exact.size
    info(f"banded recall at τ=0.3 (worst case): $recall%.4f over $nPairs pairs " +
      f"(derived floor ${LlmData.MhRecallTarget}, predicted 0.9595)")
    assert(recall >= LlmData.MhRecallTarget,
      f"measured recall $recall%.4f below the mhBandsFor target ${LlmData.MhRecallTarget}")
    // and the prediction itself is honest: measured within ±0.02 of
    // the 1−(1−τ²)^T curve the derivation relies on
    assert(math.abs(recall - 0.9595) <= 0.02,
      f"measured recall $recall%.4f far from the S-curve prediction 0.9595")
  }

  test("containment prefix filter at 50k docs: finds exactly the planted subset pairs") {
    import graft.operators.LlmData
    val s = spark
    // 50k docs with per-doc-unique vocab except 1000 planted pairs
    // (2i, 2i+1) where the odd doc's 9 words are a verbatim prefix of
    // the even doc's 33 — bigrams(short) ⊂ bigrams(long), containment
    // exactly 1.0 while Jaccard is 8/32 = 0.25, under the pair-graph
    // τ. The prefix filter joins each doc's rarest ⌊0.2·sz⌋+1
    // shingles only (planted shared bigrams have df=2, unique df=1),
    // so the candidate set stays O(planted), never token × token.
    val nDocs = 50000
    val tmp = java.nio.file.Files.createTempDirectory("graft-contain50k-").toString
    s.range(nDocs).select(col("id").as("doc_id"),
      expr("""CASE WHEN id < 2000 AND id % 2 = 1
              |  THEN array_join(transform(sequence(0, 8),  j -> concat('w', CAST(id DIV 2 AS STRING), '_', CAST(j AS STRING))), ' ')
              |  WHEN id < 2000
              |  THEN array_join(transform(sequence(0, 32), j -> concat('w', CAST(id DIV 2 AS STRING), '_', CAST(j AS STRING))), ' ')
              |  ELSE array_join(transform(sequence(0, 32), j -> concat('u', CAST(id AS STRING), '_', CAST(j AS STRING))), ' ')
              |END""".stripMargin).as("text"))
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(tmp + "/documents.parquet")
    val t0 = System.nanoTime()
    val found = LlmData.qDedupContain(s, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"containment over $nDocs docs: ${found.length} pairs in $secs%.1f s")
    val planted = (0 until 1000).map(i => (2L * i, 2L * i + 1)).toSet
    assert(found.map(p => (p._1, p._2)).toSet == planted,
      s"pair set diverged: got ${found.length}, expected 1000 planted")
    assert(found.forall(_._3 == 1.0), "planted containment must be exactly 1.0")
    assert(secs < 180, f"containment prefix filter too slow: $secs%.1f s")
  }

  test("textPairsBanded fails fast when tau is too low to band efficiently") {
    import graft.operators.LlmData
    val s = spark
    // τ far below the banding S-curve: the recall-derived band count
    // exceeds MhMaxBands and the builder must fail with the derivation
    // (mirror of the embed path's raise-tau contract), never run at
    // silent under-recall
    val sh = s.range(4).select(col("id").as("doc_id"),
      expr("transform(sequence(0, 3), j -> CAST(j AS STRING))").as("shingles"))
      .withColumn("sz", size(col("shingles")))
    val e = intercept[IllegalArgumentException] {
      LlmData.textPairsBanded(sh, 0.05, s)
    }
    assert(e.getMessage.contains("raise tau"), e.getMessage)
    // derivation sanity at the operating points: τ=0.3 → 34 bands
    // (within budget), and detection at the fixture's weakest
    // qualifying pair is effectively certain
    assert(LlmData.mhBandsFor(0.3, LlmData.MhBandRows, LlmData.MhRecallTarget) == 34L)
  }

  test("PQ sampled-training path forced: tiny codebook sample still deterministic + useful") {
    import graft.operators.LlmData
    import org.apache.spark.sql.functions.col
    // at fixture scale N < 2048, so qEmbPqAnn's production gate never
    // binds; force trainCap = 64 (an 8× sub-sample of the 500-vector
    // corpus) — the path a 100 TB corpus always takes
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .repartition(8, col("vec_id"))
    val aRows = LlmData.pqAnn(emb, trainCap = 64).collect()
    val a = aRows.map(_.toString).toSeq
    val b = LlmData.pqAnn(emb, trainCap = 64)
      .collect().map(_.toString).toSeq
    assert(a.nonEmpty && a == b, "sampled-training PQ drifted between runs")
    // the above-gate two-phase ADC shortlist cut is lossless: forced
    // here, it must reproduce the flat-window rows exactly
    val c = LlmData.pqAnn(emb, trainCap = 64, twoPhaseCut = true)
      .collect().map(_.toString).toSeq
    assert(c == a, "two-phase ADC shortlist diverged from the flat window")
    // exact L2 top-10 ground truth (unit-norm fixture)
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val exact = vecs.filter(_._1 < 5).flatMap { case (pid, pv) =>
      vecs.filter(_._1 != pid)
        .map { case (cid, cv) =>
          (cid, cv.zip(pv).map { case (x, y) => (x - y) * (x - y) }.sum) }
        .sortBy { case (cid, d) => (d, cid) }.take(10)
        .map { case (cid, _) => (pid, cid) }
    }.toSet
    // derive the pair set from the rows already collected for the
    // determinism check — no fourth pqAnn run
    val got = aRows
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = exact.count(got.contains).toDouble / exact.size
    assert(recall >= 0.4,
      s"sampled-training PQ recall $recall vs exact L2 — codebook useless")
  }

  test("parquet aggregate pushdown: count/min/max answered from footers, not a scan") {
    // the fourth big-scan avoidance mechanism after partition
    // pruning, DPP, and runtime bloom filters: a bare
    // count/min/max over parquet can be answered from row-group
    // footer statistics — at 100 TB, metadata reads instead of a
    // table scan. Needs the DSv2 read path + the pushdown flag, both
    // scoped to this test and restored after.
    val s = spark
    val prevV1 = s.conf.get("spark.sql.sources.useV1SourceList")
    val prevPush = s.conf.get("spark.sql.parquet.aggregatePushdown", "false")
    try {
      s.conf.set("spark.sql.sources.useV1SourceList", "")
      s.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      val agg = s.read.parquet(s"$dir/lineitem.parquet")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.min("l_orderkey").as("min_k"),
          org.apache.spark.sql.functions.max("l_orderkey").as("max_k"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation"),
        s"expected PushedAggregation in the scan:\n$plan")
      val viaFooter = agg.collect().head
      // restore confs, then re-run on the ordinary V1 scan path —
      // the footer answer must equal the real scan's
      s.conf.set("spark.sql.sources.useV1SourceList", prevV1)
      s.conf.set("spark.sql.parquet.aggregatePushdown", prevPush)
      val viaScan = s.read.parquet(s"$dir/lineitem.parquet")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.min("l_orderkey"),
          org.apache.spark.sql.functions.max("l_orderkey")).collect().head
      assert(viaFooter.toString == viaScan.toString,
        s"footer answer $viaFooter != scan answer $viaScan")
    } finally {
      s.conf.set("spark.sql.sources.useV1SourceList", prevV1)
      s.conf.set("spark.sql.parquet.aggregatePushdown", prevPush)
    }
  }

  test("vocab coverage: FORCED two-phase bucket top-k equals the single-window path") {
    import graft.operators.LlmData
    // both strategies over the same fixture docs: the bucket union
    // provably contains the global top-100, so rows must be identical
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn(
        "norm_text",
        org.apache.spark.sql.functions.lower(
          org.apache.spark.sql.functions.trim(
            org.apache.spark.sql.functions.col("text"))))
    val one = LlmData.vocabCoverage(docs, twoPhase = false)
      .collect().map(_.toString).toSeq
    val two = LlmData.vocabCoverage(docs, twoPhase = true)
      .collect().map(_.toString).toSeq
    assert(one.nonEmpty && one == two,
      s"two-phase vocab coverage diverged from single-window: $two vs $one")
  }

  test("skewed-graph closure: 100k-spoke hub + long chain, O(log d) rounds") {
    import graft.operators.LlmData
    val s = spark
    // the two adversarial shapes for the distributed closure: a hub
    // vertex with 10⁵ spokes (one hot key in every label join — the
    // shape AQE skew handling must absorb) forming a 100_001-member
    // mega-cluster, plus a 4096-node chain (diameter 4095 — the shape
    // that forces pointer halving's O(log d) rounds)
    val hubEdges = s.range(100000)
      .select(lit(0L).as("a_id"), (col("id") + 1).as("b_id"))
    val chainBase = 10000000L
    val chainEdges = s.range(4095)
      .select((col("id") + chainBase).as("a_id"), (col("id") + chainBase + 1).as("b_id"))
    val edges = hubEdges.unionByName(chainEdges)
    val t0 = System.nanoTime()
    val out = LlmData.clusterPairs(edges, s, driverEdgeMax = 0).cache()
    val n = out.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val rounds = LlmData.lastClosureRounds
    info(f"skewed closure: $n vertices, $rounds rounds, $secs%.1f s")
    assert(n == 104097L)
    // pointer-halving bound on the worst component (chain, d = 4095):
    // ⌈log₂ 4095⌉ + 2 = 14 rounds
    assert(rounds <= 14, s"closure took $rounds rounds — pointer halving regressed")
    // hub: every spoke labeled by the hub vertex, one 100_001 cluster
    val hub = out.filter(col("doc_id") < chainBase)
    assert(hub.filter(col("cluster_id") =!= 0L || col("cluster_size") =!= 100001L)
      .count() == 0, "hub mega-cluster mis-labeled")
    // chain: collapsed to its min vertex
    val chain = out.filter(col("doc_id") >= chainBase)
    assert(chain.filter(col("cluster_id") =!= chainBase || col("cluster_size") =!= 4096L)
      .count() == 0, "chain component mis-clustered")
    out.unpersist()
    assert(secs < 300, f"skewed closure too slow: $secs%.1f s")
  }

  test("qDedupEmbed refuses the banded path at near-threshold tau above the gate") {
    import graft.operators.LlmData
    val s = spark
    // a >32k-vector corpus at the registered τ=0.4: no sub-quadratic
    // banding exists there, so the build must fail fast with the
    // derivation — never run at a few-percent recall (round-4 advice)
    val tmp = java.nio.file.Files.createTempDirectory("graft-embgate-").toString
    s.range(40000).select(col("id").as("vec_id"),
        expr("transform(sequence(1, 64), i -> cast(rand(7) as float))").as("embedding"),
        lit(0).as("label"))
      .write.mode("overwrite").parquet(tmp + "/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      LlmData.qDedupEmbed(s, tmp)
    }
    assert(e.getMessage.contains("raise tau"),
      s"wrong failure message: ${e.getMessage}")
  }

  test("AQE skew join splits the hot key of the UNSALTED theta-range join") {
    // thetaRangeSalted is the manual skew rewrite; this pins the
    // AUTOMATIC one — the 100 TB story for q_join_theta_range's plain
    // form is "AQE splits the hot key at runtime", so that claim is
    // measured here, not narrated: on a forced-skew fixture the final
    // adaptive plan must contain a skew-handled sort-merge join whose
    // shuffle read splits one reducer partition into several
    // PartialReducerPartitionSpec slices.
    val s = spark
    import s.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // fixture-sized skew thresholds: the hot key's reducer partition
      // (~3000 rows) must read as "skewed" next to the ~3-row median
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      // keep the join a shuffled SMJ — a broadcast has no skew to split
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val hot = (0 until 3000).map(i => (i.toLong, 1L, new java.sql.Timestamp(base + i * 60000L)))
      val cold = (0 until 600).map(i => (10000L + i, 2L + (i % 200), new java.sql.Timestamp(base + i * 90000L)))
      val tmp = java.nio.file.Files.createTempDirectory("graft-skew-").toString
      (hot ++ cold).toDF("event_id", "user_id", "ts")
        .withColumn("event_type", lit("click")).withColumn("value", lit(1.0))
        .withColumn("props", lit("{}"))
        .write.mode("overwrite").parquet(tmp + "/events.parquet")
      val df = graft.operators.Relational.qJoinThetaRange(s, tmp)
      // execute THIS DataFrame's own query execution — count() would
      // plan (and adaptively execute) a different query, leaving
      // df.queryExecution un-replanned
      val n = df.collect().length
      assert(n > 3000 * 4, s"forced-skew fixture produced only $n pairs")
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
      import org.apache.spark.sql.execution.joins.SortMergeJoinExec
      val adaptive = df.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }.getOrElse(fail("no AdaptiveSparkPlanExec in the executed plan"))
      // completed query stages are LEAF nodes — plain collect() stops
      // at them, so flatten the stage tree recursively
      def flat(p: SparkPlan): Seq[SparkPlan] = p match {
        case q: QueryStageExec => q +: flat(q.plan)
        case n => n +: n.children.flatMap(flat)
      }
      val nodes = flat(adaptive.executedPlan)
      val smjs = nodes.collect { case j: SortMergeJoinExec => j }
      assert(smjs.exists(_.isSkewJoin),
        s"AQE did not mark the theta-range SMJ as a skew join:\n${adaptive.executedPlan}")
      // the split itself: at least one shuffle read carries multiple
      // partial slices of the same (skewed) reducer partition
      val partialSlices = nodes.collect { case r: AQEShuffleReadExec =>
        r.partitionSpecs.count(
          _.isInstanceOf[org.apache.spark.sql.execution.PartialReducerPartitionSpec])
      }
      assert(partialSlices.exists(_ > 1),
        s"skew-marked join did not split any reducer partition: $partialSlices")
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the fact side of a selective shuffled join") {
    // The third big-join pruning mechanism after broadcast and DPP:
    // when a shuffled join's build side is small AND selectively
    // filtered, Spark injects a bloom-filter semi-join — the fact
    // side tests might_contain(join key) BEFORE the shuffle, so rows
    // that cannot match never leave their input partition. At 100 TB
    // this turns "shuffle the whole fact table to drop 99% of it in
    // the join" into "shuffle ~1%". Thresholds here are fixture-
    // scaled (the application-side floor defaults to 10 GB); the
    // MECHANISM asserted is the production one.
    val s = spark
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val li = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir).filter(col("p_brand") === "Brand#1")
      val j = li.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"no bloom-filter semi-join injected on the fact scan:\n$plan")
      // the filter is a pre-shuffle reduction, never a result change
      val expect = Tables.lineitem(s, dir)
        .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
        .filter(col("p_brand") === "Brand#1").count()
      assert(j.collect().map(_.getLong(1)).sum == expect)
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("ANN kNN graph: recall >= 0.9 vs the exact graph on the fixture") {
    import graft.operators.LlmData
    // q_emb_knn_ann's registered sizing on the 500-vector fixture:
    // k1 = 23 cells, nProbe = 18 (the over-probe operating point)
    val exact = LlmData.qEmbKnn(spark, dir)
      .select("vec_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (v, rs) => v -> rs.map(_.getLong(1)).toSet }
    val ann = LlmData.qEmbKnnAnn(spark, dir)
      .select("vec_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (v, rs) => v -> rs.map(_.getLong(1)).toSet }
    assert(ann.keySet == exact.keySet, "ANN graph must cover every vector")
    val recall = exact.map { case (v, nb) =>
      ann(v).intersect(nb).size.toDouble / nb.size }.sum / exact.size
    info(f"ANN kNN graph recall vs exact: $recall%.4f")
    assert(recall >= 0.9, f"graph recall $recall%.4f below the 0.9 contract")
  }

  test("ANN kNN graph is deterministic under partition layout changes") {
    import graft.operators.LlmData
    def g() = LlmData.qEmbKnnAnn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val p1 = g()
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    val p2 = try g()
    finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert(p1 == p2, "ANN kNN graph changed under different partitioning")
  }

  test("ANN kNN graph at 50k vectors: production probe fraction, planted pairs surface") {
    import graft.operators.LlmData
    val s = spark
    import s.implicits._
    // 50k (≫ the 8192 exact gate) deterministic gaussian vectors;
    // ids < 2000 pair up as (base, base + 3% noise) — cosine ≈ 0.9995
    val nVecs = 50000
    val emb = s.range(nVecs).as[Long].mapPartitions(_.map { id =>
      val isDup = id < 2000 && id % 2 == 1
      val baseId = if (isDup) id - 1 else id
      val rnd = new java.util.Random(0xC0FFEE ^ baseId)
      val v = Array.fill(64)(rnd.nextGaussian())
      if (isDup) {
        val nr = new java.util.Random(0xBEEF ^ id)
        var i = 0
        while (i < 64) { v(i) += 0.03 * nr.nextGaussian(); i += 1 }
      }
      (id, v)
    }).toDF("vec_id", "v")
      .withColumn("nrm", sqrt(graft.functions.VectorExprs.dotF64(col("v"), col("v"))))
    // production fractions: k1 = ⌈√N⌉ = 224 cells, nProbe = 4 — the
    // scored fraction is 4/224 ≈ 1.8% of the corpus per vector
    val t0 = System.nanoTime()
    val graph = LlmData.knnGraphAnn(emb, k1 = 224, nProbe = 4, k = 5).cache()
    val top1 = graph.filter(col("rnk") === 1)
      .select("vec_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val rows = graph.count()
    val secs = (System.nanoTime() - t0) / 1e9
    graph.unpersist()
    info(f"50k ANN kNN graph: $rows rows in $secs%.1f s")
    assert(rows == nVecs * 5L, s"expected ${nVecs * 5L} graph rows, got $rows")
    // a near-identical pair lands in the same coarse cell (their
    // centroid ranking differs only at 3%-noise scale), so each
    // planted vector's top-1 neighbor must be its partner for
    // essentially all pairs — allow a 5% hash-boundary margin
    val planted = (0 until 1000).flatMap(i =>
      Seq((2L * i, 2L * i + 1), (2L * i + 1, 2L * i)))
    val hit = planted.count { case (a, b) => top1.get(a).contains(b) }
    info(s"planted top-1 hits: $hit/${planted.size}")
    assert(hit >= (planted.size * 0.95).toInt,
      s"only $hit/${planted.size} planted partners surfaced as top-1")
    // the budget guards against a quadratic regression (minutes-to-
    // hours, not seconds); 249 s was observed on a healthy tree under
    // full-battery JVM pressure, so the bound carries real headroom
    assert(secs < 420, f"50k ANN kNN graph too slow: $secs%.1f s")
  }

  // ===== r12: distributed rank above the SortWindowGate =====

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("sort-window scale paths ≡ exact window paths on harness data") {
    val ev = Tables.events(spark, dir)
    assert(sortedRows(graft.operators.EventOps.powerUsersFrom(ev, scalePath = true)) ==
      sortedRows(graft.operators.EventOps.powerUsersFrom(ev, scalePath = false)),
      "q_ev_power_users scale path diverged")
    val ord = Tables.orders(spark, dir)
    assert(sortedRows(graft.operators.Relational.segRfmFrom(ord, scalePath = true)) ==
      sortedRows(graft.operators.Relational.segRfmFrom(ord, scalePath = false)),
      "q_seg_rfm scale path diverged")
    val li = Tables.lineitem(spark, dir)
    assert(sortedRows(graft.operators.Relational.aggTrimmedFrom(li, scalePath = true)) ==
      sortedRows(graft.operators.Relational.aggTrimmedFrom(li, scalePath = false)),
      "q_agg_trimmed scale path diverged")
    val cust = Tables.customer(spark, dir)
    assert(sortedRows(graft.operators.Relational.winNtilePctrankFrom(cust, scalePath = true)) ==
      sortedRows(graft.operators.Relational.winNtilePctrankFrom(cust, scalePath = false)),
      "q_win_ntile_pctrank scale path diverged")
    spark.catalog.clearCache() // distributedRank's documented retention
  }

  test("ntileFromRank matches ntile() for every remainder shape incl. n < k") {
    import org.apache.spark.sql.expressions.Window
    for (n <- Seq(1L, 3L, 7L, 10L, 11L, 40L, 97L)) {
      val df = spark.range(1, n + 1)
        .select(col("id").as("rn"), lit(n).as("n"),
          ScaleOps.ntileFromRank("rn", "n", 10).as("got"),
          ntile(10).over(Window.orderBy("id")).as("want"))
      val bad = df.filter(col("got") =!= col("want")).collect()
      assert(bad.isEmpty, s"n=$n diverged: ${bad.mkString(", ")}")
    }
  }

  test("forced scale rank at 200k users: exact deciles, single-partition shuffles stay model-bounded") {
    val s = spark
    // 199k single-event users — one giant tie block that crosses every
    // slice boundary, the worst case for a distributed tie-broken rank
    // — plus 1k power users at 2–51 events
    val ev = s.range(200000).select(col("id").as("user_id"),
        when(col("id") < 1000, col("id") % 50 + 2).otherwise(lit(1L)).as("reps"))
      .select(col("user_id"), explode(expr("sequence(1, reps)")).as("e")).drop("e")
    val exact = graft.operators.EventOps.powerUsersFrom(ev, scalePath = false)
      .collect().map(_.toString).toSeq
    val scaled = graft.operators.EventOps.powerUsersFrom(ev, scalePath = true)
    val adaptiveWas = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val got = scaled.collect().map(_.toString).toSeq
      assert(got == exact, s"scale deciles diverged from exact ntile at 200k users")
      // runtime proof, not a claim: with AQE off the executed plan keeps
      // its ShuffleExchangeExec nodes and their write metrics. Every
      // single-partition exchange must have carried model-bounded rows
      // (the O(slices) counts table, the O(10) decile rollup) — never
      // the 200k-row user table the below-gate ntile window sorts.
      import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val singles = scaled.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition => e
      }
      assert(singles.nonEmpty, "expected the offset-cumulation exchange in the plan")
      singles.foreach { e =>
        val written = e.metrics("shuffleRecordsWritten").value
        assert(written <= 1000L,
          s"a single-partition exchange carried $written rows — the model bound is broken:\n$e")
      }
    } finally {
      s.conf.set("spark.sql.adaptive.enabled", adaptiveWas)
      s.catalog.clearCache()
    }
  }

  test("forced grouped scale rank at 150k lineitem rows ≡ exact per-group window") {
    // 97 distinct prices over 150k rows in 3 flags: every trim boundary
    // lands inside a tie run, so the (price, okey, lineno) tie-break is
    // load-bearing across slices
    val li = spark.range(150000).select(
      expr("CASE id % 3 WHEN 0 THEN 'A' WHEN 1 THEN 'N' ELSE 'R' END").as("l_returnflag"),
      expr("id DIV 7").as("l_orderkey"),
      expr("CAST(id % 7 AS INT)").as("l_linenumber"),
      expr("CAST(id % 97 AS DECIMAL(15,2))").as("l_extendedprice"))
    val exact = graft.operators.Relational.aggTrimmedFrom(li, scalePath = false)
      .collect().map(_.toString).toSeq
    val scaled = graft.operators.Relational.aggTrimmedFrom(li, scalePath = true)
      .collect().map(_.toString).toSeq
    assert(scaled == exact, "grouped scale trim diverged from the window path")
    spark.catalog.clearCache()
  }

  test("forced scale RFM at 120k customers ≡ exact quartile windows under total frequency ties") {
    // every customer has EXACTLY 2 orders — the frequency quartile is
    // decided entirely by the custkey tie-break, end to end
    val ord = spark.range(240000).select(
      (col("id") % 120000).as("o_custkey"),
      expr("CAST(date_add(DATE '2024-01-01', CAST(id % 700 AS INT)) AS TIMESTAMP)").as("o_orderdate"),
      expr("CAST(id % 50 * 10 + 5 AS DECIMAL(15,2))").as("o_totalprice"))
    val exact = graft.operators.Relational.segRfmFrom(ord, scalePath = false)
      .collect().map(_.toString).toSeq
    val scaled = graft.operators.Relational.segRfmFrom(ord, scalePath = true)
      .collect().map(_.toString).toSeq
    assert(scaled == exact, "scale RFM diverged from the window path")
    spark.catalog.clearCache()
  }
}
