package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{Dedup, HeavyHitters, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scaling probe: run representative operators on 1×/4×/8× replicas of
  * the sf tables and print the wall-time ratios. The point is evidence,
  * not a benchmark: a scale-safe plan (hash aggs, equi-join candidate
  * generation, broadcast dims) should grow near-linearly in input size;
  * anything super-linear here would blow up long before 100 TB.
  *
  * Replication shifts ids per copy so dedup candidate structure scales
  * realistically (each copy forms its own near-dup clusters instead of
  * collapsing into one giant bucket).
  *
  * Run: sbt "runMain graft.tools.ScaleProbe [sfDir] [probeSubstr ...]"
  * — trailing args filter probes by name substring, so one new
  * operator's row can be (re)measured without the full sweep.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only: Seq[String] = args.drop(1).toSeq
    // staging blocks are minutes of work at sf0.1 — only pay one when
    // the name filter actually selects a probe that reads it (the
    // single-row re-measure workflow the tool documents)
    def wanted(name: String): Boolean =
      only.isEmpty || only.exists(name.contains)
    val spark = GraftSession.build("graft-scale-probe")
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)

    // step derived from the data, not a constant: at SFs where base ids
    // exceed a fixed step, copies would alias into each other and the
    // dedup/ANN probes would silently measure collapsed candidate
    // structure. Memoized per (source plan, id column) so the max(id)
    // scan runs ONCE per table OUTSIDE the timed probes — an agg job
    // inside run(c) would add a constant to every 1x/4x/8x measurement
    // and compress the very ratios this tool reports. Keyed by the
    // analyzed plan's semanticHash, not the column name alone: two
    // tables reusing an id column name (e.g. both exposing doc_id) must
    // each get their own max(id)-derived step, or their copies would
    // alias into each other's id ranges.
    val stepCache = scala.collection.mutable.Map.empty[(Int, String), Long]
    def replicate(df: DataFrame, idCol: String, copies: Int): DataFrame = {
      val step = stepCache.getOrElseUpdate(
        (df.queryExecution.analyzed.semanticHash(), idCol),
        df.agg(max(col(idCol).cast("long"))).head.getLong(0) + 1L)
      (0 until copies).map(i =>
        df.withColumn(idCol, col(idCol) + lit(i * step))).reduce(_ union _)
    }

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    def probe(name: String, run: Int => Long): Unit = {
      if (only.nonEmpty && !only.exists(name.contains)) return
      run(1) // warm
      val results = Seq(1, 4, 8).map { c =>
        GraftSession.dropAllBlocks(spark)
        val (sec, n) = time(run(c))
        (c, sec, n)
      }
      val (_, t1, _) = results.head
      val line = results.map { case (c, sec, n) =>
        f"${c}x=${sec}%.2fs(rows=$n,ratio=${sec / t1}%.1f)"
      }.mkString(" ")
      println(f"$name%-22s $line")
    }

    probe("agg_pricing", c =>
      replicate(t.lineitem, "l_orderkey", c)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")), avg(col("l_extendedprice")),
          count(lit(1))).count())

    probe("join_broadcast", c =>
      replicate(t.orders, "o_orderkey", c)
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1))).count())

    probe("window_rank", c => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(desc("o_totalprice"))
      replicate(t.orders, "o_orderkey", c)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).count()
    })

    probe("minhash_lsh", c =>
      Dedup.minHashPairs(replicate(t.documents, "doc_id", c), 3, 0.8).count())

    probe("heavy_hitters", c =>
      HeavyHitters.exactTopK(replicate(t.documents, "doc_id", c), 64, 10)
        .count())

    probe("brute_ann", c => {
      val emb = replicate(t.embeddings, "vec_id", c)
        .select(col("vec_id").as("id"), col("embedding"))
      Similarity.bruteTopK(emb.filter(col("id") < 10), emb, 5).count()
    })

    // ---- round-4 operators (n39–n52 scale shapes) --------------------

    probe("byte_diversity", c =>
      graft.operators.TextAnalysis
        .byteDiversity(replicate(t.documents, "doc_id", c)).count())

    probe("bigram_fluency", c =>
      graft.operators.LanguageModel
        .bigramFluency(replicate(t.documents, "doc_id", c)).count())

    probe("bloom_decontam", c => {
      val docs = replicate(t.documents, "doc_id", c)
      graft.operators.Decontamination
        .flagContaminatedBloom(docs, docs.filter(col("doc_id") % 5 === 0),
          4, 0.25)
        .count()
    })

    probe("pagerank_dupgraph", c =>
      graft.operators.Clustering.pageRank(
        Dedup.jaccardPairs(replicate(t.documents, "doc_id", c), 3, 0.8)
          .select("id_a", "id_b"),
        iters = 3).count())

    probe("span_removal", c =>
      Dedup.removeDupSpans(replicate(t.documents, "doc_id", c), 5, 2).count())

    probe("editdist_dedup", c =>
      Dedup.editDistancePairs(replicate(t.documents, "doc_id", c), 3, 0.5, 0.95)
        .count())

    probe("source_overlap", c =>
      graft.operators.TextAnalysis
        .sourceOverlap(replicate(t.documents, "doc_id", c)).count())

    probe("pq_ann", c => {
      val emb = replicate(t.embeddings, "vec_id", c)
        .select(col("vec_id").as("id"), col("embedding"))
      Similarity.pqTopK(emb.filter(col("id") < 10), emb, 5).count()
    })

    // ---- round-5/6 operators (n52-n54, s17, s18 scale shapes) --------
    // Query side stays the base-copy ids (< 10) while the corpus
    // replicates — the ANN scale question is corpus growth, not Q.

    probe("lsh_multitable", c => {
      val emb = replicate(t.embeddings, "vec_id", c)
        .select(col("vec_id").as("id"), col("embedding"))
      Similarity.lshTopK(emb.filter(col("id") < 10), emb, 3, numTables = 2)
        .count()
    })

    probe("lsh_multiprobe", c => {
      val emb = replicate(t.embeddings, "vec_id", c)
        .select(col("vec_id").as("id"), col("embedding"))
      Similarity.lshMultiProbeTopK(emb.filter(col("id") < 10), emb, 3)
        .count()
    })

    probe("ivf_lloyd", c => {
      val emb = replicate(t.embeddings, "vec_id", c)
        .select(col("vec_id").as("id"), col("embedding"))
      Similarity.ivfTopKLloyd(emb.filter(col("id") < 10), emb, 5).count()
    })

    // Replication keeps each copy's source labels, so per-source doc
    // counts grow with the copies while gram document-frequency grows in
    // lockstep — the boilerplate FRACTION is scale-invariant, which is
    // exactly the per-source-relative contract under test.
    probe("boilerplate", c =>
      Dedup.boilerplateRemoval(replicate(t.documents, "doc_id", c), 2, 0.2)
        .count())

    probe("quantile_gate", c =>
      graft.operators.Sampling
        .qualityQuantileGate(replicate(t.documents, "doc_id", c), 0.5)
        .count())

    probe("keep_best", c =>
      graft.operators.Clustering
        .dupClustersKeepBest(replicate(t.documents, "doc_id", c), 3, 0.8)
        .count())

    probe("curation_v2", c =>
      graft.operators.Curation
        .pipelineV2(replicate(t.documents, "doc_id", c))
        .count())

    // Replication preserves the lang labels, so the target slice grows
    // with the corpus — the gram-vocab (V) stays fixed while counts
    // scale, the realistic regime for importance weighting.
    probe("dsir_select", c =>
      graft.operators.Sampling
        .dsirSelect(replicate(t.documents, "doc_id", c),
          col("lang") === "en", 0.25)
        .count())

    probe("soft_dedup", c =>
      graft.operators.Clustering
        .dupClustersSoftWeight(replicate(t.documents, "doc_id", c), 3, 0.8)
        .count())

    probe("temperature_mix", c =>
      graft.operators.Sampling
        .temperatureMixture(replicate(t.documents, "doc_id", c), 200L)
        .count())

    probe("gopher_rules", c =>
      graft.operators.TextAnalysis
        .gopherQualityRules(replicate(t.documents, "doc_id", c))
        .count())

    // replicas are TRUE simhash dups (identical text → identical
    // signature): the candidate/pair set grows quadratically per
    // twin-group while the (token × bit) explode grows linearly — the
    // n03/n47 regime on the md5-bit pipeline
    probe("simhash_portable", c =>
      graft.operators.Dedup
        .simHashPairsPortable(replicate(t.documents, "doc_id", c))
        .count())

    probe("spearman_calibration", c =>
      graft.operators.TextAnalysis
        .qualityLengthSpearman(replicate(t.documents, "doc_id", c))
        .count())

    // per-iteration work is one scan + two keyed partial aggs; model
    // state is a constant 64+1 doubles per round regardless of corpus
    // size — time should track the token explode linearly
    probe("quality_classifier", c =>
      graft.operators.QualityModel
        .trainedQualityScores(replicate(t.documents, "doc_id", c),
          positiveSources = Seq("src0", "src1", "src2", "src3", "src4"),
          iters = 3)
        .count())

    // one co-partitioned full-outer join; the changeset replicates with
    // the base (same modulus rules per copy) so the change fraction is
    // scale-invariant — time should track the snapshot scan
    probe("snapshot_merge", c => {
      val docs = replicate(t.documents, "doc_id", c)
      val base = docs.select(col("doc_id"), col("text"))
      val changes = docs
        .filter(col("doc_id") % 7 === 0 || col("doc_id") % 5 === 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, lit("delete"))
            .otherwise(lit("upsert")).as("op"),
          when(col("doc_id") % 7 === 0, lit(null).cast("string"))
            .otherwise(concat(col("text"), lit(" v2"))).as("text"))
      graft.operators.Snapshot
        .applyChangeset(base, changes, idCol = "doc_id")
        .count()
    })

    // round-9 rows: the trained mixture and valuation operators are
    // vocab-bounded after their one corpus-sized count pass (the dsir
    // regime — vocab is FIXED under replication while counts scale), so
    // both should be near-flat; embedding decontam's corpus replicas
    // are identical vectors, so true matches per eval item grow
    // linearly with copies — candidate-bounded growth (the dedup
    // regime), never corpus × eval
    probe("doremi_mixture", c =>
      graft.operators.Mixture
        .doremiTrajectory(replicate(t.documents, "doc_id", c)).count())

    probe("domain_ablation", c =>
      graft.operators.Mixture
        .domainAblation(replicate(t.documents, "doc_id", c),
          col("lang") === "en").count())

    probe("embed_decontam", c => {
      val emb = replicate(t.embeddings, "vec_id", c)
      graft.operators.Decontamination.flagContaminatedEmbedding(
        emb.filter(col("vec_id") >= 100),
        t.embeddings.filter(col("vec_id") < 100), 0.2).count()
    })

    probe("rank_fusion", c =>
      graft.operators.Sampling
        .rankFusionGate(replicate(t.documents, "doc_id", c),
          col("lang") === "en", 0.25).count())

    // fixed anchor set, growing corpus: positives grow with bucket
    // density, the rank-table sort with corpus size — the axes that
    // matter when the mined corpus is 100 TB and the anchors are not
    probe("contrastive_mine", c =>
      Similarity.contrastiveTriplets(
        replicate(t.embeddings, "vec_id", c),
        anchorMax = 100L, posThreshold = 0.35, negsPerPair = 2).count())

    // round-11 rows: fixed query sets over a growing corpus — the
    // recall eval and margin miner are both broadcast-Q scans whose
    // work is Q·corpus (linear under replication; the eval joins are
    // Q·k, invisible); the allocators are one corpus aggregate + D-row
    // frames, so they should be near-flat past the scan
    probe("ann_recall_eval", c => {
      val emb = replicate(t.embeddings, "vec_id", c)
        .select(col("vec_id").as("id"), col("embedding"))
      val q = emb.filter(col("id") < 10)
      Similarity.annRecall(
        Similarity.bruteTopK(q, emb, 10),
        Similarity.lshTopK(q, emb, 10)).count()
    })

    probe("bitext_margin", c => {
      val emb = replicate(t.embeddings, "vec_id", c)
        .select(col("vec_id").as("id"), col("embedding"))
      Similarity.bitextMarginPairs(
        emb.filter(col("id") % 2 === 0 && col("id") < 20),
        emb.filter(col("id") % 2 === 0),
        emb.filter(col("id") % 2 === 1), 4).count()
    })

    probe("eval_allocation", c =>
      graft.operators.Sampling
        .evalSuiteAllocation(replicate(t.documents, "doc_id", c), 200)
        .count())

    probe("token_waterfill", c =>
      graft.operators.Mixture
        .tokenWaterfill(replicate(t.documents, "doc_id", c), 15000L)
        .count())

    // Streaming probes: replicated events staged to disk ONCE per scale
    // (the file-stream source needs files; staging is setup, not the
    // measured stream). user_id AND event_id shift per copy, so each
    // copy is a fresh population — join/agg STATE grows with input,
    // which is exactly the scaling question for stateful streams.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // normalize ts BEFORE staging: the replicated copies are re-written
    // by Spark, so they carry a plain TimestampType regardless of the
    // driver data's physical generation (nanos-long vs timestamp[us])
    val eventsRaw =
      graft.Tables.normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
    lazy val evSteps: (Long, Long) = {
      val r = eventsRaw
        .agg(max(col("user_id")), max(col("event_id"))).head
      (r.getLong(0) + 1L, r.getLong(1) + 1L)
    }
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmTree))
      f.delete(); ()
    }
    val evBase = java.nio.file.Files.createTempDirectory("graft_probe_ev_")
      .toFile
    val evDirs: Map[Int, String] =
      if (!wanted("stream_3way_join") && !wanted("stream_ckpt_restart"))
        Map.empty
      else Seq(1, 4, 8).map { c =>
      val p = new java.io.File(evBase, s"x$c")
      val (uStep, eStep) = evSteps
      (0 until c).map(i => eventsRaw
          .withColumn("user_id", col("user_id") + lit(i * uStep))
          .withColumn("event_id", col("event_id") + lit(i * eStep)))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(p.getAbsolutePath)
      c -> p.getAbsolutePath
    }.toMap

    val streamN = new java.util.concurrent.atomic.AtomicInteger
    def runStreamCount(df: DataFrame, mode: String,
        ckpt: Option[String]): Long = {
      val name = s"scale_probe_${streamN.incrementAndGet()}"
      // state-partition sizing per docs/PLANS.md "Streaming
      // state-partition sizing" — same policy as the s* queries
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions",
        math.min(8, prev.toInt).toString)
      try {
        val w = df.writeStream.outputMode(mode)
          .format("memory").queryName(name)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        val q = ckpt.fold(w)(cl => w.option("checkpointLocation", cl)).start()
        q.awaitTermination()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      val n = spark.table(name).count()
      spark.catalog.dropTempView(name)
      n
    }
    def typedStream(dir: String, tpe: String, p: String): DataFrame =
      spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
          "event_type STRING, value DOUBLE, props STRING")
        .parquet(dir)
        .filter(col("event_type") === tpe)
        .select(col("user_id").as(s"${p}_user"), col("ts").as(s"${p}_ts"),
          col("event_id").as(s"${p}_id"))
        .withWatermark(s"${p}_ts", "1 hour")

    probe("stream_3way_join", c => {
      val dir = evDirs(c)
      val vc = typedStream(dir, "view", "v").join(
        typedStream(dir, "click", "c"),
        col("v_user") === col("c_user") &&
          col("c_ts") >= col("v_ts") &&
          col("c_ts") <= col("v_ts") + expr("INTERVAL 12 HOURS"))
      val vcp = vc.join(typedStream(dir, "purchase", "p"),
        col("v_user") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 12 HOURS"))
        .select(col("v_id"), col("c_id"), col("p_id"))
      runStreamCount(vcp, "append", None)
    })

    probe("stream_ckpt_restart", c => {
      // the s17 shape: consume half the files, stop, restart from the
      // checkpoint with phase-1 files deleted; staging cost is inside
      // the probe (as in the driver query) and identical per scale
      val base = java.nio.file.Files
        .createTempDirectory("graft_probe_s17_").toFile
      try {
        val stage = new java.io.File(base, "stage")
        val in = new java.io.File(base, "in"); in.mkdirs()
        val ckpt = new java.io.File(base, "ckpt")
        spark.read.parquet(evDirs(c)).select(col("event_type"), col("value"))
          .repartition(4)
          .write.mode("overwrite").parquet(stage.getAbsolutePath)
        val parts = stage.listFiles()
          .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        val (phase1, phase2) = parts.splitAt(2)
        def copyIn(fs: Array[java.io.File]): Unit = fs.foreach { f =>
          java.nio.file.Files.copy(f.toPath,
            new java.io.File(in, f.getName).toPath)
        }
        def runPhase(): Long = runStreamCount(
          spark.readStream
            .schema("event_type STRING, value DOUBLE")
            .parquet(in.getAbsolutePath)
            .groupBy("event_type")
            .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value")),
          "complete", Some(ckpt.getAbsolutePath))
        copyIn(phase1)
        runPhase()
        phase1.foreach(f => new java.io.File(in, f.getName).delete())
        copyIn(phase2)
        runPhase()
      } finally rmTree(base)
    })

    rmTree(evBase)

    // ---- s20 standing-index growth: per-batch ADMISSION cost as the
    // file-backed band index grows (the index-size axis, not the
    // batch-size axis the other dedup rows measure). Indexes of 1x/4x/8x
    // corpora are staged OUTSIDE the timed probe; copies beyond the
    // first get per-copy-salted text, so a fixed probe batch generates
    // the SAME candidate set against every index size — what grows is
    // only the standing table the equi-join probes. Production buckets
    // that table by band_key so the probe touches matching buckets
    // only; here it is a flat parquet re-read, so the measured growth
    // bounds the UNbucketed worst case from above.
    val s20Base = java.nio.file.Files
      .createTempDirectory("graft_probe_s20_").toFile
    lazy val s20Step =
      t.documents.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val s20Dirs: Map[Int, (String, String)] =
      if (!wanted("stream_dedup_index")) Map.empty
      else Seq(1, 4, 8).map { c =>
      val corpus = (0 until c).map { i =>
        val shifted = t.documents
          .withColumn("doc_id", col("doc_id") + lit(i * s20Step))
        // copies beyond the first get a token INTERLEAVED into every
        // gap — every shingle then contains the copy tag, so copies
        // share no shingles with the batch or each other (a suffix tag
        // would leave Jaccard ≥ threshold and candidates would scale
        // with the index — measured: 4x/8x pair growth)
        if (i == 0) shifted
        else shifted.withColumn("text",
          regexp_replace(col("text"), " ", s" zq$i "))
      }.reduce(_ union _)
      val shDir = new java.io.File(s20Base, s"sh$c").getAbsolutePath
      Dedup.portableShingles(corpus).write.parquet(shDir)
      val idxDir = new java.io.File(s20Base, s"idx$c").getAbsolutePath
      Dedup.portableMinHashBands(spark.read.parquet(shDir))
        .write.parquet(idxDir)
      c -> (idxDir, shDir)
    }.toMap

    probe("stream_dedup_index", c => {
      val (idxDir, shDir) = s20Dirs(c)
      // the fixed incoming batch: base texts (near-dups of the UNsalted
      // index copy only), fresh ids — s20's admission probe via the
      // SHARED Dedup.verifiedIndexDups (the same code path the shipped
      // query runs), minus the within-batch pass, which does not touch
      // the index
      val batch = t.documents
        .withColumn("doc_id", col("doc_id") + lit(100L * s20Step))
      val shN = Dedup.portableShingles(batch)
      Dedup.verifiedIndexDups(Dedup.portableMinHashBands(shN), shN,
        spark.read.parquet(idxDir), spark.read.parquet(shDir), 0.5)
        .count()
    })

    rmTree(s20Base)

    probe("stream_token_quota", c => {
      // s25's shape: 3 contiguous id-range batches (maxFilesPerTrigger=1
      // forces one micro-batch per staged file, so the per-source state
      // genuinely carries); staging is setup, identical in kind per
      // scale. State stays ONE long per source at every scale — the
      // probe measures the per-batch scan+sort cost tracking input size.
      val base = java.nio.file.Files
        .createTempDirectory("graft_probe_s25_").toFile
      try {
        val in = new java.io.File(base, "in"); in.mkdirs()
        val docs = replicate(
          t.documents.select(col("doc_id"), col("source"), col("text")),
          "doc_id", c)
        val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
        val cut = maxId / 3 + 1
        (0 to 2).foreach { k =>
          docs.filter(col("doc_id") >= k * cut &&
              col("doc_id") < (k + 1) * cut)
            .coalesce(1).write.mode("overwrite")
            .parquet(new java.io.File(in, s"b$k").getAbsolutePath)
        }
        import spark.implicits._
        val src = spark.readStream
          .schema("doc_id LONG, source STRING, text STRING")
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "*.parquet")
          .parquet(in.getAbsolutePath + "/*")
          .select(col("source"), col("doc_id"),
            size(split(col("text"), " ")).as("n_tokens"))
          .as[(String, Long, Int)]
        runStreamCount(graft.streaming.StatefulOps.tokenQuota(src, 2000L)
          .toDF("doc_id", "source", "n_tokens", "start_off", "kept"),
          "append", None)
      } finally rmTree(base)
    })

    probe("bt_reward_train", c =>
      // pair mining + 3 GD rounds + trajectory: per-round cost is two
      // keyed partial aggregations over the pair-token frame, so time
      // should track corpus size (copies add pairs per source)
      graft.operators.Preference
        .btTrajectory(replicate(t.documents, "doc_id", c), iters = 3)
        .count())

    probe("doc_influence", c =>
      // per-doc leave-one-out closed form: explode + three hash aggs +
      // vocab-keyed equi-joins pruned to the target vocabulary
      graft.operators.Mixture
        .docAblation(replicate(t.documents, "doc_id", c),
          col("lang") === "en")
        .count())

    probe("bm25_retrieval", c =>
      // fixed 5-query set against a growing corpus: posting lists grow
      // with the replicas, so time should track corpus size while the
      // per-query candidate work stays posting-bounded
      graft.operators.Retrieval
        .bm25MoreLikeThis(replicate(t.documents, "doc_id", c),
          nQueries = 5L, k = 5)
        .count())

    probe("bm25_nopersist", c =>
      // the SAME plan minus the tf materialization: four explode passes
      // over the corpus instead of one cache fill. This row vs
      // bm25_retrieval measures the persist trade the r11 round argued
      // (a ~1.5 s cache-fill barrier at sf0.1 bought eliminating 3
      // redundant corpus explodes) — the growth-ratio gap between the
      // two rows is the crossover evidence PLANS.md cites
      graft.operators.Retrieval
        .bm25MoreLikeThis(replicate(t.documents, "doc_id", c),
          nQueries = 5L, k = 5, materializeTf = false)
        .count())

    probe("length_tvd", c =>
      // ONE corpus scan into the (source, bin) agg; everything after
      // runs on the persisted S·B count frame — time should track the
      // scan, with the dense-grid tail constant in corpus size
      graft.operators.TextAnalysis
        .sourceLengthTvd(replicate(t.documents, "doc_id", c))
        .count())

    probe("minhash_est_eval", c =>
      // candidate-bounded like every LSH shape: replicas form their own
      // near-dup structure, so candidate volume (and output) grows with
      // copies while the signature/shingle passes grow linearly
      graft.operators.Dedup
        .minhashEstimateEval(replicate(t.documents, "doc_id", c))
        .count())

    probe("ivf_probe_sweep", c => {
      // the sweep's claim under growth: corpus passes (assignment,
      // scoring) are shared across the three settings, so time should
      // track corpus size once, not once per setting
      val emb = replicate(
        t.embeddings.select(col("vec_id").as("id"), col("embedding")),
        "id", c)
      graft.operators.Similarity
        .ivfProbeSweep(emb.filter(col("id") < 10), emb, 10, Seq(1, 2, 4))
        .count()
    })

    probe("cent_occupancy", c => {
      // scan-stage argmax: map-only over the corpus, one numCentroids-
      // row aggregate — the most linear shape in the registry
      val emb = replicate(
        t.embeddings.select(col("vec_id").as("id"), col("embedding")),
        "id", c)
      graft.operators.Similarity.occupancyGapReport(
        graft.operators.Similarity.centOccupancy(emb,
          col("id") % 2 === 0,
          graft.operators.Similarity.lowIdCents(emb)))
        .count()
    })

    probe("containment_dedup", c =>
      // each replica forms its own contained/container structure; the
      // df cap bounds per-shingle fanout as copies multiply df
      graft.operators.Dedup
        .containmentPairs(replicate(t.documents, "doc_id", c), 3, 0.9)
        .count())

    probe("punctuated_windows", c => {
      // replicate on user_id: each copy is a fresh set of keyed streams,
      // which is how this operator scales (more independent protocols)
      val ev = replicate(
        t.events.select(col("user_id").as("key"), col("value"),
          unix_micros(col("ts")).as("ts"), col("event_id")),
        "key", c)
      graft.streaming.PunctuatedWatermarks.windowsPerKey(
        graft.streaming.PunctuatedWatermarks.punctuateByKey(ev, 50, "event_id"),
        3600L * 1000000L).count()
    })

    spark.stop()
  }
}
