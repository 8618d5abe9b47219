package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: print ONE JSON line
  * {"metric":…,"value":…,"unit":"sec","queries":{…},"sf":…}.
  *
  * Headline queries span every operator family (scan/agg, join snowflake,
  * window, high-cardinality two-phase agg, and the extension dedup/ann/
  * events/text pipelines). Each query executes to completion through the
  * noop sink (full plan runs, nothing materializes driver-side), after a
  * warmup query absorbs JVM/session startup.
  */
object Bench {
  val headline: Seq[String] = Seq(
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q13_customer_distribution",
    "q18_large_volume_customer",
    "q21_suppliers_waiting",
    "j_inner_large",
    "a_high_cardinality",
    "w_rows_frames",
    "o_topk",
    "x_dedup_exact",
    "x_dedup_minhash_lsh",
    "x_ann_brute_topk",
    "x_events_sessionize",
    "x_text_quality")

  /** Heavier round-4 pipeline/index queries, timed in a separate section
    * so `headline_total` stays comparable across rounds. */
  val extended: Seq[String] = Seq(
    "x_pipeline_e2e",
    "x_ann_ivfpq_topk",
    "x_ann_sq8_topk",
    "x_search_bm25",
    "x_dedup_chunks",
    "x_dedup_cc",
    "x_text_entropy",
    "x_events_anomaly",
    "j_asof_attribution",
    // index lifecycle split: build time (forced retrain + artifact write)
    // vs query time over the prebuilt artifacts — reported separately
    "x_ann_index_build",
    "x_ann_ivfpq_indexed",
    // round-5 additions
    "x_events_scd2",
    "x_events_ewma",
    "x_text_cms_heavyhitters",
    "j_bloom_prefilter",
    "j_fuzzy_edit_join",
    "x_text_hll_distinct",
    "x_dedup_kmv_overlap",
    "x_dedup_cdc_chunks",
    "a_topk_per_group",
    "x_media_audio_vad",
    "x_pipeline_budget_mix",
    "x_graph_pagerank",
    "x_graph_triangles",
    "x_events_pattern",
    "j_skyline_dominance",
    "x_dedup_setjoin",
    // round-6 additions
    "x_dedup_minhash_calibration",
    "x_ann_recall_ivf",
    "d_time_travel",
    "d_zorder_layout",
    "d_matview_incremental",
    "x_ann_nprobe_sweep",
    "x_graph_labelprop",
    "x_graph_khop",
    "x_pipeline_dsir",
    "x_text_hash_embed",
    "d_analyze_histogram",
    "x_pipeline_expectations",
    "x_pipeline_drift_psi",
    "a_moments",
    // round-6 session-2 additions
    "x_dedup_containment",
    "x_media_phash_hamming_join",
    "x_ann_mrl_truncate",
    "x_pipeline_tokenizer_coverage",
    "x_pipeline_split_leakage",
    "x_stream_cdc_upsert",
    "x_ann_centroid_drift",
    "x_text_lm_kn",
    "x_search_more_like_this",
    "x_events_changepoint",
    "x_pipeline_dataset_card",
    "x_events_abtest",
    "x_ann_pq_residual_topk",
    "x_ann_pq_residual_indexed",
    "x_graph_modularity",
    "x_events_outlier_mad",
    "x_ann_mrl_rerank",
    "x_text_collocations_pmi",
    "x_ann_ood_detection",
    "x_events_conversion_lag",
    "x_pipeline_quality_classifier",
    "x_events_survival_km",
    "x_pipeline_auc",
    "x_pipeline_active_learning",
    "x_events_active_users",
    "x_text_zipf_fit")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // FAIR job scheduling for the multi-user section: under the default
      // FIFO scheduler a 0.1 s scan-agg submitted by user B queues behind
      // every stage of user A's in-flight join, so small-query latency
      // measures queue depth, not the engine. Each user thread below runs
      // in its own fair pool — the same per-connection fairness a
      // multi-user reference deployment gets.
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.tune(spark)

    // execution-only timing (construction/analysis excluded) — the
    // round-over-round-comparable number the headline set has always
    // reported
    // between-queries hygiene: clearCache drops SQL-cache entries, and
    // the explicit unpersist drops DEAD localCheckpoint blocks — every
    // barrier()ing query registers its checkpoint RDDs in the block
    // manager, and without this they accumulate across the ~80-query
    // bench until storage pressure squeezes execution memory (round-6's
    // x_dedup_cc read 6.8 s in the extended section vs 2.3 s in a clean
    // JVM purely from that buildup). Runs BEFORE construction, never
    // mid-query, so a query's own fresh checkpoints are untouched.
    def resetState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def run(name: String): Double = {
      resetState()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    // end-to-end timing for the extended set: iterative operators
    // (x_dedup_cc's convergence loop, the ANN k-means trainings) run
    // eager actions while the DataFrame is being BUILT, which the
    // save-only timer above would miss entirely
    def runE2eIn(name: String, dir: String): Double = {
      resetState()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    def runE2e(name: String): Double = runE2eIn(name, sfDir)

    // warmup: absorb session startup, file-listing, and first-codegen cost
    // outside the timings — touch every table, then one full query
    try {
      Tables.all.foreach(t => Tables.table(spark, sfDir, t).count())
      run("q06_forecast_revenue")
    } catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }

    // SPARK_GRAFT_BENCH_ALL=1 times every registered query (slow-outlier
    // hunting); SPARK_GRAFT_BENCH_ONLY=a,b,c times just those (local
    // iteration on one op); default is the headline set the driver records.
    val names =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
        case Some(list) => list.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        case None =>
          if (sys.env.get("SPARK_GRAFT_BENCH_ALL").contains("1"))
            SparkEntry.queries.keys.toSeq.sorted
          else headline
      }
    // best-of-N (default 2): the first execution of a plan pays one-time
    // whole-stage-codegen compilation; steady-state is the throughput
    // number comparable to a warmed reference engine
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    // a failed query is reported as JSON null, never a numeric sentinel a
    // consumer could silently fold into sums/averages
    def jnum(v: Option[Double]): String = v.map(_.toString).getOrElse("null")
    // targeted iteration mode: time just the named queries end-to-end
    // (construction included, like the extended section), print one line,
    // and skip every other section
    if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY")) {
      val only = names.map { name =>
        val sec =
          try Some((1 to runs).map(_ => runE2eIn(name, sfDir)).min)
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            None
          }
        "\"" + name + "\":" + jnum(sec)
      }
      println(s"""{"metric":"only","queries":${
        only.mkString("{", ",", "}")},"sf":"$sfDir"}""")
      spark.stop()
      return
    }

    // queries whose construction now materializes eagerly (the banded
    // dedup family localCheckpoints its band table at build time) are
    // timed END-TO-END in the headline so the metric keeps measuring the
    // same work it measured when their plans were fully lazy — otherwise
    // the checkpoint would silently move the signature map out of the
    // timed window and fake a speedup. A BENCH_ALL sweep times EVERY
    // query end-to-end for the same reason: the Prefix-scan and
    // LR-training families also do real work at construction, and an
    // outlier hunt that excludes it would miss the outliers.
    val eagerHeadline = Set("x_dedup_minhash_lsh")
    val benchAll = sys.env.get("SPARK_GRAFT_BENCH_ALL").contains("1")
    val results: Seq[(String, Option[Double])] = names.map { name =>
      def once(): Double =
        if (benchAll || eagerHeadline(name)) runE2eIn(name, sfDir)
        else run(name)
      val sec =
        try Some((1 to runs).map(_ => once()).min)
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + jnum(v) }
      .mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum

    // concurrency mini-bench — the reference's multi-user story
    // (utils/scenarios/perf/testcase/grptest.sh:17-23 runs the query group
    // from 2 concurrent users): N threads drive the same headline set
    // against one session; report per-query p50/max across users plus a
    // serial baseline measured the same way, so p50/serial is the true
    // contention cost.
    //
    // Two measurement rules fix round-6's phantom 6× "regression":
    //  - no clearCache() inside the section: run()'s global clearCache,
    //    fired from one user thread, was wiping the OTHER user's in-flight
    //    state mid-query — self-sabotage the engine never sees in
    //    production;
    //  - every query's DataFrame is constructed ONCE before the threads
    //    start, so construction-time materialization (the minhash band
    //    table's checkpoint) is paid up-front as the shared artifact it
    //    is, and each user times pure execution of the shared plan —
    //    multi-user latency, not duplicated index builds.
    val users = sys.env.getOrElse("SPARK_GRAFT_BENCH_USERS", "2").toInt
    var concWorst: Option[Double] = None
    val concurrentJson: String =
      if (users <= 1) "{}"
      else {
        // concurrency always runs the headline set, never BENCH_ALL's full
        // list: the d_* queries mutate fixed scratch paths / metastore
        // tables and would race across user threads
        val concNames = headline
        resetState()
        val shared = concNames.flatMap { n =>
          try Some(n -> SparkEntry.queries(n)(spark, sfDir))
          catch { case e: Throwable =>
            System.err.println(s"[bench] concurrent build $n: ${e.getMessage}")
            None
          }
        }.toMap
        def execOnly(n: String): Double = {
          val t0 = System.nanoTime()
          shared(n).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        val serialBase = concNames.flatMap { n =>
          if (!shared.contains(n)) None
          else try Some(n -> execOnly(n))
          catch { case e: Throwable =>
            System.err.println(s"[bench] concurrent serial $n: ${e.getMessage}")
            None
          }
        }.toMap
        val times =
          new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
        val threads = (1 to users).map { u =>
          new Thread(() => {
            // one fair-scheduler pool per user: concurrent queries share
            // the executor fairly instead of queueing whole-job FIFO
            spark.sparkContext.setLocalProperty(
              "spark.scheduler.pool", s"user$u")
            concNames.filter(shared.contains).foreach { n =>
              try times.add(n -> execOnly(n))
              catch { case e: Throwable =>
                System.err.println(s"[bench] concurrent $n: ${e.getMessage}")
                times.add(n -> -1.0)
              }
            }
          })
        }
        threads.foreach(_.start())
        threads.foreach(_.join())
        import scala.jdk.CollectionConverters._
        val byName = times.asScala.toSeq.groupBy(_._1)
        val ratios = scala.collection.mutable.ArrayBuffer.empty[Double]
        val entries = concNames.flatMap(n => byName.get(n).map { vs =>
          val ok = vs.map(_._2).filter(_ >= 0).sorted
          // lower median: with 2 users the upper median is just the max
          val p50 = if (ok.isEmpty) "null" else ok((ok.size - 1) / 2).toString
          val mx = if (ok.isEmpty) "null" else ok.last.toString
          val ser = serialBase.get(n)
          ser.filter(_ > 0).foreach { s0 =>
            if (ok.nonEmpty) ratios += ok((ok.size - 1) / 2) / s0
          }
          "\"" + n + "\":{\"p50\":" + p50 + ",\"max\":" + mx +
            ",\"serial\":" + jnum(ser) + "}"
        })
        if (ratios.nonEmpty) concWorst = Some(ratios.max)
        entries.mkString("{", ",", "}")
      }

    // dwweek soak analog (reference: utils/scenarios/dwweek/ — nightly bulk
    // load alternating with daytime query groups): each cycle reloads a
    // slice of orders through the cpimport path, then runs a query group.
    val soakCycles = sys.env.getOrElse("SPARK_GRAFT_SOAK_CYCLES", "2").toInt
    // a soak failure must never destroy the already-measured headline and
    // concurrency results, so the whole section is fallible
    val soakJson: String =
      if (soakCycles <= 0) "[]"
      else try {
        import org.apache.spark.sql.functions.col
        val tmp = java.nio.file.Files.createTempDirectory("graft_soak")
        // soak data is throwaway; the finally guarantees the scratch dir is
        // removed even when a mid-cycle failure aborts the loop
        try {
          val group = Seq("q01_pricing_summary", "q06_forecast_revenue",
            "j_inner_large", "a_high_cardinality")
          val cycles = (1 to soakCycles).map { i =>
            val t0 = System.nanoTime()
            val slice = Tables.table(spark, sfDir, "orders")
              .filter(col("o_orderkey") % soakCycles === i - 1)
            sources.Loader.exportCsv(slice, s"$tmp/c$i/csv")
            sources.Loader.loadCsv(spark, s"$tmp/c$i/csv", slice.schema,
              s"$tmp/c$i/parquet")
            val loadSec = (System.nanoTime() - t0) / 1e9
            val q0 = System.nanoTime()
            group.foreach(n =>
              try run(n)
              catch { case e: Throwable =>
                System.err.println(s"[bench] soak $n: ${e.getMessage}") })
            val querySec = (System.nanoTime() - q0) / 1e9
            s"""{"cycle":$i,"load_sec":$loadSec,"query_sec":$querySec}"""
          }
          cycles.mkString("[", ",", "]")
        } finally {
          sources.FsUtil.deleteRecursively(tmp, swallowErrors = true)
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] soak failed: ${e.getMessage}")
        "[]"
      }

    // extended section: heavier pipeline/index queries timed separately so
    // headline_total stays comparable round-over-round
    val extResults: Seq[(String, Option[Double])] = extended.map { name =>
      val sec =
        try Some((1 to runs).map(_ => runE2e(name)).min)
        catch { case e: Throwable =>
          System.err.println(s"[bench] extended $name failed: ${e.getMessage}")
          None
        }
      name -> sec
    }
    val extJson = extResults.map { case (k, v) => "\"" + k + "\":" + jnum(v) }
      .mkString("{", ",", "}")

    // measured scaling curve: self-scale the corpus ~8× (union of
    // id-offset copies into a temp dir; testdata untouched) and run the
    // heaviest extended pipelines at 1× and 8×. Near-linear designs show
    // ratio ≈ factor; a super-linear op (all-pairs, diameter-bound loop)
    // shows here long before a real 100× cluster does. x1 is best-of-2,
    // x8 single-shot — the bias direction OVERSTATES the ratio, so a
    // passing curve is conservative.
    val scaleFactor =
      sys.env.getOrElse("SPARK_GRAFT_SCALING_FACTOR", "8").toInt
    val scalRatios = scala.collection.mutable.ArrayBuffer.empty[Double]
    val scalingJson: String =
      if (scaleFactor <= 1) "{}"
      else try {
        import org.apache.spark.sql.functions.{col, lit}
        val tmp = java.nio.file.Files.createTempDirectory("graft_scale")
        try {
          val off = 100000000L // id offset per copy; copy 0 keeps the
                               // original ids, so the vec_id<10 query
                               // sets stay fixed while the corpus grows
          def scaleUp(table: String, idCol: String): Unit = {
            val base = Tables.table(spark, sfDir, table)
            (0 until scaleFactor)
              .map(i => base.withColumn(idCol, col(idCol) + lit(i * off)))
              .reduce(_ unionAll _)
              .write.mode("overwrite").parquet(s"$tmp/$table.parquet")
          }
          scaleUp("documents", "doc_id")
          scaleUp("embeddings", "vec_id")
          // prebuild both ANN indexes so the ivfpq entry times the
          // read-side query, not construction
          operators.AnnIndex.ensureBuilt(spark, sfDir)
          operators.AnnIndex.ensureBuilt(spark, tmp.toString)
          // auc + dsir cover the round-7 Prefix-scan rewrites: the
          // window-free rank path must stay sublinear as the corpus grows
          val scaleQs = Seq("x_dedup_minhash_lsh", "x_dedup_chunks",
            "x_dedup_cc", "x_search_bm25", "x_ann_ivfpq_indexed",
            "x_dedup_setjoin", "x_graph_pagerank", "x_pipeline_auc",
            "x_pipeline_dsir")
          val entries = scaleQs.map { name =>
            try {
              val x1 = (1 to 2).map(_ => runE2eIn(name, sfDir)).min
              val xn = runE2eIn(name, tmp.toString)
              val ratio = if (x1 > 0) xn / x1 else -1.0
              if (x1 > 0) scalRatios += ratio
              s""""$name":{"x1":$x1,"x$scaleFactor":$xn,"ratio":$ratio}"""
            } catch { case e: Throwable =>
              System.err.println(s"[bench] scaling $name: ${e.getMessage}")
              s""""$name":null"""
            }
          }
          s"""{"factor":$scaleFactor,"queries":${
            entries.mkString("{", ",", "}")}}"""
        } finally {
          sources.FsUtil.deleteRecursively(tmp, swallowErrors = true)
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] scaling failed: ${e.getMessage}")
        "{}"
      }

    val line = s"""{"metric":"headline_total","value":$total,"unit":"sec","queries":$qs,"extended":$extJson,"scaling":$scalingJson,"concurrent":{"sessions":$users,"queries":$concurrentJson},"soak":$soakJson,"sf":"$sfDir"}"""
    // full-precision, full-section copy: sbt wraps stdout in [info] noise
    // and the driver's stdout tail capture is ~2 KB, so the complete
    // artifact always lands in this file
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_out.json"), line + "\n")
    // printed line: must parse out of the driver's ~2 KB tail buffer —
    // round-5's full line (~3.6 KB) was truncated mid-JSON and recorded as
    // parsed:null. Print headline (rounded to ms) always, plus as many of
    // the secondary sections as fit under the budget.
    def r3(d: Double): Double = math.rint(d * 1000) / 1000
    def jnum3(v: Option[Double]): String =
      v.map(x => r3(x).toString).getOrElse("null")
    val qs3 = results.map { case (k, v) => "\"" + k + "\":" + jnum3(v) }
      .mkString("{", ",", "}")
    val ext3 = extResults.map { case (k, v) => "\"" + k + "\":" + jnum3(v) }
      .mkString("{", ",", "}")
    // the three regression signals the driver-visible line must NEVER
    // drop (round-6's tail truncation lost the extended/scaling/
    // concurrent sections entirely): extended-section total, worst
    // measured scaling ratio, worst concurrent p50/serial ratio
    val extTotal = r3(extResults.flatMap(_._2).sum)
    // ext_fail guards ext_total's blind spot: a crashing extended query
    // drops OUT of the sum, which would otherwise read as a speedup
    val extFail = extResults.count(_._2.isEmpty)
    val scalWorst = jnum(scalRatios.maxOption.map(r3))
    val concW = jnum(concWorst.map(r3))
    val signals = s""","ext_total":$extTotal,"ext_fail":$extFail""" +
      s""","scal_worst":$scalWorst,"conc_worst":$concW"""
    val head = s"""{"metric":"headline_total","value":${r3(total)},"unit":"sec","queries":$qs3"""
    val tailF = s"""$signals,"sf":"$sfDir"}"""
    val withExt = s"""$head,"extended":$ext3$tailF"""
    val compact =
      if (withExt.length <= 1700) withExt
      else head + tailF
    println(compact)
    spark.stop()
  }
}
