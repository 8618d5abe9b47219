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
    "x_text_zipf_fit",
    // round-8 additions: the ANN lifecycle maintenance legs (composed
    // merge/delete are training-inclusive oracle gates; maintenance is
    // the persisted segmented path incl. base train + append + tomb)
    "x_ann_index_merge",
    "x_ann_index_delete",
    "x_ann_index_maintenance")

  // ---- machine-state guard (round-9, after the r8 driver artifact was
  // taken on a co-loaded VM and read 9.9 s/10.5× against 6.3 s/2.2× for
  // identical code, with nothing in the JSON to tell): sample load
  // average and CPU steal around the run, re-run any timing whose reps
  // disagree wildly, and stamp the artifact `contended` when the
  // evidence says the numbers are polluted — a contaminated artifact of
  // record must self-identify instead of requiring a judge re-run. ----

  /** 1-minute load average, -1 when unreadable (non-Linux). */
  private def loadAvg(): Double =
    try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).trim.split("\\s+")(0)
      .toDouble
    catch { case _: Exception => -1.0 }

  /** Cumulative (steal, total) jiffies from /proc/stat's cpu line —
    * deltas give the fraction of time the hypervisor ran OTHER tenants
    * on our cpus, the direct co-load signal a loadavg (which includes
    * our own threads) cannot isolate. */
  private def cpuJiffies(): (Long, Long) =
    try {
      val f = java.nio.file.Files.readAllLines(
          java.nio.file.Paths.get("/proc/stat")).get(0)
        .trim.split("\\s+").drop(1).map(_.toLong)
      (if (f.length > 7) f(7) else 0L, f.sum)
    } catch { case _: Exception => (0L, 0L) }

  /** Deterministic CPU calibration: aggregate xorshift64 throughput in
    * M iterations/sec across `threads` threads. A STEADY co-tenant load
    * defeats every other guard — containerized loadavg doesn't see the
    * host, steal only sees the hypervisor, and the spread re-runs
    * converge (onto uniformly slow values) when the interference is
    * constant rather than bursty. A fixed arithmetic workload is the
    * yardstick none of that can fool: round-over-round, probe_1
    * (single-core speed) and probe_n (whole-machine headroom) make a
    * "same code, 1.6× slower everywhere" artifact attributable to the
    * machine in one glance.
    *
    * Per-thread work is FIXED, not total÷threads: dividing a fixed
    * total by the thread count shrinks per-thread wall toward the
    * thread start/join overhead as core counts grow, deflating the
    * aggregate rate enough to false-trip the par_eff threshold on a
    * big IDLE machine. Fixed per-thread work keeps wall ~0.4 s at any
    * thread count on an idle box; under co-load it stretches — which
    * is the measurement. */
  private def cpuProbe(threads: Int): Double = {
    val iters = 200000000L
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val t0 = System.nanoTime()
    val ts = (1 to threads).map { i =>
      val th = new Thread(() => {
        var x = 0x9E3779B97F4A7C15L + i
        var n = 0L
        while (n < iters) {
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17
          n += 1
        }
        sink.addAndGet(x) // defeat dead-code elimination
      })
      th.start(); th
    }
    ts.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    if (sink.get() == Long.MinValue) println("") // keep sink observable
    math.rint(threads * iters / sec / 1e6 * 10) / 10
  }

  /** Mixed-leg verdict, finalized after the machine-state verdict is
    * known. Returns (okJson, reasonJson) for the artifact:
    *  - a torn snapshot or a reader/writer error is `false` REGARDLESS
    *    of contention — co-load slows queries, it cannot tear MVCC
    *    snapshots, so those failures always indict the engine;
    *  - p95/serial bound violations alone on a CONTENDED run emit
    *    `null` with reason `"contended"`: the serial denominators were
    *    themselves measured under load (round-11's driver artifact
    *    carried q01 serial 1.33 s vs the builder's 0.20 s), so the
    *    ratios convict the machine, and the artifact of record must
    *    say so machine-readably instead of printing a bare red a human
    *    has to acquit against steal_pct (reference analog: the perf
    *    harness annotates run TYPE — Disk/Cache — rather than leaving
    *    unlike runs to be compared raw, grptest.sh:17-23);
    *  - bound violations on an UNCONTENDED run stay an honest `false`
    *    with reason `"p95_bound"` — the builder artifact must still be
    *    able to fail.
    * The violation list itself is always emitted either way. */
  /** Violations surviving the mixed leg's confirm re-leg: second-leg
    * violations whose QUERY also violated in the first observation
    * (entries are "query:ratio>bound" strings; ratios differ between
    * observations, the query name is the reproducibility key). */
  def confirmedViolations(first: Seq[String],
      second: Seq[String]): Seq[String] = {
    val firstQs = first.map(_.takeWhile(_ != ':')).toSet
    second.filter(v => firstQs(v.takeWhile(_ != ':')))
  }

  /** Shared verdict state machine for the self-validating legs
    * (mixed conc4, 2-user concurrent, scaling — round 13 made the
    * family uniform): hard failures (torn snapshots, errors) are
    * `false` regardless of contention; bound-only trips on a
    * contended machine are `null/"contended"`; quiet-machine trips
    * are an honest `false` with the leg's own bound name
    * (`boundReason`: "p95_bound" for conc4, "p50_bound" for the
    * 2-user leg, "ratio_bound" for scaling). */
  def conc4Verdict(consistent: Boolean, errors: Int,
      violations: Seq[String], contended: Boolean,
      boundReason: String = "p95_bound"): (String, String) =
    if (!consistent) ("false", "\"inconsistent_snapshot\"")
    else if (errors > 0) ("false", "\"errors\"")
    else if (violations.nonEmpty) {
      if (contended) ("null", "\"contended\"")
      else ("false", "\"" + boundReason + "\"")
    } else ("true", "null")

  // ---- pinned machine yardstick (round-14 directive #1): the builder
  // headline drifted +17% in BOTH round 12 and round 13 with zero
  // query-code change, each time acquitted by a bespoke judge-side
  // narrative — a drift envelope larger than any plausible code
  // regression means the raw round-over-round comparison can no longer
  // catch one. The artifact already records the machine yardsticks
  // (cpu probes, io probe); normalization makes the comparison
  // arithmetic: every artifact now carries a `normalized` headline =
  // raw × (this run's probe speeds ÷ the PINNED reference speeds),
  // i.e. "what this headline would have read on the yardstick
  // machine" (wall ∝ 1/speed, so a slower machine's factor < 1
  // deflates its inflated walls back). The pins come from the round-13
  // builder artifact of record (BENCH_r13_builder.json,
  // contended:false, entry load 0.0) and live HERE, not in
  // BASELINE.json (driver-owned file), with the values echoed into
  // every artifact under normalized.yardstick so the formula is
  // reproducible from the artifact alone. Re-pin only against a new
  // committed contended:false builder artifact, with a SCALE.md note —
  // re-pinning resets the comparison basis exactly like a fingerprint
  // migration resets plan history. Limits (SCALE.md §normalization):
  // the probes are entry-window samples adjacent to the headline, so a
  // burst arriving mid-headline is the retry policy's job, not the
  // factor's; and the io probe measures sequential bandwidth, so a
  // pure storage-LATENCY shift (the r12 control experiment's class) is
  // only partially captured. ----
  val yardstickFrom = "BENCH_r13_builder.json"
  val yardstickCpu1 = 495.3 // M iter/s, single thread
  val yardstickCpuN = 11345.3 // M iter/s, at yardstickCpuNThreads
  // the all-threads probe is only comparable at the SAME thread count
  // it was pinned at (an 8-thread run's aggregate is a third of a
  // 32-thread run's on the same machine — thread count, not co-load);
  // runs at other counts drop the cpuN ratio from the factor
  val yardstickCpuNThreads = 32
  val yardstickIoWarm = 2879.3 // MB/s, warm sequential parquet read

  /** Machine-speed factor vs the pinned yardstick: geometric mean of
    * the VALID probe ratios (this run ÷ yardstick), each clamped to
    * [0.5, 2.0] so one bogus or wildly-off probe cannot dominate the
    * normalized number (a clamp hit is itself visible: the ratios are
    * emitted raw next to the factor). Invalid ratios (probe failed,
    * read ≤0) are dropped; all-invalid degrades to 1.0 — normalized
    * equals raw rather than silently vanishing. */
  def normFactor(ratios: Seq[Double]): Double = {
    val valid = ratios.filter(r => r > 0 && !r.isNaN && !r.isInfinite)
      .map(r => math.min(2.0, math.max(0.5, r)))
    if (valid.isEmpty) 1.0
    else math.exp(valid.map(math.log).sum / valid.size)
  }

  /** Median of the VALID samples (>0, finite); -1 when none are. The
    * yardstick probes are median-of-3 as of round 15 (r14 residual
    * #3: the factor's inputs were single entry-window samples, so one
    * noisy draw moved the normalized headline directly — this round's
    * r14 io probe even sat ON the 0.5 clamp floor with nothing in the
    * artifact saying whether that was a steady state or one bad
    * read). */
  def medianOf(xs: Seq[Double]): Double = {
    val valid = xs.filter(x => x > 0 && !x.isNaN && !x.isInfinite).sorted
    if (valid.isEmpty) -1.0 else valid((valid.size - 1) / 2)
  }

  /** Probe spread as a percentage of the median ((max-min)/median) —
    * emitted next to each median-of-3 probe so clamp hits and probe
    * variance are visible in the artifact instead of silently folded
    * into the factor. -1 when fewer than 2 valid samples. */
  def spreadPct(xs: Seq[Double]): Double = {
    val valid = xs.filter(x => x > 0 && !x.isNaN && !x.isInfinite)
    val med = medianOf(valid)
    if (valid.size < 2 || med <= 0) -1.0
    else math.rint((valid.max - valid.min) / med * 1000) / 10
  }

  /** Per-query wall ratios (this run ÷ trailing same-plan median) for
    * the wall-basis machine factor — only queries present in BOTH maps
    * with a positive median contribute. The trailing map is already
    * plan-hash-scoped and ≥3-priors-scoped by its builders, so a ratio
    * here compares like with like on the same measurement basis. */
  def wallRatios(walls: Map[String, Double],
      trailing: Map[String, Double]): Seq[Double] =
    walls.toSeq.flatMap { case (n, w) =>
      trailing.get(n).filter(m => m > 0 && w > 0).map(w / _)
    }

  /** Wall-basis machine factor (round-15 directive #1): the probe
    * factor normalizes against a PROXY workload (xorshift loops, one
    * sequential read) and overcorrected in r14 — probes said 0.64
    * while plan-matched walls said ~0.78, so the README claimed a
    * −16.6% improvement in a round with zero operator-code change.
    * This factor measures the WORKLOAD itself: median of (this run's
    * wall ÷ trailing same-plan bench median) across every registry
    * query with ≥3 priors and an unchanged plan hash, inverted into
    * the same speed convention as normFactor (factor < 1 = slower
    * machine; normalized = raw × factor). The median over dozens-to-
    * hundreds of plan-matched pairs is robust without clamping — and
    * unlike the probes it sees storage latency, page-cache state, and
    * JIT quality exactly as the queries do. Returns
    * (factor, medianRatio, nPairs); factor -1 when fewer than
    * minPairs pairs exist (fresh history, drills with history off). */
  def wallFactor(ratios: Seq[Double],
      minPairs: Int = 5): (Double, Double, Int) = {
    val valid = ratios.filter(r => r > 0 && !r.isNaN && !r.isInfinite)
    if (valid.size < minPairs) (-1.0, -1.0, valid.size)
    else {
      val med = medianOf(valid)
      (1.0 / med, med, valid.size)
    }
  }

  /** Run-wide wall budget (round-16 directive #1): the r15 32-core
    * driver run was killed by the driver's own timeout (rc 124) while
    * still inside the extended section, so NO JSON line was ever
    * printed and the whole round lost its round-over-round comparison.
    * The budget inverts the failure mode: every section (and every
    * query inside the long extended/sweep loops) first checks the
    * remaining wall and SKIPS-AND-REPORTS instead of running past the
    * driver's window — the one-line JSON with whatever completed always
    * beats a dead process with nothing. Skips are recorded by section
    * name in the artifact's `budget` object; the headline section is
    * never skipped (it is the driver contract). Default 2100 s sits
    * well inside the observed driver window (the r14 full run passed at
    * 1881 s); override via SPARK_GRAFT_BENCH_BUDGET_SEC (0 = unlimited,
    * for drills whose own loops manage time). */
  final class WallBudget(val budgetSec: Double) {
    private val t0 = System.nanoTime()
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    def elapsed: Double = (System.nanoTime() - t0) / 1e9
    def remaining: Double =
      if (budgetSec <= 0) Double.MaxValue else budgetSec - elapsed
    /** Gate a section: true = run it; false = skip, recorded. */
    def allows(section: String, reserveSec: Double): Boolean = {
      val ok = remaining > reserveSec
      if (!ok) {
        skipped += section
        System.err.println(f"[bench] budget: skipping $section " +
          f"($remaining%.0f s left < $reserveSec%.0f s reserve)")
      }
      ok
    }
    /** Quiet check for per-query loop guards (the loop records ONE
      * section-level skip entry itself, not one per query). */
    def has(reserveSec: Double): Boolean = remaining > reserveSec
  }

  /** Do the probe-basis and wall-basis factors disagree by >15%?
    * (round-15 directive #1: when they do, the walls win — they
    * measure the workload, not a proxy — and the artifact + README
    * must flag the disagreement instead of printing the probe number
    * as truth). False when either factor is invalid. */
  def factorsDisagree(probeFactor: Double, wallsFactor: Double): Boolean =
    probeFactor > 0 && wallsFactor > 0 &&
      math.abs(probeFactor / wallsFactor - 1.0) > 0.15

  /** Should the mixed leg settle-and-re-leg? (round-15 directive #2:
    * the r14 builder's conc4 leg read 6.34% window steal, correctly
    * withheld its bound verdict — and the round ended with the bound
    * question unanswered. The headline has a retry policy for exactly
    * this; the mixed leg gets the same discipline.) Re-leg only when
    * the verdict WOULD be withheld on window evidence: bound
    * violations survived the confirm pass, nothing hard-failed
    * (torn snapshots and errors stand on their own — they are never
    * machine-attributable), and the leg's own window was dirty
    * (steal > 2.5% or serial inflation). A bound trip on a QUIET
    * window is an honest false and must not be retried away. */
  def shouldSettleReleg(consistent: Boolean, errors: Int,
      violations: Seq[String], legWindowDirty: Boolean): Boolean =
    consistent && errors == 0 && violations.nonEmpty && legWindowDirty

  /** Run-level machine-state verdict, window-weighted (round-14
    * directive #2): three of the last four DRIVER artifacts
    * self-flagged `contended` from the unstable-timings branch alone —
    * r13's driver run carried the fastest windows ever measured
    * (headline 5.965 s, steal 0.78%, par_eff 0.89) yet printed
    * contended:true because two sub-second queries failed the 25%
    * convergence guard on GC variance. A per-query timing symptom may
    * no longer convict the whole run UNLESS at least one WINDOWED
    * sensor corroborates it (probe decay entry→exit, a section-exit
    * probe decay, serial inflation in a verdict leg, a dirty kept
    * headline-retry window, or steal above 2.5%). The direct machine
    * evidence — hypervisor steal >5% over the run, parallel efficiency
    * below 0.35 — still convicts on its own, corroborated or not. The
    * raw entry loadavg stays recorded in `load.entry` for forensics
    * and remains a non-trigger (launch-tail load average, round-9
    * rationale unchanged). */
  def runContended(stealPct: Double, parEff: Double, cpus: Int,
      unstableCount: Int, pristine: Boolean,
      windowCorroborated: Boolean): Boolean =
    stealPct > 5.0 || (cpus > 1 && parEff < 0.35) ||
      ((if (pristine) unstableCount >= 2 else unstableCount >= 1) &&
        windowCorroborated)

  /** Which headline window to keep after a retry (ADVICE r13: when the
    * retry was triggered by probe decay alone, both windows' unstable
    * lists are empty and the old size-comparison tie kept the FIRST
    * window even if the retry's exit probe was clearly healthier —
    * e.g. first decayed 40%, retry 16%, both below the 0.85 bar). On
    * an unstable-count tie the exit probes break it: keep the window
    * whose probe held up better. */
  def keepRetryWindow(retryClean: Boolean, firstUnstable: Int,
      retryUnstable: Int, probeFirstExit: Double,
      probeRetryExit: Double): Boolean =
    retryClean || retryUnstable < firstUnstable ||
      (retryUnstable == firstUnstable && probeRetryExit > probeFirstExit)

  /** Reference walls for the serial-inflation sensor (round-14
    * directive #3 closes the loop round 13 left open: the sensor's
    * references came from the same run's headline, so if the headline
    * window itself ran dirty — the case the retry policy exists for
    * but can only retry once — the 1.25× trigger quietly loosened).
    * Default: this run's headline walls. The trailing same-plan
    * bench-basis medians override per-query (≥3 priors; headline wall
    * as the fallback for queries with no history) only when the KEPT
    * headline window is still DIRTY — r14 substituted whenever the
    * retry merely FIRED, which discarded a clean kept window's
    * perfectly good walls (ADVICE r14). The medians were measured
    * under PRIOR rounds' machine speed, so they are re-expressed in
    * this machine's seconds by dividing by the run's probe-basis
    * normalization factor (wall ∝ 1/speed: on a machine reading
    * nFactor 0.64 — r14's — honest serials run ~1.5× the faster
    * rounds' medians and would spuriously fire serial_inflation
    * against the raw medians). nFactor ≤ 0 (degenerate) leaves the
    * medians unscaled. */
  def serialRefWalls(windowDirty: Boolean,
      headline: Map[String, Double],
      trailingMedians: Map[String, Double],
      nFactor: Double = 1.0): Map[String, Double] =
    if (!windowDirty) headline
    else headline ++ trailingMedians.map { case (n, m) =>
      n -> (if (nFactor > 0) m / nFactor else m)
    }

  /** Steal percentage between two `cpuJiffies()` samples — the
    * per-LEG co-load sensor (round 14): a hypervisor burst confined
    * to a verdict leg's 30–60 s window evades entry-vs-exit probe
    * decay (the burst is gone by leg exit) and can miss the
    * serial-inflation sensor (the serial references are measured
    * just before the reader window), yet it is exactly what inflates
    * the leg's p95s — three r14 builder attempts reproduced the
    * shape: serials byte-identical to r13's, concurrent samples
    * uniformly ~2× slower, run-level steal 1.5–2.4% (diluted below
    * every threshold). Bracketing the leg's own window with jiffies
    * samples measures the burst where it lands. */
  def stealBetween(j0: (Long, Long), j1: (Long, Long)): Double =
    if (j1._2 > j0._2)
      // floor at 0: a steal counter that REGRESSES between samples (VM
      // migration / counter reset) while total jiffies advance would
      // otherwise emit a negative percentage into the artifact's
      // steal_pct fields — it can't trip the >2.5 thresholds, but
      // negative steal is nonsense forensics (ADVICE r14)
      math.max(0.0, 100.0 * (j1._1 - j0._1) / (j1._2 - j0._2))
    else 0.0

  /** Serial-inflation sensor (round 13; reference walls parameterized
    * in round 14): a verdict leg's serial references are
    * EXECUTION-ONLY MEDIANS of warm shared plans (median-of-3 in both
    * the mixed and the 2-user leg), so they can never legitimately
    * exceed the same queries' reference walls (headline best-of-N
    * end-to-end, or trailing bench medians when the headline window
    * was suspect — see serialRefWalls). Two or more serials reading
    * >1.25× their reference (and >0.15 s over — sub-150 ms plans
    * jitter that much on GC alone) convict the leg's own window of a
    * co-load burst, even one steady enough to hide from entry-vs-exit
    * probe decay; clean-run serials measure 0.4–0.9× their headline
    * walls, far from the trigger. */
  def serialsInflated(serials: Map[String, Double],
      refWalls: Map[String, Double]): Boolean =
    serials.count { case (n, s0) =>
      refWalls.get(n).exists(h => s0 > 1.25 * h && s0 > h + 0.15)
    } >= 2

  /** Sequential-read throughput (MB/s) over the corpus' largest parquet
    * file — the I/O yardstick the CPU probes cannot substitute for.
    * Round-12 lesson: a ~20% headline drift arrived with every CPU
    * probe flat (518 vs 527 M/s single-core, par_eff 0.88, steal
    * 0.46%) and was proven environmental by rebuilding the PREVIOUS
    * round's commit and measuring the same walls in the same window —
    * the machine class the arithmetic yardstick is blind to is
    * storage/page-cache latency, which short scan-bound queries feel
    * first while long pipelines amortize it. Two passes: the first
    * mixes cold and cached state, the second is warm; both reported so
    * a round-over-round artifact comparison can attribute a headline
    * drift to the I/O path in one glance. */
  private def ioReadOnce(sfDir: String): Double =
    try {
      def files(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(files) else Seq(f)
      val target = files(new java.io.File(sfDir))
        .filter(_.getName.endsWith(".parquet")).maxBy(_.length)
      val ch = java.nio.file.Files.newByteChannel(target.toPath)
      try {
        val buf = java.nio.ByteBuffer.allocate(4 << 20)
        var n = 0L
        val t0 = System.nanoTime()
        var r = 0
        while ({ buf.clear(); r = ch.read(buf); r >= 0 }) n += r
        math.rint(n / 1e6 / ((System.nanoTime() - t0) / 1e9) * 10) / 10
      } finally ch.close()
    } catch { case _: Exception => -1.0 }

  /** Size of the file the io probe reads — the io NORMALIZATION ratio
    * is only comparable when the probed file is big enough that
    * throughput, not open/syscall overhead, dominates (the sf0.001
    * corpus' 190 KB largest file reads "0.38× the yardstick" purely
    * from fixed costs). 8 MB floor ≈ the sf0.1 pin's 10.8 MB file. */
  private def largestParquetBytes(sfDir: String): Long =
    try {
      def files(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(files) else Seq(f)
      files(new java.io.File(sfDir))
        .filter(_.getName.endsWith(".parquet")).map(_.length).max
    } catch { case _: Exception => -1L }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // soak-only profile: skip every timing section and run just the
    // warmup + soak (+ crash drills) — the cheap nightly dwweek run
    val soakOnly = sys.env.get("SPARK_GRAFT_SOAK_ONLY").contains("1")
    // run-wide wall budget (see WallBudget's scaladoc): starts BEFORE
    // the entry probes so "elapsed" is the driver's view of the process
    val budget = new WallBudget(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "2100").toDouble)
    // entry load is sampled BEFORE any Spark work, so it measures what
    // else the machine is doing, not our own bench
    val loadEntry = loadAvg()
    val jiffies0 = cpuJiffies()
    // median-of-3 yardstick probes (round-15 directive #3): each probe
    // is sampled 3 times and the MEDIAN feeds everything downstream
    // (normalization ratios, par_eff, retry window guard); the raw
    // triplets + spread ride the artifact so a noisy draw or a clamp
    // hit is attributable instead of silently moving the normalized
    // headline. ~2 s of extra entry cost at 3×0.4 s per cpu probe.
    val probe1Samples = Seq.fill(3)(cpuProbe(1))
    val probeNSamples = Seq.fill(3)(cpuProbe(cpus.toInt))
    val probe1 = medianOf(probe1Samples)
    val probeN = medianOf(probeNSamples)
    // io: first read mixes cold/cached state (reported as the cold
    // figure, same meaning as r12-r14), then 3 warm reads → median
    val ioCold = ioReadOnce(sfDir)
    val ioWarmSamples = Seq.fill(3)(ioReadOnce(sfDir))
    val ioWarm = medianOf(ioWarmSamples)
    // probe-basis normalization ratios + factor, computed AT ENTRY
    // (not emit time) because the serial-inflation sensor now scales
    // its trailing-median references by the factor (ADVICE r14 — the
    // medians were measured at prior rounds' machine speed; on a
    // machine reading factor 0.64 honest serials run ~1.5× those
    // medians and would spuriously fire the sensor)
    val cpu1Ratio = if (probe1 > 0) probe1 / yardstickCpu1 else -1.0
    val cpuNRatio =
      if (probeN > 0 && cpus.toInt == yardstickCpuNThreads)
        probeN / yardstickCpuN
      else -1.0
    val ioWarmRatio =
      if (ioWarm > 0 && largestParquetBytes(sfDir) >= (8L << 20))
        ioWarm / yardstickIoWarm
      else -1.0
    val nFactor = normFactor(Seq(cpu1Ratio, cpuNRatio, ioWarmRatio))
    val loadTrace =
      scala.collection.mutable.ArrayBuffer[(String, Double)]()
    def traceLoad(section: String): Unit =
      loadTrace += section -> loadAvg()
    var benchReruns = 0
    // run-wide convergence-re-run cap (round-16 directive #1; default
    // generous — a quiet run uses single digits, a noisy run is exactly
    // where unbounded re-runs blow the wall)
    val rerunCap =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RERUN_CAP", "24").toInt
    val unstable = scala.collection.mutable.ArrayBuffer.empty[String]
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
    // ALL timing is end-to-end (construction included) as of round 8:
    // the Prefix/barrier rewrites made several queries do real work at
    // DataFrame-construction time, and a save-only timer silently moves
    // that work out of the timed window — the "fake speedup" failure
    // mode. One timer, one basis, nothing excludable. (Headline history:
    // r1–r7 were execution-only for lazily-constructed plans; the bases
    // differ by construction/analysis cost only, single-digit ms for
    // those plans.)
    // plan fingerprints for the query-history batches: captured once
    // per query from the constructed DataFrame (semanticHash of the
    // optimized plan — one extra driver-side Catalyst pass per QUERY,
    // not per rep, outside the timed window). Round 11 widened this
    // from the headline set to every query timed at sfDir, so the
    // full-registry sweep's history rows carry plan hashes too and the
    // regression tripwire can tell "slower" from "slower because the
    // plan changed" across the whole surface.
    val planHashes = scala.collection.mutable.Map.empty[String, String]
    // regression-drill plant knob (round-12 directive: the tripwire's
    // detector is oracle-gated on crafted history, but nothing ever
    // forced a slowdown through the LIVE pipeline — append batch →
    // bench_*-scoped trailing median → regressions field — to show it
    // can flip). SPARK_GRAFT_BENCH_PLANT="<query>:<ms>" injects a
    // sleep INSIDE the named query's timed window, so the planted wall
    // flows through the identical recording path as a real slowdown.
    // scripts/regression_drill.sh stages 3 clean runs + 1 planted + 1
    // clean and asserts the field reads 0 → ≥1 → 0.
    val plant: Option[(String, Long)] =
      sys.env.get("SPARK_GRAFT_BENCH_PLANT").flatMap { s =>
        s.split(":", 2) match {
          case Array(n, ms) => scala.util.Try(n -> ms.toLong).toOption
          case _ => None
        }
      }
    // scaling-drill plant knob (round-13 directive: the scaling verdict
    // below needs the same live-fire proof the conc4 verdict got).
    // "<query>:<ms>" sleeps ms inside the named query's timed window
    // ONLY when it runs against a scaled-up corpus (dir != sfDir), so
    // the x1 denominators stay clean and the planted ratio flows
    // through the identical breach → pair-confirm → verdict path a
    // genuine super-linear regression would.
    val scalingPlant: Option[(String, Long)] =
      sys.env.get("SPARK_GRAFT_SCALING_PLANT").flatMap { s =>
        s.split(":", 2) match {
          case Array(n, ms) => scala.util.Try(n -> ms.toLong).toOption
          case _ => None
        }
      }
    // conc4 settle-releg drill knob (round-15 directive #2): a comma
    // list of FAKE per-observation leg-steal readings, consumed one
    // per runMixLeg call (last value reused beyond). The settle-releg
    // path triggers only on a dirty leg window — unforceable on a
    // quiet drill machine — so the drill overrides the sensor READING
    // (never the measurement path of a real run: empty list = real
    // jiffies), walks plant→withhold→settle→re-leg live, and the knob
    // is recorded in `plants` so the artifact self-identifies as
    // falsified (scripts/conc4_drill.sh asserts it;
    // update_readme_bench.py refuses planted artifacts).
    val conc4StealPlant: Seq[Double] =
      sys.env.get("SPARK_GRAFT_CONC4_STEAL_PLANT").toSeq
        .flatMap(_.split(","))
        .flatMap(s => scala.util.Try(s.trim.toDouble).toOption)
    // every active plant knob is RECORDED in the artifact (ADVICE r12:
    // a leftover exported env var would otherwise produce a falsified
    // artifact indistinguishable from a genuine run). The drill
    // scripts assert the field; update_readme_bench.py refuses to
    // quote a planted artifact.
    val plantsJson: String = (
      plant.map { case (n, ms) => s"bench:$n:$ms" }.toSeq ++
      sys.env.get("SPARK_GRAFT_MIXED_PLANT").filter(_.nonEmpty)
        .map(s => s"mixed:$s").toSeq ++
      scalingPlant.map { case (n, ms) => s"scaling:$n:$ms" }.toSeq ++
      sys.env.get("SPARK_GRAFT_CONC4_STEAL_PLANT").filter(_.nonEmpty)
        .filter(_ => conc4StealPlant.nonEmpty)
        .map(s => s"conc4steal:$s").toSeq
    ).map("\"" + _ + "\"").mkString("[", ",", "]")
    def runE2eIn(name: String, dir: String): Double = {
      resetState()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.mode("overwrite").format("noop").save()
      plant.foreach { case (n, ms) => if (n == name) Thread.sleep(ms) }
      scalingPlant.foreach { case (n, ms) =>
        if (n == name && dir != sfDir) Thread.sleep(ms) }
      val sec = (System.nanoTime() - t0) / 1e9
      if (dir == sfDir && !planHashes.contains(name))
        try planHashes(name) = graft.plans.QueryStats.planHash(df)
        catch { case _: Throwable => }
      sec
    }
    def runE2e(name: String): Double = runE2eIn(name, sfDir)
    def run(name: String): Double = runE2e(name)

    // best-of with a CO-LOAD guard: accept once the two fastest reps
    // agree within 25% (steady-state timings of a compiled plan do on an
    // idle machine); otherwise re-run up to 2 extra reps — contention
    // turns best-of-N into a lottery, and the artifact must either
    // converge or carry the query's name in `unstable` so a polluted
    // number self-identifies
    def runStable(name: String, dir: String, reps: Int): Double = {
      val ts = scala.collection.mutable.ArrayBuffer(
        (1 to reps).map(_ => runE2eIn(name, dir)): _*)
      // 50 ms absolute floor: sub-100 ms plans jitter ±30 ms on GC/IO
      // noise alone — that's not the co-load signal this guard hunts
      def stable = { val s = ts.sorted
        s(1) - s(0) <= math.max(0.25 * s(0), 0.05) }
      var extra = 0
      // convergence re-runs are capped run-wide AND budget-gated
      // (round-16 directive #1): on a contended machine more queries
      // read unstable → more re-runs → more wall, exactly when wall is
      // scarce — the amplifier in the r15 32-core timeout. A query
      // whose extras were withheld stays marked unstable (honest), it
      // just stops paying for confirmation.
      while (reps > 1 && !stable && extra < 2 &&
          benchReruns < rerunCap && budget.has(120)) {
        ts += runE2eIn(name, dir); extra += 1; benchReruns += 1
      }
      if (reps > 1 && !stable) unstable += name
      ts.min
    }

    // warmup: absorb session startup, file-listing, and first-codegen
    // cost outside the timings. count() alone is NOT enough — an
    // empty-schema parquet count reads row-group metadata, not data
    // pages, so the first query touching a big column (documents.text)
    // still paid a cold page-cache read (round-7's bistable
    // x_text_quality: 0.35–0.70 s run to run). Force every column's
    // pages through the page cache, then one full query.
    try {
      Tables.all.foreach { t =>
        val df = Tables.table(spark, sfDir, t)
        df.select(df.columns.map(c =>
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.col(c)).as(c)).toIndexedSeq: _*)
          .collect()
      }
      run("q06_forecast_revenue")
    } catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }

    // SPARK_GRAFT_BENCH_ALL=1 times every registered query (slow-outlier
    // hunting); SPARK_GRAFT_BENCH_ONLY=a,b,c times just those (local
    // iteration on one op); default is the headline set the driver records.
    val names =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
        case Some(list) => list.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        case None =>
          if (soakOnly) Seq.empty
          else if (sys.env.get("SPARK_GRAFT_BENCH_ALL").contains("1"))
            SparkEntry.queries.keys.toSeq.sorted
          else headline
      }
    // best-of-N: the first execution of a plan pays one-time whole-stage-
    // codegen compilation; steady-state is the throughput number
    // comparable to a warmed reference engine. Headline default is 3
    // (round-7's x_text_quality was bistable across best-of-2 runs —
    // the page-cache warmup above plus one more rep pins it); the
    // heavier extended set stays at 2.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val extRuns = math.min(runs, 2)
    // a failed query is reported as JSON null, never a numeric sentinel a
    // consumer could silently fold into sums/averages
    def jnum(v: Option[Double]): String = v.map(_.toString).getOrElse("null")
    def r3(d: Double): Double = math.rint(d * 1000) / 1000
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

    def measureHeadline(): Seq[(String, Option[Double])] = names.map { name =>
      // re-pin the documents text pages right before the one headline
      // entry that reads them: the session-start warmup is minutes old
      // by the 16th query, and under co-tenant page-cache pressure the
      // cold/warm flip put a 0.4 s coin flip on x_text_quality
      // (driver 0.799 vs builder 0.411 on identical round-9 code).
      // One untimed touch scan — same best-of-N warm basis as every
      // other entry, just with the warmth re-established adjacently.
      if (name == "x_text_quality")
        try {
          import org.apache.spark.sql.functions.{col, length, sum}
          Tables.table(spark, sfDir, "documents")
            .agg(sum(length(col("text")))).collect()
        } catch { case e: Throwable =>
          System.err.println(s"[bench] documents touch: $e") }
      val sec =
        try Some(runStable(name, sfDir, runs))
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      name -> sec
    }
    var results: Seq[(String, Option[Double])] = measureHeadline()
    // headline retry policy (round-13 directive: two of the last three
    // DRIVER artifacts were contended while every builder artifact was
    // clean — the guard worked, but an artifact of record that must be
    // acquitted by its own flags erodes the one-glance property). When
    // the HEADLINE WINDOW itself looks polluted — any timing failed to
    // converge, or the single-core probe decayed >15% between entry and
    // headline-exit — the headline section re-runs ONCE and the run
    // whose window-guard is cleaner lands in the artifact; both windows'
    // evidence is recorded in `headline_retry` so nothing is hidden.
    // The `unstable` buffer carries only the KEPT window's entries into
    // the run-level `contended` verdict (the discarded window is
    // forensics, not the measurement). Opt out: SPARK_GRAFT_BENCH_RETRY=0
    // (the drills do — their walls are scaffolding).
    var headlineRetryJson = """{"ran":false}"""
    // window evidence for the run-level contended verdict AND the
    // serial-inflation reference switch (ADVICE r14): keeping a window
    // that is still dirty (not retry_clean) is a windowed contention
    // sensor, and only THAT state — not the retry merely firing —
    // discards the kept headline walls as serial references
    var headlineWindowDirty = false
    val retryEnabled =
      !sys.env.get("SPARK_GRAFT_BENCH_RETRY").contains("0")
    if (names.nonEmpty && retryEnabled) {
      val probeHead = cpuProbe(1)
      def windowClean(uns: Seq[String], probeEnd: Double): Boolean =
        uns.isEmpty && (probe1 <= 0 || probeEnd >= probe1 * 0.85)
      val firstUnstable = unstable.toList
      // the full-headline re-run roughly doubles the headline cost —
      // affordable early, not when the budget says later sections are
      // already at risk (budget gate records itself when it bites)
      if (!windowClean(firstUnstable, probeHead) &&
          budget.allows("headline_retry", 600)) {
        System.err.println(s"[bench] headline window suspect " +
          s"(unstable=${firstUnstable.mkString(",")}, probe " +
          s"$probe1 -> $probeHead M/s) — one full headline re-run")
        val firstResults = results
        unstable.clear()
        val retryResults = measureHeadline()
        val probeRetry = cpuProbe(1)
        val retryUnstable = unstable.toList
        val retryClean = windowClean(retryUnstable, probeRetry)
        // keep the cleaner window; ties (both dirty) keep whichever
        // has fewer non-converging timings, exit probes break a full
        // tie (keepRetryWindow — ADVICE r13: a probe-decay-only retry
        // has two empty unstable lists, and the healthier exit probe
        // is the only evidence left)
        val useRetry = keepRetryWindow(retryClean,
          firstUnstable.size, retryUnstable.size, probeHead, probeRetry)
        if (useRetry) results = retryResults
        else { unstable.clear(); unstable ++= firstUnstable }
        headlineWindowDirty = !(useRetry && retryClean)
        def tot(rs: Seq[(String, Option[Double])]): Double =
          math.rint(rs.flatMap(_._2).sum * 1000) / 1000
        def jl(xs: Seq[String]): String =
          xs.map("\"" + _ + "\"").mkString("[", ",", "]")
        headlineRetryJson =
          s"""{"ran":true,"used":"${if (useRetry) "retry" else "first"}",""" +
            s""""first_total":${tot(firstResults)},""" +
            s""""retry_total":${tot(retryResults)},""" +
            s""""first_unstable":${jl(firstUnstable)},""" +
            s""""retry_unstable":${jl(retryUnstable)},""" +
            s""""probe_entry":$probe1,"probe_first":$probeHead,""" +
            s""""probe_retry":$probeRetry,"retry_clean":$retryClean}"""
        System.err.println(s"[bench] headline retry: kept " +
          (if (useRetry) "retry" else "first") + s" window " +
          s"(retry_clean=$retryClean)")
      }
    }
    traceLoad("headline")
    val qs = results.map { case (k, v) => "\"" + k + "\":" + jnum(v) }
      .mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum

    // persisted query-history stats (querystats analog — reference:
    // utils/querystats/querystats.h): one batch per bench run into a
    // durable history catalog, so round-over-round walls and plan
    // hashes are queryable with the engine itself (d_query_stats is
    // the oracle-gated read side). rows is -1 on this path — the noop
    // sink reports no row count, and counting would re-run the query.
    // Fallible and opt-out-able (SPARK_GRAFT_HISTORY_DIR="") — a
    // history write must never damage the bench.
    val histRoot =
      sys.env.getOrElse("SPARK_GRAFT_HISTORY_DIR", "bench_history")
    val benchTs = System.currentTimeMillis()
    val benchRunId = s"bench_$benchTs"
    try {
      if (histRoot.nonEmpty && results.nonEmpty) {
        plans.QueryStats.append(spark, histRoot, benchRunId,
          results.flatMap { case (n, secOpt) => secOpt.map(s =>
            plans.QueryStats.Entry(n, math.rint(s * 1e6) / 1e3, -1L,
              benchTs, planHashes.getOrElse(n, ""))) })
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] query history append: $e")
    }
    // regression tripwire over the accumulated headline history (the
    // querystats read-back the table exists for): after appending this
    // run's batch, flag any headline query whose latest wall is >3× its
    // trailing same-plan median (≥3 priors), plus plan churn. -1 =
    // tripwire unavailable (fresh/empty history, opt-out, or failure);
    // 0 = checked and clean. Scoped to bench_* run_ids — the sweep's
    // single-shot walls are a different measurement basis.
    var regressionsN = -1
    var regressionNames: Seq[String] = Seq.empty
    // trailing same-plan bench-basis medians (≥3 priors, this run's
    // batch excluded) — the serial-inflation sensor's fallback
    // reference when the headline window was suspect (directive #3;
    // see serialRefWalls)
    var trailingMedians: Map[String, Double] = Map.empty
    try {
      if (histRoot.nonEmpty && results.nonEmpty) {
        val hist = plans.QueryStats.history(spark, histRoot)
        val flagged = plans.QueryStats
          .regressions(hist, runPrefix = Some("bench_"))
          .select("query", "kind").collect()
        regressionsN = flagged.length
        regressionNames = flagged.toSeq
          .map(r => s"${r.getString(0)}:${r.getString(1)}").sorted
        import org.apache.spark.sql.functions.{col, count, lit, median}
        trailingMedians = hist
          .filter(col("run_id").startsWith("bench_") &&
            col("run_id") =!= benchRunId)
          .groupBy(col("query"), col("plan_hash"))
          .agg(median(col("wall_ms")).as("med"), count(lit(1)).as("n"))
          .collect().flatMap { r =>
            val q = r.getString(0)
            if (r.getLong(3) >= 3 && planHashes.get(q).contains(r.getString(1)))
              Some(q -> r.getDouble(2) / 1000.0)
            else None
          }.toMap
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] regression tripwire: $e")
    }

    // serial-inflation sensor references, computed HERE (before the
    // verdict legs) because the conc4 settle-releg decision below
    // needs them mid-run, not just at emit time: this run's headline
    // walls by default; nFactor-scaled trailing same-plan bench
    // medians override per-query when the KEPT headline window is
    // dirty — see serialRefWalls' scaladoc (ADVICE r14: substitution
    // on retry-fired alone discarded a clean kept window's walls, and
    // unscaled prior-round medians false-fire on a slow machine)
    val headlineWall: Map[String, Double] =
      results.collect { case (n, Some(s)) => n -> s }.toMap
    val serialRefs =
      serialRefWalls(headlineWindowDirty, headlineWall, trailingMedians,
        nFactor)

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
    // verdict ingredients for the 2-user leg (round-13 directive: the
    // last compact-line ratio with no bound — the continuous conc4
    // bound applies nearly verbatim, on the p50 since the leg reports
    // the lower median across users): p50 may not exceed
    // max(2.5 × serial, serial + 0.5 s). Same emit-time contention
    // qualification as conc4; `concRan` distinguishes "leg skipped"
    // (verdict null/null) from "ran clean" (true).
    var concRan = false
    val concViolations = scala.collection.mutable.ArrayBuffer.empty[String]
    var concSerials: Map[String, Double] = Map.empty
    // per-leg co-load sensor (round 14, stealBetween scaladoc): steal
    // measured across the leg's own concurrent window, -1 = leg
    // skipped
    var concSteal = -1.0
    val concurrentJson: String =
      if (users <= 1 || soakOnly ||
          !budget.allows("concurrent", 300)) "{}"
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
        // median-of-3 serial reference, matching conc4's serial4
        // (ADVICE r13: the p50 bound divides by this — a single
        // noisy-fast serial draw inflates p50/serial and can trip
        // conc_ok:false spuriously on a quiet machine; the denominator
        // must be the TYPICAL serial wall, not one sample). This also
        // makes the serial-inflation sensor's "execution-only medians"
        // premise literally true for BOTH legs.
        val serialBase = concNames.flatMap { n =>
          if (!shared.contains(n)) None
          else try {
            val s3 = Seq.fill(3)(execOnly(n)).sorted
            Some(n -> s3(1))
          } catch { case e: Throwable =>
            System.err.println(s"[bench] concurrent serial $n: ${e.getMessage}")
            None
          }
        }.toMap
        concSerials = serialBase
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
        val concJ0 = cpuJiffies()
        threads.foreach(_.start())
        threads.foreach(_.join())
        concSteal = math.rint(stealBetween(concJ0, cpuJiffies()) * 100) / 100
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
            if (ok.nonEmpty) {
              val p50v = ok((ok.size - 1) / 2)
              ratios += p50v / s0
              // continuous bound (same form and rationale as conc4's):
              // contention-cost factor 2.5× plus a 0.5 s absolute term
              // for the fixed per-job FAIR-scheduler tail
              val bound = math.max(2.5 * s0, s0 + 0.5)
              if (p50v > bound)
                concViolations +=
                  s"$n:${r3(p50v / s0)}x>${r3(bound / s0)}x"
            }
          }
          "\"" + n + "\":{\"p50\":" + p50 + ",\"max\":" + mx +
            ",\"serial\":" + jnum(ser) + "}"
        })
        if (ratios.nonEmpty) concWorst = Some(ratios.max)
        concRan = entries.nonEmpty
        concViolations.foreach(v =>
          System.err.println(s"[bench] concurrent p50/serial bound: $v"))
        entries.mkString("{", ",", "}")
      }
    // section-local contention sensor for the 2-user leg, same pattern
    // as conc4's: probe decay vs the entry baseline convicts this
    // window even when the run-level average dilutes it
    val concProbeAfter = if (concRan) cpuProbe(1) else -1.0
    traceLoad("concurrent")

    // ---- concurrent4: the grptest MIXED-workload analog (reference:
    // utils/scenarios/perf/testcase/grptest.sh:17-23 drives query
    // groups × numConcur users × run types Disk/Cache/Stream/Mixed —
    // the shape the 2-user read-only section above doesn't cover is
    // READS RACING A WRITER). 4 sessions loop a 6-query read mix for
    // ~30 s while a 5th thread commits locked full-table updates to a
    // scratch catalog table; between queries every reader takes a
    // snapshot-consistency read (exactly one generation, full row
    // count — the pre- or post-image of some committed update, never
    // a partial one). Reported per query: p50/p95 across all samples
    // plus a serial baseline measured on the same shared plans, so
    // p95/serial is the true mixed-load contention cost. ------------
    val mixSecs =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MIXED", "30").toInt
    var conc4Worst: Option[Double] = None
    // self-validated verdict for the mixed leg (round-11 directive: the
    // SCALE.md bound — p95/serial ≤2.5× at serial ≥0.25 s, ≤4× below,
    // zero inconsistent snapshots, zero errors — was documented but the
    // artifact carried only raw numbers; a violation should be a
    // one-glance failure the way `contended` is).
    //
    // Round-12 restructure: the verdict is FINALIZED AT EMIT TIME, after
    // the run-level machine-state verdict is known — the round-11 driver
    // artifact printed a bare conc4_ok:false on a contended machine
    // (steal 1.32%, serial denominators measured under load) whose
    // violations vanished in the uncontended builder run, and acquitting
    // it required a human to cross-reference steal_pct. The leg stores
    // its raw findings (consistency, errors, bound violations) plus a
    // deferred JSON assembler; conc4Verdict() below qualifies the bound
    // check with the contention evidence. Consistency violations and
    // errors are NEVER excused by contention — a busy machine slows
    // queries, it does not tear MVCC snapshots.
    var conc4Assemble: Option[(String, String) => String] = None
    var conc4Consistent = true
    var conc4Errors = 0
    var conc4Violations: Seq[String] = Seq.empty
    // the verdict leg's serial references, kept for the emit-time
    // serial-inflation check (round 13): execution-only serials of
    // warm shared plans can never legitimately exceed the same
    // queries' just-measured HEADLINE walls (best-of-N END-TO-END,
    // construction included) — when several do, the leg's window
    // caught a co-load burst that entry-vs-exit probe decay can miss
    // (this round's forcing measurement: a burst the probe sensor
    // missed by 3% while five of six serials read 1.4–2.2× their
    // headline walls and every ratio tripped)
    var conc4Serials: Map[String, Double] = Map.empty
    // steal measured across the kept leg's reader window (round 14):
    // the ratios' numerators come from exactly that window, so co-load
    // landing there is contention evidence run-level dilution hides
    var conc4Steal = -1.0
    // one full observation of the mixed leg: builds the scratch table,
    // runs 4 readers × mixSecs against the locked writer, and returns
    // every verdict ingredient. Factored so a bound violation can be
    // CONFIRMED with a second independent observation (below) — the
    // sweep and scaling legs already re-run anomalies; a verdict leg
    // deserves the same discipline.
    case class MixLeg(durSec: Double, commits: Int, reads: Long,
        consistent: Boolean, errors: Int, violations: Seq[String],
        entriesStr: String, serials: Map[String, Double],
        stealPct: Double)
    // observation counter for the steal-plant knob: legs run strictly
    // serially (first → confirm → settle-releg), so a plain var indexes
    // the fake readings one per observation
    var mixLegIdx = 0
    def runMixLeg(mixUsers: Int, mixNames: Seq[String]): MixLeg = {
        import org.apache.spark.sql.functions.{col, lit}
        val tmp = java.nio.file.Files.createTempDirectory("graft_mix")
        try {
          // writer's table: ~1/10th of orders, so a commit cycle is
          // seconds-scale and several commits land inside the window
          val cat = new sources.Catalog(spark, s"$tmp/cat")
          val seed = Tables.table(spark, sfDir, "orders")
            .filter(col("o_orderkey") % 10 === 0)
            .select(col("o_orderkey")).withColumn("gen", lit(0))
          cat.createTableAs("mix_orders", seed)
          val expectRows = cat.table("mix_orders").count()
          resetState()
          // construction once, execution per sample — same rules as the
          // 2-user section (shared artifacts are shared, no clearCache
          // sabotage mid-flight)
          val shared4 = mixNames.flatMap { n =>
            try Some(n -> SparkEntry.queries(n)(spark, sfDir))
            catch { case e: Throwable =>
              System.err.println(s"[bench] mixed build $n: ${e.getMessage}")
              None
            }
          }.toMap
          // mixed-leg plant knob (the verdict-drill analog of
          // SPARK_GRAFT_BENCH_PLANT): "<query>:<everyN>:<ms>" sleeps
          // ms inside every Nth CONCURRENT sample of the named query —
          // reader threads only (discriminated by their mix_user FAIR
          // pool), so the serial references stay clean and the planted
          // tail lands where a real contention tail would: in the p95,
          // not the denominator. Every Nth (not every) so p50 stays
          // sane and the violation is a TAIL violation, the shape the
          // bound exists for. scripts/conc4_drill.sh stages a planted
          // run (trip → confirm re-leg → confirmed false/p95_bound)
          // and a clean run (ok:true).
          val mixedPlant: Option[(String, Int, Long)] =
            sys.env.get("SPARK_GRAFT_MIXED_PLANT").flatMap { s =>
              s.split(":") match {
                case Array(q, n, ms) =>
                  scala.util.Try((q, n.toInt, ms.toLong)).toOption
                case _ => None
              }
            }
          val plantCounter = new java.util.concurrent.atomic.AtomicLong
          def execOnly(n: String): Double = {
            val t0 = System.nanoTime()
            shared4(n).write.mode("overwrite").format("noop").save()
            mixedPlant.foreach { case (q, everyN, ms) =>
              if (n == q && Option(spark.sparkContext
                    .getLocalProperty("spark.scheduler.pool"))
                    .exists(_.startsWith("mix_user")) &&
                  plantCounter.incrementAndGet() % everyN == 0)
                Thread.sleep(ms)
            }
            (System.nanoTime() - t0) / 1e9
          }
          // one untimed pass first: the serial baseline must be the
          // same WARM steady-state the concurrent samples reach, or
          // p95/serial reads flatteringly below 1 on first-codegen cost
          mixNames.filter(shared4.contains).foreach(n =>
            try execOnly(n) catch { case _: Throwable => })
          // median-of-3 serial reference: the bound divides a
          // contended p95 by this, and a single lucky-fast serial
          // sample on a sub-0.15 s query inflates the ratio past the
          // bound as a measurement artifact (observed: one 4.14×>4.0×
          // trip whose committed-artifact twin read 3.46×) — the
          // denominator must be the TYPICAL serial wall, not one draw
          val serial4 = mixNames.filter(shared4.contains)
            .map { n =>
              val s3 = Seq.fill(3)(execOnly(n)).sorted
              n -> s3(1)
            }.toMap
          val samples =
            new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
          val badReads =
            new java.util.concurrent.ConcurrentLinkedQueue[String]()
          val nReads = new java.util.concurrent.atomic.AtomicLong
          val errs =
            new java.util.concurrent.ConcurrentLinkedQueue[String]()
          @volatile var stopWriter = false
          var commits = 0
          val writer = new Thread(() => {
            try {
              spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", "mix_writer")
              var g = 1
              while (!stopWriter) {
                cat.update("mix_orders", _.withColumn("gen", lit(g)))
                commits += 1
                g += 1
              }
            } catch { case e: Throwable => errs.add(s"writer: $e") }
          })
          val deadline =
            System.nanoTime() + mixSecs * 1000000000L
          val readers = (1 to mixUsers).map { u =>
            new Thread(() => {
              try {
                spark.sparkContext.setLocalProperty(
                  "spark.scheduler.pool", s"mix_user$u")
                val names = mixNames.filter(shared4.contains)
                var i = u // stagger start points across users
                while (System.nanoTime() < deadline) {
                  val n = names(i % names.length)
                  try samples.add(n -> execOnly(n))
                  catch { case e: Throwable => errs.add(s"$n: $e") }
                  // snapshot-consistency read between queries: one
                  // complete generation, never a mix or partial count
                  val gens = cat.readCommitted("mix_orders")(
                    _.groupBy("gen").count().collect())
                  nReads.incrementAndGet()
                  if (gens.length != 1 || gens(0).getLong(1) != expectRows)
                    badReads.add(gens.mkString(","))
                  i += 1
                }
              } catch { case e: Throwable => errs.add(s"reader$u: $e") }
            })
          }
          val t0 = System.nanoTime()
          val legJ0 = cpuJiffies()
          writer.start()
          readers.foreach(_.start())
          readers.foreach(_.join())
          stopWriter = true
          writer.join()
          val legIdx = mixLegIdx
          mixLegIdx += 1
          val legSteal =
            if (conc4StealPlant.nonEmpty)
              conc4StealPlant(math.min(legIdx, conc4StealPlant.size - 1))
            else math.rint(stealBetween(legJ0, cpuJiffies()) * 100) / 100
          val durSec = (System.nanoTime() - t0) / 1e9
          import scala.jdk.CollectionConverters._
          val byName = samples.asScala.toSeq.groupBy(_._1)
          val boundViolations =
            scala.collection.mutable.ArrayBuffer.empty[String]
          val entries = mixNames.flatMap(n => byName.get(n).map { vs =>
            val s = vs.map(_._2).sorted
            val p50 = s((s.size - 1) / 2)
            val p95 = s(math.max(0, math.ceil(s.size * 0.95).toInt - 1))
            val ser = serial4.get(n)
            ser.filter(_ > 0).foreach { s0 =>
              conc4Worst = Some(math.max(conc4Worst.getOrElse(0.0),
                p95 / s0))
              // SCALE.md bound, CONTINUOUS form (round 12): p95 may
              // not exceed 2.5× the serial wall OR serial + 0.5 s,
              // whichever is larger. The 2.5× factor is the contention
              // cost bound; the 0.5 s absolute term models the fixed
              // per-job scheduler tail 5 FAIR pools impose on one
              // local JVM (measured 0.1–0.41 s across every mixed
              // query in round 11 — the same stall whether the query's
              // serial wall is 0.12 s or 0.36 s). The round-11 form
              // had a CLIFF at serial = 0.25 s (allowance dropped from
              // max(4×s, s+0.5) to 2.5×s the instant serial crossed
              // the band edge) — and a 19% environmental drift moved
              // q01's serial from 0.204 to exactly 0.250, flipping its
              // verdict while its tail behavior was unchanged. A fixed
              // tail does not vanish at 0.25 s; the continuous form
              // gives identical verdicts on every round-11 measurement
              // and removes the band-edge coin flip.
              val bound = math.max(2.5 * s0, s0 + 0.5)
              if (p95 > bound)
                boundViolations +=
                  s"$n:${r3(p95 / s0)}x>${r3(bound / s0)}x"
            }
            // per-query p95/serial ratio surfaced directly (ADVICE r11:
            // the new sub-0.25 s absolute allowance means drift toward
            // the ceiling should be visible at a glance, not require
            // dividing two fields during verdict review)
            val ratioJson = ser.filter(_ > 0)
              .map(s0 => r3(p95 / s0).toString).getOrElse("null")
            s""""$n":{"p50":${r3(p50)},"p95":${r3(p95)},""" +
              s""""serial":${jnum(ser)},"ratio":$ratioJson,"n":${s.size}}"""
          })
          // consistency and errors are DIFFERENT verdicts: `consistent`
          // answers "did any read observe a torn snapshot" (the MVCC
          // claim under test); a reader/writer exception is reported in
          // its own counter so a transient query failure can't print as
          // a false snapshot-integrity alarm in the artifact of record
          errs.forEach(e => System.err.println(s"[bench] mixed: $e"))
          badReads.forEach(b =>
            System.err.println(s"[bench] mixed inconsistent snapshot: $b"))
          boundViolations.foreach(v =>
            System.err.println(s"[bench] mixed p95/serial bound: $v"))
          MixLeg(durSec, commits, nReads.get(), badReads.isEmpty,
            errs.size, boundViolations.toSeq,
            entries.mkString("{", ",", "}"), serial4, legSteal)
        } finally {
          sources.FsUtil.deleteRecursively(tmp, swallowErrors = true)
        }
    }
    if (!(mixSecs <= 0 || soakOnly) &&
        budget.allows("concurrent4", 360)) {
      try {
        val mixUsers = 4
        val mixNames = Seq("q01_pricing_summary", "q06_forecast_revenue",
          "j_inner_large", "a_high_cardinality", "o_topk", "x_dedup_exact")
        var leg = runMixLeg(mixUsers, mixNames)
        // anomaly-confirm for the VERDICT (round 12): a p95 is decided
        // by the ~3 worst samples of a 30 s window, and the same
        // binary's leg read 3.44× (pass) and 5.43× (trip) on the same
        // day for a_high_cardinality — a coin-flip red is exactly the
        // verdict shape round 11 said to eliminate. A bound-only trip
        // triggers ONE full independent re-leg (fresh serial refs,
        // fresh samples); only violations whose QUERY reproduces in
        // both observations survive. Consistency failures and errors
        // are never softened — a second leg's torn snapshot stands on
        // its own.
        var confirmRan = false
        var firstViolations: Seq[String] = Seq.empty
        // the confirm leg's RAW violation list (ADVICE r12: a
        // violation appearing ONLY in the re-leg doesn't flip the
        // verdict — it wasn't reproducing — but dropping it entirely
        // loses the forensic trail; violations_second preserves it)
        var secondViolations: Seq[String] = Seq.empty
        if (leg.consistent && leg.errors == 0 && leg.violations.nonEmpty &&
            budget.allows("conc4_confirm", 240)) {
          confirmRan = true
          firstViolations = leg.violations
          System.err.println(s"[bench] mixed bound violations " +
            s"${firstViolations.mkString(", ")} — confirming with one " +
            "independent re-leg")
          val second = runMixLeg(mixUsers, mixNames)
          secondViolations = second.violations
          leg =
            if (second.consistent && second.errors == 0)
              second.copy(violations =
                confirmedViolations(firstViolations, second.violations))
            else second
        }
        // settle-and-re-leg (round-15 directive #2): when the kept
        // observation's CONFIRMED bound violations would be withheld
        // on leg-window evidence (steal > 2.5% or serial inflation —
        // the r14 builder shape: 6.34% window steal, verdict
        // null/"contended", bound question left unanswered for the
        // round), wait for the burst to pass (bounded: 5 s steal
        // windows, up to 90 s, stop early when a window reads <1.5%)
        // and run ONE more full independent leg. A quiet re-leg's
        // verdict stands — its violations filtered to queries already
        // observed violating (a fresh singleton on the quiet window
        // is the confirm discipline's business, not a new conviction)
        // — so the artifact of record resolves to true or an honest
        // false/p95_bound. A still-dirty re-leg keeps the original
        // withheld verdict with BOTH windows' steal recorded. Hard
        // failures are never retried away: a torn snapshot or error
        // in the re-leg replaces the leg and stands.
        var settleJson = """{"ran":false}"""
        if (shouldSettleReleg(leg.consistent, leg.errors, leg.violations,
            leg.stealPct > 2.5 ||
              serialsInflated(leg.serials, serialRefs)) &&
            budget.allows("conc4_settle_releg", 300)) {
          val stealFirst = leg.stealPct
          System.err.println(s"[bench] mixed verdict would be withheld " +
            s"on window evidence (leg steal $stealFirst%) — settling, " +
            "then one re-leg")
          val t0s = System.nanoTime()
          var settleWindowSteal = -1.0
          var waitedMs = 0L
          var quiet = false
          while (!quiet && waitedMs < 90000) {
            val j0 = cpuJiffies()
            Thread.sleep(5000)
            settleWindowSteal =
              math.rint(stealBetween(j0, cpuJiffies()) * 100) / 100
            waitedMs = (System.nanoTime() - t0s) / 1000000
            quiet = settleWindowSteal < 1.5
          }
          val releg = runMixLeg(mixUsers, mixNames)
          val relegDirty = releg.stealPct > 2.5 ||
            serialsInflated(releg.serials, serialRefs)
          val hardFail = !releg.consistent || releg.errors > 0
          val useReleg = hardFail || !relegDirty
          if (useReleg)
            leg =
              if (hardFail) releg
              else releg.copy(violations =
                confirmedViolations(leg.violations, releg.violations))
          settleJson =
            s"""{"ran":true,"waited_ms":$waitedMs,""" +
              s""""settle_window_steal":$settleWindowSteal,""" +
              s""""steal_first":$stealFirst,""" +
              s""""steal_releg":${releg.stealPct},""" +
              s""""releg_dirty":$relegDirty,""" +
              s""""used":"${if (useReleg) "releg" else "first"}"}"""
          System.err.println(s"[bench] settle-releg: kept " +
            (if (useReleg) "releg" else "first (still dirty)") +
            s" (releg steal ${releg.stealPct}%)")
        }
        conc4Consistent = leg.consistent
        conc4Errors = leg.errors
        conc4Violations = leg.violations
        conc4Serials = leg.serials
        conc4Steal = leg.stealPct
        val legNow = leg
        val confirmNow = confirmRan
        val firstViolNow = firstViolations
        val secondViolNow = secondViolations
        val settleNow = settleJson
        conc4Assemble = Some((ok, reason) =>
          s"""{"sessions":$mixUsers,"dur_sec":${r3(legNow.durSec)},""" +
            s""""writer_commits":${legNow.commits},""" +
            s""""snapshot_reads":${legNow.reads},""" +
            s""""consistent":${legNow.consistent},""" +
            s""""errors":${legNow.errors},""" +
            s""""steal_pct":${legNow.stealPct},""" +
            s""""ok":$ok,"reason":$reason,""" +
            s""""violations":${legNow.violations
              .map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
            s""""confirm_ran":$confirmNow,""" +
            s""""violations_first":${firstViolNow
              .map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
            s""""violations_second":${secondViolNow
              .map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
            s""""settle":$settleNow,""" +
            s""""queries":${legNow.entriesStr}}""")
      } catch { case e: Throwable =>
        System.err.println(s"[bench] mixed leg failed: ${e.getMessage}")
      }
    }
    // section-local contention sensor: one single-thread probe taken the
    // instant the mixed leg ends. The run-level `contended` verdict
    // averages over the WHOLE run — a co-load that arrived only during
    // this 30 s window dilutes below its thresholds, yet it is exactly
    // what inflates these p95s. Probe decay vs the entry baseline
    // convicts the window itself.
    val conc4ProbeAfter =
      if (conc4Assemble.isDefined) cpuProbe(1) else -1.0
    traceLoad("concurrent4")

    // dwweek soak analog (reference: utils/scenarios/dwweek/ — the
    // week-long scenario runs DAYTIME QUERY GROUPS CONCURRENTLY with
    // bulk loads: dwControlNightly.sh + dwControlBulk.sh). Each cycle a
    // loader thread pushes 3 batches through the cpimport path (CSV
    // export → typed load → parquet) and MERGEs them into a catalog
    // table via the locked upsert, WHILE the main thread runs the query
    // group and, between queries, snapshot-consistency reads: every
    // observed state must be exactly "batches 0..j, each complete" —
    // the pre- or post-image of some committed merge, never a partial
    // one (the readCommitted retry absorbs the swap's rename window,
    // the table lock serializes the merges).
    val soakCycles = sys.env.getOrElse("SPARK_GRAFT_SOAK_CYCLES", "2").toInt
    // nightly dwweek profile (SCALE.md): SPARK_GRAFT_SOAK_CYCLES=7
    // SPARK_GRAFT_SOAK_CRASH_DRILLS=2 SPARK_GRAFT_SOAK_ONLY=1 runs a
    // week-of-nightly-loads-shaped soak (7 load+query cycles, a crash
    // drill per ~3) without the full bench around it
    val crashDrills =
      sys.env.getOrElse("SPARK_GRAFT_SOAK_CRASH_DRILLS", "1").toInt
    var soakFail = 0
    // the crash-recovery drill's result (dwweek-with-failures analog) —
    // populated by the crash cycle inside the soak section below
    var soakCrashJson = """{"ran":false}"""
    // all drills (nightly profile runs several); stays null for the
    // default single-drill round so the artifact shape is unchanged
    var soakCrashAllJson = "null"
    // a soak failure must never destroy the already-measured headline and
    // concurrency results, so the whole section is fallible
    val soakJson: String =
      if (soakCycles <= 0 || !budget.allows("soak", 360)) "[]"
      else try {
        import org.apache.spark.sql.functions.{col, lit}
        val tmp = java.nio.file.Files.createTempDirectory("graft_soak")
        // soak data is throwaway; the finally guarantees the scratch dir is
        // removed even when a mid-cycle failure aborts the loop
        try {
          val group = Seq("q01_pricing_summary", "q06_forecast_revenue",
            "j_inner_large", "a_high_cardinality")
          val nb = soakCycles * 3 // 3 load batches per cycle
          val orders = Tables.table(spark, sfDir, "orders")
          def batchDf(k: Int) = orders
            .filter(col("o_orderkey") % nb === k)
            .withColumn("batch_id", lit(k))
          val expected = orders
            .groupBy((col("o_orderkey") % nb).cast("int").as("k")).count()
            .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
          val cat = new sources.Catalog(spark, s"$tmp/cat")
          cat.createTableAs("soak_orders", batchDf(0).limit(0))
          val cycles = (1 to soakCycles).map { i =>
            val errs =
              new java.util.concurrent.ConcurrentLinkedQueue[String]()
            var loadSec = 0.0
            val loader = new Thread(() => {
              try {
                spark.sparkContext.setLocalProperty(
                  "spark.scheduler.pool", "soak_loader")
                val t0 = System.nanoTime()
                for (k <- (i - 1) * 3 until i * 3) {
                  val slice = batchDf(k)
                  sources.Loader.exportCsv(slice, s"$tmp/b$k/csv")
                  sources.Loader.loadCsv(spark, s"$tmp/b$k/csv",
                    slice.schema, s"$tmp/b$k/parquet")
                  cat.upsert("soak_orders",
                    spark.read.schema(slice.schema)
                      .parquet(s"$tmp/b$k/parquet"),
                    Seq("o_orderkey"))
                }
                loadSec = (System.nanoTime() - t0) / 1e9
              } catch { case e: Throwable => errs.add(e.toString) }
            })
            var reads = 0
            var overlapReads = 0
            var consistent = true
            def checkSnapshot(): Unit = {
              val duringLoad = loader.isAlive
              val seen = cat.readCommitted("soak_orders")(
                _.groupBy("batch_id").count().collect())
                .map(r => r.getInt(0) -> r.getLong(1)).toMap
              reads += 1
              if (duringLoad) overlapReads += 1
              // exactly the batches 0..j, each with its full row count
              val ok = seen.keySet == (0 to
                (if (seen.isEmpty) -1 else seen.keys.max)).toSet &&
                seen.forall { case (k, n) => expected.get(k).contains(n) }
              if (!ok) {
                consistent = false
                errs.add(s"inconsistent snapshot: $seen")
              }
            }
            loader.start()
            val q0 = System.nanoTime()
            group.foreach { n =>
              try run(n)
              catch { case e: Throwable =>
                System.err.println(s"[bench] soak $n: ${e.getMessage}") }
              checkSnapshot()
            }
            val querySec = (System.nanoTime() - q0) / 1e9
            // keep observing until the loader commits its last batch, so
            // overlap is guaranteed even if the query group finished fast
            while (loader.isAlive) { checkSnapshot(); Thread.sleep(50) }
            loader.join()
            checkSnapshot() // post-load state must be complete too
            val failed = !consistent || !errs.isEmpty
            if (failed) soakFail += 1
            errs.forEach(e => System.err.println(s"[bench] soak: $e"))
            s"""{"cycle":$i,"load_sec":$loadSec,"query_sec":$querySec,""" +
              s""""overlap":${overlapReads > 0},"reads":$reads,""" +
              s""""consistent":$consistent}"""
          }

          // ---- WRITER-CRASH cycle (reference: dwweek is a week of
          // loads WITH failures; recovery = DMLProc crash →
          // cleartablelock, dbcon/dmlpackageproc/
          // commandpackageprocessor.cpp:34). A REAL second JVM runs a
          // locked upsert, parks inside the commit window (live dir
          // renamed aside, post-image staged, lock held — the worst
          // instant), and is kill -9'd there. The next reader and
          // writer must proceed through the stale-lock steal +
          // recover() path and observe only complete images. ----------
          def jstr(s: String): String = "\"" + s
            .replaceAll("[\\\\\"]", " ")
            .replaceAll("[\\u0000-\\u001f]", " ") + "\""
          def runCrashDrill(): String = {
            // STAGING (getting the child parked inside the commit
            // window) is a harness concern, separate from RECOVERY (the
            // engine surviving the kill): round 9's driver run conflated
            // them in one soak_fail counter with zero diagnostics when
            // the child died before parking. Staging now retries once,
            // records the child's exit code and a bounded output tail,
            // and ANY staging failure — a never-parking child OR an
            // exception thrown while setting the stage — reports itself
            // (`staged:false` + diagnosis) WITHOUT counting as a soak
            // failure; only a staged drill whose recovery then breaks
            // is one.
            var attempts = 0
            var childExit = "null"
            var childTail = ""
            val flag = java.nio.file.Paths.get(
              s"$tmp/cat", "_locks", ".midswap_soak_orders")
            val stagedOk: Either[String, Unit] = try {
              // the crash batch REPLACES batch 0's rows under new
              // batch_id 999 (same keys), so pre- and post-image are
              // distinguishable and both enumerable exactly
              batchDf(0).withColumn("batch_id", lit(999))
                .write.mode("overwrite").parquet(s"$tmp/crash_batch")
              var staged = false
              while (!staged && attempts < 2) {
                attempts += 1
                // a PREVIOUS drill's kill -9 lands while the child parks
                // inside the flag's try/finally, so the flag file
                // survives the kill — without this delete the next
                // drill's wait loop "sees" the stale flag instantly and
                // kills a child that never reached the window (false
                // staged: the kill tests nothing)
                java.nio.file.Files.deleteIfExists(flag)
                val child = sources.ChildJvm.spawn(
                  "graft.sources.SoakCrashWriter",
                  Seq(s"$tmp/cat", "soak_orders", s"$tmp/crash_batch",
                    "o_orderkey"),
                  env = Map("GRAFT_SWAP_PAUSE_MS" -> "120000"))
                val dl = System.nanoTime() + 240L * 1000000000L
                while (!java.nio.file.Files.exists(flag) && child.isAlive &&
                    System.nanoTime() < dl)
                  Thread.sleep(20)
                staged = java.nio.file.Files.exists(flag)
                if (!staged) {
                  childExit =
                    if (!child.isAlive) child.proc.exitValue().toString
                    else "\"timeout\"" // alive but never parked in 240 s
                  childTail = child.tail()
                  System.err.println(s"[bench] soak_crash staging attempt " +
                    s"$attempts failed (exit=$childExit); child tail:\n" +
                    childTail.takeRight(2000))
                }
                // kill -9 — at the parked commit window when staged, or
                // cleanup of a failed attempt (the next attempt's locked
                // upsert steals the dead claim and recovers, which is the
                // production path anyway)
                child.destroyForcibly()
                child.waitFor()
              }
              if (staged) Right(())
              else {
                // self-explaining staging diagnosis in the artifact of
                // record; recovery is NOT implicated, so no soak_fail.
                // Round 10's tail-only truncation kept "…2 more" and
                // dropped the line naming WHICH class failed — report
                // the FIRST exception line, the bounded tail, a
                // classload-only probe verdict (isolates classpath
                // propagation from Spark startup), and the resolved
                // child classpath shape.
                val probe = sources.ChildJvm.probe()
                Left(
                  s"""{"ran":true,"staged":false,"attempts":$attempts,""" +
                    s""""child_exit":$childExit,""" +
                    s""""child_err":${jstr(
                      sources.ChildJvm.firstError(childTail))},""" +
                    s""""probe":${jstr(probe)},""" +
                    s""""child_cp":${jstr(
                      sources.ChildJvm.describeClasspath().take(200))},""" +
                    s""""child_tail":${jstr(childTail.takeRight(160))}}""")
              }
            } catch { case e: Throwable =>
              val msg = Option(e.getMessage).getOrElse(e.toString)
              Left(s"""{"ran":true,"staged":false,""" +
                s""""attempts":$attempts,"err":${jstr(msg.take(200))}}""")
            }
            stagedOk match {
              case Left(json) => json
              case Right(_) => try {
              val liveGone = !java.nio.file.Files.exists(
                java.nio.file.Paths.get(s"$tmp/cat/soak_orders"))
              val lockLeft = java.nio.file.Files.exists(
                java.nio.file.Paths.get(
                  s"$tmp/cat/_locks/soak_orders.lock"))
              // next READER: must recover (steal the dead writer's lock,
              // restore an image) and see a COMPLETE snapshot — the full
              // pre-image (batch 0 live) or the full post-image (999
              // replacing 0), never a mix or a missing table
              val seen = cat.readCommitted("soak_orders")(
                _.groupBy("batch_id").count().collect())
                .map(r => r.getInt(0) -> r.getLong(1)).toMap
              val preImage = (0 until nb).map(k => k -> expected(k)).toMap
              val postImage = preImage - 0 + (999 -> expected(0))
              val image =
                if (seen == postImage) "post"
                else if (seen == preImage) "pre" else "INCONSISTENT"
              // next WRITER proceeds under a fresh claim: restore batch 0
              cat.upsert("soak_orders", batchDf(0), Seq("o_orderkey"))
              val finalOk = cat.readCommitted("soak_orders")(
                _.groupBy("batch_id").count().collect())
                .map(r => r.getInt(0) -> r.getLong(1)).toMap == preImage
              val recovered = image != "INCONSISTENT" && finalOk
              if (!recovered) soakFail += 1
              s"""{"ran":true,"staged":true,"attempts":$attempts,""" +
                s""""killed_mid_swap":true,""" +
                s""""live_gone_at_kill":$liveGone,""" +
                s""""stale_lock_left":$lockLeft,""" +
                s""""reader_image":"$image",""" +
                s""""next_writer_ok":$finalOk,"recovered":$recovered}"""
              } catch { case e: Throwable =>
                // the stage WAS set (child parked + killed mid-swap):
                // an exception here is the recovery path failing — the
                // one case that legitimately counts as a soak failure
                soakFail += 1
                val msg = Option(e.getMessage).getOrElse(e.toString)
                s"""{"ran":true,"staged":true,"recovered":false,""" +
                  s""""err":${jstr(msg.take(200))}}"""
              }
            }
          }
          // each drill self-restores the pre-image, so repeated drills
          // (the nightly crash-per-N-cycles profile) are independent
          val drillJsons = (1 to math.max(1, crashDrills)).map(_ =>
            runCrashDrill())
          soakCrashJson = drillJsons.last
          if (drillJsons.size > 1)
            soakCrashAllJson = drillJsons.mkString("[", ",", "]")

          cycles.mkString("[", ",", "]")
        } finally {
          sources.FsUtil.deleteRecursively(tmp, swallowErrors = true)
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] soak failed: ${e.getMessage}")
        soakFail += 1
        "[]"
      }
    traceLoad("soak")

    // extended section: heavier pipeline/index queries timed separately so
    // headline_total stays comparable round-over-round.
    // SPARK_GRAFT_BENCH_EXT=0 skips it — the regression drill loops the
    // headline+tripwire path several times and must not pay ~60 heavy
    // queries per loop for a verdict that only reads headline history.
    val skipExt =
      soakOnly || sys.env.get("SPARK_GRAFT_BENCH_EXT").contains("0")
    // budget-gated per query: a skipped entry is DROPPED from the map
    // (a null would read as a query failure and inflate ext_fail) and
    // counted in the budget object — the section stops at the first
    // skip so the tail's order stays deterministic
    val extSkipped = scala.collection.mutable.ArrayBuffer.empty[String]
    val extResults: Seq[(String, Option[Double])] =
        (if (skipExt) Seq.empty[String] else extended).flatMap { name =>
      if (extSkipped.nonEmpty || !budget.has(90)) {
        if (extSkipped.isEmpty) budget.skipped += "extended_tail"
        extSkipped += name
        None
      } else {
        val sec =
          try Some(runStable(name, sfDir, extRuns))
          catch { case e: Throwable =>
            System.err.println(s"[bench] extended $name failed: ${e.getMessage}")
            None
          }
        Some(name -> sec)
      }
    }
    traceLoad("extended")
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
    // verdict ingredients for the scaling leg (round-13 directive: the
    // r12 driver artifact printed a bare scal_worst 20.405 on a
    // contended machine with only the run-level flag to acquit it —
    // the leg now qualifies itself the way conc4 does). The bound,
    // now pinned in SCALE.md: a query's EFFECTIVE ratio — output/
    // edge-normalized ratio_per_row where the leg measures one, raw
    // wall ratio otherwise — may not exceed 2.5 (normalized; the
    // SCALE.md bar the round-8/9 normalization was built against) or
    // factor/2 (raw; 4× at 8× — builder-side raw ratios cluster
    // 1.2–2.4), with an absolute guard xN > x1 + 0.5 s so sub-second
    // jitter on a tiny corpus can never trip a scale alarm. A breach
    // triggers ONE in-leg re-measure of the x1/xN PAIR (both sides —
    // a contended x1 denominator poisons the ratio from below); only
    // a reproducing breach becomes a violation.
    var scalRan = false
    // attempted vs ran (ADVICE r13): if the leg throws BEFORE any
    // query runs (e.g. the scaled-corpus build fails), scalRan stays
    // false and the old verdict read null/null — indistinguishable in
    // the artifact from an intentionally skipped leg. scalAttempted is
    // set before the corpus build; attempted-but-crashed emits
    // false/"errors", reserving null/null for factor<=1/soakOnly.
    var scalAttempted = false
    var scalErrors = 0
    // steal across the whole scaling section (round 14; same rationale
    // as the mixed leg's window sensor — the xN walls are single-shot)
    var scalSteal = -1.0
    val scalViolations = scala.collection.mutable.ArrayBuffer.empty[String]
    val scalConfirmed = scala.collection.mutable.ArrayBuffer.empty[String]
    var scaling27Json = "{}"
    val scalingJson: String =
      // a budget skip is NOT "attempted": scalAttempted stays false so
      // the verdict reads null/null (skipped), not false/"errors"
      if (scaleFactor <= 1 || soakOnly ||
          !budget.allows("scaling", 480)) "{}"
      else try {
        scalAttempted = true
        val scalJ0 = cpuJiffies()
        import org.apache.spark.sql.functions.{col, lit}
        val tmp = java.nio.file.Files.createTempDirectory("graft_scale")
        // the scaling legs run with RELIABLE checkpoint barriers (r8
        // post-mortem: the localCheckpoint default stores barrier blocks
        // in executor memory, and under memory pressure eviction forces
        // recomputation of the whole iterative lineage — the signature
        // of the contended run's pagerank 2.2×→10.5× / minhash 4×→32×
        // tails, which degraded multiplicatively while everything else
        // slowed 1.5×. Reliable mode persists barriers to disk, so
        // eviction degrades into a file re-read — the production
        // setting on a real cluster, and the honest basis for a curve
        // that claims to predict 100× behavior). Cost at sf0.1: see
        // SCALE.md's mode comparison (~parity on an idle machine).
        spark.conf.set("spark.graft.checkpoint.dir", s"$tmp/_ckpt")
        try {
          val off = 100000000L // id offset per copy; copy 0 keeps the
                               // original ids, so the vec_id<10 query
                               // sets stay fixed while the corpus grows
          def scaleUp(table: String, idCol: String, factor: Int,
              dest: java.nio.file.Path): Unit = {
            val base = Tables.table(spark, sfDir, table)
            (0 until factor)
              .map(i => base.withColumn(idCol, col(idCol) + lit(i * off)))
              .reduce(_ unionAll _)
              .write.mode("overwrite").parquet(s"$dest/$table.parquet")
          }
          scaleUp("documents", "doc_id", scaleFactor, tmp)
          scaleUp("embeddings", "vec_id", scaleFactor, tmp)
          // prebuild both ANN indexes so the ivfpq entry times the
          // read-side query, not construction
          operators.AnnIndex.ensureBuilt(spark, sfDir)
          operators.AnnIndex.ensureBuilt(spark, tmp.toString)
          // auc + dsir cover the round-7 Prefix-scan rewrites: the
          // window-free rank path must stay sublinear as the corpus grows
          // the span pair joined in round 12 (r11 directive): they are
          // the dedup family's highest shuffled-row counts — stride-1
          // windows cost L× the chunk pass — and SCALE.md asserted
          // their slope without the artifact measuring it
          val scaleQs = Seq("x_dedup_minhash_lsh", "x_dedup_chunks",
            "x_dedup_cc", "x_search_bm25", "x_ann_ivfpq_indexed",
            "x_dedup_setjoin", "x_graph_pagerank", "x_graph_labelprop",
            "x_graph_triangles", "x_pipeline_auc", "x_pipeline_dsir",
            "x_dedup_spans", "x_dedup_span_removal")
          // join-style dedup is OUTPUT-BOUND on the salted-clone corpus:
          // every doc gains N near-identical copies, so TRUE near-dup
          // pairs grow ~quadratically per clone group and wall time
          // tracks emitted pairs, not plan cost. For these, also count
          // output rows at both scales and report a per-output-row
          // ratio — the number that would expose a genuine
          // candidate-explosion regression the raw curve hides behind
          // "expected output growth". scal_worst uses the normalized
          // ratio for these queries, the raw ratio otherwise.
          val outputBound = Set("x_dedup_minhash_lsh", "x_dedup_setjoin")
          // the graph family is normalized the same way, but on its
          // DERIVED star-edge set (fixture-sensitive: edges grow with
          // shared-chunk/band density, not just rows) — a raw wall
          // ratio could hide a derived-edge explosion exactly like the
          // dedup joins' raw ratios hid output growth before round 8.
          // One edge count per (family, corpus), shared across the
          // family's queries.
          val edgeCounts =
            scala.collection.mutable.Map.empty[(String, String), Long]
          def edgesFor(name: String, dir: String): Option[Long] =
            name match {
              case "x_graph_pagerank" | "x_graph_labelprop" |
                   "x_graph_triangles" =>
                Some(edgeCounts.getOrElseUpdate(("graph", dir), {
                  resetState()
                  operators.GraphQueries.derivedEdgeCount(spark, dir)
                }))
              case "x_dedup_cc" =>
                Some(edgeCounts.getOrElseUpdate(("cc", dir), {
                  resetState()
                  operators.DedupQueries.ccStarEdgeCount(spark, dir)
                }))
              // span family: normalized on the FLAGGED-POSITION count
              // (stride-1 windows whose digest repeats corpus-wide) —
              // on the self-cloned scaling corpus every window gains
              // N-1 identical twins, so the flagged set jumps from the
              // sparse genuine-dup fraction to ~ALL windows: a raw wall
              // ratio would indict the engine for fixture growth the
              // same way the graph family's derived star edges would
              case "x_dedup_spans" | "x_dedup_span_removal" =>
                Some(edgeCounts.getOrElseUpdate(("span", dir), {
                  resetState()
                  operators.DedupQueries.spanFlaggedCount(spark, dir)
                }))
              case _ => None
            }
          // anomaly-confirmation for the single-shot xN legs: they stay
          // single-shot by design (the bias OVERSTATES ratios —
          // conservative), but a single shot taken 20 minutes into a
          // JVM can also catch a one-off GC/spill spike and stamp a
          // phantom 24× into the artifact of record (round-10's first
          // full run did exactly that on dsir@27×: 35.8 s vs 6.2 s on a
          // clean re-run). A result whose ratio exceeds `thresh` gets
          // exactly one confirming re-run; if it reproduces, it stays.
          def confirmedRun(name: String, dir: String, x1: Double,
              thresh: Double): Double = {
            val first = runE2eIn(name, dir)
            if (x1 > 0 && first / x1 > thresh) {
              System.err.println(s"[bench] scaling $name read " +
                s"${math.rint(first / x1 * 10) / 10}x (> $thresh) — " +
                "confirming with one re-run")
              math.min(first, runE2eIn(name, dir))
            } else first
          }
          val x1Times = scala.collection.mutable.Map.empty[String, Double]
          val rawRatio8 = scala.collection.mutable.Map.empty[String, Double]
          scalRan = true
          val entries = scaleQs.map { name =>
            try {
              var x1 = runStable(name, sfDir, 2)
              // at 8× the alarm bar is the factor itself: even the
              // edge-superlinear graph queries measure well below it
              // (2.1–2.4× raw), so a trip means a genuine anomaly
              var xn = confirmedRun(name, tmp.toString, x1,
                scaleFactor.toDouble)
              val outs: Option[(Long, Long)] =
                if (outputBound(name)) {
                  resetState()
                  val o1 = SparkEntry.queries(name)(spark, sfDir).count()
                  resetState()
                  val oN = SparkEntry.queries(name)(spark, tmp.toString)
                    .count()
                  Some((o1, oN))
                } else for {
                  o1 <- edgesFor(name, sfDir)
                  oN <- edgesFor(name, tmp.toString)
                } yield (o1, oN)
              val growth = outs.map { case (o1, oN) =>
                if (o1 > 0) oN.toDouble / o1 else -1.0 }
              def ratioOf(a: Double, b: Double) = if (a > 0) b / a else -1.0
              def perRowOf(r: Double) = growth
                .map(g => if (r > 0 && g > 0) r / g else -1.0)
              // effective ratio vs its bound: normalized where the leg
              // measures output/edge growth, raw otherwise (the same
              // choice scal_worst makes)
              def breach(a: Double, b: Double): Option[String] = {
                val r = ratioOf(a, b)
                val pr = perRowOf(r).filter(_ > 0)
                val (eff, bound) = pr.map((_, 2.5))
                  .getOrElse((r, scaleFactor / 2.0))
                if (eff > bound && b > a + 0.5)
                  Some(s"$name:${r3(eff)}x>${r3(bound)}x")
                else None
              }
              breach(x1, xn).foreach { first =>
                System.err.println(s"[bench] scaling bound breach $first" +
                  " — re-measuring the x1/xN pair once")
                scalConfirmed += name
                x1 = math.min(x1, runE2eIn(name, sfDir))
                xn = math.min(xn, runE2eIn(name, tmp.toString))
                breach(x1, xn).foreach { v =>
                  scalViolations += v
                  System.err.println(s"[bench] scaling bound violation " +
                    s"(reproduced): $v")
                }
              }
              val ratio = ratioOf(x1, xn)
              x1Times(name) = x1
              if (ratio > 0) rawRatio8(name) = ratio
              outs match {
                case Some((o1, oN)) =>
                  val perRow = perRowOf(ratio).getOrElse(-1.0)
                  if (perRow > 0) scalRatios += perRow
                  s""""$name":{"x1":$x1,"x$scaleFactor":$xn,""" +
                    s""""ratio":$ratio,"out_x1":$o1,"out_xn":$oN,""" +
                    s""""ratio_per_row":$perRow}"""
                case None =>
                  if (x1 > 0) scalRatios += ratio
                  s""""$name":{"x1":$x1,"x$scaleFactor":$xn,"ratio":$ratio}"""
              }
            } catch { case e: Throwable =>
              System.err.println(s"[bench] scaling $name: ${e.getMessage}")
              scalErrors += 1
              s""""$name":null"""
            }
          }
          // reduced 27× leg (r8 directive: SCALE.md's 27× curves were
          // measured in round 7 and frozen — a regression at the 27×
          // knee, e.g. a broadcast crossing its threshold, would not
          // show in an 8×-only artifact). Three documents-only ops with
          // the worst 8× raw ratios, single-shot, x1 reused from above:
          // ~1 min of bench time keeps the knee observable per round.
          if (!sys.env.get("SPARK_GRAFT_SCALING27").contains("0") &&
              budget.allows("scaling27", 180)) try {
            val f27 = 27
            val tmp27 = java.nio.file.Files.createTempDirectory("graft_s27")
            try {
              scaleUp("documents", "doc_id", f27, tmp27)
              val q27 = Seq("x_graph_pagerank", "x_dedup_cc",
                "x_pipeline_dsir", "x_dedup_span_removal")
                .filter(x1Times.contains)
              val e27 = q27.map { name =>
                try {
                  val x1 = x1Times(name)
                  // the 27× alarm bar extrapolates from the MEASURED 8×
                  // ratio (2 × ratio8 × 27/8, floored at the factor):
                  // a raw "ratio > 27" bar never fires — the round-10
                  // dsir spike read 24.4×, i.e. sub-factor yet 18×
                  // above what its own 8× leg predicted
                  val thresh = rawRatio8.get(name).filter(_ > 0)
                    .map(r8 => math.min(f27.toDouble,
                      2.0 * r8 * f27 / scaleFactor))
                    .getOrElse(f27.toDouble)
                  val xn = confirmedRun(name, tmp27.toString, x1, thresh)
                  val ratio = if (x1 > 0) xn / x1 else -1.0
                  // same edge normalization as the 8× leg: the derived
                  // star-edge set grows SUPERLINEARLY in the copy count
                  // (8× data → 51.7× edges on this fixture), so a raw
                  // 27× wall ratio would look alarming while per-edge
                  // cost is the honest number
                  (for {
                    o1 <- edgesFor(name, sfDir)
                    oN <- edgesFor(name, tmp27.toString)
                  } yield (o1, oN)) match {
                    case Some((o1, oN)) =>
                      val growth = if (o1 > 0) oN.toDouble / o1 else -1.0
                      val perRow =
                        if (ratio > 0 && growth > 0) ratio / growth
                        else -1.0
                      s""""$name":{"x1":$x1,"x$f27":$xn,"ratio":$ratio,""" +
                        s""""out_x1":$o1,"out_xn":$oN,""" +
                        s""""ratio_per_row":$perRow}"""
                    case None =>
                      s""""$name":{"x1":$x1,"x$f27":$xn,"ratio":$ratio}"""
                  }
                } catch { case e: Throwable =>
                  System.err.println(s"[bench] scaling27 $name: ${e.getMessage}")
                  s""""$name":null"""
                }
              }
              scaling27Json = s"""{"factor":$f27,"queries":${
                e27.mkString("{", ",", "}")}}"""
            } finally {
              sources.FsUtil.deleteRecursively(tmp27, swallowErrors = true)
            }
          } catch { case e: Throwable =>
            System.err.println(s"[bench] scaling27 failed: ${e.getMessage}")
          }
          scalSteal =
            math.rint(stealBetween(scalJ0, cpuJiffies()) * 100) / 100
          s"""{"factor":$scaleFactor,"checkpoint":"reliable",""" +
            s""""steal_pct":$scalSteal,"queries":${
              entries.mkString("{", ",", "}")}}"""
        } finally {
          spark.conf.unset("spark.graft.checkpoint.dir")
          sources.FsUtil.deleteRecursively(tmp, swallowErrors = true)
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] scaling failed: ${e.getMessage}")
        // the leg was attempted (the guard above filtered factor<=1/
        // soakOnly), so a crash here — before OR after the first query
        // — is an engine/harness error the verdict must carry
        scalErrors += 1
        "{}"
      }
    // section-local contention sensor for the scaling leg (the r12
    // driver's scal_worst 20.405 was measured in a window the
    // run-level average could not convict on its own)
    val scalProbeAfter = if (scalRan) cpuProbe(1) else -1.0
    traceLoad("scaling")

    // full-registry e2e sweep (single-shot per query, construction and
    // training included — the strictest basis): every registered query,
    // so the driver artifact carries total coverage cost, failure count,
    // and the slowest entry each round instead of that sweep living only
    // in a README claim. Serial on purpose — d_* queries mutate fixed
    // scratch paths and may not interleave.
    val fullReg = !sys.env.get("SPARK_GRAFT_BENCH_FULLREG").contains("0") &&
      !soakOnly && budget.allows("all_sweep", 300)
    var allTotal = 0.0
    var allFail = 0
    val allSkipped = scala.collection.mutable.ArrayBuffer.empty[String]
    var slowest: (String, Double) = ("", 0.0)
    // anomaly-confirm for the sweep (round-11 directive: the 27× leg
    // got single-shot confirmation in round 10, the sweep didn't — and
    // the round-10 driver artifact carries an 18.6 s single-shot spike
    // the builder measures at 7.0 s). A single-shot entry that reads
    // far above its own reference — trailing sweep median from the
    // history when ≥3 priors exist, else this run's best-of-N for the
    // same query, else an 8 s absolute bar — gets exactly one
    // confirming re-run; the min lands in the artifact and the name in
    // `all_confirmed`, so a surviving tail entry is a confirmed
    // measurement, never a lottery ticket.
    val allConfirmed = scala.collection.mutable.ArrayBuffer.empty[String]
    // sweep-basis wall ratios for the wall-basis machine factor
    // (round-15 directive #1): this run's single-shot sweep wall ÷ the
    // trailing same-plan sweep median (≥3 priors), one ratio per
    // plan-matched registry query — the factor's statistical power
    // comes from here (~300 pairs on a mature history vs the
    // headline's 16)
    var sweepWallRatios: Seq[Double] = Seq.empty
    val allJson: String =
      if (!fullReg) "{}"
      else {
        val sweepMedians: Map[String, (Double, Long)] =
          try {
            if (histRoot.isEmpty) Map.empty
            else {
              import org.apache.spark.sql.functions.{col, count, lit,
                median}
              plans.QueryStats.history(spark, histRoot)
                .filter(col("run_id").startsWith("sweep_"))
                .groupBy(col("query"))
                .agg(median(col("wall_ms")).as("med"),
                  count(lit(1)).as("n"))
                .collect()
                .map(r => r.getString(0) ->
                  (r.getDouble(1) / 1000.0, r.getLong(2))).toMap
            }
          } catch { case _: Throwable => Map.empty }
        // same read, plan-hash-scoped: (query, plan_hash) → trailing
        // sweep median over ≥3 priors. Plan-hash filtering happens at
        // ratio time (below) because sweep-only queries get their
        // hashes captured DURING the sweep, after this point.
        val sweepTrailing: Map[(String, String), Double] =
          try {
            if (histRoot.isEmpty) Map.empty
            else {
              import org.apache.spark.sql.functions.{col, count, lit,
                median}
              plans.QueryStats.history(spark, histRoot)
                .filter(col("run_id").startsWith("sweep_"))
                .groupBy(col("query"), col("plan_hash"))
                .agg(median(col("wall_ms")).as("med"),
                  count(lit(1)).as("n"))
                .collect().flatMap { r =>
                  if (r.getLong(3) >= 3)
                    Some((r.getString(0), r.getString(1)) ->
                      r.getDouble(2) / 1000.0)
                  else None
                }.toMap
            }
          } catch { case _: Throwable => Map.empty }
        val priorBest: Map[String, Double] =
          (results ++ extResults).collect { case (n, Some(s)) => n -> s }
            .toMap
        def confirmBar(name: String): Double =
          sweepMedians.get(name).collect { case (med, n) if n >= 3 =>
            math.max(2.0 * med, 1.0) }
          .orElse(priorBest.get(name).map(b => math.max(3.0 * b, 2.0)))
          .getOrElse(8.0)
        val sweepTimes =
          scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
        // same budget rule as the extended section: skipped entries are
        // dropped (never nulled — null means FAILED) and counted
        val entries = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
          if (allSkipped.nonEmpty || !budget.has(45)) {
            if (allSkipped.isEmpty) budget.skipped += "all_sweep_tail"
            allSkipped += name
            None
          } else {
          val sec =
            try {
              val first = runE2e(name)
              val bar = confirmBar(name)
              Some(if (first > bar && budget.has(90)) {
                System.err.println(s"[bench] sweep $name read " +
                  s"${r3(first)}s (> ${r3(bar)}s bar) — confirming " +
                  "with one re-run")
                allConfirmed += name
                math.min(first, runE2e(name))
              } else first)
            } catch { case e: Throwable =>
              System.err.println(s"[bench] all $name failed: ${e.getMessage}")
              None
            }
          sec match {
            case Some(s) =>
              allTotal += s
              sweepTimes += name -> s
              if (s > slowest._2) slowest = (name, s)
            case None => allFail += 1
          }
          Some("\"" + name + "\":" + jnum(sec))
          }
        }
        sweepWallRatios = sweepTimes.toSeq.flatMap { case (n, s) =>
          planHashes.get(n)
            .flatMap(h => sweepTrailing.get((n, h)))
            .filter(m => m > 0 && s > 0).map(s / _)
        }
        // the sweep's walls join the history under sweep_* run_ids —
        // the trailing-median reference the confirm bar reads next run
        try {
          if (histRoot.nonEmpty && sweepTimes.nonEmpty) {
            val ts = System.currentTimeMillis()
            plans.QueryStats.append(spark, histRoot, s"sweep_$ts",
              sweepTimes.toSeq.map { case (n, s) =>
                plans.QueryStats.Entry(n, math.rint(s * 1e6) / 1e3, -1L,
                  ts, planHashes.getOrElse(n, "")) })
          }
        } catch { case e: Throwable =>
          System.err.println(s"[bench] sweep history append: $e")
        }
        entries.mkString("{", ",", "}")
      }
    traceLoad("all")

    // machine-state verdict for the whole run. Contended when any of:
    //  - the hypervisor stole >5% of cpu during the run;
    //  - any timing failed to converge under the re-run guard;
    //  - parallel efficiency (all-threads probe ÷ threads×single-thread
    //    probe) below 0.35 — fewer than ~a third of the claimed cpus
    //    actually deliver cycles. This is the one signal a STEADY
    //    co-tenant can't hide from: SMT alone sits ~0.5 on a dedicated
    //    box, while a host-level co-load (invisible to containerized
    //    loadavg AND to steal) caps aggregate throughput directly.
    // Entry loadavg is reported but is NOT a trigger: the 1-minute
    // average still carries the harness's own just-finished compile /
    // JVM startup and decays slowly, so it false-positives on a clean
    // dedicated box (and, containerized, misses the host anyway — the
    // probe covers that case properly).
    val jiffies1 = cpuJiffies()
    val stealPct =
      if (jiffies1._2 > jiffies0._2)
        100.0 * (jiffies1._1 - jiffies0._1) / (jiffies1._2 - jiffies0._2)
      else 0.0
    val parEff =
      if (probe1 > 0 && cpus.toInt > 1)
        math.rint(probeN / (probe1 * cpus.toInt) * 100) / 100
      else 1.0
    // exit probe: a co-load that ARRIVED mid-run shows as probe decay
    val probe1End = cpuProbe(1)
    // exit I/O probe (warm by now, one read suffices): mid-run storage
    // degradation shows as decay vs the entry warm pass
    val ioEnd = ioReadOnce(sfDir)
    // run-level verdict. ONE query failing the 25% convergence guard is
    // not, by itself, machine contention: round-10 measured a pristine
    // window (par_eff 0.84, steal 0.03%, probe 454→449 M/s) where a
    // single sub-second extended query (x_events_survival_km) still
    // spread past the guard on its own GC variance — flipping the whole
    // artifact to `contended` on that alone makes the flag cry wolf and
    // buries the real signal. So: when every machine probe is PRISTINE
    // (steal ≤1%, par_eff ≥0.7, no probe decay), a singleton unstable
    // timing stays a per-query annotation in `load.unstable`; two or
    // more, or any non-pristine probe alongside instability, still
    // condemn the run — the genuinely co-loaded round-10 windows read
    // 4×unstable and 1×unstable@par_eff 0.56 and both stay flagged.
    val probeDecay = probe1 > 0 && probe1End < probe1 * 0.85
    val pristine = stealPct <= 1.0 && !probeDecay &&
      (cpus.toInt == 1 || parEff >= 0.7)
    def sectionDecayed(probeAfter: Double): Boolean =
      probe1 > 0 && probeAfter > 0 && probeAfter < probe1 * 0.85
    val concInflated = concRan && serialsInflated(concSerials, serialRefs)
    val conc4Inflated =
      conc4Assemble.isDefined && serialsInflated(conc4Serials, serialRefs)
    // the WINDOWED contention sensors, collected by name so the
    // artifact records WHICH evidence corroborated (or would have):
    // per-query timing instability alone may no longer convict the
    // run (round-14 directive #2 — see runContended's scaladoc)
    val windowEvidence: Seq[String] = Seq(
      "probe_decay" -> probeDecay,
      "steal" -> (stealPct > 2.5),
      "conc_probe_decay" -> sectionDecayed(concProbeAfter),
      "conc4_probe_decay" -> sectionDecayed(conc4ProbeAfter),
      "scal_probe_decay" -> sectionDecayed(scalProbeAfter),
      "serial_inflation" -> (concInflated || conc4Inflated),
      "conc_steal" -> (concSteal > 2.5),
      "conc4_steal" -> (conc4Steal > 2.5),
      "scal_steal" -> (scalSteal > 2.5),
      "headline_retry_dirty" -> headlineWindowDirty
    ).collect { case (n, true) => n }
    val contended = runContended(stealPct, parEff, cpus.toInt,
      unstable.size, pristine, windowEvidence.nonEmpty)
    val loadJson = s"""{"entry":$loadEntry,"steal_pct":${
        math.rint(stealPct * 100) / 100},"reruns":$benchReruns,""" +
      s""""cpu_probe_1":$probe1,"cpu_probe_n":$probeN,""" +
      s""""cpu_probe_1_end":$probe1End,""" +
      s""""cpu_probe_1_conc4":$conc4ProbeAfter,"par_eff":$parEff,""" +
      s""""io_probe_mbs":[$ioCold,$ioWarm],"io_probe_mbs_end":$ioEnd,""" +
      s""""unstable":${unstable.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""evidence":${windowEvidence.map("\"" + _ + "\"")
        .mkString("[", ",", "]")},""" +
      s""""trace":${loadTrace.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")}}"""

    // finalize the mixed-leg verdict now that the contention evidence
    // is in: run-level `contended` OR probe decay measured right at the
    // leg's exit OR the leg's own serial inflation qualifies a
    // bound-only failure as machine-attributable
    val (conc4OkJson, conc4ReasonJson) = conc4Assemble match {
      case None => ("null", "null") // leg skipped — no verdict at all
      case Some(_) =>
        val sectionContended = sectionDecayed(conc4ProbeAfter) ||
          conc4Inflated || conc4Steal > 2.5
        conc4Verdict(conc4Consistent, conc4Errors, conc4Violations,
          contended || sectionContended)
    }
    val concurrent4Json =
      conc4Assemble.map(_(conc4OkJson, conc4ReasonJson)).getOrElse("{}")
    // 2-user leg verdict, same emit-time qualification (round 13)
    val (concOkJson, concReasonJson) =
      if (!concRan) ("null", "null")
      else conc4Verdict(true, 0, concViolations.toSeq,
        contended || sectionDecayed(concProbeAfter) || concInflated ||
          concSteal > 2.5,
        "p50_bound")
    // scaling-leg verdict (round-13 directive): a scaling query that
    // THREW is an engine failure (false/"errors"); a reproducing
    // ratio-bound breach on a quiet machine is false/"ratio_bound";
    // the same breach on a contended run — where numerator and
    // denominator were measured under different load — is
    // null/"contended"; a clean leg is true. A leg that was ATTEMPTED
    // but crashed before any query ran is false/"errors" too (ADVICE
    // r13) — null/null is reserved for factor<=1/soakOnly skips.
    val (scalOkJson, scalReasonJson) =
      if (!scalAttempted) ("null", "null")
      else if (!scalRan) ("false", "\"errors\"")
      else conc4Verdict(true, scalErrors, scalViolations.toSeq,
        contended || sectionDecayed(scalProbeAfter) || scalSteal > 2.5,
        "ratio_bound")
    val scalViolJson =
      scalViolations.map("\"" + _ + "\"").mkString("[", ",", "]")
    val scalConfJson =
      scalConfirmed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val concViolJson =
      concViolations.map("\"" + _ + "\"").mkString("[", ",", "]")

    val confirmedJson =
      allConfirmed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val regNamesJson =
      regressionNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val scalWorst = jnum(scalRatios.maxOption.map(r3))
    val concW = jnum(concWorst.map(r3))
    // normalized headline vs the pinned yardstick (round-14 directive
    // #1 — see the yardstick block's comment): factor = geomean of the
    // clamped probe ratios (this run ÷ pin), normalized = raw total ×
    // factor, i.e. the headline expressed in yardstick-machine
    // seconds. Per-query normalized walls are raw × the same factor
    // (one machine, one factor), so only the factor is emitted. The
    // ENTRY probes are used — they are the samples adjacent to the
    // headline window. Raw ratios ride along un-clamped so a clamp
    // hit is visible in the artifact.
    def r4(d: Double): Double = math.rint(d * 10000) / 10000
    val normTotal = r3(total * nFactor)
    // wall-basis machine factor (round-15 directive #1 — see
    // wallFactor's scaladoc): headline pairs (best-of-N vs trailing
    // bench-basis same-plan medians) pooled with sweep pairs
    // (single-shot vs trailing sweep-basis same-plan medians); each
    // pool compares like with like on its own basis, and both ratios
    // estimate the same machine speed. The walls win when the two
    // factors disagree >15% — they measure the workload, not a proxy
    // — and the disagreement is flagged in the artifact and README.
    val wallRatioPool =
      wallRatios(headlineWall, trailingMedians) ++ sweepWallRatios
    val (factorWalls, wallsMedian, wallsPairs) = wallFactor(wallRatioPool)
    val normWallsTotal =
      if (factorWalls > 0) r3(total * factorWalls).toString else "null"
    val normDisagree = factorsDisagree(nFactor, factorWalls)
    def jarr(xs: Seq[Double]): String = xs.mkString("[", ",", "]")
    val normalizedJson =
      s"""{"value":$normTotal,"factor":${r4(nFactor)},""" +
        s""""value_walls":$normWallsTotal,""" +
        s""""factor_walls":${r4(factorWalls)},""" +
        s""""walls_ratio_median":${r4(wallsMedian)},""" +
        s""""walls_pairs":$wallsPairs,""" +
        s""""factors_disagree":$normDisagree,""" +
        s""""cpu1_ratio":${r4(cpu1Ratio)},"cpun_ratio":${r4(cpuNRatio)},""" +
        s""""io_warm_ratio":${r4(ioWarmRatio)},""" +
        s""""cpu_n_threads":${cpus.toInt},""" +
        s""""probes":{"cpu1":${jarr(probe1Samples)},""" +
        s""""cpun":${jarr(probeNSamples)},""" +
        s""""io_warm":${jarr(ioWarmSamples)}},""" +
        s""""probe_spread_pct":{"cpu1":${spreadPct(probe1Samples)},""" +
        s""""cpun":${spreadPct(probeNSamples)},""" +
        s""""io_warm":${spreadPct(ioWarmSamples)}},""" +
        s""""yardstick":{"cpu_probe_1":$yardstickCpu1,""" +
        s""""cpu_probe_n":$yardstickCpuN,""" +
        s""""cpu_n_threads":$yardstickCpuNThreads,""" +
        s""""io_warm_mbs":$yardstickIoWarm,""" +
        s""""pinned_from":"$yardstickFrom"}}"""
    // budget accounting (round-16 directive #1): which sections the
    // wall budget skipped, and how many extended/sweep entries were
    // dropped — a dropped entry is a budget event, never a failure
    val budgetJson =
      s"""{"sec":${budget.budgetSec},"elapsed":${r3(budget.elapsed)},""" +
        s""""reruns_capped":${benchReruns >= rerunCap},""" +
        s""""sections_skipped":${budget.skipped
          .map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""ext_skipped":${extSkipped.size},""" +
        s""""all_skipped":${allSkipped.size},""" +
        s""""ext_skipped_names":${extSkipped
          .map("\"" + _ + "\"").mkString("[", ",", "]")}}"""
    val line = s"""{"metric":"headline_total","value":$total,"unit":"sec","budget":$budgetJson,"normalized":$normalizedJson,"queries":$qs,"extended":$extJson,"scaling":$scalingJson,"scaling27":$scaling27Json,"scal_worst":$scalWorst,"scal_ok":$scalOkJson,"scal_reason":$scalReasonJson,"scal_violations":$scalViolJson,"scal_confirmed":$scalConfJson,"concurrent":{"sessions":$users,"ok":$concOkJson,"reason":$concReasonJson,"worst":$concW,"steal_pct":$concSteal,"violations":$concViolJson,"queries":$concurrentJson},"concurrent4":$concurrent4Json,"soak":$soakJson,"soak_crash":$soakCrashJson,"soak_crash_all":$soakCrashAllJson,"all":$allJson,"all_confirmed":$confirmedJson,"regressions":$regressionsN,"regression_names":$regNamesJson,"headline_retry":$headlineRetryJson,"plants":$plantsJson,"contended":$contended,"load":$loadJson,"sf":"$sfDir"}"""
    // full-precision, full-section copy: sbt wraps stdout in [info] noise
    // and the driver's stdout tail capture is ~2 KB, so the complete
    // artifact always lands in this file
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_out.json"), line + "\n")
    // printed line: must parse out of the driver's ~2 KB tail buffer —
    // round-5's full line (~3.6 KB) was truncated mid-JSON and recorded as
    // parsed:null. Print headline (rounded to ms) always, plus as many of
    // the secondary sections as fit under the budget.
    def jnum3(v: Option[Double]): String =
      v.map(x => r3(x).toString).getOrElse("null")
    val qs3 = results.map { case (k, v) => "\"" + k + "\":" + jnum3(v) }
      .mkString("{", ",", "}")
    val ext3 = extResults.map { case (k, v) => "\"" + k + "\":" + jnum3(v) }
      .mkString("{", ",", "}")
    // the regression signals the driver-visible line must NEVER drop
    // (round-6's tail truncation lost the extended/scaling/concurrent
    // sections entirely): extended-section total, worst measured scaling
    // ratio (output-normalized for the output-bound dedup joins), worst
    // concurrent p50/serial ratio, full-registry total/failures/slowest,
    // soak failures
    val extTotal = r3(extResults.flatMap(_._2).sum)
    // ext_fail guards ext_total's blind spot: a crashing extended query
    // drops OUT of the sum, which would otherwise read as a speedup
    val extFail = extResults.count(_._2.isEmpty)
    val conc4W = jnum(conc4Worst.map(r3))
    val slowJson =
      if (slowest._1.isEmpty) "null"
      else "\"" + slowest._1 + ":" + r3(slowest._2) + "\""
    val signals =
      // normalized headline + factor ride the driver-visible line so
      // the round-over-round comparison is arithmetic from the compact
      // line alone (full formula inputs live in bench_out.json's
      // `normalized` object)
      s""","headline_normalized":$normTotal,"norm_factor":${r4(nFactor)}""" +
      // wall-basis twin + disagreement flag (round-15 directive #1):
      // the driver-visible line carries BOTH normalizations so the
      // round-over-round comparison never rests on the proxy factor
      // alone
      s""","headline_norm_walls":$normWallsTotal""" +
      s""","norm_factor_walls":${r4(factorWalls)}""" +
      s""","norm_disagree":$normDisagree""" +
      // budget skip summary rides the compact line too: a shorter-than-
      // usual extended/all section must self-identify as a budget event
      // in the driver-visible line, not read as a mysterious speedup
      s""","budget_skipped":${budget.skipped
        .map("\"" + _ + "\"").mkString("[", ",", "]")}""" +
      s""","ext_skipped":${extSkipped.size},"all_skipped":${allSkipped.size}""" +
      s""","ext_total":$extTotal,"ext_fail":$extFail""" +
      s""","scal_worst":$scalWorst,"conc_worst":$concW""" +
      s""","conc4_worst":$conc4W""" +
      // the self-validating verdicts (round 11, completed round 13 —
      // every compact-line ratio now travels with its own bound
      // verdict): conc4_ok (mixed leg), conc_ok (2-user leg), scal_ok
      // (scaling leg), regressions (query-history tripwire; -1 = no
      // trailing history yet), all_confirmed (sweep entries that
      // survived an anomaly-confirm re-run)
      s""","conc4_ok":$conc4OkJson,"conc4_reason":$conc4ReasonJson""" +
      s""","conc_ok":$concOkJson,"conc_reason":$concReasonJson""" +
      s""","scal_ok":$scalOkJson,"scal_reason":$scalReasonJson""" +
      s""","plants":$plantsJson""" +
      s""","regressions":$regressionsN""" +
      s""","all_total":${r3(allTotal)},"all_fail":$allFail""" +
      s""","all_confirmed":$confirmedJson""" +
      s""","slowest":$slowJson,"soak_fail":$soakFail""" +
      // the drill's verdict rides the DRIVER-VISIBLE line in full:
      // round 9's bare soak_fail count arrived with zero diagnosis and
      // forced forensics on a gitignored file — staged/child_exit/
      // recovered (and a bounded child tail on failure) make any
      // future staging or recovery failure self-explaining
      s""","soak_crash":$soakCrashJson""" +
      s""","contended":$contended,"load_entry":$loadEntry""" +
      s""","steal_pct":${math.rint(stealPct * 100) / 100}""" +
      s""","cpu_probe_1":$probe1,"cpu_probe_n":$probeN"""
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
