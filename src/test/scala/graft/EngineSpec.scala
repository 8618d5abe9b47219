package graft

import org.apache.spark.sql.functions._

/** End-to-end sanity over the driver contract at sf0.001. */
class EngineSpec extends GraftSuite {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and matches declared names") {
    val names = SparkEntry.queries.keySet
    assert(names.size == QueryDef.all.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
  }

  test("q01 pricing summary shape and invariants") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
    val rows = df.collect()
    assert(rows.length == 6) // 3 returnflags × 2 linestatus
    assert(df.columns.toSeq == Seq("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "sum_charge", "avg_qty",
      "avg_price", "avg_disc", "count_order"))
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("sum_disc_price")) <=
        r.getDouble(r.fieldIndex("sum_base_price")))
      assert(r.getDouble(r.fieldIndex("sum_charge")) >=
        r.getDouble(r.fieldIndex("sum_disc_price")))
      assert(r.getLong(r.fieldIndex("count_order")) > 0)
    }
  }

  test("q06 equals manual recomputation") {
    val li = Tables.table(spark, sf, "lineitem")
    val manual = li.filter(
      col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice") * col("l_discount"))).collect()(0)
      .getDouble(0)
    val got = SparkEntry.queries("q06_forecast_revenue")(spark, sf)
      .collect()(0).getDouble(0)
    assert(math.abs(got - manual) < 1e-6)
  }

  test("null-aware NOT IN returns zero when subquery has nulls") {
    val df = SparkEntry.queries("j_anti_null_aware")(spark, sf).collect()(0)
    assert(df.getLong(df.fieldIndex("n_with_nulls")) == 0L)
    assert(df.getLong(df.fieldIndex("n_without_nulls")) == 0L)
    assert(df.getLong(df.fieldIndex("n_plain")) > 0L)
  }

  test("where-false short-circuits to zero") {
    val r = SparkEntry.queries("f_where_false")(spark, sf).collect()(0)
    assert(r.getLong(0) == 0L)
  }

  test("resample densifies gaps and forward-fills the last observation") {
    import spark.implicits._
    // hours 0, 1, 3 have events (hour 2 is a gap); values 2.0, 4.0, 8.0
    val rows = Seq(0, 1, 3).flatMap(h => Seq(
      (h.toLong * 10, new java.sql.Timestamp(h.toLong * 3600 * 1000), 1L,
        "click", math.pow(2.0, h + 1), "{}")))
    val tmp = java.nio.file.Files.createTempDirectory("graft_rs").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = operators.EventsQueries.resample.run(spark, tmp).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 3L),
      "spine must densify to every hour between min and max")
    val gap = out.find(_.getLong(1) == 2L).get
    assert(gap.getLong(2) == 0L && gap.getBoolean(3), "hour 2 must be a gap")
    assert(gap.getDouble(4) == 4.0,
      "gap must carry hour 1's value forward")
    assert(out.count(_.getBoolean(3)) == 1, "exactly one gap expected")
  }

  test("winsorized mean resists planted outliers; raw mean does not") {
    import spark.implicits._
    // 98 values of 10.0 plus two enormous outliers: raw mean is dragged
    // to ~210, the p05/p95-clipped mean stays at 10
    val rows = ((1 to 98).map(i => (i.toLong,
      new java.sql.Timestamp(i * 60000L), 1L, "m", 10.0, "{}")) ++
      Seq((99L, new java.sql.Timestamp(99 * 60000L), 1L, "m", 10000.0, "{}"),
        (100L, new java.sql.Timestamp(100 * 60000L), 1L, "m", 10000.0, "{}")))
    val tmp = java.nio.file.Files.createTempDirectory("graft_wz").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = operators.EventsQueries.winsorize.run(spark, tmp).collect()(0)
    assert(r.getLong(1) == 100L)
    assert(r.getDouble(2) > 200.0, s"raw mean must be dragged: $r")
    assert(r.getDouble(3) == 10.0, s"winsorized mean must resist: $r")
    assert(r.getLong(7) == 2L, "both outliers must clip high")
  }

  test("transition matrix counts lagged pairs and row-normalizes") {
    import spark.implicits._
    // user 1: A B A B  → A→B ×2, B→A ×1;  user 2: A C  → A→C ×1
    val rows = Seq(
      (1L, 0, 1L, "A"), (2L, 1, 1L, "B"), (3L, 2, 1L, "A"),
      (4L, 3, 1L, "B"), (5L, 0, 2L, "A"), (6L, 1, 2L, "C"))
      .map { case (id, m, u, t) =>
        (id, new java.sql.Timestamp(m * 60000L), u, t, 1.0, "{}") }
    val tmp = java.nio.file.Files.createTempDirectory("graft_tr").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = operators.EventsQueries.transitions.run(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out(("A", "B")).getLong(2) == 2L)
    assert(out(("A", "B")).getDouble(3) == 0.6667)
    assert(out(("A", "C")).getDouble(3) == 0.3333)
    assert(out(("B", "A")).getLong(2) == 1L)
    assert(out(("B", "A")).getDouble(3) == 1.0)
    assert(out.size == 3, out.keys.toString)
  }

  test("anomaly detection flags planted spikes on flat and noisy baselines") {
    import spark.implicits._
    // two independent series: "flat" holds 10/hour (σ = 0), "noisy"
    // alternates 9/11 (σ ≈ 1); both spike to 100 events in hour 29
    val rows = (0 until 30).flatMap { h =>
      def mk(typ: String, n: Int) = (0 until n).map(i =>
        (h.toLong * 10000 + typ.length * 1000 + i,
          new java.sql.Timestamp(h.toLong * 3600 * 1000), 1L, typ, 1.0, "{}"))
      val flat = mk("flat", if (h == 29) 100 else 10)
      val noisy = mk("noisy", if (h == 29) 100 else if (h % 2 == 0) 9 else 11)
      flat ++ noisy
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_ev").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = operators.EventsQueries.anomaly.run(spark, tmp).collect()
    val key = out.map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    // noisy series: genuine z-score path, z ≫ 3
    assert(key(("noisy", 29L)).getBoolean(7), "noisy spike not flagged")
    assert(key(("noisy", 29L)).getDouble(6) > 3.0)
    // flat series: σ = 0, z pinned to 0, but the deviation still flags
    assert(key(("flat", 29L)).getBoolean(7), "flat-baseline spike missed")
    assert(key(("flat", 29L)).getDouble(6) == 0.0)
    // baseline hours never flag on either series
    assert((5L to 28L).forall(h => !key(("flat", h)).getBoolean(7)))
    assert((5L to 28L).forall(h => !key(("noisy", h)).getBoolean(7)))
  }

  test("ewma replays the exponential recursion per type") {
    import spark.implicits._
    // type A: hourly counts 10, 20, 30, 40 → s = 10, 13, 18.1, 24.67
    // type B: a single hour → seed only
    val rows = (0 until 4).flatMap { h =>
      (0 until (h + 1) * 10).map(i =>
        (h.toLong * 1000 + i, new java.sql.Timestamp(h.toLong * 3600 * 1000),
          1L, "A", 1.0, "{}"))
    } ++ Seq((9000L, new java.sql.Timestamp(0L), 1L, "B", 1.0, "{}"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_ew").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = operators.EventsQueries.ewma.run(spark, tmp).collect()
    val a = out.filter(_.getString(0) == "A").sortBy(_.getTimestamp(1).getTime)
    assert(a.map(_.getLong(2)).toSeq == Seq(10L, 20L, 30L, 40L))
    val expect = Seq(10.0, 0.3 * 20 + 0.7 * 10.0)
    val e2 = 0.3 * 30 + 0.7 * expect(1)
    val all = expect ++ Seq(e2, 0.3 * 40 + 0.7 * e2)
    a.map(_.getDouble(3)).zip(all).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-12, s"got $got want $want")
    }
    val b = out.filter(_.getString(0) == "B")
    assert(b.length == 1 && b(0).getDouble(3) == 1.0,
      "single observation must seed the smoother with itself")
  }

  test("holt forecasting tracks a perfect linear trend exactly") {
    import spark.implicits._
    // counts 10,20,30,40 → Holt with l₁=10, b₁=10 stays locked on the
    // line: level 40, trend 10, forecast 50 (simple EWMA would lag)
    val rows = (0 until 4).flatMap { h =>
      (0 until (h + 1) * 10).map(i =>
        (h.toLong * 1000 + i, new java.sql.Timestamp(h.toLong * 3600 * 1000),
          1L, "A", 1.0, "{}"))
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_holt").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = operators.EventsQueries.holtForecast.run(spark, tmp).collect()(0)
    assert(r.getLong(1) == 4L)
    assert(r.getDouble(2) == 40.0 && r.getDouble(3) == 10.0 &&
      r.getDouble(4) == 50.0, s"holt on a line: ${r.toSeq}")
  }

  test("dau/wau/mau replay a planted sparse-activity calendar") {
    import spark.implicits._
    // users 1,2 on day 0; user 3 on day 10: DAU(10)=1, the 7-day window
    // ending day 10 holds only user 3 (WAU=1), the 28-day window still
    // remembers users 1,2 (MAU=3)
    def ts(d: Long) = new java.sql.Timestamp(d * 86400 * 1000)
    val rows = Seq((1L, ts(0), 1L, "view", 1.0, "{}"),
      (2L, ts(0), 2L, "view", 1.0, "{}"),
      (3L, ts(10), 3L, "view", 1.0, "{}"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_au").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = operators.EventsQueries.activeUsers.run(spark, tmp).collect()
      .map(r => (r.getTimestamp(0).getTime / 86400000L,
        r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 2L, 2L, 2L), (10L, 1L, 1L, 3L)),
      s"activity calendar: ${out.toSeq}")
  }

  test("kaplan-meier keeps the censored user in the risk set") {
    import spark.implicits._
    // users 1,2 convert at hour 2; user 4 at hour 5; user 3 never —
    // censored at corpus end (hour 5). S(2) = 1−2/4 = 0.5;
    // S(5) = 0.5·(1−1/2) = 0.25. A censoring-blind curve would read
    // S(5) = 0 — user 3 is the whole point.
    def ts(h: Long) = new java.sql.Timestamp(h * 3600 * 1000)
    val rows = Seq(
      (1L, ts(0), 1L, "view", 1.0, "{}"), (2L, ts(2), 1L, "purchase", 1.0, "{}"),
      (3L, ts(0), 2L, "view", 1.0, "{}"), (4L, ts(2), 2L, "purchase", 1.0, "{}"),
      (5L, ts(0), 3L, "view", 1.0, "{}"),
      (6L, ts(0), 4L, "view", 1.0, "{}"), (7L, ts(5), 4L, "purchase", 1.0, "{}"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_km").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = operators.EventsQueries.survivalKm.run(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((2L, 4L, 2L, 0.5), (5L, 2L, 1L, 0.25)),
      s"KM curve: ${out.toSeq}")
  }

  test("conversion lag matches a direct recomputation") {
    import org.apache.spark.sql.functions.{col, min => fmin, when, unix_micros, lit}
    val r = operators.EventsQueries.conversionLag.run(spark, sf).collect()(0)
    val lags = Tables.table(spark, sf, "events").groupBy(col("user_id"))
      .agg(fmin(when(col("event_type") === "view", col("ts"))).as("fv"),
        fmin(when(col("event_type") === "purchase", col("ts"))).as("fp"))
      .filter(col("fv").isNotNull && col("fp").isNotNull &&
        col("fp") > col("fv"))
      .select(((unix_micros(col("fp")) - unix_micros(col("fv")))
        .cast("double") / lit(1000000)).as("lag"))
      .collect().map(_.getDouble(0)).sorted
    assert(r.getLong(0) == lags.length)
    assert(r.getDouble(3) == math.rint(lags.head * 1000) / 1000)
    assert(r.getDouble(4) == math.rint(lags.last * 1000) / 1000)
    // p50 within the observed range and ≤ p90
    assert(r.getDouble(1) >= lags.head && r.getDouble(1) <= lags.last)
    assert(r.getDouble(1) <= r.getDouble(2))
  }

  test("mad outliers flag the spike a mean/sigma rule would dilute") {
    import spark.implicits._
    // "noisy": 15 hours of 9, 14 hours of 11, then a 100-spike → median
    // 10, MAD 1, modified z = 0.6745·90 = 60.705 at hour 29 only.
    // "flat": constant rate → MAD 0 → rz pinned to 0, no flags.
    val rows = (0 until 30).flatMap { h =>
      def mk(typ: String, n: Int) = (0 until n).map(i =>
        (h.toLong * 10000 + typ.length * 1000 + i,
          new java.sql.Timestamp(h.toLong * 3600 * 1000), 1L, typ, 1.0, "{}"))
      mk("noisy", if (h == 29) 100 else if (h % 2 == 0) 9 else 11) ++
        mk("flat", 7)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_mad").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = operators.EventsQueries.outlierMad.run(spark, tmp).collect()
      .map(r => r.getString(0) -> r).toMap
    val n = out("noisy")
    assert(n.getDouble(2) == 10.0 && n.getDouble(3) == 1.0,
      s"median/MAD: ${n.getDouble(2)}/${n.getDouble(3)}")
    assert(n.getLong(4) == 1L, "exactly the spike flags")
    assert(n.getTimestamp(5).getTime == 29L * 3600 * 1000)
    assert(n.getDouble(6) == 60.705, s"modified z: ${n.getDouble(6)}")
    val f = out("flat")
    assert(f.getLong(4) == 0L && f.getDouble(3) == 0.0,
      "constant series must not alarm")
  }

  test("cusum change-point fires on a small persistent shift, not on noise") {
    import spark.implicits._
    // "shift": 20 hours at 10/h then 20 at 14/h → μ=12, σ=2, drift
    // y−μ−0.5σ = y−13: the CUSUM climbs 1/shifted-hour and crosses the
    // 4σ=8 alarm at the 9th shifted hour (hour 28); a pointwise z-score
    // never fires (max z = 1). "quiet": constant rate, σ=0 → no flags.
    val rows = (0 until 40).flatMap { h =>
      def mk(typ: String, n: Int) = (0 until n).map(i =>
        (h.toLong * 10000 + typ.length * 1000 + i,
          new java.sql.Timestamp(h.toLong * 3600 * 1000), 1L, typ, 1.0, "{}"))
      mk("shift", if (h < 20) 10 else 14) ++ mk("quiet", 7)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_cp").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = operators.EventsQueries.changepoint.run(spark, tmp).collect()
      .map(r => r.getString(0) -> r).toMap
    val sh = out("shift")
    assert(sh.getDouble(2) == 12.0 && sh.getDouble(3) == 2.0,
      s"planted stats: mu=${sh.getDouble(2)} sigma=${sh.getDouble(3)}")
    assert(sh.getLong(4) == 12L, s"flags from S=9..20: ${sh.getLong(4)}")
    assert(sh.getTimestamp(5).getTime == 28L * 3600 * 1000,
      "first alarm at the 9th shifted hour")
    assert(sh.getDouble(6) == 20.0, "peak statistic = total drift")
    val q = out("quiet")
    assert(q.getLong(4) == 0L && q.getTimestamp(5) == null,
      "flat-sigma series must not alarm")
  }

  test("abtest readout is a consistent two-arm partition with finite z") {
    val r = operators.EventsQueries.abtest.run(spark, sf).collect()(0)
    val (na, nb, ca, cb) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    val nUsers = Tables.table(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(na + nb == nUsers, "arms partition the user population")
    assert(na > 0 && nb > 0, "salted hash must populate both arms")
    assert(ca <= na && cb <= nb)
    // median-split conversion: both outcome classes populated → finite z
    assert(ca + cb > 0 && ca + cb < na + nb, "non-degenerate conversion")
    assert(!r.getDouble(6).isNaN && !r.getDouble(6).isInfinite)
  }

  test("bloom prefilter never false-negatives and matches an in-process replay") {
    import spark.implicits._
    import graft.functions.Fnv64
    // dim: orders 1..40 are early (members); 41..400 late. facts: every key.
    val cutoff = java.sql.Timestamp.valueOf("1995-03-01 00:00:00")
    val orders = (1 to 400).map { k =>
      val ts = if (k <= 40) java.sql.Timestamp.valueOf("1995-01-15 00:00:00")
      else java.sql.Timestamp.valueOf("1997-06-01 00:00:00")
      (k.toLong, ts)
    }
    assert(orders.forall { case (k, ts) => (k <= 40) == ts.before(cutoff) })
    val tmp = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    orders.toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    (1 to 400).map(k => (k.toLong, 1.0)).toDF("l_orderkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val r = operators.JoinQueries.bloomPrefilter.run(spark, tmp).collect()(0)
    // in-process replay of the m=65536, k=4 bloom over the same family
    def buckets(k: Long): Seq[Long] = (0 until 4).map { j =>
      val h = Fnv64.mix(Fnv64.hashBytes(k.toString.getBytes("UTF-8"), 0L)
        + (j + 1) * 0x9e3779b97f4a7c15L)
      ((h % 65536) + 65536) % 65536
    }
    val bits = (1 to 40).flatMap(k => buckets(k.toLong)).toSet
    val pass = (1 to 400).count(k => buckets(k.toLong).forall(bits.contains))
    assert(r.getLong(0) == 400L && r.getLong(2) == 40L)
    assert(r.getLong(1) == pass.toLong, "bloom pass count must match replay")
    assert(r.getLong(1) >= r.getLong(2), "no false negatives, ever")
    assert(r.getLong(3) == r.getLong(1) - 40L)
  }

  test("copurchase lift replays the hand-computed basket math") {
    import spark.implicits._
    // baskets: u1{1,2} u2{1,2} u3{1,3} u4{2} → pair (1,2) support 2,
    // lift = 2·4/(3·3) = 0.8889; pair (1,3) support 1 is cut
    val tmp = java.nio.file.Files.createTempDirectory("graft_cop").toString
    Seq((1L, 1), (1L, 2), (2L, 1), (2L, 2), (3L, 1), (3L, 3), (4L, 2))
      .map { case (u, k) => (u, "purchase", s"""{"k": $k}""") }
      .toDF("user_id", "event_type", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val rows = operators.EventsQueries.copurchase.run(spark, tmp).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.toSeq == Seq((1, 2, 2L, 3L, 3L, 0.8889)),
      s"got ${rows.toSeq}")
  }

  test("moments replay hand-computed skewness and kurtosis exactly") {
    import spark.implicits._
    // A: {1,2,3} symmetric → skew 0, excess kurtosis −1.5 (uniform-3).
    // B: {1,1,1,5} right-tailed → m2=3, m3=6, m4=21:
    //    skew = 6/3^1.5 = 1.1547, kurt = 21/9 − 3 = −0.6667, median 1.
    val tmp = java.nio.file.Files.createTempDirectory("graft_mom").toString
    (Seq(1, 2, 3).map(q => ("A", q.toDouble)) ++
      Seq(1, 1, 1, 5).map(q => ("B", q.toDouble)))
      .toDF("l_returnflag", "l_quantity")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val rows = operators.AggregateQueries.moments.run(spark, tmp).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(rows("A") == ((3L, 2.0, 2.0, 0.0, -1.5)), s"A: ${rows("A")}")
    assert(rows("B") == ((4L, 1.0, 2.0, 1.1547, -0.6667)), s"B: ${rows("B")}")
  }

  test("fuzzy edit join finds subs and indels, rejects transpositions") {
    import spark.implicits._
    // carol/carl: deletion pair (dist 1). mike/mika: substitution (dist 1).
    // stone/notes: anagram sharing NO deletion variant. ab/ba: transposition
    // — shares deletion variants {a,b} so it IS a candidate, but dist 2
    // must be filtered by the verify stage. zz: isolated.
    val tmp = java.nio.file.Files.createTempDirectory("graft_fuzzy").toString
    Seq("carol", "carl", "mike", "mika", "stone", "notes", "ab", "ba", "zz")
      .toDF("s_name").write.mode("overwrite").parquet(s"$tmp/supplier.parquet")
    val pairs = operators.JoinQueries.fuzzyEditJoin.run(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(pairs == Set(("carl", "carol", 1), ("mika", "mike", 1)),
      s"got $pairs")
  }

  test("scd2 collapses runs into contiguous half-open validity ranges") {
    import spark.implicits._
    // user 1: A A B A → versions A[0,2) n=2, B[2,3) n=1, A[3,∞) n=1
    // user 2: C       → single current version
    val rows = Seq((1L, 0, 1L, "A"), (2L, 1, 1L, "A"), (3L, 2, 1L, "B"),
      (4L, 3, 1L, "A"), (5L, 0, 2L, "C"))
      .map { case (id, m, u, t) =>
        (id, new java.sql.Timestamp(m * 60000L), u, t, 1.0, "{}") }
    val tmp = java.nio.file.Files.createTempDirectory("graft_scd").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = operators.EventsQueries.scd2.run(spark, tmp).collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(r => (r.getLong(1), r.getString(2), r.getLong(5))).toSeq ==
      Seq((1L, "A", 2L), (2L, "B", 1L), (3L, "A", 1L)))
    // ranges must tile: each valid_to equals the next valid_from
    u1.sliding(2).foreach { case Array(a, b) =>
      assert(a.getTimestamp(4) == b.getTimestamp(3), "ranges must be contiguous")
    }
    assert(u1.count(_.getBoolean(6)) == 1 && u1.last.getBoolean(6),
      "exactly the open run is current")
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2(0).getBoolean(6) && u2(0).isNullAt(4))
  }

  test("event pattern matching finds planted conversion paths and error runs") {
    import spark.implicits._
    // user 1: view click error error purchase view purchase → "vceepvp":
    // two non-overlapping v[ces]*p conversions, error run of 2.
    // user 2: signup view → no conversion.
    // user 3: two events at the SAME ts — event_id must break the tie
    // (purchase id 30 before view id 31 → "pv", no conversion).
    val rows = (Seq(
      (10L, 0, 1L, "view"), (11L, 1, 1L, "click"), (12L, 2, 1L, "error"),
      (13L, 3, 1L, "error"), (14L, 4, 1L, "purchase"),
      (15L, 5, 1L, "view"), (16L, 6, 1L, "purchase"),
      (20L, 0, 2L, "signup"), (21L, 1, 2L, "view"),
      (31L, 0, 3L, "view"), (30L, 0, 3L, "purchase")))
      .map { case (id, m, u, t) =>
        (id, new java.sql.Timestamp(m * 60000L), u, t, 1.0, "{}") }
    val tmp = java.nio.file.Files.createTempDirectory("graft_pat").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = operators.EventsQueries.pattern.run(spark, tmp).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("vceepvp", 2L, 2L)), s"user 1: ${out(1L)}")
    assert(out(2L) == (("sv", 0L, 0L)), s"user 2: ${out(2L)}")
    assert(out(3L) == (("pv", 0L, 0L)),
      s"same-ts order must fall back to event_id: ${out(3L)}")
  }

  test("skyline keeps exactly the non-dominated points (ties both survive)") {
    import spark.implicits._
    // (2) beats (1) on size at equal price; (3)=(4) duplicates — neither
    // strictly better, both stay; (5) min size, (6) min price
    val parts = Seq(
      (1L, 10.0, 5), (2L, 10.0, 3), (3L, 8.0, 7), (4L, 8.0, 7),
      (5L, 12.0, 1), (6L, 7.0, 9))
    val tmp = java.nio.file.Files.createTempDirectory("graft_sky").toString
    parts.toDF("p_partkey", "p_retailprice", "p_size")
      .write.mode("overwrite").parquet(s"$tmp/part.parquet")
    val keys = operators.JoinQueries.skyline.run(spark, tmp).collect()
      .map(_.getLong(0)).toSeq
    assert(keys == Seq(2L, 3L, 4L, 5L, 6L), s"frontier: $keys")
  }

  test("recursive closure: pointer doubling reaches a depth-5 chain") {
    import spark.implicits._
    // planted supplier keys along one decimal chain: 0 → 7 → 73 → 731 →
    // 7313 → 73133 (parent = key div 10); depth = chain position. Five
    // levels exceeds what a single- or double-hop pass could close, so
    // this pins that the doubling loop actually composes pointers.
    val tmp = java.nio.file.Files.createTempDirectory("graft_rec").toString
    Seq(0L, 7L, 73L, 731L, 7313L, 73133L).toDF("s_suppkey")
      .write.mode("overwrite").parquet(s"$tmp/supplier.parquet")
    val out = operators.SubqueryQueries.recursiveClosure.run(spark, tmp)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out(0L) == ((0L, 0L)))
    assert(out(7L) == ((0L, 1L)))
    assert(out(73133L) == ((0L, 5L)), s"deep node: ${out(73133L)}")
  }

  test("phrase search finds planted consecutive runs, not bag matches") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_phrase").toString
    Seq(
      // two true occurrences (positions 1 and 5)
      (1L, "x slow hash batch x slow hash batch", 35L),
      // all three tokens present but never consecutive — must NOT match
      (2L, "slow x hash x batch slow", 24L),
      // overlapping-ish: run at position 0 only
      (3L, "slow hash batch hash batch", 26L))
      .toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = operators.TextQueries.phraseSearch.run(spark, tmp)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2))))
      .toMap
    assert(out == Map(1L -> ((2L, 1)), 3L -> ((1L, 0))), s"got $out")
  }

  test("keep-best elects the largest member of a planted dup cluster") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_kb").toString
    val dupText = "alpha beta gamma delta epsilon zeta eta theta"
    Seq(
      (10L, dupText, 100L), (11L, dupText, 300L), (12L, dupText, 200L),
      (13L, "totally different content words here right now", 50L))
      .toDF("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = operators.DedupQueries.keepBest.run(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // cluster 10: three identical docs; survivor = largest (11, 300),
    // dropped = 100 + 200
    assert(rows(10L) == ((3L, 11L, 300L, 300L)), s"got ${rows.get(10L)}")
    // the distinct doc forms its own singleton cluster, drops nothing
    assert(rows(13L) == ((1L, 13L, 50L, 0L)), s"got ${rows.get(13L)}")
  }

  test("domain cap keeps at most 15 docs per source, best-first") {
    val df = operators.TextQueries.domainCap.run(spark, sf)
    val rows = df.collect()
    val bySrc = rows.groupBy(_.getString(1))
    assert(bySrc.values.forall(_.length <= 15))
    // within a source, ranks are 1..n and n_chars never increases
    bySrc.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to rs.length))
      val chars = sorted.map(_.getLong(2)).toSeq
      assert(chars.zip(chars.tail).forall { case (a, b) => a >= b })
    }
  }

  test("deterministic shuffle: shards partition the corpus, pos contiguous") {
    val df = operators.TextQueries.shuffleShards.run(spark, sf)
    val rows = df.collect()
    val total = Tables.table(spark, sf, "documents").count()
    assert(rows.length == total, "every doc lands in exactly one shard")
    rows.groupBy(_.getString(1)).values.foreach { rs =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to rs.length),
        "per-shard positions must be 1..n")
    }
    // re-running yields the identical assignment (determinism)
    val again = operators.TextQueries.shuffleShards.run(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
