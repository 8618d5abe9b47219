package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators (extension suite — the reference has no ASOF or
  * interval join; its join story is hash equi-join, dbcon/joblist
  * tuplehashjoin.cpp). Both operators here are deliberately COMPOSED from
  * shuffle-once window/equi-join primitives rather than implemented as a
  * custom SparkPlan: the per-key ordered-scan shape is exactly what a
  * sort-merge as-of join's inner loop would do, but composition keeps the
  * plan inside whole-stage codegen and Catalyst's existing optimizations
  * (SURVEY §7.4 preference order (a)).
  */
object TemporalJoinQueries {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "events")

  /** AS-OF join: each purchase matched to the latest click by the same
    * user at-or-before its timestamp (click→purchase attribution).
    *
    * Scale shape: the classic point-in-time join is a per-key non-equi
    * join (O(clicks × purchases) per user). Instead both sides union into
    * ONE pass: tag rows, shuffle once on user_id, sort within partitions
    * by (ts, kind, event_id), and carry the last non-null click forward
    * with last(ignoreNulls) — O(n log n) per partition, no join at all.
    * A click at the identical timestamp counts as "before" (kind orders
    * clicks first), matching ASOF JOIN backward semantics.
    */
  val asofAttribution: QueryDef = QueryDef(
    "j_asof_attribution",
    (s, dir) => {
      val marked = ev(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("event_type") === "click", 0).otherwise(1).as("kind"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      marked
        .withColumn("click_id",
          last(when(col("kind") === 0, col("event_id")), ignoreNulls = true)
            .over(w))
        .withColumn("click_ts",
          last(when(col("kind") === 0, col("ts")), ignoreNulls = true)
            .over(w))
        .filter(col("kind") === 1)
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("purchase_ts"), col("click_id"), col("click_ts"),
          (unix_seconds(col("ts")) - unix_seconds(col("click_ts")))
            .as("secs_since_click"))
        .orderBy(col("purchase_id"))
    },
    oracle = Some("""
      WITH r AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts,
                        CASE WHEN event_type = 'click' THEN 0 ELSE 1 END
                          AS kind
                 FROM events WHERE event_type IN ('click', 'purchase')),
      m AS (SELECT *,
              last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS click_id,
              last_value(CASE WHEN kind = 0 THEN ts END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS click_ts
            FROM r)
      SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
             click_id, click_ts,
             CAST(floor(date_part('epoch', ts))
                  - floor(date_part('epoch', click_ts)) AS BIGINT)
               AS secs_since_click
      FROM m WHERE kind = 1 ORDER BY purchase_id""")
  )

  /** Banded interval-overlap join: per-user activity sessions (10-minute
    * gap, same definition as x_events_sessionize) joined against daily
    * maintenance windows [03:00, 04:00] by closed-interval overlap.
    *
    * Scale shape: a naive interval join is a cross join + theta filter.
    * Banding makes it an EQUI-join: both interval sets explode into the
    * epoch-hour buckets they cover (sessions span ~1-2 buckets, windows
    * exactly 2), the join key is the bucket, the precise overlap predicate
    * filters the banded candidates, and DISTINCT collapses multi-bucket
    * matches. Candidates are O(intervals × avg_buckets) instead of
    * O(n × m) — the standard banding trick for interval joins at scale.
    */
  val rangeInterval: QueryDef = QueryDef(
    "j_range_interval",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = ev(s, dir)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 600000000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_sess")).over(wRun))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
      val sessB = sess.withColumn("bucket",
        explode(sequence(expr("unix_micros(s_start) div 3600000000"),
          expr("unix_micros(s_end) div 3600000000"))))
      val wins = s.range(1).select(explode(sequence(
          to_timestamp(lit("2024-01-01 03:00:00")),
          to_timestamp(lit("2024-01-30 03:00:00")),
          expr("INTERVAL 1 DAY"))).as("w_start"))
        .withColumn("w_end", col("w_start") + expr("INTERVAL 1 HOUR"))
      val winB = wins.withColumn("bucket",
        explode(sequence(expr("unix_micros(w_start) div 3600000000"),
          expr("unix_micros(w_end) div 3600000000"))))
      val overlaps = winB.join(sessB, Seq("bucket"))
        .filter(col("s_start") <= col("w_end") &&
          col("w_start") <= col("s_end"))
        .select(col("w_start"), col("user_id"), col("session_id"))
        .distinct()
      wins.join(overlaps, Seq("w_start"), "left_outer")
        .groupBy(col("w_start"))
        .agg(count(col("user_id")).as("n_sessions"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("w_start"))
    },
    oracle = Some("""
      WITH o AS (SELECT user_id, event_id, ts::TIMESTAMP AS ts,
                        lag(ts::TIMESTAMP) OVER (PARTITION BY user_id
                          ORDER BY ts::TIMESTAMP, event_id) AS prev
                 FROM events),
      f AS (SELECT *, CASE WHEN prev IS NULL
                             OR epoch_us(ts) - epoch_us(prev) > 600000000
                           THEN 1 ELSE 0 END AS nf
            FROM o),
      sx AS (SELECT *, sum(nf) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             FROM f),
      sess AS (SELECT user_id, sid, min(ts) AS s_start, max(ts) AS s_end
               FROM sx GROUP BY user_id, sid),
      w AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-01 03:00:00',
                     TIMESTAMP '2024-01-30 03:00:00', INTERVAL 1 DAY))
                     AS w_start),
      w2 AS (SELECT w_start, w_start + INTERVAL 1 HOUR AS w_end FROM w),
      ov AS (SELECT w2.w_start, sess.user_id, sess.sid
             FROM w2 JOIN sess
               ON sess.s_start <= w2.w_end AND w2.w_start <= sess.s_end)
      SELECT w2.w_start, count(ov.user_id) AS n_sessions,
             count(DISTINCT ov.user_id) AS n_users
      FROM w2 LEFT JOIN ov USING (w_start)
      GROUP BY w2.w_start ORDER BY w2.w_start""")
  )

  def defs: Seq[QueryDef] = Seq(asofAttribution, rangeInterval)
}
