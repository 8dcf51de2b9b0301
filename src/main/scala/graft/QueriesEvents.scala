package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Analyzers
import graft.operators._
import graft.streaming.EventStream

/** SparkEntry's Events family —
  * temporal/event ops: windows, sessionize, as-of/range joins, funnel, retention, EQL (§2.9 batch twins).
  *
  * Split out of the single 7.7k-line registry (round-14): each family
  * module contributes its slice of the SAME SparkEntry.queries /
  * oracleSql maps — pure motion, no semantics; key-disjointness is
  * spec-asserted so ++ can never silently overwrite an entry. */
private[graft] object QueriesEvents {
  import SparkEntry.{queries => _, oracleSql => _, entry => _, _}

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- event-time analytics (SURVEY §2.9 extension) ----
    "e1_tumbling" -> ((s, d) => EventOps.tumbling(Tables.events(s, d))),
    "e2_sessionize" -> ((s, d) => EventOps.sessionize(Tables.events(s, d))),
    "e3_sliding" -> ((s, d) => EventOps.sliding(Tables.events(s, d))),
    "e5_asof_join" -> ((s, d) => EventOps.asofJoin(Tables.events(s, d))),
    "e6_range_join" -> ((s, d) => {
      // intervals: ±45 min around user 1's purchases (arbitrary,
      // overlapping, not grid-aligned); count all events inside each
      val ev = Tables.events(s, d)
      val intervals = ev
        .filter(col("event_type") === "purchase" && col("user_id") === 1)
        .select(col("event_id").as("interval_id"),
          (col("ts") - expr("INTERVAL 45 MINUTES")).as("start_ts"),
          (col("ts") + expr("INTERVAL 45 MINUTES")).as("end_ts"))
      EventOps.rangeJoinCounts(ev, intervals)
    }),
    "e4_session_window" -> ((s, d) =>
      // Spark-native gap sessions (SessionWindow operator) — batch twin
      // of streaming.EventStream.sessionWindows
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("session_value"))
        .select(col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("user_id"), col("n_events"), col("session_value"))
        .orderBy(col("user_id"), col("session_start"))),
    "e7_funnel" -> ((s, d) =>
      // staged conversion funnel: signup → click (after) → purchase
      // (after that), earliest-completion semantics per stage
      EventOps.funnel(Tables.events(s, d),
        Seq("signup", "click", "purchase"))),
    "e10_eql_sequence" -> ((s, d) =>
      // EQL sequence-with-maxspan (EventOps.eqlSequence scaladoc):
      // signup → click → purchase within 6 h, greedy-latest chains in
      // stages−1 linear window passes; the oracle is the quadratic
      // exists-triple specification
      EventOps.eqlSequence(Tables.events(s, d),
        Seq("signup", "click", "purchase"), maxspanSeconds = 21600L)),
    "e10b_eql_hits" -> ((s, d) =>
      // the EQL sequence's per-match HITS — the matched event chains
      // ES EQL returns (EventOps.eqlHits scaladoc): one row per
      // matched final-stage event with every stage's exact-µs
      // timestamp; the oracle replays the identical greedy-latest
      // scalar windows, so the CHAIN itself is pinned cross-engine,
      // not just its existence
      EventOps.eqlHits(Tables.events(s, d),
        Seq("signup", "click", "purchase"), maxspanSeconds = 21600L)),
    "e9_retention" -> ((s, d) =>
      // cohort retention matrix (EventOps.retention scaladoc): users
      // bucketed by first-seen ISO week, counted in every later week
      // they were active; exact integer week offsets + basis-point
      // retention against the offset-0 cohort size
      EventOps.retention(Tables.events(s, d))),
    "e8_retention" -> ((s, d) => {
      // weekly cohort retention: users bucketed by first-event week,
      // distinct actives per (cohort, week offset). The cohort week
      // rides a window-min over user_id, then ONE distinct-agg on
      // (cohort, offset, user) collapses duplicate user-weeks before
      // the count — the standard two-level exact distinct at scale
      val w = Window.partitionBy(col("user_id"))
      val e = Tables.events(s, d)
        .select(col("user_id"),
          date_trunc("WEEK", col("ts")).as("week"),
          date_trunc("WEEK", min(col("ts")).over(w)).as("cohort_week"))
        .select(col("user_id"), col("cohort_week"),
          (datediff(col("week"), col("cohort_week")) / 7)
            .cast("long").as("week_offset"))
        .distinct()
      e.groupBy(col("cohort_week"), col("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),
  )

  lazy val oracleSql: Map[String, String] = Map(
    "e1_tumbling" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
                round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "e2_sessionize" ->
      """WITH g AS (SELECT user_id, ts, value,
                           CASE WHEN lag(ts) OVER w IS NULL
                                  OR date_diff('second', lag(ts) OVER w, ts) > 1800
                                THEN 1 ELSE 0 END AS new_s
                    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                           ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx
                FROM g)
          SELECT user_id, session_idx, count(*) AS n_events,
                 round(sum(value), 2) AS session_value,
                 date_diff('second', min(ts), max(ts))::BIGINT AS duration_s
          FROM s GROUP BY 1, 2 ORDER BY 1, 2""",
    "e3_sliding" ->
      """SELECT win_start, win_start + INTERVAL 1 HOUR AS win_end, event_type,
                count(*) AS n, round(sum(value), 2) AS sum_value
         FROM (SELECT unnest([time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
                              time_bucket(INTERVAL '30 minutes', ts)]) AS win_start,
                      event_type, value
               FROM events)
         GROUP BY win_start, event_type ORDER BY win_start, event_type""",
    "e5_asof_join" ->
      """WITH p AS (SELECT user_id, ts, max_by(value, event_id) AS p_value
                    FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
         SELECT e.event_id, e.user_id, e.ts, e.event_type,
                round(coalesce(p.p_value, 0.0), 2) AS last_purchase_value
         FROM events e ASOF LEFT JOIN p
           ON e.user_id = p.user_id AND e.ts >= p.ts
         ORDER BY e.event_id""",
    "e6_range_join" ->
      """WITH iv AS (SELECT event_id AS interval_id,
                            ts - INTERVAL 45 MINUTE AS start_ts,
                            ts + INTERVAL 45 MINUTE AS end_ts
                     FROM events WHERE event_type = 'purchase' AND user_id = 1)
         SELECT iv.interval_id, count(*)::BIGINT AS n_in_range,
                round(sum(e.value), 2) AS range_value
         FROM iv JOIN events e ON e.ts BETWEEN iv.start_ts AND iv.end_ts
         GROUP BY 1 ORDER BY 1""",
    "e4_session_window" ->
      """WITH g AS (SELECT user_id, ts, value,
                           CASE WHEN lag(ts) OVER w IS NULL
                                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                                THEN 1 ELSE 0 END AS new_s
                    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                           ROWS UNBOUNDED PRECEDING) AS sid
                FROM g)
          SELECT min(ts) AS session_start, max(ts) + INTERVAL 30 MINUTE AS session_end,
                 user_id, count(*) AS n_events, round(sum(value), 2) AS session_value
          FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "e7_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                     WHERE event_type = 'signup' GROUP BY 1),
          s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
                 JOIN s1 USING (user_id)
                 WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
          s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
                 JOIN s2 USING (user_id)
                 WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
          SELECT '1_signup' AS stage, count(*)::BIGINT AS n_users FROM s1
          UNION ALL SELECT '2_click', count(*)::BIGINT FROM s2
          UNION ALL SELECT '3_purchase', count(*)::BIGINT FROM s3
          ORDER BY stage""",
    // e10: the quadratic exists-triple SPECIFICATION of the sequence
    // match (the impl's greedy-latest window chain must agree);
    // ordering and the span bound in exact epoch microseconds
    "e10_eql_sequence" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts)::BIGINT AS us,
                           event_type
                    FROM events),
          v AS (SELECT DISTINCT p.user_id, p.event_id
                FROM e s
                JOIN e c ON c.user_id = s.user_id
                        AND c.event_type = 'click' AND c.us > s.us
                JOIN e p ON p.user_id = s.user_id
                        AND p.event_type = 'purchase' AND p.us > c.us
                        AND p.us - s.us <= 21600000000
                WHERE s.event_type = 'signup')
          SELECT 21600::BIGINT AS maxspan_s,
                 count(DISTINCT user_id)::BIGINT AS n_users,
                 count(*)::BIGINT AS n_matches
          FROM v""",
    // e10b: the greedy-latest chain replayed component-by-component —
    // the same scalar last(..ignore nulls) windows over strict
    // microsecond order, so both engines emit identical chains
    "e10b_eql_hits" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts)::BIGINT AS us
                    FROM events
                    WHERE event_type IN ('signup', 'click', 'purchase')),
          c0 AS (SELECT *, CASE WHEN event_type = 'signup' THEN us END AS t0_0
                 FROM e),
          c1 AS (SELECT *,
                   CASE WHEN event_type = 'click' THEN
                     last_value(CASE WHEN event_type = 'signup' THEN t0_0 END
                                IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY us
                             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   END AS t1_0 FROM c0),
          c1b AS (SELECT *, CASE WHEN event_type = 'click'
                                  AND t1_0 IS NOT NULL THEN us END AS t1_1
                  FROM c1),
          c2 AS (SELECT *,
                   CASE WHEN event_type = 'purchase' THEN
                     last_value(CASE WHEN event_type = 'click' THEN t1_0 END
                                IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY us
                             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   END AS t2_0,
                   CASE WHEN event_type = 'purchase' THEN
                     last_value(CASE WHEN event_type = 'click' THEN t1_1 END
                                IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY us
                             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   END AS t2_1
                 FROM c1b),
          c2b AS (SELECT *, CASE WHEN event_type = 'purchase'
                                  AND t2_0 IS NOT NULL THEN us END AS t2_2
                  FROM c2)
          SELECT user_id, t2_0 AS t_signup_us, t2_1 AS t_click_us,
                 t2_2 AS t_purchase_us
          FROM c2b
          WHERE event_type = 'purchase' AND t2_0 IS NOT NULL
            AND us - t2_0 <= 21600000000
          ORDER BY user_id, t_signup_us, t_click_us, t_purchase_us""",
    // e9: cohort retention — both engines truncate to the same ISO
    // Monday, so the day diff is an exact multiple of 7
    "e9_retention" ->
      """WITH wk AS (SELECT DISTINCT user_id,
                            date_trunc('week', ts)::TIMESTAMP AS wk
                     FROM events),
          fst AS (SELECT user_id, min(wk) AS cohort_week FROM wk GROUP BY 1),
          m AS (SELECT cohort_week,
                       (date_diff('day', cohort_week, wk) // 7)::BIGINT
                         AS week_offset,
                       count(*)::BIGINT AS n_users
                FROM wk JOIN fst USING (user_id) GROUP BY 1, 2),
          sz AS (SELECT cohort_week, n_users AS cohort_size FROM m
                 WHERE week_offset = 0)
          SELECT m.cohort_week, m.week_offset, m.n_users, sz.cohort_size,
                 (m.n_users * 10000 // sz.cohort_size)::BIGINT AS retention_bp
          FROM m JOIN sz USING (cohort_week)
          ORDER BY m.cohort_week, m.week_offset""",
    "e8_retention" ->
      """WITH e AS (SELECT DISTINCT user_id,
                           date_trunc('week',
                             min(ts) OVER (PARTITION BY user_id))::TIMESTAMP
                             AS cohort_week,
                           (date_diff('day',
                              date_trunc('week',
                                min(ts) OVER (PARTITION BY user_id)),
                              date_trunc('week', ts)) // 7)::BIGINT
                             AS week_offset
                    FROM events)
         SELECT cohort_week, week_offset, count(*)::BIGINT AS n_users
         FROM e GROUP BY 1, 2 ORDER BY cohort_week, week_offset""",
  )
}
