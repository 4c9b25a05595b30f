package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Batch queries over the `events` stream-shaped table (event_id, ts,
  * user_id, event_type, value, props) — the SQL-checkable faces of the
  * streaming operators (the incremental forms live in graft.stream and
  * are exercised by StreamingSpec with MemoryStream).
  *
  * Monetary sums are carried as exact integer cents (`round(value*100)`)
  * so Spark and DuckDB aggregate bit-identically regardless of order.
  */
object EventsQueries {

  /** ST-windowing face: tumbling 1-hour event-time windows × event_type
    * (Spark `window()`; oracle uses date_trunc — same aligned tumbling
    * semantics). */
  val eventsHourly = Q(
    "q38_events_hourly",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(round(col("value") * 100, 0).cast("long")).as("sum_cents"))
        .select(col("w.start").cast("long").as("ws"), col("event_type"),
                col("n"), col("sum_cents"))
        .orderBy(col("ws"), col("event_type")),
    Some("""SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS ws,
           event_type, count(*) AS n,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
           FROM events GROUP BY 1, 2 ORDER BY ws, event_type""")
  )

  /** Sessionization: per-user session count with a 30-minute inactivity
    * gap (lag window over event time). */
  val eventsSessions = Q(
    "q39_events_sessions",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev").isNull ||
               unix_micros(col("ts")) - unix_micros(col("prev")) > 1800L * 1000000L,
            1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },
    Some("""WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tu
                       FROM events),
           l AS (SELECT user_id,
                   CASE WHEN lag(tu) OVER (PARTITION BY user_id ORDER BY tu, event_id)
                     IS NULL OR tu - lag(tu) OVER (PARTITION BY user_id
                       ORDER BY tu, event_id) > 1800000000
                   THEN 1 ELSE 0 END AS new_sess
                 FROM e)
           SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
                  count(*) AS n_events
           FROM l GROUP BY 1 ORDER BY user_id""")
  )

  /** ST3 parse face: round-trip `"user event cents"` text lines through
    * split/element_at/cast (F1/F2/F5) — the socket-line parse path with
    * an oracle. */
  val streamParse = Q(
    "q40_stream_parse",
    (s, d) => {
      val lines = Tables.events(s, d)
        .select(col("event_id"),
          concat_ws(" ", col("user_id"), col("event_type"),
            round(col("value") * 100, 0).cast("long")).as("value"))
      val p = split(col("value"), " ")
      lines.select(
        col("event_id"),
        element_at(p, 1).cast("long").as("user_id"),
        element_at(p, 2).as("event_type"),
        (element_at(p, 3).cast("long").cast("double") / 100.0).as("value"))
        .orderBy(col("event_id"))
    },
    Some("""WITH lines AS (
             SELECT event_id,
               concat(CAST(user_id AS VARCHAR), ' ', event_type, ' ',
                      CAST(CAST(round(value * 100, 0) AS BIGINT) AS VARCHAR)) AS v
             FROM events)
           SELECT event_id,
             CAST(string_split(v, ' ')[1] AS BIGINT) AS user_id,
             string_split(v, ' ')[2] AS event_type,
             CAST(CAST(string_split(v, ' ')[3] AS BIGINT) AS DOUBLE) / 100.0 AS value
           FROM lines ORDER BY event_id""")
  )

  /** Semi-structured payload extraction: pull `$.k` out of the JSON
    * `props` column and aggregate — the JSON face the reference never had
    * (its props-like payloads were packed strings, SURVEY §1.2). */
  val jsonExtract = Q(
    "q43_json_extract",
    (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
             min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
    Some("""SELECT event_type, count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
           FROM events GROUP BY 1 ORDER BY event_type""")
  )

  /** Sliding event-time windows (1 h long, 30 min slide): every event
    * lands in two overlapping windows (Spark `window(ts, len, slide)`;
    * oracle unnests the two covering window starts per event). */
  val eventsSliding = Q(
    "q55_events_sliding",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").cast("long").as("ws"), col("n"))
        .orderBy(col("ws")),
    Some("""SELECT CAST(epoch(ws) AS BIGINT) AS ws, count(*) AS n FROM (
             SELECT unnest([
               time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
               time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
                 - INTERVAL '30 minutes']) AS ws
             FROM events)
           GROUP BY 1 ORDER BY ws""")
  )

  /** AS-OF JOIN (attribution shape: each purchase matched to the same
    * user's LAST click at or before it) — an operator Spark lacks
    * natively, built scale-correct with the union-and-running-last trick:
    * tag both sides, ONE shuffle+sort per user_id, and a running
    * `last(..., ignoreNulls)` over the unbounded-preceding frame carries
    * the most recent click forward. No range join, no per-row probe —
    * the cost is one sort of |clicks|+|purchases| rows however wide the
    * time range, which is why this shape survives 100 TB where a
    * range-predicate join explodes. The oracle is DuckDB's NATIVE
    * `ASOF LEFT JOIN`, so our relational construction is checked against
    * an independent first-class implementation. Event times compare at
    * microsecond precision on both sides (no (user, µs) ties in any
    * fixture — verified at all three scales). */
  val asofJoin = Q(
    "q75_asof_join",
    (s, d) => {
      val e = Tables.events(s, d)
      val tagged = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(0).as("kind"),
          col("event_id").as("click_id"),
          lit(null).cast("long").as("event_id"))
        .unionAll(e.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(1).as("kind"),
            lit(null).cast("long").as("click_id"), col("event_id")))
      // clicks sort before purchases at equal ts → "at or before" is
      // inclusive, matching ASOF's p.ts >= c.ts
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("kind"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("lc_id", last(col("click_id"), ignoreNulls = true).over(w))
        .withColumn("lc_ts",
          last(when(col("kind") === 0, col("ts")), ignoreNulls = true).over(w))
        .where(col("kind") === 1)
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tu"),
          col("lc_id").as("click_id"), unix_micros(col("lc_ts")).as("click_tu"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT p.event_id, p.user_id,
             epoch_us(CAST(p.ts AS TIMESTAMP)) AS tu,
             c.event_id AS click_id,
             epoch_us(CAST(c.ts AS TIMESTAMP)) AS click_tu
           FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                 FROM events WHERE event_type = 'purchase') p
           ASOF LEFT JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                 FROM events WHERE event_type = 'click') c
             ON p.user_id = c.user_id AND p.ts >= c.ts
           ORDER BY p.event_id""")
  )

  /** RANGE (interval-containment) JOIN — the brief's other
    * custom-operator example: each error event joined to the session
    * interval containing it. Spark has no interval-join operator, and the
    * naive `a.user = b.user AND a.tu BETWEEN b.lo AND b.hi` plans as a
    * per-key nested loop; the scale-correct construction BUCKETIZES time
    * (here 30-min buckets = the session gap, so a session spans ≤2–3
    * buckets): intervals explode into their covering buckets, the join
    * becomes a plain equi-join on (user, bucket), and the BETWEEN
    * predicate refines the candidates. Cost is |events| + Σ
    * buckets-per-interval shuffled on uniform keys — no nested loop at
    * any scale; bucket width tunes the explode/candidate trade. Oracle is
    * the direct BETWEEN join in DuckDB, independently validating the
    * bucketed rewrite. */
  val rangeJoin = Q(
    "q76_range_join",
    (s, d) => {
      val B = 1800L * 1000000L
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("tu"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("tu"), col("event_id"))
      val sess = e
        .withColumn("new_sess",
          when(col("tu") - lag(col("tu"), 1).over(w) > B, 1L)
            .otherwise(when(lag(col("tu"), 1).over(w).isNull, 1L).otherwise(0L)))
        .withColumn("sess_id", sum(col("new_sess")).over(w))
      val iv = sess.groupBy(col("user_id"), col("sess_id"))
        .agg(min(col("tu")).as("start_us"), max(col("tu")).as("end_us"))
      val ivB = iv.select(col("user_id"), col("start_us"), col("end_us"),
        explode(expr(s"sequence(start_us div $B, end_us div $B)")).as("bucket"))
      val err = e.where(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), col("tu"),
          expr(s"tu div $B").as("bucket"))
      err.join(ivB, Seq("user_id", "bucket"))
        .where(col("tu").between(col("start_us"), col("end_us")))
        .select(col("event_id"), col("user_id"), col("tu"),
          col("start_us"), col("end_us"))
        .orderBy(col("event_id"))
    },
    Some("""WITH e AS (SELECT user_id, event_id, event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS tu FROM events),
           l AS (SELECT user_id, event_id, event_type, tu,
                   CASE WHEN lag(tu) OVER w IS NULL
                     OR tu - lag(tu) OVER w > 1800000000
                   THEN 1 ELSE 0 END AS new_sess
                 FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)),
           s AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
                   ORDER BY tu, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS sess_id FROM l),
           iv AS (SELECT user_id, sess_id, min(tu) AS start_us, max(tu) AS end_us
                  FROM s GROUP BY 1, 2)
           SELECT err.event_id, err.user_id, err.tu, iv.start_us, iv.end_us
           FROM (SELECT * FROM e WHERE event_type = 'error') err
           JOIN iv ON err.user_id = iv.user_id
             AND err.tu BETWEEN iv.start_us AND iv.end_us
           ORDER BY err.event_id""")
  )

  /** Replay dedup — the batch twin of `StreamOps.dedupStream`
    * (`dropDuplicatesWithinWatermark` keeps the FIRST event per key):
    * replaying a logged stream, keep each (user_id, event_type) key's
    * earliest event by (ts, event_id) — event_id breaks same-microsecond
    * ties deterministically, exactly the semantics the streaming path
    * promises at ingest. This oracle-checks what StreamingSpec can only
    * golden-test, and is itself the standard "first touch per key"
    * attribution query: one hash shuffle on the key, per-key top-1
    * window (no global sort). */
  val replayDedup = Q(
    "q85_replay_dedup",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_type"),
          col("event_id").as("first_event_id"),
          unix_micros(col("ts")).as("first_tu"))
        .orderBy(col("user_id"), col("event_type"))
    },
    Some("""SELECT user_id, event_type, event_id AS first_event_id,
              epoch_us(CAST(ts AS TIMESTAMP)) AS first_tu FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn FROM events) t
            WHERE rn = 1 ORDER BY user_id, event_type""")
  )

  /** Native SESSION WINDOWS (Spark's `session_window` gap-merge
    * operator, the batch face of streaming sessionization) pinned to
    * the relational definition: the oracle rebuilds sessions the
    * classic way — lag + gap flag + running sum — and must produce the
    * identical (start, end, count) triples, including Spark's exact
    * boundary rule (a gap of EXACTLY 30 min starts a new session:
    * windows merge only on strict overlap, so the oracle flags
    * `diff >= gap`, where q39's count-only sessionization used `>`).
    * Session end = last event + gap, as the operator defines it. */
  val sessionWindows = Q(
    "q89_session_windows",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("start_us"),
          unix_micros(col("w.end")).as("end_us"),
          col("n_events"))
        .orderBy(col("user_id"), col("start_us")),
    Some("""WITH e AS (SELECT user_id, event_id,
                  epoch_us(CAST(ts AS TIMESTAMP)) AS tu FROM events),
            l AS (SELECT user_id, event_id, tu,
                    CASE WHEN lag(tu) OVER w IS NULL
                           OR tu - lag(tu) OVER w >= 1800000000
                    THEN 1 ELSE 0 END AS new_sess
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)),
            sa AS (SELECT user_id, tu,
                   sum(new_sess) OVER (PARTITION BY user_id
                     ORDER BY tu, event_id ROWS UNBOUNDED PRECEDING) AS sid
                 FROM l)
            SELECT user_id, min(tu) AS start_us,
                   max(tu) + 1800000000 AS end_us,
                   count(*) AS n_events
            FROM sa GROUP BY user_id, sid ORDER BY user_id, start_us""")
  )

  /** Cohort retention curve — the product-analytics staple: users
    * cohorted by their FIRST active day, then for each day-offset
    * k = 0..7 the share of the cohort active again on cohort+k. Built
    * from distinct (day, user) pairs, so the heavy input collapses
    * before any join; cohort assignment is a min-agg and the curve is
    * one shuffle on (cohort, k). All counts are exact integers. Day
    * buckets use exact-integer FLOOR division (see q94) so pre-1970
    * micros can't fold into day 0. */
  val retentionCurve = Q(
    "q96_retention_curve",
    (s, d) => {
      val p = Tables.events(s, d)
        .select(expr("(unix_micros(ts) - pmod(unix_micros(ts), 86400000000))" +
            " div 86400000000").as("day"),
          col("user_id"))
        .distinct().cache()
      val first = p.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
      val sizes = first.groupBy(col("cohort"))
        .agg(count(lit(1)).as("n_cohort"))
      val act = p.join(first, Seq("user_id"))
        .select(col("cohort"), (col("day") - col("cohort")).as("k"),
          col("user_id"))
        .where(col("k") <= 7)
        .groupBy(col("cohort"), col("k"))
        .agg(countDistinct(col("user_id")).as("n_active"))
      act.join(sizes, Seq("cohort"))
        .select(col("cohort"), col("k"), col("n_active"), col("n_cohort"),
          round(col("n_active").cast("double") / col("n_cohort"), 6)
            .as("retention"))
        .orderBy(col("cohort"), col("k"))
    },
    Some("""WITH e0 AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, user_id
            FROM events),
            p AS (SELECT DISTINCT
              (us - ((us % 86400000000 + 86400000000) % 86400000000))
                // 86400000000 AS day, user_id
            FROM e0),
            f AS (SELECT user_id, min(day) AS cohort FROM p GROUP BY 1),
            sz AS (SELECT cohort, count(*) AS n_cohort FROM f GROUP BY 1),
            a AS (SELECT f.cohort, p.day - f.cohort AS k,
                    count(DISTINCT p.user_id) AS n_active
                  FROM p JOIN f USING (user_id)
                  WHERE p.day - f.cohort <= 7 GROUP BY 1, 2)
            SELECT cohort, k, n_active, n_cohort,
                   round(CAST(n_active AS DOUBLE) / n_cohort, 6) AS retention
            FROM a JOIN sz USING (cohort) ORDER BY cohort, k""")
  )

  /** Ordered funnel (view → click → purchase): each step's timestamp
    * must strictly follow the previous step's FIRST occurrence — the
    * progressive min-join formulation (step k = min event time after
    * step k−1's time), not a mere per-type existence check. Three
    * bounded-key join+aggs; counts are exact integers. */
  val funnel = Q(
    "q97_funnel",
    (s, d) => {
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("tu")).cache()
      val v = e.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("tu")).as("vt"))
      val c = e.where(col("event_type") === "click")
        .join(v, Seq("user_id")).where(col("tu") > col("vt"))
        .groupBy(col("user_id")).agg(min(col("tu")).as("ct"))
      val p = e.where(col("event_type") === "purchase")
        .join(c, Seq("user_id")).where(col("tu") > col("ct"))
        .groupBy(col("user_id")).agg(min(col("tu")).as("pt"))
      val totals = e.agg(countDistinct(col("user_id")).as("n_users"))
      totals
        .crossJoin(broadcast(v.agg(count(lit(1)).as("n_view"))))
        .crossJoin(broadcast(c.agg(count(lit(1)).as("n_click"))))
        .crossJoin(broadcast(p.agg(count(lit(1)).as("n_purchase"))))
        .select(col("n_users"), col("n_view"), col("n_click"), col("n_purchase"),
          round(col("n_click").cast("double") / col("n_view"), 6)
            .as("view_to_click"),
          round(col("n_purchase").cast("double") / col("n_click"), 6)
            .as("click_to_purchase"))
    },
    Some("""WITH e AS (SELECT user_id, event_type,
                  epoch_us(CAST(ts AS TIMESTAMP)) AS tu FROM events),
            v AS (SELECT user_id, min(tu) AS vt FROM e
                  WHERE event_type = 'view' GROUP BY 1),
            c AS (SELECT e.user_id, min(tu) AS ct FROM e JOIN v USING (user_id)
                  WHERE event_type = 'click' AND tu > vt GROUP BY 1),
            p AS (SELECT e.user_id, min(tu) AS pt FROM e JOIN c USING (user_id)
                  WHERE event_type = 'purchase' AND tu > ct GROUP BY 1)
            SELECT n_users, n_view, n_click, n_purchase,
                   round(CAST(n_click AS DOUBLE) / n_view, 6) AS view_to_click,
                   round(CAST(n_purchase AS DOUBLE) / n_click, 6)
                     AS click_to_purchase
            FROM (SELECT
                    (SELECT count(DISTINCT user_id) FROM e) AS n_users,
                    (SELECT count(*) FROM v) AS n_view,
                    (SELECT count(*) FROM c) AS n_click,
                    (SELECT count(*) FROM p) AS n_purchase) t""")
  )

  val all: Seq[Q] = Seq(eventsHourly, eventsSessions, streamParse, jsonExtract,
    eventsSliding, asofJoin, rangeJoin, replayDedup, sessionWindows,
    retentionCurve, funnel)
}
