package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.operators.AsOfJoin

/** Time-series queries over the `events` fixture: as-of join, interval
  * range join, and the batch equivalents of the streaming window operators
  * (tumbling / sliding / session). The same window expressions run under
  * Structured Streaming in `graft.streaming` — batch/stream equivalence is
  * asserted in the test suite; here the batch side is graded against the
  * DuckDB oracle.
  */
object EventQueries {

  private def ev(s: SparkSession, dir: String) = Tables.events(s, dir)

  private def decSum(c: String) =
    sum(col(c).cast(DecimalType(18, 2))).cast("double")

  /** Shared purchase/click as-of shape: right side deduped per (user, ts)
    * so the match is deterministic; `join` supplies the direction
    * (backward q25 / forward q47 / nearest-with-tolerance q48).
    */
  private def asofClicks(s: SparkSession, dir: String)(
      join: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val e = ev(s, dir)
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.where(col("event_type") === "click")
      .groupBy("user_id", "ts")
      .agg(max("event_id").as("click_id"))
      .withColumn("click_ts_us", unix_micros(col("ts")))
    join(purchases, clicks)
      .select(
        col("event_id"),
        col("user_id"),
        unix_micros(col("ts")).as("purchase_ts_us"),
        col("asof_click_id").as("click_id"),
        col("asof_click_ts_us").as("click_ts_us"))
      .orderBy("event_id")
  }

  private val asofPayload = Seq("click_id", "click_ts_us")

  /** merge_asof parity: latest click at-or-before each purchase, per user. */
  private def qAsof(s: SparkSession, dir: String): DataFrame =
    asofClicks(s, dir)((p, c) => AsOfJoin.backward(p, c,
      on = Seq("user_id"), leftTs = "ts", rightTs = "ts",
      payload = asofPayload, tieBreak = Some("click_id")))

  /** merge_asof direction="forward": earliest click at-or-after. */
  private def qAsofForward(s: SparkSession, dir: String): DataFrame =
    asofClicks(s, dir)((p, c) => AsOfJoin.forward(p, c,
      on = Seq("user_id"), leftTs = "ts", rightTs = "ts",
      payload = asofPayload, tieBreak = Some("click_id")))

  /** merge_asof direction="nearest" with a 10-minute tolerance: closest
    * click within ±600s, equidistant ties to backward.
    */
  private def qAsofNearest(s: SparkSession, dir: String): DataFrame =
    asofClicks(s, dir)((p, c) => AsOfJoin.nearest(p, c,
      on = Seq("user_id"), leftTs = "ts", rightTs = "ts",
      payload = asofPayload, tieBreak = Some("click_id"), tolerance = Some(600d)))

  /** q48's nearest-with-tolerance run through the mega-hot-key path:
    * `bucketWidth` spreads each user's timeline over 1-hour window
    * partitions with carry-row boundary stitching. Semantically identical
    * by construction, so it grades against q48's oracle SQL verbatim —
    * the DuckDB gate proves the bucketed path end-to-end on real data.
    */
  private def qAsofBucketed(s: SparkSession, dir: String): DataFrame =
    asofClicks(s, dir)((p, c) => AsOfJoin.nearest(p, c,
      on = Seq("user_id"), leftTs = "ts", rightTs = "ts",
      payload = asofPayload, tieBreak = Some("click_id"), tolerance = Some(600d),
      bucketWidth = Some(3600d)))

  /** Interval range join: clicks in the 10 minutes before each purchase. */
  private def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val p = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c = e.where(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(
        c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
          col("c_ts") < col("p_ts"),
        "left")
      .groupBy(col("p_id"), col("p_user"))
      .agg(count(col("c_id")).as("n_clicks_10m"))
      .select(col("p_id").as("event_id"), col("p_user").as("user_id"), col("n_clicks_10m"))
      .orderBy("event_id")
  }

  /** Tumbling 1-hour window aggregate (streaming window, batch mode). */
  private def qTumbling(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), decSum("value").as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("wstart_us"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("wstart_us", "event_type")

  /** Sliding 1-hour window, 30-minute slide: each event lands in 2 windows. */
  private def qSliding(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"), decSum("value").as("sum_value"))
      .select(unix_micros(col("window.start")).as("wstart_us"), col("n"), col("sum_value"))
      .orderBy("wstart_us")

  /** Session window with a 10-minute gap, per user. */
  private def qSession(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_events"), decSum("value").as("sum_value"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start_us")

  /** Time-based rolling window: trailing 1-hour sum per user via a RANGE
    * frame over epoch-micros (event-count-independent, unlike ROWS).
    */
  private def qRangeWindow(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
      .rangeBetween(-3600000000L, 0L)
    ev(s, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("value").cast(DecimalType(18, 2)).as("v"))
      .withColumn("trailing_1h_sum", sum("v").over(w).cast("double"))
      .select("event_id", "user_id", "ts_us", "trailing_1h_sum")
      .orderBy("event_id")
  }

  /** Ordered conversion funnel with min-ts chaining: a user reaches
    * step i only via an event AT OR AFTER their step-i−1 time (the
    * standard ordered-funnel semantics — a click BEFORE the signup
    * doesn't count). One per-user min aggregate per step chained by
    * equality joins on the user key, each input pre-filtered to one
    * event type (pruned scan); at 1000 executors each stage shuffles
    * only the per-type slice keyed by user, and the final frame is
    * steps-sized. Output: (step, step_name, n_users, conversion from
    * previous step; null for step 1 or a zero previous step).
    */
  def funnel(events: DataFrame, steps: Seq[String],
      typeCol: String = "event_type", userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // reached(i) = (user_id, t_i): users whose earliest step-i event at
    // or after their t_{i-1}.
    val reached = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val typed = events.where(col(typeCol) === step)
        val eligible = prev match {
          case None => typed
          case Some(p) => typed.join(p, userCol).where(col(tsCol) >= col("__t"))
        }
        Some(eligible.groupBy(userCol).agg(min(col(tsCol)).as("__t")))
    }.flatten
    def counted(df: DataFrame, n: Int, name: String) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(n).as("step"), lit(name).as("step_name"), col("n_users"))
    import org.apache.spark.sql.expressions.Window
    reached.zip(steps).zipWithIndex
      .map { case ((df, name), i) => counted(df, i + 1, name) }
      .reduce(_.unionAll(_))
      // steps-row frame: the global window is fine by construction.
      .withColumn("conversion", round(
        col("n_users").cast("double") /
          nullif(lag(col("n_users"), 1).over(Window.orderBy("step")), lit(0)),
        4))
  }

  private def qFunnel(s: SparkSession, dir: String): DataFrame =
    funnel(ev(s, dir), Seq("signup", "click", "purchase")).orderBy("step")

  /** Retention triangle: users grouped by FIRST-activity day; for each
    * (cohort day, day offset ≤ 7) the distinct users active that day.
    * The event stream collapses to DISTINCT (user, day) FIRST — the
    * corpus-scale reduction; everything after runs on user-days. Two
    * user-keyed aggregates + one join; sessions' grade runs under a UTC
    * session (Verify/Bench), matching the oracle's naive-date cast.
    */
  private def qRetention(s: SparkSession, dir: String): DataFrame = {
    val d = ev(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val cohort = d.groupBy("user_id").agg(min(col("d")).as("c"))
    d.join(cohort, "user_id")
      .select(col("c"), datediff(col("d"), col("c")).as("day_offset"),
        col("user_id"))
      .where(col("day_offset") <= 7)
      .groupBy("c", "day_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("c"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset").cast("int").as("day_offset"), col("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** RFM segmentation: per purchasing user, Recency (days since last
    * purchase, vs the corpus max), Frequency (purchase count), Monetary
    * (exact-DECIMAL purchase sum) — each cut into terciles by `ntile(3)`
    * with a user-id tiebreak (total order → engine-deterministic
    * buckets) — then user counts per (r, f, m) cell, the classic
    * marketing segmentation cube. The windows run over the ALREADY
    * per-user-aggregated table (users ≪ events); a corpus with billions
    * of users would swap ntile for approx-quantile thresholds the way
    * qn48's scaladoc routes giant sources.
    */
  private def qRfm(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = ev(s, dir).where(col("event_type") === "purchase")
    val byUser = p.groupBy("user_id").agg(
      max(col("ts")).as("last_ts"),
      count(lit(1)).as("freq"),
      decSum("value").as("monetary"))
    val mx = p.agg(max(col("ts")).as("mx"))
    byUser.crossJoin(broadcast(mx))
      .withColumn("recency_days",
        datediff(to_date(col("mx")), to_date(col("last_ts"))))
      // asc_nulls_last: Spark's ASC default is nulls FIRST, DuckDB's is
      // nulls LAST — unreachable on this fixture (no null ts) but the
      // contract shouldn't depend on that.
      .withColumn("r_bucket",
        ntile(3).over(Window.orderBy(
          col("recency_days").asc_nulls_last, col("user_id"))))
      .withColumn("f_bucket",
        ntile(3).over(Window.orderBy(col("freq").desc, col("user_id"))))
      .withColumn("m_bucket",
        ntile(3).over(Window.orderBy(col("monetary").desc, col("user_id"))))
      .groupBy("r_bucket", "f_bucket", "m_bucket")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("r_bucket", "f_bucket", "m_bucket")
  }

  /** Robust per-type anomaly detection: flag events with
    * |value − median| > 6·MAD (median absolute deviation — the robust
    * z-score; outliers can't poison the scale estimate the way they
    * inflate a stddev-based z). Exact interpolated percentiles (the
    * q20 contract; at 100 TB swap in approx_percentile, the q49 path).
    * The flag MULTIPLIES (dev > 6·mad) instead of dividing, so an
    * all-constant type (MAD 0) flags every deviating row rather than
    * erroring under ANSI; its score is null via nullif. Two tiny
    * per-type aggregates broadcast back; the event stream crosses no
    * join shuffle.
    */
  private def qAnomalyMad(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(col("event_id"), col("event_type"), col("value"))
    val med = e.groupBy("event_type")
      .agg(percentile(col("value"), lit(0.5)).as("med"))
    val dev = e.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(percentile(col("dev"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), "event_type")
      .where(col("dev") > lit(6.0) * col("mad"))
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("dev") / nullif(col("mad"), lit(0.0)), 4).as("mad_score"))
      .orderBy("event_id")
  }

  /** Pandas `resample('1h').sum()` + `ffill()` parity: per-user hourly
    * time spine from each user's first to last event hour (dense — empty
    * hours materialize), hourly event count + exact-DECIMAL value sum,
    * and the last observed hourly sum carried forward across the gaps.
    *
    * Shape at scale: the spine is `explode(sequence(h0, h1, 1h))` off a
    * per-user min/max aggregate — |users| × active-hours rows, linear in
    * the timeline, never events × hours; the fill is one per-user window
    * over HOURS (not events). A multi-year × billion-user resample would
    * range-partition the spine by (user, month) and run the same window
    * per chunk with boundary carry rows — the AsOfJoin.bucketWidth
    * pattern; the per-user-bounded spine here is the 1000-executor shape
    * already (user is the shuffle key, hours stay sorted within).
    */
  private def qResampleGapfill(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = ev(s, dir).where(col("user_id") < 40)
      .select(col("user_id"), col("ts"), col("value"))
    val hourly = e
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n_events"), round(decSum("value"), 4).as("sum_value"))
    val spine = e.groupBy("user_id")
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
    spine.join(hourly, Seq("user_id", "h"), "left")
      .select(
        col("user_id"),
        unix_micros(col("h")).as("hour_us"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("sum_value"),
        last(col("sum_value"), ignoreNulls = true)
          .over(Window.partitionBy("user_id").orderBy("h")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("filled_value"))
      .orderBy("user_id", "hour_us")
  }

  /** First-order Markov transition matrix over each user's event
    * sequence (ties broken by event_id, so the sequence is total):
    * counts and conditional probabilities of `prev -> next` event-type
    * transitions — the behavioral fingerprint behind funnel mining and
    * bot detection (a scripted client's transition matrix is nearly
    * deterministic; organic traffic is diffuse). One per-user lag
    * window (partitioned — no global sort) into a types²-sized
    * aggregate; the probability normalization windows over that tiny
    * table, not the event log.
    */
  private def qEventTransitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wt = Window.partitionBy("prev_type")
    ev(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_trans"))
      .withColumn("p_next",
        round(col("n_trans").cast("double") / sum("n_trans").over(wt), 6))
      .orderBy("prev_type", "next_type")
  }

  /** Cumulative distinct users by day — the growth-curve query. The
    * scalable formulation is first-seen-day per user (one aggregate)
    * + a days-sized running sum, NOT a distinct-count over an
    * expanding window (which re-scans the prefix per day and holds a
    * per-day distinct set). New-user days absent from the event log
    * contribute nothing, so the curve is stated per active day.
    */
  private def qCumulativeUsers(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val firstSeen = ev(s, dir)
      .groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("day"))
      .groupBy("day")
      .agg(count(lit(1)).as("new_users"))
    firstSeen
      .withColumn("cum_users",
        sum("new_users").over(
          Window.orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("day")
  }

  /** Activity concentration per event type: the Gini coefficient of
    * per-user event counts — the "how bot-heavy / whale-heavy is this
    * stream" metric. Closed form over the sorted counts,
    * `G = (2·Σ i·xᵢ)/(n·Σxᵢ) − (n+1)/n`, with every sum over exact
    * integers (i·xᵢ products), so the value is engine-exact before the
    * final double division. One users-sized aggregate, a per-type rank
    * window over that (users per type, not events), one types-sized
    * result.
    */
  private def qActivityGini(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy(col("x").asc, col("user_id").asc)
    ev(s, dir)
      .groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("x"))
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"), sum("x").as("sx"),
        sum(col("i") * col("x")).as("six"))
      .select(col("event_type"), col("n_users"),
        round((lit(2d) * col("six")) / (col("n_users") * col("sx")) -
          (col("n_users") + lit(1)).cast("double") / col("n_users"), 6).as("gini"))
      .orderBy("event_type")
  }

  /** Shared by q48 (unbucketed) and q50 (hot-key bucketed): the two
    * paths must grade against the IDENTICAL contract - a single constant
    * cannot silently desynchronize the way two pasted copies can.
    */
  private val nearestOracle: String = """
      WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
           c AS (SELECT user_id, ts, max(event_id) AS click_id
                 FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
           m AS (SELECT p.event_id, c.click_id, epoch_us(c.ts) AS click_ts_us,
                        row_number() OVER (PARTITION BY p.event_id
                          ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)),
                                   CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END,
                                   c.click_id) AS rn
                 FROM p JOIN c ON p.user_id = c.user_id
                      AND abs(epoch_us(c.ts) - epoch_us(p.ts)) <= 600000000)
      SELECT p.event_id, p.user_id, epoch_us(p.ts) AS purchase_ts_us,
             m.click_id, m.click_ts_us
      FROM p LEFT JOIN m ON p.event_id = m.event_id AND m.rn = 1
      ORDER BY p.event_id"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q25_asof_join", qAsof _, Some("""
      WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
           c AS (SELECT user_id, ts, max(event_id) AS click_id
                 FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
           m AS (SELECT p.event_id, c.click_id, epoch_us(c.ts) AS click_ts_us,
                        row_number() OVER (PARTITION BY p.event_id
                                           ORDER BY c.ts DESC, c.click_id DESC) AS rn
                 FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts)
      SELECT p.event_id, p.user_id, epoch_us(p.ts) AS purchase_ts_us,
             m.click_id, m.click_ts_us
      FROM p LEFT JOIN m ON p.event_id = m.event_id AND m.rn = 1
      ORDER BY p.event_id""")),
    QueryDef("q47_asof_forward", qAsofForward _, Some("""
      WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
           c AS (SELECT user_id, ts, max(event_id) AS click_id
                 FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
           m AS (SELECT p.event_id, c.click_id, epoch_us(c.ts) AS click_ts_us,
                        row_number() OVER (PARTITION BY p.event_id
                                           ORDER BY c.ts ASC, c.click_id ASC) AS rn
                 FROM p JOIN c ON p.user_id = c.user_id AND c.ts >= p.ts)
      SELECT p.event_id, p.user_id, epoch_us(p.ts) AS purchase_ts_us,
             m.click_id, m.click_ts_us
      FROM p LEFT JOIN m ON p.event_id = m.event_id AND m.rn = 1
      ORDER BY p.event_id""")),
    QueryDef("q48_asof_nearest", qAsofNearest _, Some(nearestOracle)),
    QueryDef("q50_asof_bucketed", qAsofBucketed _, Some(nearestOracle)),
    QueryDef("q26_range_join", qRangeJoin _, Some("""
      WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
           c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
      SELECT p.event_id, p.user_id, count(c.event_id) AS n_clicks_10m
      FROM p LEFT JOIN c ON p.user_id = c.user_id
           AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts < p.ts
      GROUP BY p.event_id, p.user_id
      ORDER BY p.event_id""")),
    QueryDef("q27_tumbling_window", qTumbling _, Some("""
      SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS wstart_us,
             event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY wstart_us, event_type""")),
    QueryDef("q28_sliding_window", qSliding _, Some("""
      WITH starts AS (
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS wstart, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE AS wstart, value
        FROM events)
      SELECT epoch_us(wstart) AS wstart_us,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM starts
      GROUP BY 1
      ORDER BY wstart_us""")),
    QueryDef("q29_session_window", qSession _, Some("""
      WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts >= lag(ts) OVER w + INTERVAL 10 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sess AS (
        SELECT user_id, ts, value,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged)
      SELECT user_id, epoch_us(min(ts)) AS session_start_us,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM sess
      GROUP BY user_id, sid
      ORDER BY user_id, session_start_us""")),
    QueryDef("q36_window_range_time", qRangeWindow _, Some("""
      SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS trailing_1h_sum
      FROM events
      ORDER BY event_id""")),
    QueryDef("q53_event_funnel", qFunnel _, Some("""
      WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                  WHERE event_type = 'signup' GROUP BY user_id),
      s2 AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
             WHERE event_type = 'click' AND ts >= t1 GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
             WHERE event_type = 'purchase' AND ts >= t2 GROUP BY e.user_id),
      n AS (SELECT 1 AS step, 'signup' AS step_name, count(*) AS n_users FROM s1
            UNION ALL SELECT 2, 'click', count(*) FROM s2
            UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
      SELECT step, step_name, CAST(n_users AS BIGINT) AS n_users,
             round(n_users * 1.0 / nullif(lag(n_users) OVER (ORDER BY step), 0), 4)
               AS conversion
      FROM n ORDER BY step""")),
    QueryDef("q54_retention_cohorts", qRetention _, Some("""
      WITH d AS (SELECT DISTINCT user_id, ts::DATE AS d FROM events),
      c AS (SELECT user_id, min(d) AS c FROM d GROUP BY user_id),
      j AS (SELECT d.user_id, c.c, date_diff('day', c.c, d.d) AS day_offset
            FROM d JOIN c USING (user_id))
      SELECT strftime(c, '%Y-%m-%d') AS cohort_day,
             CAST(day_offset AS INT) AS day_offset,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM j WHERE day_offset <= 7
      GROUP BY 1, 2 ORDER BY 1, 2""")),
    QueryDef("q55_rfm_segments", qRfm _, Some("""
      WITH p AS (SELECT user_id, ts, value FROM events
                 WHERE event_type = 'purchase'),
      u AS (SELECT user_id, max(ts) AS last_ts, count(*) AS freq,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
            FROM p GROUP BY user_id),
      mx AS (SELECT max(ts) AS mx FROM p),
      b AS (SELECT user_id,
                   date_diff('day', last_ts::DATE, mx::DATE) AS recency_days,
                   freq, monetary FROM u, mx),
      t AS (SELECT user_id,
                   ntile(3) OVER (ORDER BY recency_days, user_id) AS r_bucket,
                   ntile(3) OVER (ORDER BY freq DESC, user_id) AS f_bucket,
                   ntile(3) OVER (ORDER BY monetary DESC, user_id) AS m_bucket
            FROM b)
      SELECT CAST(r_bucket AS INT) AS r_bucket, CAST(f_bucket AS INT) AS f_bucket,
             CAST(m_bucket AS INT) AS m_bucket, CAST(count(*) AS BIGINT) AS n_users
      FROM t GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),
    QueryDef("q57_resample_gapfill", qResampleGapfill _, Some("""
      WITH e AS (SELECT user_id, ts, value FROM events WHERE user_id < 40),
      h AS (SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS h,
                   count(*) AS n_events,
                   round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4)
                     AS sum_value
            FROM e GROUP BY 1, 2),
      b AS (SELECT user_id, time_bucket(INTERVAL 1 HOUR, min(ts)) AS h0,
                   time_bucket(INTERVAL 1 HOUR, max(ts)) AS h1
            FROM e GROUP BY 1),
      sp AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
             FROM b)
      SELECT sp.user_id, epoch_us(sp.h) AS hour_us,
             CAST(coalesce(h.n_events, 0) AS BIGINT) AS n_events,
             h.sum_value,
             last_value(h.sum_value IGNORE NULLS) OVER (
               PARTITION BY sp.user_id ORDER BY sp.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
      FROM sp LEFT JOIN h ON sp.user_id = h.user_id AND sp.h = h.h
      ORDER BY sp.user_id, hour_us""")),
    QueryDef("q56_anomaly_mad", qAnomalyMad _, Some("""
      WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                 FROM events GROUP BY 1),
      d AS (SELECT e.event_id, e.event_type, e.value,
                   abs(e.value - m.med) AS dev
            FROM events e JOIN m USING (event_type)),
      md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
             FROM d GROUP BY 1)
      SELECT event_id, d.event_type, value,
             round(dev / nullif(mad, 0), 4) AS mad_score
      FROM d JOIN md USING (event_type)
      WHERE dev > 6 * mad
      ORDER BY event_id""")),
    QueryDef("q70_event_transitions", qEventTransitions _, Some("""
      WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events),
      c AS (SELECT prev_type, event_type AS next_type,
                   CAST(count(*) AS BIGINT) AS n_trans
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type)
      SELECT prev_type, next_type, n_trans,
             round(n_trans / sum(n_trans) OVER (PARTITION BY prev_type), 6) AS p_next
      FROM c
      ORDER BY prev_type, next_type""")),
    QueryDef("q72_cumulative_users", qCumulativeUsers _, Some("""
      WITH f AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS day
        FROM events GROUP BY user_id),
      n AS (SELECT day, count(*) AS new_users FROM f GROUP BY day)
      SELECT day, CAST(new_users AS BIGINT) AS new_users,
             CAST(sum(new_users) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_users
      FROM n
      ORDER BY day""")),
    QueryDef("q73_activity_gini", qActivityGini _, Some("""
      WITH u AS (
        SELECT event_type, user_id, count(*) AS x
        FROM events GROUP BY event_type, user_id),
      r AS (
        SELECT event_type, x,
               CAST(row_number() OVER (PARTITION BY event_type
                    ORDER BY x, user_id) AS BIGINT) AS i
        FROM u),
      g AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
               sum(x) AS sx, sum(i * x) AS six
        FROM r GROUP BY event_type)
      SELECT event_type, n_users,
             round((2.0 * six) / (n_users * sx)
                   - (n_users + 1) * 1.0 / n_users, 6) AS gini
      FROM g
      ORDER BY event_type"""))
  )
}
