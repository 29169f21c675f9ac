package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Deeper relational coverage: correlated subqueries (Catalyst
  * decorrelation), RANGE window frames, ranking-function variety,
  * interpolated percentiles.
  */
object Advanced {

  private val dec2 = DecimalType(18, 2)
  private val dec2w = DecimalType(38, 2)

  /** Correlated scalar subquery (decorrelated by Catalyst into an
    * aggregate + join): customers whose balance exceeds 1/20 of their own
    * average order price. Exact decimal average for determinism.
    */
  def correlatedSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(
      """SELECT c_custkey, c_acctbal FROM customer c
        |WHERE c_acctbal > (
        |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) / 20.0
        |  FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  val correlatedSubquerySql: String =
    """SELECT c_custkey, c_acctbal FROM customer c
      |WHERE c_acctbal > (
      |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) / 20.0
      |  FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** RANGE window frame: per user, sum of values within the last 100
    * event_ids (value-range frame, not row-count frame).
    */
  def rangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rangeBetween(-100, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        sum(col("value").cast(dec2)).over(w).cast(dec2w).cast("string").as("sum_last_100"))
      .orderBy("user_id", "event_id")
  }

  val rangeFrameSql: String =
    """SELECT user_id, event_id,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2)))
      |         OVER (PARTITION BY user_id ORDER BY event_id
      |               RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS VARCHAR) AS sum_last_100
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** Ranking-function variety: dense_rank, ntile, lead over one ordering. */
  def rankingVariety(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        dense_rank().over(w).as("drank"),
        ntile(4).over(w).as("quartile"),
        lead(col("o_orderkey"), 1).over(w).as("next_okey"))
      .orderBy("o_custkey", "drank", "o_orderkey")
  }

  val rankingVarietySql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(dense_rank() OVER w AS INT) AS drank,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  lead(o_orderkey, 1) OVER w AS next_okey
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, drank, o_orderkey""".stripMargin

  /** Interpolated percentiles per event type (exact `percentile` — sorted
    * order statistics + one interpolation, no accumulation order).
    */
  def percentiles(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"))
      .orderBy("event_type")

  val percentilesSql: String =
    """SELECT event_type, quantile_cont(value, 0.5) AS p50,
      |  quantile_cont(value, 0.9) AS p90
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q50: LATERAL join — the per-row correlated derived table (top-2
    * customers by balance for every nation), the SQL surface behind
    * "for each row, run this parameterized subquery". Catalyst
    * decorrelates the LIMIT-2 lateral into a ranked window join, the same
    * physical shape as q08's window top-n — no per-row re-execution.
    */
  def lateralTopN(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(
      """SELECT n.n_name, l.c_name, l.c_acctbal FROM nation n,
        |LATERAL (SELECT c_name, c_acctbal FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_name LIMIT 2) l
        |ORDER BY n.n_name, l.c_acctbal DESC, l.c_name""".stripMargin)
  }

  val lateralTopNSql: String =
    """SELECT n.n_name, l.c_name, l.c_acctbal FROM nation n,
      |LATERAL (SELECT c_name, c_acctbal FROM customer c
      |         WHERE c.c_nationkey = n.n_nationkey
      |         ORDER BY c_acctbal DESC, c_name LIMIT 2) l
      |ORDER BY n.n_name, l.c_acctbal DESC, l.c_name""".stripMargin

  /** q52: RECURSIVE CTE (Spark 4's WITH RECURSIVE) — the calendar-spine
    * gap-filling report: a recursively generated month spine LEFT-joined
    * to monthly order aggregates, so months with ZERO orders still appear
    * (what a plain GROUP BY can never produce). The spine is pure int64
    * yyyymm arithmetic — no date/interval type crosses the engine
    * boundary, so the oracle hash-matches. Recursion is driver-bounded
    * (84 rows) and the join side aggregates partial before the broadcast
    * join, the same shape both engines pick.
    */
  def recursiveCte(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(
      """WITH RECURSIVE months(ym) AS (
        |  SELECT 199201
        |  UNION ALL
        |  SELECT CASE WHEN ym % 100 = 12 THEN ym + 89 ELSE ym + 1 END
        |  FROM months WHERE ym < 199812
        |)
        |SELECT m.ym, count(o.o_orderkey) AS n_orders,
        |  CAST(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS STRING) AS sum_price
        |FROM months m LEFT JOIN orders o
        |  ON year(o.o_orderdate) * 100 + month(o.o_orderdate) = m.ym
        |GROUP BY m.ym ORDER BY m.ym""".stripMargin)
  }

  val recursiveCteSql: String =
    """WITH RECURSIVE months(ym) AS (
      |  SELECT 199201
      |  UNION ALL
      |  SELECT CASE WHEN ym % 100 = 12 THEN ym + 89 ELSE ym + 1 END
      |  FROM months WHERE ym < 199812
      |)
      |SELECT m.ym, count(o.o_orderkey) AS n_orders,
      |  CAST(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_price
      |FROM months m LEFT JOIN orders o
      |  ON year(o.o_orderdate) * 100 + month(o.o_orderdate) = m.ym
      |GROUP BY m.ym ORDER BY m.ym""".stripMargin

  /** q53: IGNORE NULLS window navigation — the sensor/telemetry gap-fill
    * idiom (carry the last observed reading forward across missing
    * samples; also report the previous non-null reading). The events
    * table has no organic nulls, so readings are gapped deterministically
    * (event_id % 3 == 0 ⇒ NULL), identically in the oracle — the operator
    * under test is null-skipping navigation itself: `last_value IGNORE
    * NULLS` over a running frame and `lag IGNORE NULLS`, which plain
    * lag/last cannot express without a second self-join pass.
    *
    * Values pass through untouched (no cross-row float arithmetic), so
    * doubles hash-match bit-for-bit. Scale shape: ONE window exchange on
    * user_id (both functions share the frame family); per-user state is
    * one carried value — unbounded key cardinality, bounded per-key work.
    */
  def ignoreNullsWindows(s: SparkSession, d: String): DataFrame = {
    val gapped = when(col("event_id") % 3 === 0, lit(null).cast("double"))
      .otherwise(col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(s, d)
      .withColumn("reading", gapped)
      .select(col("event_id"), col("user_id"),
        col("reading").isNull.cast("int").as("is_gap"),
        last(col("reading"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("filled"),
        lag(col("reading"), 1, null, ignoreNulls = true).over(w).as("prev_reading"))
      .orderBy("event_id")
  }

  val ignoreNullsWindowsSql: String =
    """WITH g AS (SELECT event_id, user_id,
      |    CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS reading
      |  FROM events)
      |SELECT event_id, user_id,
      |  CAST(reading IS NULL AS INT) AS is_gap,
      |  last_value(reading IGNORE NULLS) OVER (PARTITION BY user_id
      |    ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS filled,
      |  lag(reading IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY event_id)
      |    AS prev_reading
      |FROM g ORDER BY event_id""".stripMargin

  /** q54: VARIANT semi-structured ingestion — Spark 4's binary-encoded
    * VariantType (`parse_json` → `variant_get`), the modern lakehouse
    * path for schema-on-read JSON columns (q19 covers the legacy
    * string-path `get_json_object`). The variant is an INTERNAL column
    * only — typed scalars are extracted before the aggregate (a terminal
    * VARIANT would violate the driver-comparator contract exactly as an
    * array would), and `try_variant_get` with a wrong type documents the
    * null-on-missing-path contract. The oracle reads the same JSON with
    * DuckDB's json_extract — the values agree because extraction is
    * exact integer. (`try_variant_get` probes an ABSENT path — an int
    * happily casts to several types, so a type-mismatch probe would be
    * engine-specific; path absence is not.)
    *
    * Scale shape: parse + extract are narrow codegen'd per-row work at
    * the scan; the rollup is one partial-aggregated exchange. VARIANT's
    * value at 100 TB is pushdown-friendly binary encoding vs re-parsing
    * JSON text per access — here each row is parsed once either way.
    */
  def variantJson(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("v", parse_json(col("props")))
      .select(
        expr("variant_get(v, '$.k', 'int')").as("k_val"),
        expr("try_variant_get(v, '$.absent', 'int')").isNull
          .cast("int").as("k_not_ts"))
      // `%` (sign-of-dividend) on BOTH engines — pmod would silently
      // diverge from the oracle's `%` on negative keys
      .groupBy(expr("k_val % 10").as("k_mod"))
      .agg(count(lit(1)).as("n"),
        min(col("k_val")).as("k_min"),
        max(col("k_val")).as("k_max"),
        sum(col("k_not_ts")).as("n_type_miss"))
      .orderBy("k_mod")

  val variantJsonSql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
      |  count(*) AS n,
      |  min(CAST(json_extract_string(props, '$.k') AS INT)) AS k_min,
      |  max(CAST(json_extract_string(props, '$.k') AS INT)) AS k_max,
      |  CAST(count(*) AS BIGINT) AS n_type_miss
      |FROM events GROUP BY 1 ORDER BY k_mod""".stripMargin

  /** q56: gaps-and-islands — per-user runs of consecutive ACTIVE DAYS,
    * the classic sessionization-by-calendar idiom (retention/streak
    * analytics; q29's session_window is its event-time cousin). The
    * grouping key is the row_number-difference trick: within a user,
    * `day - row_number()` is constant exactly while days are consecutive,
    * so one window + one aggregate finds every island with no self-join
    * (the naive form is an O(n²) anti-join per user). Days are int64
    * day-offsets from a fixed epoch on both engines — no DATE crosses the
    * comparator boundary.
    *
    * Scale shape: one distinct on (user_id, day) — the shuffle carries
    * two longs — then the window partitions by user_id (cardinality grows
    * with data; per-key state is one counter) and reuses the same
    * clustering for the island aggregate, so EnsureRequirements inserts
    * no second exchange.
    */
  def gapsIslands(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // events.ts is µs TIMESTAMP_NTZ (Tables.load); session tz is UTC, so
    // the date floor matches DuckDB's naive CAST(ts AS DATE). (An integer
    // `unix_micros div 86400000000 - 8035` form benched identical —
    // datediff/to_date are already codegen'd; the cost is the
    // distinct+window, so the readable calendar form stays.)
    val days = Tables.events(s, d)
      .select(col("user_id"),
        datediff(to_date(TimeWindows.eventTime),
          lit("1992-01-01").cast("date")).cast("long").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    days
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(min("day").as("start_day"), max("day").as("end_day"),
        count(lit(1)).as("island_days"))
      .select("user_id", "start_day", "end_day", "island_days")
      .orderBy("user_id", "start_day")
  }

  val gapsIslandsSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_diff('day', DATE '1992-01-01', CAST(ts AS DATE)) AS BIGINT) AS day
      |  FROM events),
      |g AS (SELECT user_id, day,
      |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
      |  FROM days)
      |SELECT user_id, min(day) AS start_day, max(day) AS end_day,
      |  count(*) AS island_days
      |FROM g GROUP BY user_id, grp
      |ORDER BY user_id, start_day""".stripMargin

  /** q61: ordered conversion funnel (view → click → purchase) — the
    * product-analytics staple (Amplitude/Mixpanel-style): a user advances
    * a stage only with an event STRICTLY AFTER their previous stage's
    * first event, so out-of-order arrivals (click before any view) don't
    * count. Reported as per-stage converted-user counts.
    *
    * Scale shape: one exchange total — both window passes and the final
    * per-user fold share the user_id partitioning, so stages 2/3 and the
    * per-user collapse add no shuffle (the q56 discipline); the stage
    * report is a constant-width conditional aggregate of |users| rows.
    * Never a per-stage self-join of events (the naive form: 3 scans + 2
    * joins of the full log).
    */
  def funnel(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
    val staged = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), TimeWindows.eventTime.as("t"))
      .withColumn("fv", min(when(col("event_type") === "view", col("t"))).over(w))
      .withColumn("fc", min(when(col("event_type") === "click" && col("t") > col("fv"), col("t"))).over(w))
      .withColumn("fp", min(when(col("event_type") === "purchase" && col("t") > col("fc"), col("t"))).over(w))
    val perUser = staged.groupBy(col("user_id"))
      .agg(max(col("fv")).as("fv"), max(col("fc")).as("fc"), max(col("fp")).as("fp"))
    perUser.agg(
        count(col("fv")).as("viewed"),
        count(col("fc")).as("clicked_after_view"),
        count(col("fp")).as("purchased_after_click"))
      .select(explode(array(
          struct(lit("1_viewed").as("stage"), col("viewed").as("n_users")),
          struct(lit("2_clicked_after_view").as("stage"), col("clicked_after_view").as("n_users")),
          struct(lit("3_purchased_after_click").as("stage"), col("purchased_after_click").as("n_users")))).as("e"))
      .select(col("e.stage").as("stage"), col("e.n_users").as("n_users"))
      .orderBy("stage")
  }

  val funnelSql: String =
    """WITH w1 AS (SELECT user_id, event_type, ts,
      |    min(CASE WHEN event_type = 'view' THEN ts END)
      |      OVER (PARTITION BY user_id) AS fv FROM events),
      |w2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > fv THEN ts END)
      |    OVER (PARTITION BY user_id) AS fc FROM w1),
      |w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > fc THEN ts END)
      |    OVER (PARTITION BY user_id) AS fp FROM w2),
      |u AS (SELECT user_id, max(fv) AS fv, max(fc) AS fc, max(fp) AS fp
      |      FROM w3 GROUP BY user_id),
      |agg AS (SELECT CAST(count(fv) AS BIGINT) AS viewed,
      |          CAST(count(fc) AS BIGINT) AS clicked_after_view,
      |          CAST(count(fp) AS BIGINT) AS purchased_after_click FROM u)
      |SELECT stage, n_users FROM (
      |  SELECT '1_viewed' AS stage, viewed AS n_users FROM agg
      |  UNION ALL SELECT '2_clicked_after_view', clicked_after_view FROM agg
      |  UNION ALL SELECT '3_purchased_after_click', purchased_after_click FROM agg)
      |ORDER BY stage""".stripMargin

  /** q62: cohort retention — users grouped by first-activity day (the
    * cohort), counted by how many are active again k days later. The
    * growth-analytics table every event warehouse serves.
    *
    * Day arithmetic is integer day-indexes from a fixed epoch (the q56
    * NTZ discipline — no DATE columns in the output contract). Scale
    * shape: the events log is scanned once and immediately reduced to
    * distinct (user, day) pairs (partial-agg collapses the log map-side);
    * everything after moves only those narrow pairs — a per-user window
    * min, then a (cohort, offset) aggregate a few thousand rows wide.
    */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = Tables.events(s, d)
      .select(col("user_id"),
        datediff(to_date(TimeWindows.eventTime),
          lit("1992-01-01").cast("date")).cast("long").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id")
    days
      .withColumn("cohort_day", min(col("day")).over(w))
      .select(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .filter(col("day_offset") <= 14)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_day", "day_offset")
  }

  val cohortRetentionSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_diff('day', DATE '1992-01-01', CAST(ts AS DATE)) AS BIGINT) AS day
      |  FROM events),
      |c AS (SELECT user_id, day,
      |    min(day) OVER (PARTITION BY user_id) AS cohort_day FROM days)
      |SELECT cohort_day, day - cohort_day AS day_offset,
      |  CAST(count(*) AS BIGINT) AS n_active
      |FROM c WHERE day - cohort_day <= 14
      |GROUP BY cohort_day, day - cohort_day
      |ORDER BY cohort_day, day_offset""".stripMargin

  /** q69: multi-touch revenue attribution — every purchase credits its
    * LAST preceding touch (click/view/signup, anywhere earlier in the
    * user's timeline) and the FIRST touch of its purchase-to-purchase
    * segment; per channel, attributed purchase counts and exact
    * revenue-cents under both models. The marketing-warehouse companion
    * of q61's funnel: q61 counts conversions, q69 allocates their value.
    *
    * Scale shape: the last-touch carry and the segment index (cumulative
    * purchase count) come off ONE (user_id)-partitioned ordered pass —
    * the q53 IGNORE-NULLS frame, never a per-purchase self-join of the
    * log; the first-touch pass refines the partitioning to (user_id,
    * seg); attribution rows then collapse to a |channels|-wide
    * conditional aggregate, with both models emitted from one explode
    * (one Generate, not a union of two scans — the g02 lesson). Revenue
    * is exact integer cents (the q66 centsOf geometry).
    */
  def attribution(s: SparkSession, d: String): DataFrame =
    attributionOf(Tables.events(s, d))

  /** q69 over any events-shaped frame (spec-injectable face). */
  private[graft] def attributionOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wPrev = Window.partitionBy("user_id")
      .orderBy(col("t"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wSegPrev = Window.partitionBy("user_id", "seg")
      .orderBy(col("t"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ev = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        TimeWindows.eventTime.as("t"),
        Extras.centsOf(col("value")).as("cents"))
      .withColumn("ch",
        when(col("event_type").isin("click", "view", "signup"), col("event_type")))
      .withColumn("last_ch", last(col("ch"), ignoreNulls = true).over(wPrev))
      .withColumn("seg", coalesce(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).over(wPrev),
        lit(0L)))
    val pur = ev
      .withColumn("first_ch", first(col("ch"), ignoreNulls = true).over(wSegPrev))
      .filter(col("event_type") === "purchase")
      .select(coalesce(col("last_ch"), lit("(none)")).as("last_ch"),
        coalesce(col("first_ch"), lit("(none)")).as("first_ch"),
        col("cents"))
    pur.select(explode(array(
        struct(lit("last").as("model"), col("last_ch").as("channel"), col("cents")),
        struct(lit("first").as("model"), col("first_ch").as("channel"), col("cents")))).as("e"))
      .select(col("e.model").as("model"), col("e.channel").as("channel"),
        col("e.cents").as("cents"))
      .groupBy("channel")
      .agg(
        count(when(col("model") === "last", 1)).as("n_last"),
        coalesce(sum(when(col("model") === "last", col("cents"))), lit(0L))
          .as("rev_last_cents"),
        count(when(col("model") === "first", 1)).as("n_first"),
        coalesce(sum(when(col("model") === "first", col("cents"))), lit(0L))
          .as("rev_first_cents"))
      .orderBy("channel")
  }

  val attributionSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, ts,
      |    CAST(floor(value * 100.0) AS BIGINT) AS cents,
      |    CASE WHEN event_type IN ('click', 'view', 'signup')
      |         THEN event_type END AS ch
      |  FROM events),
      |w1 AS (SELECT *,
      |    last_value(ch IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_ch,
      |    coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg
      |  FROM ev),
      |w2 AS (SELECT *,
      |    first_value(ch IGNORE NULLS) OVER (
      |      PARTITION BY user_id, seg ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_ch
      |  FROM w1),
      |pur AS MATERIALIZED (
      |  SELECT coalesce(last_ch, '(none)') AS last_ch,
      |         coalesce(first_ch, '(none)') AS first_ch, cents
      |  FROM w2 WHERE event_type = 'purchase'),
      |x AS (SELECT 'last' AS model, last_ch AS channel, cents FROM pur
      |      UNION ALL SELECT 'first', first_ch, cents FROM pur)
      |SELECT channel,
      |  CAST(count(CASE WHEN model = 'last' THEN 1 END) AS BIGINT) AS n_last,
      |  CAST(coalesce(sum(CASE WHEN model = 'last' THEN cents END), 0)
      |    AS BIGINT) AS rev_last_cents,
      |  CAST(count(CASE WHEN model = 'first' THEN 1 END) AS BIGINT) AS n_first,
      |  CAST(coalesce(sum(CASE WHEN model = 'first' THEN cents END), 0)
      |    AS BIGINT) AS rev_first_cents
      |FROM x GROUP BY channel ORDER BY channel""".stripMargin

  // --------------------------------- q71 point-in-time feature snapshot
  /** q71: point-in-time-correct training-feature materialization — the
    * feature-store operation that decides whether a trained model is
    * legitimate: for every (user, active day), emit the features known
    * STRICTLY BEFORE that day (prior active days, prior event count,
    * prior spend, recency gap) next to that day's label (purchases).
    * Leakage is the failure mode — a feature frame built with same-day or
    * future data inflates offline metrics and dies in production; here
    * the frame boundary `rowsBetween(unboundedPreceding, -1)` makes
    * same-day leakage impossible BY CONSTRUCTION, and the spec replays a
    * user's history sequentially to pin it.
    *
    * Exactness: spend quantizes to cents per event (floor(100·v), one
    * IEEE multiply+floor) before summing, so cumulative features are
    * exact integers; days are int64 offsets from the fixed epoch (the
    * q56 discipline — no DATE crosses the comparator); the recency gap
    * coalesces to −1 on each user's first day.
    *
    * Scale shape: events collapse to the (user, day) rollup first (the
    * only event-mass shuffle), then ONE user-partitioned sort provides
    * all four window features — count/sum/lag share the frame — and the
    * label rides the same rollup row. Per-user state is O(1); nothing
    * is unpartitioned.
    */
  def pitFeatures(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .select(col("user_id"),
        datediff(to_date(TimeWindows.eventTime),
          lit("1992-01-01").cast("date")).cast("long").as("day"),
        floor(col("value") * lit(100.0)).cast("long").as("cents"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("is_p"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("day_cents"),
        sum(col("is_p")).as("label_purchases"))
    val w = Window.partitionBy("user_id").orderBy("day")
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    daily
      .select(col("user_id"), col("day"),
        count(lit(1)).over(prior).as("prior_days"),
        coalesce(sum(col("n_events")).over(prior), lit(0L)).as("prior_events"),
        coalesce(sum(col("day_cents")).over(prior), lit(0L)).as("prior_cents"),
        coalesce(col("day") - lag(col("day"), 1).over(w), lit(-1L))
          .as("days_since_prev"),
        col("label_purchases"))
      .orderBy("user_id", "day")
  }

  /** q71 oracle: identical rollup, frame boundary, and cent/day-offset
    * arithmetic.
    */
  val pitFeaturesSql: String =
    """WITH daily AS (
      |  SELECT user_id,
      |    CAST(date_diff('day', DATE '1992-01-01', CAST(ts AS DATE)) AS BIGINT) AS day,
      |    count(*) AS n_events,
      |    CAST(sum(CAST(floor(value * 100.0) AS BIGINT)) AS BIGINT) AS day_cents,
      |    CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS label_purchases
      |  FROM events GROUP BY 1, 2)
      |SELECT user_id, day,
      |  CAST(count(*) OVER prior AS BIGINT) AS prior_days,
      |  CAST(coalesce(sum(n_events) OVER prior, 0) AS BIGINT) AS prior_events,
      |  CAST(coalesce(sum(day_cents) OVER prior, 0) AS BIGINT) AS prior_cents,
      |  coalesce(day - lag(day) OVER (PARTITION BY user_id ORDER BY day), -1)
      |    AS days_since_prev,
      |  label_purchases
      |FROM daily
      |WINDOW prior AS (PARTITION BY user_id ORDER BY day
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |ORDER BY user_id, day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q71_pit_features" -> (pitFeatures _),
    "q69_attribution" -> (attribution _),
    "q61_funnel" -> (funnel _),
    "q62_cohort_retention" -> (cohortRetention _),
    "q56_gaps_islands" -> (gapsIslands _),
    "q54_variant" -> (variantJson _),
    "q53_ignore_nulls_windows" -> (ignoreNullsWindows _),
    "q52_recursive_cte" -> (recursiveCte _),
    "q50_lateral_topn" -> (lateralTopN _),
    "q32_correlated_subquery" -> (correlatedSubquery _),
    "q33_range_frame" -> (rangeFrame _),
    "q34_ranking_variety" -> (rankingVariety _),
    "q35_percentiles" -> (percentiles _))

  val oracles: Map[String, String] = Map(
    "q71_pit_features" -> pitFeaturesSql,
    "q69_attribution" -> attributionSql,
    "q61_funnel" -> funnelSql,
    "q62_cohort_retention" -> cohortRetentionSql,
    "q56_gaps_islands" -> gapsIslandsSql,
    "q54_variant" -> variantJsonSql,
    "q53_ignore_nulls_windows" -> ignoreNullsWindowsSql,
    "q52_recursive_cte" -> recursiveCteSql,
    "q50_lateral_topn" -> lateralTopNSql,
    "q32_correlated_subquery" -> correlatedSubquerySql,
    "q33_range_frame" -> rangeFrameSql,
    "q34_ranking_variety" -> rankingVarietySql,
    "q35_percentiles" -> percentilesSql)
}
