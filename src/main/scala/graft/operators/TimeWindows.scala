package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Event-time windowing over the events stream table (ST5 — absent in the
  * reference, mandated for Layer B): tumbling and session windows, usable
  * identically in batch and Structured Streaming (the streaming side with
  * watermarks is exercised in EventTimeWindowSpec).
  *
  * events.ts arrives as µs TIMESTAMP_NTZ (see Tables.load); the cast to
  * session-local TIMESTAMP is value-stable because every graft session
  * pins spark.sql.session.timeZone=UTC — an invariant Tables.load now
  * asserts (require) rather than assumes.
  */
object TimeWindows {

  /** Event-time as a session-UTC timestamp column (DuckDB reads the same
    * µs values as naive TIMESTAMP, so window starts agree bit-for-bit).
    */
  def eventTime: Column = col("ts").cast("timestamp")

  /** Tumbling 1-hour windows: count + exact sum per window. */
  def hourlyWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(eventTime, "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DecimalType(38, 2)).cast("string").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("n_events"), col("sum_value"))
      .orderBy("hour_start")

  val hourlyWindowSql: String =
    """SELECT date_trunc('hour', ts) AS hour_start, count(*) AS n_events,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_value
      |FROM events GROUP BY 1 ORDER BY hour_start""".stripMargin

  /** Session windows: per-user sessions closed by a 12-hour inactivity gap.
    * The oracle mirrors the gaps-and-islands formulation (new session when
    * the gap >= the window, i.e. Spark's half-open [start, last+gap)).
    */
  def userSessions(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(eventTime, "12 hours"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))
      .orderBy("user_id", "session_start")

  val userSessionsSql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 12 HOURS THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |numbered AS (
      |  SELECT user_id, ts,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged)
      |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
      |FROM numbered GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_time_window" -> (hourlyWindow _),
    "q29_session_window" -> (userSessions _))

  val oracles: Map[String, String] = Map(
    "q28_time_window" -> hourlyWindowSql,
    "q29_session_window" -> userSessionsSql)
}
