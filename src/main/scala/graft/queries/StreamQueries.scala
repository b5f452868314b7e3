package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.EventStreams

/** Batch registrations of the S2/S3 streaming transforms (SURVEY §2.7):
  * the SAME EventStreams functions run here over the batch `events` table
  * (watermark a no-op) and over MemoryStream in StreamingSpec — the
  * batch≡stream differential is the unit test, the batch result is the
  * driver-checked oracle (tumbling ≡ epoch-floor bucketing, sliding ≡ the
  * two enclosing slide-aligned windows, session ≡ gaps-and-islands SQL).
  */
object StreamQueries {

  def tumbling(spark: SparkSession, dir: String): DataFrame =
    EventStreams.tumblingCounts(Tables.events(spark, dir))
      .orderBy(col("window_start_us"), col("event_type"))

  val tumblingOracle: String =
    """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
      |  event_type, count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start_us, event_type""".stripMargin

  def sliding(spark: SparkSession, dir: String): DataFrame =
    EventStreams.slidingCounts(Tables.events(spark, dir))
      .orderBy(col("window_start_us"), col("event_type"))

  val slidingOracle: String =
    """WITH e AS (
      |  SELECT event_type,
      |         unnest([ (epoch_us(ts) // 1800000000) * 1800000000 - 1800000000,
      |                  (epoch_us(ts) // 1800000000) * 1800000000 ]) AS window_start_us
      |  FROM events)
      |SELECT window_start_us, event_type, count(*) AS n_events
      |FROM e GROUP BY 1, 2 ORDER BY window_start_us, event_type""".stripMargin

  def session(spark: SparkSession, dir: String): DataFrame =
    EventStreams.sessionCounts(Tables.events(spark, dir))
      .orderBy(col("user_id"), col("session_start_us"))

  val sessionOracle: String =
    """WITH o AS (
      |  SELECT user_id, value, epoch_us(ts) AS us,
      |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |  FROM events),
      |  flagged AS (
      |    SELECT user_id, value, us,
      |           CASE WHEN prev_us IS NULL OR us - prev_us >= 300000000 THEN 1 ELSE 0 END AS new_s
      |    FROM o),
      |  sess AS (
      |    SELECT user_id, value, us,
      |           sum(new_s) OVER (PARTITION BY user_id ORDER BY us
      |                            ROWS UNBOUNDED PRECEDING) AS sid
      |    FROM flagged)
      |SELECT min(us) AS session_start_us,
      |       max(us) + 300000000 AS session_end_us,
      |       user_id, count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_tumbling_window" -> ((s, d) => tumbling(s, d)),
    "q51_sliding_window" -> ((s, d) => sliding(s, d)),
    "q52_session_window" -> ((s, d) => session(s, d))
  )

  def oracles: Map[String, String] = Map(
    "q50_tumbling_window" -> tumblingOracle,
    "q51_sliding_window" -> slidingOracle,
    "q52_session_window" -> sessionOracle
  )
}
