package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream join: attribute each purchase to a click by the same user
  * within the preceding attribution window — the streaming sibling of
  * [[graft.operators.Temporal.asOfJoin]].
  *
  * Both sides carry watermarks and the join condition bounds the event-time
  * distance, so Spark can expire join state: click state lives for at most
  * (attribution window + watermark delay) — bounded memory at any scale,
  * the property that makes stream-stream joins viable on an unbounded
  * 100 TB/day firehose. Without the time-range condition the state would
  * grow forever (Spark rejects unbounded inner stream-stream joins
  * without watermarks for exactly that reason).
  */
object StreamJoin {

  /** @param clicks    streaming DF: (user_id, click_id, click_time)
    * @param purchases streaming DF: (user_id, purchase_id, purchase_time)
    * @param window    attribution horizon, e.g. "30 minutes"
    */
  def attribution(clicks: DataFrame, purchases: DataFrame,
                  window: String = "30 minutes",
                  watermark: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("click_time", watermark)
    val p = purchases.withWatermark("purchase_time", watermark)
    p.join(c,
      p("user_id") === c("user_id") &&
        c("click_time") <= p("purchase_time") &&
        c("click_time") >= p("purchase_time") - expr(s"INTERVAL $window"))
      .select(p("user_id"), col("purchase_id"), col("click_id"),
              unix_timestamp(col("purchase_time")).as("purchase_epoch"),
              unix_timestamp(col("click_time")).as("click_epoch"))
  }
}
