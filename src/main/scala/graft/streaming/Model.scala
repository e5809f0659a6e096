package graft.streaming

/** Wire-format case classes mirroring the reference's data model.
  *
  * Input: `{uid, ts}` per Kafka message value on topic `users`
  * (`/root/reference/processor/processor.go:13-16`; `ts` is epoch seconds,
  * `processor.go:45,48`).
  */
final case class UserMsg(uid: String, ts: Long)

/** Output record (`/root/reference/processor/processor.go:18-22`).
  * Field names stay CAPITALIZED — the reference serializes with Go-default
  * keys `Type`/`Timestamp`/`Value` (`kafkaio/kafkaio.go:92`), and Spark
  * `to_json(struct(...))` preserves case-class field casing.
  *
  * `Timestamp` is the window START in epoch seconds; `Type` is one of
  * `minute_count|day_count|week_count|month_count|year_count`
  * (`processor.go:24-32`).
  */
final case class StatMsg(Type: String, Timestamp: Long, Value: Long)

/** Env-var config surface, defaults identical to the reference
  * (`/root/reference/kafkaio/kafkaio.go:14-27`). */
object KafkaConfig {
  def broker: String = sys.env.getOrElse("KAFKA_BROKER", "localhost:9092")
  def usersTopic: String = sys.env.getOrElse("USERS_TOPIC", "users")
  def statsTopic: String = sys.env.getOrElse("STATS_TOPIC", "stats")
}
