package graft.model

/** Typed row model for the events stream (ts is TIMESTAMP_NTZ ↔
  * LocalDateTime). Use the typed API when compile-time field checks
  * matter (pipeline code evolving with the schema); DataFrame when the
  * schema is dynamic (driver-visible queries).
  */
case class Event(
    event_id: Long,
    ts: java.time.LocalDateTime,
    user_id: Long,
    event_type: String,
    value: Double,
    props: String)
