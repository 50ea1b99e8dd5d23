package graft.model

/** One rule evaluation result (reference `common/Alert.java:16-23`):
  * which rule fired, on which group key, the triggering event (as JSON),
  * the aggregate value (decimal string — exact), and the HAVING verdict.
  *
  * The reference only emits rows where the threshold passed; we carry the
  * verdict so the demo sink (K2, `DynamicQueryFunction.java:170-190`) can
  * also log non-firing evaluations, as the reference's side output does.
  */
final case class Alert(
    ruleId: Long,
    key: String,
    tsMillis: Long,
    aggregate: String,
    passed: Boolean,
    payload: String)

/** The event×rule fan-out product (reference `common/Keyed.java:14-18`):
  * an event bound to one rule and its composite group key, reduced to the
  * fields the windowed state operator needs. `aggIn` is the aggregate
  * input rendered as a decimal string (null-safe: empty for COUNT rules),
  * `payload` the full event as JSON for alert emission.
  */
final case class KeyedEvent(
    ruleId: Long,
    key: String,
    tsMillis: Long,
    aggIn: String,
    payload: String)
