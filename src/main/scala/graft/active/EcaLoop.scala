package graft.active

import graft.model._

/** C4/C5: the "active" half of the active data warehouse — when a rule's
  * HAVING fires, its `alertRules` templates are *instantiated*,
  * parameterized by the triggering event, and merged back into the rule
  * store as brand-new continuous queries (reference
  * `common/KafkaSender.java:56-123`; loop closure via the Kafka `rules`
  * topic is replaced by a driver-side merge in `foreachBatch`, SURVEY §3).
  *
  * Template expansion (`KafkaSender.java:91-107`): each grouping key of
  * the form `$field` is bound from the triggering event — the key becomes
  * the literal `field` and an equality filter `field = <event value>` is
  * appended. (The reference accumulates key names across iterations in a
  * never-reset StringBuilder — a bug; we implement the per-key intent,
  * documented here.)
  *
  * Stamping (`KafkaSender.java:108-114`): activeTime, activeId = parent
  * rule instance, fresh Snowflake queryId. The reference stamps
  * `activeTime = now` which makes a fresh TTL rule instantly expired; we
  * stamp `now + lastTime` (the value its own refresh path C3 uses), which
  * is the evident intent of the README's "10 s TTL" example.
  *
  * Spawn dedup (C5, `KafkaSender.java:30-31,65-79`): the reference keeps a
  * 10-slot ring of (queryId, carId) to throttle duplicate spawns; here
  * dedup is structural — RuleStore.merge is idempotent on (filters,
  * activeId) — plus a per-batch distinct on the same key.
  */
object EcaLoop {

  /** Expand one parent rule's templates for one firing alert.
    * `eventFields` = the triggering event as field → string value. */
  def instantiate(parent: Rule, eventFields: Map[String, String],
      ids: SnowflakeId, now: Long = System.currentTimeMillis()): Seq[Rule] =
    parent.alertRules.map { tmpl =>
      val bound = tmpl.groupingKeyNames.map { k =>
        if (Rule.isParameter(k)) Rule.parameterField(k) else k
      }
      val boundFilters = tmpl.groupingKeyNames.collect {
        case k if Rule.isParameter(k) =>
          val f = Rule.parameterField(k)
          val v = eventFields.getOrElse(f,
            throw new IllegalArgumentException(
              s"$$-parameter '$f' not present in triggering event ${eventFields.keys}"))
          FilterSpec(f, CompareOp.Equal, v)
      }
      tmpl.copy(
        queryId = Some(ids.nextId()),
        queryState = QueryState.Active,
        groupingKeyNames = bound,
        windowFilterRules = tmpl.windowFilterRules ++ boundFilters,
        activeTime = tmpl.lastTime.filter(_ > 0).map(now + _),
        activeId = parent.queryId)
    }

  /** One batch of the feedback loop: for each firing alert, expand and
    * merge the spawned rules; batch-level dedup on (parent, event key) —
    * the reference's ring-buffer throttle, done exactly. */
  def processAlerts(parentsById: Map[Long, Rule],
      alerts: Seq[(Alert, Map[String, String])],
      store: RuleStore, ids: SnowflakeId,
      now: Long = System.currentTimeMillis()): Int = {
    val fired = alerts.filter(_._1.passed)
    val deduped = fired.groupBy { case (a, _) => (a.ruleId, a.key) }
      .map { case (_, group) => group.maxBy(_._1.tsMillis) }
    var spawned = 0
    for {
      (alert, fields) <- deduped
      parent <- parentsById.get(alert.ruleId).toSeq
      child <- instantiate(parent, fields, ids, now)
    } {
      store.merge(child, now)
      spawned += 1
    }
    spawned
  }
}
