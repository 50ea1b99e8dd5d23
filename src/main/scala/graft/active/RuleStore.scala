package graft.active

import graft.model._

/** The live-rule table (reference C1/C2/C3/C7): the Spark-side replacement
  * for Flink broadcast state. One snapshot is read per micro-batch, which
  * removes the reference's broadcast-state race (`DynamicQueryFunction
  * .java:268-271`) — every operator sees the same rule set for a batch.
  *
  * Semantics (MERGE-style, mirroring `common/ProcessingUtils.java:18-29`
  * and `DynamicKeyFunction.java:108-144`):
  *  - ACTIVE/PAUSE upsert by queryId; DELETE removes;
  *  - an incoming rule matching a live rule on (windowFilterRules,
  *    activeId) is a *re-trigger*: refresh activeTime = now + lastTime and
  *    reuse the live queryId (C3 — prevents duplicate query instances);
  *  - TTL expiry (C2): rules whose activeTime passed and lastTime > 0 are
  *    dropped at snapshot time;
  *  - CONTROL rules dispatch commands (C7) instead of merging.
  *
  * Thread-safe in-memory implementation; at cluster scale the same MERGE
  * lands on a Delta/parquet rules table (the logic below is the MERGE
  * condition set, unchanged).
  */
final class RuleStore {
  private val rules = scala.collection.mutable.LinkedHashMap.empty[Long, Rule]
  private var stateClearRequested = false
  private var exported: Seq[Rule] = Nil

  /** Apply one incoming rule (the reference's processBroadcastElement). */
  def merge(incoming: Rule, now: Long = System.currentTimeMillis()): Unit =
    synchronized {
      incoming.queryState match {
        case QueryState.Control =>
          incoming.controlType.foreach {
            case ControlType.DeleteRulesAll => rules.clear()
            case ControlType.ClearStateAll => stateClearRequested = true
            // the reference's _STOP removes the standing clear command from
            // broadcast state (`DynamicQueryFunction.java:341-343`) — here
            // that is cancelling a pending, not-yet-consumed clear request
            case ControlType.ClearStateAllStop => stateClearRequested = false
            case ControlType.ExportRulesCurrent => exported = snapshot(now)
          }
        case QueryState.Delete =>
          incoming.queryId.foreach(rules.remove)
        case _ =>
          // C3 re-trigger refresh: same filters + same activeId = same
          // spawned query instance
          val matched = incoming.activeId.flatMap { aid =>
            rules.values.find(r =>
              r.activeId.contains(aid) &&
                r.windowFilterRules == incoming.windowFilterRules)
          }
          val merged = matched match {
            case Some(live) =>
              incoming.copy(
                queryId = live.queryId,
                activeTime = incoming.lastTime.filter(_ > 0).map(now + _)
                  .orElse(incoming.activeTime))
            case None => incoming
          }
          merged.queryId.foreach(id => rules.update(id, merged))
      }
    }

  /** Live rules as of `now`, with TTL-expired rules dropped (C2). The
    * reference publishes a DELETE for expired rules during event
    * processing (`DynamicKeyFunction.java:62-66`); snapshot-time filtering
    * is the idempotent equivalent. */
  def snapshot(now: Long = System.currentTimeMillis()): Seq[Rule] =
    synchronized {
      val (expired, live) = rules.values.toSeq.partition(r =>
        r.activeTime.exists(_ < now) && r.lastTime.exists(_ > 0))
      expired.flatMap(_.queryId).foreach(rules.remove)
      live.filter(_.queryState == QueryState.Active)
    }

  def exportedRules: Seq[Rule] = synchronized(exported)
  def consumeStateClear(): Boolean = synchronized {
    val r = stateClearRequested; stateClearRequested = false; r
  }
  def size: Int = synchronized(rules.size)

  /** Durable face of the store: the live rule set as JSON lines (the
    * reference wire format, K4's EXPORT made persistent). [[RuleStore.load]]
    * replays a saved file through [[merge]], so restart recovery follows
    * the exact same MERGE path as live traffic — the promised "same MERGE
    * lands on a rules table" without needing a table format. */
  def save(path: java.nio.file.Path, now: Long = System.currentTimeMillis()): Unit = {
    val lines = snapshot(now).map(graft.rules.RuleCodec.encode)
    java.nio.file.Files.writeString(path, lines.mkString("", "\n", "\n"))
  }
}

object RuleStore {
  /** Rebuild a store by replaying a [[RuleStore.save]] file (or any
    * JSON-lines rule feed) through the MERGE path; undecodable lines are
    * dropped like the lenient deserializer (S6). */
  def load(path: java.nio.file.Path,
      now: Long = System.currentTimeMillis()): RuleStore = {
    val store = new RuleStore
    if (java.nio.file.Files.exists(path))
      java.nio.file.Files.readAllLines(path).forEach { line =>
        if (line.trim.nonEmpty)
          graft.rules.RuleCodec.decodeOption(line).foreach(store.merge(_, now))
      }
    store
  }
}
