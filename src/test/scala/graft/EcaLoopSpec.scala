package graft

import graft.active.{EcaLoop, RuleStore, SnowflakeId}
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** C2-C7: ECA instantiation, TTL, re-trigger refresh, control commands,
  * Snowflake ids. */
class EcaLoopSpec extends AnyFunSuite {

  val template = Rule(
    queryId = Some(2L),
    groupingKeyNames = Seq("$carId"),
    aggregateFieldName = Some("speed"),
    aggregatorFunctionType = Some(AggregatorType.Max),
    limitOperatorType = Some(CompareOp.Greater),
    limit = Some(BigDecimal(10)),
    windowMilliseconds = Some(5000L),
    frequencyMilliseconds = Some(0L),
    lastTime = Some(10000L))

  val parent = Rule(
    queryId = Some(1L),
    groupingKeyNames = Seq("carId"),
    aggregateFieldName = Some("speed"),
    aggregatorFunctionType = Some(AggregatorType.Avg),
    limitOperatorType = Some(CompareOp.Greater),
    limit = Some(BigDecimal(120)),
    windowMilliseconds = Some(10000L),
    frequencyMilliseconds = Some(0L),
    alertRules = Seq(template))

  test("$-substitution binds grouping key from triggering event (C4)") {
    val ids = new SnowflakeId(1, 1)
    val spawned = EcaLoop.instantiate(parent,
      Map("carId" -> "00270", "speed" -> "130.0"), ids, now = 1000L)
    assert(spawned.size == 1)
    val child = spawned.head
    assert(child.groupingKeyNames == Seq("carId"))
    assert(child.windowFilterRules ==
      Seq(FilterSpec("carId", CompareOp.Equal, "00270")))
    assert(child.activeId.contains(1L))
    assert(child.activeTime.contains(11000L)) // now + lastTime
    assert(child.queryId.isDefined && !child.queryId.contains(2L))
  }

  test("missing $-parameter in the event fails loudly") {
    val ids = new SnowflakeId(1, 1)
    assertThrows[IllegalArgumentException] {
      EcaLoop.instantiate(parent, Map("speed" -> "1"), ids)
    }
  }

  test("re-trigger refreshes activeTime and reuses queryId (C3)") {
    val store = new RuleStore
    val ids = new SnowflakeId(0, 1)
    val c1 = EcaLoop.instantiate(parent, Map("carId" -> "7"), ids, now = 1000L).head
    store.merge(c1, now = 1000L)
    assert(store.size == 1)
    val firstId = store.snapshot(now = 2000L).head.queryId
    // same filters + same activeId → refresh, not duplicate
    val c2 = EcaLoop.instantiate(parent, Map("carId" -> "7"), ids, now = 5000L).head
    store.merge(c2, now = 5000L)
    assert(store.size == 1)
    val live = store.snapshot(now = 6000L).head
    assert(live.queryId == firstId)
    assert(live.activeTime.contains(15000L)) // refreshed to now + lastTime
    // different event value → different filters → a second instance
    val c3 = EcaLoop.instantiate(parent, Map("carId" -> "8"), ids, now = 5000L).head
    store.merge(c3, now = 5000L)
    assert(store.size == 2)
  }

  test("TTL expiry drops spawned rules at snapshot time (C2)") {
    val store = new RuleStore
    val ids = new SnowflakeId(0, 2)
    val child = EcaLoop.instantiate(parent, Map("carId" -> "9"), ids, now = 1000L).head
    store.merge(child, now = 1000L)
    assert(store.snapshot(now = 5000L).size == 1)  // within TTL
    assert(store.snapshot(now = 12000L).isEmpty)   // activeTime 11000 passed
    assert(store.size == 0)                        // physically removed
    // permanent rules (lastTime <= 0) never expire
    store.merge(parent.copy(lastTime = Some(-1L)), now = 0L)
    assert(store.snapshot(now = Long.MaxValue / 2).size == 1)
  }

  test("control commands (C7): DELETE_RULES_ALL and EXPORT_RULES_CURRENT") {
    val store = new RuleStore
    store.merge(parent)
    store.merge(Rule(queryState = QueryState.Control,
      controlType = Some(ControlType.ExportRulesCurrent)))
    assert(store.exportedRules.map(_.queryId) == Seq(Some(1L)))
    store.merge(Rule(queryState = QueryState.Control,
      controlType = Some(ControlType.DeleteRulesAll)))
    assert(store.size == 0)
    store.merge(Rule(queryState = QueryState.Control,
      controlType = Some(ControlType.ClearStateAll)))
    assert(store.consumeStateClear())
    assert(!store.consumeStateClear())
  }

  test("PAUSE rules are stored but not in the active snapshot") {
    val store = new RuleStore
    store.merge(parent.copy(queryState = QueryState.Pause))
    assert(store.size == 1)
    assert(store.snapshot().isEmpty)
  }

  test("alert batch dedup spawns once per (rule, key) (C5)") {
    val store = new RuleStore
    val ids = new SnowflakeId(0, 3)
    val alerts = Seq(
      (Alert(1L, "{carId=7}", 100L, "130", passed = true, "{}"), Map("carId" -> "7")),
      (Alert(1L, "{carId=7}", 200L, "140", passed = true, "{}"), Map("carId" -> "7")),
      (Alert(1L, "{carId=8}", 100L, "150", passed = true, "{}"), Map("carId" -> "8")),
      (Alert(1L, "{carId=9}", 100L, "10", passed = false, "{}"), Map("carId" -> "9")))
    val n = EcaLoop.processAlerts(Map(1L -> parent), alerts, store, ids)
    assert(n == 2)      // 7 deduped, 9 did not fire
    assert(store.size == 2)
  }

  test("Snowflake ids are unique and monotonic (C6)") {
    val ids = new SnowflakeId(3, 4)
    val got = (1 to 5000).map(_ => ids.nextId())
    assert(got.distinct.size == got.size)
    assert(got == got.sorted)
    // clock regression refuses
    var t = 100L
    val ids2 = new SnowflakeId(0, 0)
    ids2.nextId(() => t)
    t = 50L
    assertThrows[IllegalStateException] { ids2.nextId(() => t) }
  }
}
