package graft.model

/** The query AST of the engine: a continuous-query "rule".
  *
  * Semantics derived from the reference's rule model
  * (`/root/reference/src/main/java/rule/Rule.java:20-34` and
  * `common/WindowFilterRules.java:16-20`), re-expressed as immutable Scala
  * case classes. A rule is one continuous query:
  *
  * {{{
  * SELECT group_key, AGG(aggregateField) AS agg_value
  * FROM events
  * WHERE <conjunction of filters>
  * GROUP BY groupingKeyNames, SLIDING_WINDOW(ts, windowMillis, frequencyMillis)
  * HAVING agg_value <limitOp> limit      -- fires alert + spawns alertRules
  * }}}
  */
final case class Rule(
    queryId: Option[Long] = None,
    queryState: QueryState = QueryState.Active,
    /** Conjunctive WHERE predicates on raw events. */
    windowFilterRules: Seq[FilterSpec] = Nil,
    /** GROUP BY columns by name; a `$field` entry is a parameter bound from
      * the triggering event at ECA spawn time
      * (reference `common/KafkaSender.java:91-107`). */
    groupingKeyNames: Seq[String] = Nil,
    /** Aggregated column; sentinels [[Rule.CountSentinel]] /
      * [[Rule.CountWithResetSentinel]] mean COUNT(*)
      * (reference `operator/DynamicQueryFunction.java:36-37,285-289`). */
    aggregateFieldName: Option[String] = None,
    aggregatorFunctionType: Option[AggregatorType] = None,
    /** HAVING predicate on the aggregate: `agg <limitOperatorType> limit`. */
    limitOperatorType: Option[CompareOp] = None,
    limit: Option[BigDecimal] = None,
    /** Sliding window length in ms; `<= 0` / absent = no aggregation (raw
      * filtered passthrough, reference `DynamicQueryFunction.java:93-116`). */
    windowMilliseconds: Option[Long] = None,
    /** Emission period: `Some(0)` = evaluate+emit per event; `None` or
      * `> window` = emit once per window period; else emit every
      * `frequency` ms (reference `DynamicQueryFunction.java:118-147`). */
    frequencyMilliseconds: Option[Long] = None,
    /** ECA actions: child queries activated when HAVING fires
      * (reference `DynamicQueryFunction.java:193-203`). Nesting depth 1. */
    alertRules: Seq[Rule] = Nil,
    /** TTL for spawned rules in ms; `-1`/`0` = permanent. */
    lastTime: Option[Long] = None,
    /** Absolute expiry deadline epoch-ms (stamped at spawn, refreshed on
      * re-trigger). */
    activeTime: Option[Long] = None,
    /** Out-of-band command carried by a CONTROL-state rule. */
    controlType: Option[ControlType] = None,
    /** Id of the parent rule instance that spawned this rule (dedup key). */
    activeId: Option[Long] = None
) {
  /** COUNT(*) is requested through the aggregate-field sentinels. */
  def isCount: Boolean = aggregateFieldName.exists(Rule.isCountSentinel)

  /** `window <= 0` (or unset) = raw passthrough mode (W4). */
  def isPassthrough: Boolean = !windowMilliseconds.exists(_ > 0)

  /** Per-event emission mode (W1): `frequency == 0`. */
  def isPerEventEmission: Boolean = frequencyMilliseconds.contains(0L)

  /** Evaluate the HAVING predicate on a computed aggregate (driver-side
    * mirror of the Column expression, used by the streaming state op). */
  def applyLimit(aggregate: BigDecimal): Boolean = (limitOperatorType, limit) match {
    case (Some(op), Some(lim)) => op(aggregate, lim)
    case _                     => true
  }
}

object Rule {
  val CountSentinel = "COUNT_FLINK"
  val CountWithResetSentinel = "COUNT_WITH_RESET_FLINK"
  def isCountSentinel(field: String): Boolean =
    field == CountSentinel || field == CountWithResetSentinel

  /** Grouping-key entries prefixed `$` are parameters to be bound from the
    * triggering event when an alert rule is instantiated. */
  def isParameter(keyName: String): Boolean = keyName.startsWith("$")
  def parameterField(keyName: String): String = keyName.stripPrefix("$")
}

/** One conjunctive WHERE predicate `(field, op, value)`.
  *
  * Comparison typing matches the reference (`DynamicKeyFunction.java:69-94`):
  * `=` compares field and value *as strings*; all other operators compare
  * *as decimals* after a string round-trip.
  */
final case class FilterSpec(field: String, operator: CompareOp, value: String)

/** Rule lifecycle state (reference `rule/Rule.java` RuleState). */
sealed abstract class QueryState(val name: String)
object QueryState {
  case object Active  extends QueryState("ACTIVE")
  case object Pause   extends QueryState("PAUSE")
  case object Delete  extends QueryState("DELETE")
  case object Control extends QueryState("CONTROL")
  val all: Seq[QueryState] = Seq(Active, Pause, Delete, Control)
  def fromString(s: String): QueryState =
    all.find(_.name == s).getOrElse(
      throw new IllegalArgumentException(s"unknown queryState: $s"))
}

/** Aggregate function (reference `rule/Rule.java` AggregatorFunctionType;
  * COUNT arrives via the aggregate-field sentinel, not this enum). */
sealed abstract class AggregatorType(val name: String)
object AggregatorType {
  case object Sum extends AggregatorType("SUM")
  case object Avg extends AggregatorType("AVG")
  case object Min extends AggregatorType("MIN")
  case object Max extends AggregatorType("MAX")
  val all: Seq[AggregatorType] = Seq(Sum, Avg, Min, Max)
  def fromString(s: String): AggregatorType =
    all.find(_.name == s).getOrElse(
      throw new IllegalArgumentException(s"unknown aggregatorFunctionType: $s"))
}

/** The 6-way comparison kernel shared by filters and HAVING
  * (reference `DynamicKeyFunction.java:160-177`, `Rule.java:57-74`).
  * Parses both symbolic (`>=`) and named (`GREATER_EQUAL`) spellings. */
sealed abstract class CompareOp(val symbol: String, val name: String) {
  def apply(a: BigDecimal, b: BigDecimal): Boolean = {
    val c = a.compare(b)
    this match {
      case CompareOp.Equal        => c == 0
      case CompareOp.NotEqual     => c != 0
      case CompareOp.Greater      => c > 0
      case CompareOp.Less         => c < 0
      case CompareOp.GreaterEqual => c >= 0
      case CompareOp.LessEqual    => c <= 0
    }
  }
}
object CompareOp {
  case object Equal        extends CompareOp("=", "EQUAL")
  case object NotEqual     extends CompareOp("!=", "NOT_EQUAL")
  case object Greater      extends CompareOp(">", "GREATER")
  case object Less         extends CompareOp("<", "LESS")
  case object GreaterEqual extends CompareOp(">=", "GREATER_EQUAL")
  case object LessEqual    extends CompareOp("<=", "LESS_EQUAL")
  val all: Seq[CompareOp] =
    Seq(Equal, NotEqual, Greater, Less, GreaterEqual, LessEqual)
  def fromString(s: String): CompareOp =
    all.find(o => o.symbol == s || o.name == s).getOrElse(
      throw new IllegalArgumentException(s"unknown comparison operator: $s"))
}

/** Out-of-band control commands (reference `rule/Rule.java` ControlType). */
sealed abstract class ControlType(val name: String)
object ControlType {
  case object ClearStateAll     extends ControlType("CLEAR_STATE_ALL")
  case object ClearStateAllStop extends ControlType("CLEAR_STATE_ALL_STOP")
  case object DeleteRulesAll    extends ControlType("DELETE_RULES_ALL")
  case object ExportRulesCurrent extends ControlType("EXPORT_RULES_CURRENT")
  val all: Seq[ControlType] =
    Seq(ClearStateAll, ClearStateAllStop, DeleteRulesAll, ExportRulesCurrent)
  def fromString(s: String): ControlType =
    all.find(_.name == s).getOrElse(
      throw new IllegalArgumentException(s"unknown controlType: $s"))
}
