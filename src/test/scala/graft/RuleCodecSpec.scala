package graft

import graft.model._
import graft.rules.RuleCodec
import org.scalatest.funsuite.AnyFunSuite

/** F9 codec tests: round-trip the reference README's two example rules
  * verbatim (FIXTURES A2) plus validation/drop semantics
  * (`rule/RuleDeserializer.java:28-40`). */
class RuleCodecSpec extends AnyFunSuite {

  val readmeRule1 =
    """{"lastTime":-1,"windowMilliseconds":10000,"frequencyMilliseconds":0,
       "groupingKeyNames":["carId"],"windowFilterRules":[],
       "alertRules":[{"windowFilterRules":[],"lastTime":10000,"windowMilliseconds":5000,
         "frequencyMilliseconds":0,"groupingKeyNames":["$carId"],
         "aggregatorFunctionType":"MAX","limitOperatorType":"GREATER","limit":10,
         "queryState":"ACTIVE","aggregateFieldName":"speed","queryId":2}],
       "aggregatorFunctionType":"AVG","limitOperatorType":"GREATER","limit":120,
       "queryState":"ACTIVE","aggregateFieldName":"speed","queryId":1}"""

  val readmeRule2 =
    """{"lastTime":-1,"windowMilliseconds":60000,"frequencyMilliseconds":0,
       "windowFilterRules":[
         {"field":"lon","value":"121.513011","operator":">"},
         {"field":"lon","value":"121.515430","operator":"<"},
         {"field":"lat","value":"31.234928","operator":"<"},
         {"field":"lat","value":"31.233456","operator":">"}],
       "aggregatorFunctionType":"AVG","limitOperatorType":"GREATER","limit":120,
       "queryState":"ACTIVE","aggregateFieldName":"speed","queryId":1,
       "activeTime":123000}"""

  test("README example 1 decodes with nested alert rule") {
    val r = RuleCodec.decode(readmeRule1)
    assert(r.queryId.contains(1L))
    assert(r.aggregatorFunctionType.contains(AggregatorType.Avg))
    assert(r.limitOperatorType.contains(CompareOp.Greater))
    assert(r.limit.contains(BigDecimal(120)))
    assert(r.isPerEventEmission)
    assert(r.alertRules.size == 1)
    val child = r.alertRules.head
    assert(child.groupingKeyNames == Seq("$carId"))
    assert(child.aggregatorFunctionType.contains(AggregatorType.Max))
    assert(child.lastTime.contains(10000L))
  }

  test("README example 2 decodes the filter conjunction") {
    val r = RuleCodec.decode(readmeRule2)
    assert(r.windowFilterRules.size == 4)
    assert(r.windowFilterRules.head ==
      FilterSpec("lon", CompareOp.Greater, "121.513011"))
    assert(r.windowFilterRules.map(_.operator).distinct.toSet ==
      Set(CompareOp.Greater, CompareOp.Less))
  }

  test("round-trip preserves the rule") {
    for (json <- Seq(readmeRule1, readmeRule2)) {
      val r = RuleCodec.decode(json)
      assert(RuleCodec.decode(RuleCodec.encode(r)) == r)
    }
  }

  test("rule without queryId is rejected unless CONTROL") {
    assert(RuleCodec.decodeOption("""{"queryState":"ACTIVE"}""").isEmpty)
    val ctl = RuleCodec.decode(
      """{"queryState":"CONTROL","controlType":"DELETE_RULES_ALL"}""")
    assert(ctl.controlType.contains(ControlType.DeleteRulesAll))
  }

  test("malformed JSON drops, does not throw") {
    assert(RuleCodec.decodeOption("not json at all").isEmpty)
    assert(RuleCodec.decodeOption("""{"queryId":"abc?}""").isEmpty)
  }

  test("operator spellings: symbolic and named both parse") {
    assert(CompareOp.fromString(">=") == CompareOp.GreaterEqual)
    assert(CompareOp.fromString("GREATER_EQUAL") == CompareOp.GreaterEqual)
    assert(CompareOp.fromString("=") == CompareOp.Equal)
    assert(CompareOp.fromString("NOT_EQUAL") == CompareOp.NotEqual)
  }
}
