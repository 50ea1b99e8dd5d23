package graft.rules

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.model._

import scala.jdk.CollectionConverters._
import scala.util.{Failure, Success, Try}

/** JSON codec for [[graft.model.Rule]].
  *
  * Wire format matches the reference's Jackson binding of `rule/Rule.java`
  * (parse: `rule/RuleParser.java:29-35`, validation:
  * `rule/RuleDeserializer.java:28-40` — a rule without a `queryId` is
  * rejected unless it is a CONTROL command; malformed lines are dropped,
  * not failed). Built on jackson-databind's tree API (ships with Spark),
  * so the codec is usable both driver-side and inside executors.
  */
object RuleCodec {
  private val mapper = new ObjectMapper()

  /** Strict decode: throws on malformed input. */
  def decode(json: String): Rule = {
    val node = mapper.readTree(json)
    require(node != null && node.isObject, s"rule JSON is not an object: $json")
    val rule = fromNode(node)
    require(
      rule.queryId.isDefined || rule.queryState == QueryState.Control,
      s"rule must carry a queryId unless it is a CONTROL command: $json")
    rule
  }

  /** Lenient decode: malformed rules are dropped (reference
    * `RuleDeserializer.java:37-39` logs and drops). */
  def decodeOption(json: String): Option[Rule] =
    Try(decode(json)) match {
      case Success(r) => Some(r)
      case Failure(_) => None
    }

  def encode(rule: Rule): String = mapper.writeValueAsString(toNode(rule))

  private def fromNode(n: JsonNode): Rule = {
    def optNode(f: String): Option[JsonNode] =
      Option(n.get(f)).filterNot(_.isNull)
    def optLong(f: String) = optNode(f).map(_.asLong())
    def optText(f: String) = optNode(f).map(_.asText())

    Rule(
      queryId = optLong("queryId"),
      queryState = optText("queryState").map(QueryState.fromString)
        .getOrElse(QueryState.Active),
      windowFilterRules = optNode("windowFilterRules").toSeq
        .flatMap(_.elements().asScala)
        .map { f =>
          FilterSpec(
            field = f.get("field").asText(),
            operator = CompareOp.fromString(f.get("operator").asText()),
            value = f.get("value").asText())
        },
      groupingKeyNames = optNode("groupingKeyNames").toSeq
        .flatMap(_.elements().asScala).map(_.asText()),
      aggregateFieldName = optText("aggregateFieldName"),
      aggregatorFunctionType =
        optText("aggregatorFunctionType").map(AggregatorType.fromString),
      limitOperatorType = optText("limitOperatorType").map(CompareOp.fromString),
      limit = optNode("limit").map(v => BigDecimal(v.asText())),
      windowMilliseconds = optLong("windowMilliseconds"),
      frequencyMilliseconds = optLong("frequencyMilliseconds"),
      alertRules = optNode("alertRules").toSeq
        .flatMap(_.elements().asScala).map(fromNode),
      lastTime = optLong("lastTime"),
      activeTime = optLong("activeTime"),
      controlType = optText("controlType").map(ControlType.fromString),
      activeId = optLong("activeId")
    )
  }

  private def toNode(r: Rule): ObjectNode = {
    val o = mapper.createObjectNode()
    r.queryId.foreach(o.put("queryId", _))
    o.put("queryState", r.queryState.name)
    if (r.windowFilterRules.nonEmpty) {
      val arr = o.putArray("windowFilterRules")
      r.windowFilterRules.foreach { f =>
        val fo = arr.addObject()
        fo.put("field", f.field)
        fo.put("operator", f.operator.symbol)
        fo.put("value", f.value)
      }
    }
    if (r.groupingKeyNames.nonEmpty) {
      val arr = o.putArray("groupingKeyNames")
      r.groupingKeyNames.foreach(arr.add)
    }
    r.aggregateFieldName.foreach(o.put("aggregateFieldName", _))
    r.aggregatorFunctionType.foreach(a => o.put("aggregatorFunctionType", a.name))
    r.limitOperatorType.foreach(op => o.put("limitOperatorType", op.name))
    r.limit.foreach(l => o.put("limit", l.bigDecimal))
    r.windowMilliseconds.foreach(o.put("windowMilliseconds", _))
    r.frequencyMilliseconds.foreach(o.put("frequencyMilliseconds", _))
    if (r.alertRules.nonEmpty) {
      val arr: ArrayNode = o.putArray("alertRules")
      r.alertRules.foreach(c => arr.add(toNode(c)))
    }
    r.lastTime.foreach(o.put("lastTime", _))
    r.activeTime.foreach(o.put("activeTime", _))
    r.controlType.foreach(c => o.put("controlType", c.name))
    r.activeId.foreach(o.put("activeId", _))
    o
  }
}
