package graft

import graft.compile.RuleCompiler
import graft.exec.BatchExec
import graft.model._
import org.apache.spark.sql.functions._

/** P2/P3/D2/A1-A8 semantics at the expression level. */
class RuleCompilerSpec extends SparkSpec {
  import spark.implicits._

  lazy val df = Seq(
    ("00270", 10.0, "purchase"),
    ("270", 20.0, "purchase"),
    ("300", 30.0, "view"),
    ("301", 100.0, "view")
  ).toDF("carId", "speed", "etype")

  test("'=' is STRING equality — leading zeros matter (P2)") {
    val eq = RuleCompiler.filterPredicate(FilterSpec("carId", CompareOp.Equal, "00270"))
    assert(df.filter(eq).count() == 1)
    // numeric '>' compares as decimal: "00270" > 269 is true
    val gt = RuleCompiler.filterPredicate(FilterSpec("carId", CompareOp.Greater, "269"))
    assert(df.filter(gt).count() == 4)
  }

  test("all six comparison operators (P3)") {
    def n(op: CompareOp, v: String) =
      df.filter(RuleCompiler.filterPredicate(FilterSpec("speed", op, v))).count()
    assert(n(CompareOp.Greater, "20") == 2)
    assert(n(CompareOp.GreaterEqual, "20") == 3)
    assert(n(CompareOp.Less, "20") == 1)
    assert(n(CompareOp.LessEqual, "20") == 2)
    assert(n(CompareOp.NotEqual, "20") == 3)
    assert(n(CompareOp.Equal, "20.0") == 1) // string-eq against "20.0"
  }

  test("conjunction folds with AND; empty filter list = true") {
    val rule = Rule(queryId = Some(1), windowFilterRules = Seq(
      FilterSpec("etype", CompareOp.Equal, "view"),
      FilterSpec("speed", CompareOp.Greater, "50")))
    assert(df.filter(RuleCompiler.filterColumn(rule)).count() == 1)
    assert(df.filter(RuleCompiler.filterColumn(Rule(queryId = Some(2)))).count() == 4)
  }

  test("composite key string format (D2): {k=v;k2=v2} and {} for global") {
    val r = Rule(queryId = Some(1), groupingKeyNames = Seq("carId", "etype"))
    val keys = df.select(RuleCompiler.keyStringColumn(r)).as[String].collect()
    assert(keys.contains("{carId=00270;etype=purchase}"))
    val g = Rule(queryId = Some(1))
    assert(df.select(RuleCompiler.keyStringColumn(g)).as[String].head() == "{}")
  }

  test("aggregates: SUM/AVG/MIN/MAX/COUNT in exact decimal (A1-A6)") {
    def agg(t: AggregatorType): BigDecimal = {
      val rule = Rule(queryId = Some(1), aggregateFieldName = Some("speed"),
        aggregatorFunctionType = Some(t))
      BigDecimal(BatchExec.run(rule, df).select("agg_value").as[java.math.BigDecimal].head())
    }
    assert(agg(AggregatorType.Sum) == BigDecimal("160.000000"))
    assert(agg(AggregatorType.Avg) == BigDecimal("40.000000"))
    assert(agg(AggregatorType.Min) == BigDecimal("10.000000"))
    assert(agg(AggregatorType.Max) == BigDecimal("100.000000"))
    val cnt = Rule(queryId = Some(1), aggregateFieldName = Some(Rule.CountSentinel))
    assert(BigDecimal(BatchExec.run(cnt, df)
      .select("agg_value").as[java.math.BigDecimal].head()) == BigDecimal("4.000000"))
  }

  test("AVG rounding is HALF_UP at scale 6 regardless of partition order (A2)") {
    val d3 = Seq(1.0, 1.0, 0.0000005).toDF("v").repartition(3)
    val rule = Rule(queryId = Some(1), aggregateFieldName = Some("v"),
      aggregatorFunctionType = Some(AggregatorType.Avg))
    val got = BatchExec.run(rule, d3).select("agg_value").as[java.math.BigDecimal].head()
    // exact mean = 0.6666668333..., HALF_UP@6 = 0.666667
    assert(BigDecimal(got) == BigDecimal("0.666667"))
  }

  test("HAVING comparison (A8)") {
    val rule = Rule(queryId = Some(1), groupingKeyNames = Seq("etype"),
      aggregateFieldName = Some("speed"),
      aggregatorFunctionType = Some(AggregatorType.Sum),
      limitOperatorType = Some(CompareOp.Greater), limit = Some(BigDecimal(50)))
    val out = BatchExec.run(rule, df).select("etype").as[String].collect()
    assert(out.toSeq == Seq("view")) // view sum=130 > 50, purchase sum=30
  }
}
