package graft

import org.apache.spark.sql.SparkSession

/** The SQL-function face: cosine_sim reachable from spark.sql via both
  * registration paths (live-session register and session-build
  * extensions). */
class GraftExtensionsSpec extends SparkSpec {

  test("register exposes cosine_sim to spark.sql on the live session") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((Array(3f, 4f), Array(3f, 4f)), (Array(1f, 0f), Array(0f, 1f)))
      .toDF("a", "b").createOrReplaceTempView("ext_vecs")
    val got = spark.sql("SELECT round(cosine_sim(a, b), 4) c FROM ext_vecs")
      .as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.0))
  }

  test("withExtensions(GraftExtensions) builds a session where SQL has the functions") {
    val orig = spark
    // a sibling session on the same SparkContext, built THROUGH the
    // extensions point — the cluster-conf deployment path
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import s2.implicits._
      Seq((Array(1f, 2f), Array(1f, 2f))).toDF("a", "b")
        .createOrReplaceTempView("ext_vecs2")
      val got = s2.sql("SELECT round(cosine_sim(a, b), 4) c FROM ext_vecs2")
        .as[Double].collect().toSeq
      assert(got == Seq(1.0))
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
