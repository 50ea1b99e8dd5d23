package graft

import graft.exec.ZOrder
import org.apache.spark.sql.functions._

/** Morton interleave correctness and the clustering property it buys:
  * range-partitioning on z yields per-partition bounding boxes far
  * tighter than a single-dimension sort — the min/max pruning win. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue matches hand-computed Morton codes") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y")), 16).as("z"))
    // morton(3,5): x bits at even positions (1+4), y bits at odd (2+32)
    assert(df.as[Long].collect().toSeq ==
      Seq(0L, 1L, 2L, 39L, (1L << 32) - 1))
  }

  test("z-clustering tightens per-partition bounding boxes vs a 1-D sort") {
    val r = new scala.util.Random(5)
    val pts = (1 to 4000).map(_ => (r.nextInt(256).toLong, r.nextInt(256).toLong))
    val df = pts.toDF("x", "y")
    def avgBoxPerimeter(clustered: org.apache.spark.sql.DataFrame): Double = {
      val boxes = clustered
        .withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("x") - min("x") + max("y") - min("y")).as("per"))
        .agg(avg("per")).as[Double].head()
      boxes
    }
    val zClustered = ZOrder.cluster(df, Seq(col("x"), col("y")),
      bits = 8, nPartitions = 16)
    val xSorted = df.repartitionByRange(16, col("x"))
    val zPer = avgBoxPerimeter(zClustered)
    val xPer = avgBoxPerimeter(xSorted)
    // a 1-D sort leaves y unconstrained (~255 per box); z bounds both dims
    assert(zPer < xPer * 0.7, s"z avg perimeter $zPer vs x-sort $xPer")
  }
}
