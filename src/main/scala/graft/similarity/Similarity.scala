package graft.similarity

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `ARRAY<FLOAT>` embedding
  * column.
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    The query side is broadcast, so the big side streams through one
  *    scan with no shuffle of the corpus; cost O(|corpus|·|queries|·dim).
  *  - [[lshNearDupPairs]]: sign-bit LSH bucketing — the 100 TB scale
  *    path. Candidate pairs only form inside a bucket (expected bucket
  *    size |corpus|/2^bits), trading bounded recall for a ~4^bits
  *    reduction in pair count. Bucket skew is data-dependent; at scale,
  *    pair generation is keyed on the bucket id so AQE skew-join splitting
  *    applies.
  *
  * Scores are rounded to 4 decimals *before* ranking so that ordering (and
  * therefore top-k membership) is reproducible across engines; ties break
  * on vector id.
  */
object Similarity {

  def bruteForceTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val c = embeddings.select(col(idCol).as("vec_id"), col(vecCol).as("vec"))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(cosine(col("vec"), col("q_vec")), 4))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "cos")
  }

  def lshNearDupPairs(embeddings: DataFrame, bits: Int, minCosine: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val b = embeddings.select(col(idCol).as("sid"), col(vecCol).as("vec"),
      signBucket(col(vecCol), bits).as("bucket")).persist() // self-joined
    val l = b.select(col("sid").as("a_id"), col("vec").as("a_vec"), col("bucket"))
    val r = b.select(col("sid").as("b_id"), col("vec").as("b_vec"), col("bucket"))
    l.join(r, "bucket")
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", round(cosine(col("a_vec"), col("b_vec")), 4))
      .filter(col("cos") >= lit(minCosine))
      .select("a_id", "b_id", "cos")
  }
}
