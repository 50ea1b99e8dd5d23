package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `ARRAY<FLOAT>` embedding columns, written
  * as higher-order `functions._` expressions (codegen'd; no UDF, no
  * driver-side math). Sums fold left-to-right in double precision.
  */
object VectorFunctions {

  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  /** Σ aᵢ·bᵢ — float inputs widened to double (a float×float product is
    * exactly representable in double). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(d(a), x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity — the codegen [[CosineSimilarity]] expression
    * (higher-order functions run on Catalyst's interpreted path; the
    * native expression stays inside whole-stage codegen). Bit-identical
    * to [[cosineHof]] (same element order, same widening) — asserted in
    * SimilaritySpec, so either form satisfies the oracles. */
  def cosine(a: Column, b: Column): Column = CosineSimilarity(a, b)

  /** The pure-`functions._` composition of [[cosine]] (kept as the
    * reference implementation the codegen expression is checked against). */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-bit LSH bucket over `bits` dimensions starting at `offset`
    * (0-based): a random-hyperplane sketch that uses the axis planes
    * (valid because the embedding dimensions are already independent);
    * 2^bits buckets. Vectors in the same bucket agree on `bits` signs, so
    * near-duplicate candidates collide with high probability while the
    * candidate-pair count drops by ~4^bits vs all-pairs. The `offset` lets
    * a caller derive several *independent* band hashes from disjoint
    * dimension ranges — the multi-band OR construction that buys recall
    * back without shrinking any single band's bucket count. */
  def signBucket(a: Column, bits: Int, offset: Int = 0): Column =
    (0 until bits).map { i =>
      when(element_at(a, offset + i + 1) > lit(0.0f), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
}
