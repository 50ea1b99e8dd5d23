package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared similarity-preserving corpus replication for the scale
  * probes ([[ScaleBench]] in-memory, [[MaterializedScaleBench]]
  * on-disk): each document copy gets a distinct vowel-substitution
  * alphabet, so copies of one document share almost no shingles and the
  * near-duplicate structure within each copy matches the original
  * corpus — naive duplication would grow the pair space quadratically
  * by construction and measure the input, not the operator. */
object ScaleCorpus {
  val Alphabets: Vector[String] = Vector(
    "aeiou", "bcdfg", "hjklm", "npqrs", "tvwxy",
    "zbcdf", "eghij", "kmnop", "qrstu", "vwxyz",
    "abcde", "fghij", "klmno", "pqrst", "uvwxy", "zabcd",
    // extension to 32 distinct substitutions for the 30× decade probe —
    // same property as the first 16: each copy's vowel mapping differs
    // from every other copy's, so cross-copy shingle collisions stay
    // negligible and the pair space grows linearly, not quadratically
    "bdfhj", "cegik", "lnprt", "mosuw", "vxzbd",
    "cfilo", "drugx", "egjmp", "hkntw", "iqyce",
    "jslvz", "kotxb", "lpuyd", "mqvze", "nrwaf", "osbgh")

  /** Offsets applied to replicated ids; real ids must stay below them
    * or replicas would collide and corrupt the measured ratio. */
  val IdOffset = 10000000L
  val EventIdOffset = 100000000L
  val UserIdOffset = 1000000L

  private def guardMaxId(df: DataFrame, idCol: String, offset: Long): Unit = {
    val maxId = df.agg(max(idCol)).head().getLong(0)
    require(maxId < offset,
      s"$idCol $maxId >= $offset: replica ids would collide")
  }

  def docsAt(spark: SparkSession, dir: String, k: Int): DataFrame = {
    require(k >= 1 && k <= Alphabets.size, s"k in 1..${Alphabets.size}")
    // FULL schema (lang, n_chars carried through — translate() is
    // length-preserving so n_chars stays true of the mutated text):
    // the full-suite 10× run reads every column the contract queries
    // do, not just the probe trio's
    val d0 = graft.sources.Tables.load(spark, dir, "documents")
    if (k > 1) guardMaxId(d0, "doc_id", IdOffset)
    (0 until k).map(i => d0
      .withColumn("doc_id", col("doc_id") + lit(i.toLong * IdOffset))
      .withColumn("text", translate(col("text"), "aeiou", Alphabets(i))))
      .reduce(_ unionByName _)
  }

  /** Similarity-preserving embedding replication: copy i's vectors get
    * a cyclic DIMENSION shift of 5·i (distinct mod the 64-dim space for
    * every probe factor; 5 is coprime with 64). Cosine is invariant
    * under any fixed permutation applied to both vectors, so each
    * copy's internal near-dup structure matches the original corpus
    * exactly, while cos(v, shift(v)) across copies is the lag
    * autocorrelation of a random-ish vector — ~0. Naive duplication
    * would make every replica an exact near-dup of its original
    * (cos = 1) and grow the verified-pair space quadratically by
    * construction. */
  def embeddingsAt(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val e0 = graft.sources.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding", "label")
    if (k > 1) guardMaxId(e0, "vec_id", IdOffset)
    // shift modulus derived from the corpus's actual dimension, not a
    // hardcoded 64 (ADVICE r13): on a different-dim corpus a fixed mod
    // could exceed the vector length (invalid slices) or repeat
    // (replicas become exact dups — the case this scheme exists to
    // avoid). Shifts 5i mod dim are pairwise distinct iff
    // k ≤ dim / gcd(5, dim); enforce it.
    val dim = e0.select(size(col("embedding"))).head().getInt(0)
    require(k.toLong <= dim / BigInt(5).gcd(BigInt(dim)).toLong,
      s"factor $k would repeat a dimension shift at dim=$dim: " +
        "replicas would be exact duplicates")
    (0 until k).map { i =>
      val s = (5 * i) % dim
      val shifted =
        if (s == 0) col("embedding")
        else concat(
          slice(col("embedding"), lit(s + 1), size(col("embedding")) - lit(s)),
          slice(col("embedding"), lit(1), lit(s)))
      e0.select(
        (col("vec_id") + lit(i.toLong * IdOffset)).as("vec_id"),
        shifted.as("embedding"), col("label"))
    }.reduce(_ unionByName _)
  }

  def eventsAt(spark: SparkSession, dir: String, k: Int): DataFrame = {
    // full schema: ts/event_type/props replicate verbatim — replica
    // users are disjoint (offset ids), so sharing timestamps adds
    // parallel per-user timelines, never cross-copy state
    val e0 = graft.sources.Tables.load(spark, dir, "events")
    if (k > 1) { // same collision guard as docsAt, for both replicated ids
      guardMaxId(e0, "event_id", EventIdOffset)
      guardMaxId(e0, "user_id", UserIdOffset)
    }
    (0 until k).map(i => e0
      .withColumn("event_id", col("event_id") + lit(i.toLong * EventIdOffset))
      .withColumn("user_id", col("user_id") + lit(i.toLong * UserIdOffset)))
      .reduce(_ unionByName _)
  }
}
