package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series join operators Spark's built-ins don't express directly —
  * composed from existing operators per the custom-operator preference
  * order (compose > custom Expression > custom plan node), so Catalyst
  * keeps optimizing around them.
  */
object Joins {

  /** As-of join: for each left row, attach the `valueCol` of the single
    * right row with the greatest `rightTs <= leftTs` within the same
    * `key` (ties at equal ts match — the `<=` convention of SQL ASOF
    * joins).
    *
    * Shape: union the two sides tagged (right sorts before left at equal
    * ts), then one `last(ignoreNulls)` running window per key — ONE hash
    * exchange on `key` + sort, zero row multiplication. The classic
    * alternative (range self-join + max-per-group) shuffles |L|·|R∩window|
    * rows; this shuffles |L|+|R| regardless of time density, which is the
    * shape that survives 100×. Skewed keys split fine: the window is a
    * running accumulator, so AQE-style partial ranges stay correct per
    * partition boundary only if keys are not split — same caveat as any
    * window function.
    *
    * Right rows must be unique per (key, ts) — pre-aggregate ties or the
    * matched value is undefined (the same caveat DuckDB's ASOF documents).
    * Left rows with no prior right row get NULL (left-asof semantics). */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, valueCol: String,
      out: String = "asof_value"): DataFrame = {
    val valueType = right.schema(valueCol).dataType
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .withColumn("__v", lit(null).cast(valueType))
    val r = right.select(
      col(key), col(rightTs).as("__ts"), lit(0).as("__tag"),
      col(valueCol).as("__v"))
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(out, last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .drop("__ts", "__tag", "__v")
  }

  /** Bloom-filter-pruned semi join — the runtime-filter pattern for
    * "big fact table, selective dim predicate" joins at 100 TB. A Bloom
    * filter over the dim keys (sized by `expectedItems`/`fpp`; a few MB
    * for millions of keys regardless of fact size) is built driver-side
    * and broadcast; the fact side drops non-matching rows *before* the
    * shuffle, so the exchange ships ~|matching| + fpp·|fact| rows instead
    * of |fact|. A left-semi join against the real dim keys then removes
    * the false positives, so the result is EXACTLY the plain semi join —
    * the filter only moves work, never changes the answer. (This is the
    * same shape Spark's own runtime row-group filtering uses; expressing
    * it explicitly keeps it under the caller's control and works for any
    * dim predicate, not just joins AQE happens to cover.)
    *
    * The `mightContain` probe is a deserialized-long UDF — off codegen,
    * but ~100 ns/row against the megabytes-per-row it saves the exchange.
    */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    val keys = dim.select(col(dimKey).as(factKey)).distinct()
    val bloom = keys.stat.bloomFilter(factKey, expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bloom)
    // the probe must match the filter's insert encoding BY TYPE — a
    // mistyped probe returns false, and a false NEGATIVE here silently
    // drops matching rows (the one failure a pruning step must never
    // have), so unsupported key types are rejected loudly
    val probe = fact.schema(factKey).dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        udf((k: Long) => bc.value.mightContainLong(k))
      case StringType =>
        udf((s: String) => s != null && bc.value.mightContainString(s))
      case dt => throw new IllegalArgumentException(
        s"bloomSemiJoin: unsupported key type ${dt.sql} for '$factKey' " +
          "(integral or string keys only)")
    }
    fact
      .filter(probe(col(factKey)))
      .join(keys, Seq(factKey), "left_semi")
  }

  /** Salted equi-join for skewed keys: the big side scatters each key
    * over `salt` sub-keys by a deterministic hash of the whole row, the
    * small side replicates into all `salt` sub-keys, and the join keys on
    * (key, salt). A hot key's rows land on `salt` reducers instead of
    * one, bounding the largest partition at ~1/salt of the hottest key —
    * the classic pre-AQE skew cure, still the right tool when skew is
    * known ahead of time (AQE's skew split only fires after a stage
    * materializes the skew). Row-content salting keeps the result
    * byte-identical to the plain join: every big-side row joins the same
    * small-side rows exactly once (the small side is replicated, so each
    * (key, salt) cell holds a full copy).
    *
    * `saltCols` picks which big-side columns feed the salt hash — name a
    * couple of cheap discriminating columns (a line number, a secondary
    * id). Defaulting to ALL columns would widen the fact scan to every
    * column just to compute the salt, silently defeating column pruning —
    * the dominant hidden cost at 100 TB scan widths — so the discriminator
    * set is explicit. Rows identical across `saltCols` share a sub-key;
    * spread follows the discriminators' cardinality within each hot key.
    *
    * Small-side cost is `salt × |small|` shuffle rows — size `salt` to
    * the skew ratio, not higher. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int, saltCols: Seq[String]): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(saltCols.nonEmpty, "name at least one salt discriminator column")
    val b = big.withColumn("__salt",
      pmod(xxhash64(saltCols.map(col): _*), lit(salt)))
    val s = small.withColumn("__salt",
      explode(array((0 until salt).map(i => lit(i)): _*)))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** EXECUTE a [[Layout.skewPlan]]: the plan→execution face of skew
    * handling (the q142→q144 compaction pattern applied to salting).
    * [[saltedJoin]] takes one caller-chosen factor and salts EVERY key;
    * this joins the diagnosis in, salting exactly the flagged keys at
    * exactly their planned per-key factor — unflagged keys pay nothing
    * (salt cell 0 on both sides, no replication), the hottest key's
    * rows spread over its own ⌈n/target⌉ cells, and the small side
    * replicates Σ(salt−1 over flagged keys) extra rows only. That
    * per-key sizing is what survives 100×: one global factor must
    * chase the hottest key and over-replicates the small side for
    * every other key, while the plan's factors grow only where the
    * data does.
    *
    * The plan is broadcast both times (it is broadcast-sized by
    * [[Layout.skewPlan]]'s construction — only over-budget keys are
    * emitted), so adding the plan costs zero exchanges: the big side's
    * salt column is computed map-side under the same hash-partitioned
    * join the plain equi-join would run. Row-content salting via
    * `saltCols` (see [[saltedJoin]] — explicit discriminators keep
    * column pruning intact) makes the result byte-identical to the
    * plain inner join: every big-side row meets each matching
    * small-side row exactly once, in exactly one (key, salt) cell.
    *
    * `plan` must be [[Layout.skewPlan]] output (key, …, salt) over a
    * sample/metadata of `big` keyed compatibly with `key`. */
  def applySkewPlan(big: DataFrame, small: DataFrame, key: String,
      plan: DataFrame, saltCols: Seq[String]): DataFrame = {
    require(saltCols.nonEmpty, "name at least one salt discriminator column")
    val factors = plan.select(col("key").as(key), col("salt").as("__sf"))
    val b = big
      .join(broadcast(factors), Seq(key), "left")
      .withColumn("__salt", when(col("__sf").isNull, lit(0L))
        .otherwise(pmod(xxhash64(saltCols.map(col): _*), col("__sf"))))
      .drop("__sf")
    val sm = small
      .join(broadcast(factors), Seq(key), "left")
      .withColumn("__salt",
        explode(expr("sequence(0L, coalesce(__sf, 1L) - 1L)")))
      .drop("__sf")
    b.join(sm, Seq(key, "__salt")).drop("__salt")
  }

  /** Range (interval) join: all (left, right) pairs with the same `key`
    * and `|leftTs − rightTs| <= gap`. Executed as a bucketed equi-join:
    * both sides bucket by `ts div gap`, the right side duplicates into
    * its bucket ± 1, and the join keys on (key, bucket) — every candidate
    * pair lands in exactly one joined bucket, the exact predicate prunes
    * after. Fan-out is a constant 3× of the right side instead of the
    * |L|·|R| cross product per key a naive theta-join plans, and the
    * shuffle is a hash exchange AQE can re-balance on skew. */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, gap: Long,
      rightCols: Seq[String]): DataFrame = {
    require(gap > 0, "gap must be positive")
    val l = left
      .withColumn("__l_ts", col(leftTs).cast("long"))
      .withColumn("__bucket", expr(s"__l_ts div ${gap}L"))
    val r = right.select(
      (col(key) +: col(rightTs).cast("long").as("__r_ts") +:
        rightCols.map(c => col(c).as(s"__r_$c"))): _*)
      .withColumn("__bucket", explode(array(
        expr(s"__r_ts div ${gap}L") - lit(1L),
        expr(s"__r_ts div ${gap}L"),
        expr(s"__r_ts div ${gap}L") + lit(1L))))
    l.join(r, Seq(key, "__bucket"))
      .filter(col("__r_ts") >= col("__l_ts") - lit(gap) &&
              col("__r_ts") <= col("__l_ts") + lit(gap))
      .drop("__bucket")
  }
}
