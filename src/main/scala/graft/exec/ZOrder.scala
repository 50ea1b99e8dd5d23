package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-column data-skipping layout:
  * interleaving the bits of several quantized dimensions gives a single
  * sort key under which rows close in EVERY dimension land close in the
  * file order, so per-file min/max statistics prune scans for predicates
  * on ANY of the dimensions (a plain sort only serves its leading
  * column). This is how large tables are laid out for multi-dimensional
  * query patterns at 100 TB; the operator here is the key computation +
  * the range-partitioned re-layout.
  *
  * [[zValue]] is a statically-unrolled integer expression — `bits × dims`
  * shift/mask/add terms, no loop, no UDF, fully codegen — and exact: the
  * result fits a long for `bits·dims ≤ 63`. Inputs must already be
  * non-negative integer ranks < 2^bits (quantize first: rank, bucket or
  * mask — the caller owns the quantizer, because its equi-depth vs
  * equi-width choice is data-dependent). */
object ZOrder {
  /** Interleaved Morton code: bit `i` of dimension `j` lands at position
    * `i·dims + j`. */
  def zValue(xs: Seq[Column], bits: Int): Column = {
    require(xs.nonEmpty && bits > 0 && bits * xs.size <= 63,
      "need 0 < bits*dims <= 63")
    val d = xs.size
    val terms = for {
      i <- 0 until bits
      (x, j) <- xs.zipWithIndex
    } yield shiftright(x.cast("long"), i).bitwiseAND(lit(1L)) *
      lit(1L << (i * d + j))
    terms.reduce(_ + _)
  }

  /** Re-layout `df` clustered by the z-value of the given dimension
    * columns: range partition on z (Spark samples the z distribution),
    * sort within partitions — every output file then covers a compact
    * z-range, i.e. a small hyper-rectangle of the dimension space, which
    * is exactly what min/max pruning needs. */
  def cluster(df: DataFrame, dims: Seq[Column], bits: Int,
      nPartitions: Int, zCol: String = "__z"): DataFrame =
    df.withColumn(zCol, zValue(dims, bits))
      .repartitionByRange(nPartitions, col(zCol))
      .sortWithinPartitions(zCol)
      .drop(zCol) // layout key is internal; partition order is the product
}
