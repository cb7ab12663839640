package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout keys for multi-dimensional locality (Z-order / Morton
  * curves): interleaving the bits of two clustering columns gives a single
  * sort key under which points close in BOTH dimensions land close in the
  * file order — so min/max row-group stats prune 2-D range predicates that
  * a single-column sort can only prune on its leading column.
  *
  * Everything is closed-form long bit-arithmetic (the classic
  * spread-with-masks ladder), identical in any engine — the DuckDB oracle
  * reproduces the keys bit-for-bit (q65). At scale: compute `mortonKey`,
  * `repartitionByRange` on it, `sortWithinPartitions`, write — standard
  * Z-order clustering without a table-format dependency.
  */
object Layout {

  /** Write `df` as a bucketed (and per-bucket sorted) managed parquet
    * table — the co-located-join layout: two fact tables bucketed by the
    * same key into the same bucket count join with ZERO shuffle on either
    * side, because each scan already reports the matching hash
    * partitioning. At 100 TB this turns every repeated orders⋈lineitem
    * into a local merge per bucket — the single biggest recurring-shuffle
    * eliminator Spark offers without a table-format dependency
    * (`BucketedJoinSpec` pins the no-Exchange plan). Sorting within
    * buckets additionally removes the per-side Sort of the merge join.
    *
    * Bucketed writes must go through the session catalog (`saveAsTable`)
    * — bucket metadata lives in the metastore, not the files. */
  def writeBucketed(
      df: org.apache.spark.sql.DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Spread the low 32 bits of a non-negative long across the even bit
    * positions of a 64-bit word (0b...b2b1b0 → 0b..0b2_0b1_0b0). */
  def spreadBits(c: Column): Column = {
    val m16 = lit(0x0000FFFF0000FFFFL)
    val m8 = lit(0x00FF00FF00FF00FFL)
    val m4 = lit(0x0F0F0F0F0F0F0F0FL)
    val m2 = lit(0x3333333333333333L)
    val m1 = lit(0x5555555555555555L)
    val x0 = c.bitwiseAND(lit(0xFFFFFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 16)).bitwiseAND(m16)
    val x2 = x1.bitwiseOR(shiftleft(x1, 8)).bitwiseAND(m8)
    val x3 = x2.bitwiseOR(shiftleft(x2, 4)).bitwiseAND(m4)
    val x4 = x3.bitwiseOR(shiftleft(x3, 2)).bitwiseAND(m2)
    x4.bitwiseOR(shiftleft(x4, 1)).bitwiseAND(m1)
  }

  /** Inverse of [[spreadBits]]: collect the even bit positions back into
    * the low 32 bits. */
  def unspreadBits(c: Column): Column = {
    val m1 = lit(0x5555555555555555L)
    val m2 = lit(0x3333333333333333L)
    val m4 = lit(0x0F0F0F0F0F0F0F0FL)
    val m8 = lit(0x00FF00FF00FF00FFL)
    val m16 = lit(0x0000FFFF0000FFFFL)
    val x0 = c.bitwiseAND(m1)
    val x1 = x0.bitwiseOR(shiftright(x0, 1)).bitwiseAND(m2)
    val x2 = x1.bitwiseOR(shiftright(x1, 2)).bitwiseAND(m4)
    val x3 = x2.bitwiseOR(shiftright(x2, 4)).bitwiseAND(m8)
    val x4 = x3.bitwiseOR(shiftright(x3, 8)).bitwiseAND(m16)
    x4.bitwiseOR(shiftright(x4, 16)).bitwiseAND(lit(0xFFFFFFFFL))
  }

  /** Morton (Z-order) key of two non-negative 31-bit coordinates: bits of
    * `a` on even positions, bits of `b` on odd. Result is a non-negative
    * long; ordering by it is the Z-curve traversal of the (a, b) grid. */
  def mortonKey(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** The (a, b) coordinates back out of a morton key. */
  def mortonDecode(key: Column): (Column, Column) =
    (unspreadBits(key), unspreadBits(shiftright(key, 1)))

  /** Spread the low 21 bits across every 3rd bit position (3-D ladder). */
  def spreadBits3(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0x1FFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 32)).bitwiseAND(lit(0x1F00000000FFFFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 16)).bitwiseAND(lit(0x1F0000FF0000FFL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 8)).bitwiseAND(lit(0x100F00F00F00F00FL))
    val x4 = x3.bitwiseOR(shiftleft(x3, 4)).bitwiseAND(lit(0x10C30C30C30C30C3L))
    x4.bitwiseOR(shiftleft(x4, 2)).bitwiseAND(lit(0x1249249249249249L))
  }

  /** Inverse of [[spreadBits3]]. */
  def unspreadBits3(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0x1249249249249249L))
    val x1 = x0.bitwiseOR(shiftright(x0, 2)).bitwiseAND(lit(0x10C30C30C30C30C3L))
    val x2 = x1.bitwiseOR(shiftright(x1, 4)).bitwiseAND(lit(0x100F00F00F00F00FL))
    val x3 = x2.bitwiseOR(shiftright(x2, 8)).bitwiseAND(lit(0x1F0000FF0000FFL))
    val x4 = x3.bitwiseOR(shiftright(x3, 16)).bitwiseAND(lit(0x1F00000000FFFFL))
    x4.bitwiseOR(shiftright(x4, 32)).bitwiseAND(lit(0x1FFFFFL))
  }

  /** Morton key of three non-negative 21-bit coordinates. */
  def mortonKey3(a: Column, b: Column, c: Column): Column =
    spreadBits3(a)
      .bitwiseOR(shiftleft(spreadBits3(b), 1))
      .bitwiseOR(shiftleft(spreadBits3(c), 2))

  /** The (a, b, c) coordinates back out of a 3-D morton key. */
  def mortonDecode3(key: Column): (Column, Column, Column) =
    (unspreadBits3(key),
      unspreadBits3(shiftright(key, 1)),
      unspreadBits3(shiftright(key, 2)))

  /** Spread the low 16 bits across every 4th position: the 2-D ladder
    * applied twice (even positions of even positions ≡ multiples of 4). */
  def spreadBits4(c: Column): Column =
    spreadBits(spreadBits(c.bitwiseAND(lit(0xFFFFL))))

  /** Morton key of four non-negative 16-bit coordinates. */
  def mortonKey4(a: Column, b: Column, c: Column, d: Column): Column =
    spreadBits4(a)
      .bitwiseOR(shiftleft(spreadBits4(b), 1))
      .bitwiseOR(shiftleft(spreadBits4(c), 2))
      .bitwiseOR(shiftleft(spreadBits4(d), 3))

  /** The coordinates back out of a 4-D morton key. */
  def mortonDecode4(key: Column): (Column, Column, Column, Column) =
    (unspreadBits(unspreadBits(key)),
      unspreadBits(unspreadBits(shiftright(key, 1))),
      unspreadBits(unspreadBits(shiftright(key, 2))),
      unspreadBits(unspreadBits(shiftright(key, 3))))

  /** Z-order-clustered parquet write: range-partition on the morton key of
    * the clustering columns, sort within each partition, write one file per
    * partition. Each file then covers a narrow z-range — i.e. a small
    * rectangle in (a, b) space — so parquet row-group min/max stats prune
    * multi-dimensional range predicates that a single-column sort can only
    * prune on its leading column. `LayoutSpec` ("z-order clustered files
    * prune a 2-D box predicate") measures the effect — scan-decoded rows,
    * clustered vs shuffled. */
  def writeClustered(
      df: org.apache.spark.sql.DataFrame,
      a: String,
      b: String,
      numFiles: Int,
      path: String): Unit =
    clusterByMorton(df, a, b, numFiles)
      .write.mode("overwrite").parquet(path)

  /** The clustering transform alone (the shared core of [[writeClustered]]
    * and the manifest optimizers): morton-keyed range partitions, sorted
    * within each, schema unchanged. The key column name is salted per call
    * so a user column can never collide and be silently replaced/dropped. */
  def clusterByMorton(
      df: org.apache.spark.sql.DataFrame,
      a: String,
      b: String,
      numFiles: Int): org.apache.spark.sql.DataFrame =
    clusterByMorton(df, Seq(a, b), numFiles)

  /** N-dimensional Morton re-cluster (2-4 columns — the interleave
    * ladders exist per arity; beyond 4-D the per-coordinate bit budget
    * drops below what range clustering can use). Same contract as the
    * 2-D form: rows sort by the interleaved key, range-partitioned into
    * `numFiles` output files, each covering a small hyper-rectangle of
    * the coordinate space. */
  def clusterByMorton(
      df: org.apache.spark.sql.DataFrame,
      cols: Seq[String],
      numFiles: Int): org.apache.spark.sql.DataFrame = {
    val key = cols.map(col) match {
      case Seq(a, b) => mortonKey(a, b)
      case Seq(a, b, c) => mortonKey3(a, b, c)
      case Seq(a, b, c, d) => mortonKey4(a, b, c, d)
      case other => sys.error(
        s"clusterByMorton: ${other.length} columns — the Morton " +
          "interleave supports 2 to 4")
    }
    val zc = "__z_" + java.util.UUID.randomUUID().toString.take(8)
    df.withColumn(zc, key)
      .repartitionByRange(numFiles, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
  }
}
