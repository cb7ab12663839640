package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-profiling statistics computed in ONE scan — the numeric-column
  * relationship report of a data card. Where [[Pca]] ships float Gram
  * moments for the eigensolve, these ops are integer-exact end to end so a
  * SQL oracle reproduces them bit-for-bit.
  */
object Stats {

  /** Pearson correlation matrix over integer-valued derived columns in a
    * single pass: one global aggregate collapses the corpus to the
    * d + d + d·(d−1)/2 moment sums (Σx, Σx², Σxy — all exact longs, so
    * the shuffle-free map-side combine is order-independent), then every
    * pairwise correlation is computed from that ONE row with an identical
    * IEEE expression shape on both engines and rounded once to 6dp.
    *
    * Scale shape: zero joins, zero row-level shuffle — the only exchange
    * is the final 1-row aggregate merge; state is O(d²) numbers however
    * large the input. Caller must supply columns whose derived long values
    * keep Σx·y < 2⁶³ (cents/dollars-scale integers are fine to ~1e9 rows).
    *
    * `cols` maps output names to integer-valued derivations (e.g.
    * `round(price)`); names must be distinct. Output: one row per
    * unordered pair `(col_x, col_y, n, corr)` in listed-order pairs. */
  def corrMatrix(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.map(_._1).distinct.size == cols.size, "names must be distinct")
    val names = cols.map(_._1)
    val base = df.select(cols.map { case (n, c) =>
      c.cast("long").as(s"__$n") }: _*)
    val pairsIdx =
      for { i <- names.indices; j <- i + 1 until names.size } yield (i, j)
    val aggs =
      names.map(n => sum(col(s"__$n")).as(s"s_$n")) ++
        names.map(n => sum(col(s"__$n") * col(s"__$n")).as(s"ss_$n")) ++
        pairsIdx.map { case (i, j) =>
          sum(col(s"__${names(i)}") * col(s"__${names(j)}"))
            .as(s"sp_${names(i)}_${names(j)}")
        }
    val m = base.agg(count(lit(1)).as("n"), aggs: _*)

    val nD = col("n").cast("double")
    def corrOf(x: String, y: String): Column =
      round((nD * col(s"sp_${x}_$y") - col(s"s_$x").cast("double") * col(s"s_$y"))
        / sqrt((nD * col(s"ss_$x") - col(s"s_$x").cast("double") * col(s"s_$x"))
          * (nD * col(s"ss_$y") - col(s"s_$y").cast("double") * col(s"s_$y"))), 6)
    val pairs = pairsIdx.map { case (i, j) =>
      struct(lit(names(i)).as("col_x"), lit(names(j)).as("col_y"),
        corrOf(names(i), names(j)).as("corr"))
    }
    m.select(col("n"), explode(array(pairs: _*)).as("p"))
      .select(col("p.col_x"), col("p.col_y"), col("n"), col("p.corr"))
      .orderBy("col_x", "col_y")
  }
}
