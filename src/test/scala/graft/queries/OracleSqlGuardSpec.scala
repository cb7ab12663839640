package graft.queries

import graft.SparkEntry
import org.scalatest.funsuite.AnyFunSuite

/** Static guards over the oracle SQL — the regression class that shipped
  * round 1's only red row (q13: one un-cast window `SUM` → DuckDB HUGEINT →
  * pandas float64 → driver hash mismatch while values were equal).
  *
  * Rules encoded from COVERAGE.md "Cross-engine determinism rules":
  *  - every DuckDB `SUM(`/`sum(` must sit inside a `CAST(... AS BIGINT/
  *    DOUBLE)` (HUGEINT never reaches the driver's dataframe hash);
  *  - no bare `/` between plain integer aggregates (DuckDB `/` yields
  *    DOUBLE, Spark integer `/` yields DOUBLE too, but `//` vs `DIV`
  *    truncation must be deliberate — so int division must use `//`);
  *  - no raw timestamp emission (`SELECT ... ts` without CAST/epoch).
  */
class OracleSqlGuardSpec extends AnyFunSuite {

  private def sqls: Map[String, String] = SparkEntry.oracleSql

  test("every SUM in every oracle SQL is explicitly CAST (HUGEINT guard)") {
    val offenders = sqls.flatMap { case (name, sql) =>
      var bad = List.empty[String]
      val upper = sql.toUpperCase
      var idx = upper.indexOf("SUM(")
      while (idx >= 0) {
        // word boundary: exclude per-row list folds like list_sum(
        val isAggregate = idx == 0 || !(upper(idx - 1).isLetterOrDigit || upper(idx - 1) == '_')
        if (!isAggregate) { idx = upper.indexOf("SUM(", idx + 1) }
        else {
          // covered iff ANY earlier CAST( is still paren-open at this SUM
          // (checking only the lexically nearest CAST false-flags the
          // nested shape CAST(CAST(a AS BIGINT) + SUM(c) AS DOUBLE))
          val prefix = upper.substring(0, idx)
          val covered = Iterator.iterate(prefix.indexOf("CAST("))(p =>
              prefix.indexOf("CAST(", p + 1))
            .takeWhile(_ >= 0)
            .exists { castAt =>
              val between = prefix.substring(castAt + 5)
              between.count(_ == '(') >= between.count(_ == ')')
            }
          if (!covered) bad ::= s"$name @char $idx"
          idx = upper.indexOf("SUM(", idx + 1)
        }
      }
      bad
    }
    assert(offenders.isEmpty,
      s"un-CAST SUM in oracle SQL (DuckDB HUGEINT → float64 hash trap): $offenders")
  }

  test("oracle SQL never emits a raw timestamp column") {
    // the parquet ts columns are NANOS; any direct emission hash-mismatches.
    // every `ts`/`o_orderdate`/`l_shipdate` use must be wrapped (CAST/epoch/
    // datediff/date_trunc) — heuristic: the token never follows 'SELECT ' or
    // ', ' bare at top level. Cheap proxy: forbid the exact fragments that
    // would project them raw.
    val raw = Seq("SELECT ts,", "SELECT ts ", ", ts,", ", ts ")
    val offenders = sqls.collect {
      case (name, sql) if raw.exists(sql.contains) => name
    }
    assert(offenders.isEmpty, s"raw timestamp projection: $offenders")
  }

  test("every query name has matching queries and oracleSql keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle SQL without a query: ${o -- q}")
    assert((q -- o).isEmpty,
      s"queries without oracle SQL (none allowed since q28 gained its " +
        s"within_tol oracle): ${q -- o}")
  }
}
