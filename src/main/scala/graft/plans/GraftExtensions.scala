package graft.plans

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so
  * `spark.sql("SELECT extract_price(p) ...")` works next to the Column API.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (or `withExtensions` in code). This is the supported seam for shipping
  * engine extensions — no Spark internals are patched.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // top-k-per-key: optimizer rewrite of Filter(row_number <= k, Window)
    // plus the strategy that plans the substituted logical node
    ext.injectOptimizerRule(_ => TopKRewriteRule)
    ext.injectPlannerStrategy(_ => new TopKStrategy)
    // rewrite of pure range-predicate inner joins into the binned equi-join
    // form; graft.rangejoin.binWidth pins/disables, default auto-derives.
    // The rule is session-bound so auto derivation runs on the session that
    // owns the plan, never SparkSession.active.
    ext.injectOptimizerRule(session => new RangeJoinRule(session))
    // table-maintenance statements (VACUUM / OPTIMIZE / DESCRIBE HISTORY
    // over a quoted path) — a delegating parser: everything else goes to
    // Spark's own parser verbatim
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // RENAME COLUMN read-side: expand relations of renamed tables into
    // per-physical-name group scans (see RenameExpandRule) after
    // resolution — the un-expanded scan refuses to run, so sessions
    // without this rule are loud, never wrong
    ext.injectPostHocResolutionRule(session => RenameExpandRule(session))
    // table-valued functions: the manifest protocol's CDC and audit
    // surfaces as relations SQL can compose over (join, filter, insert
    // elsewhere) — `SELECT * FROM graft_table_changes('t', 1, 3)`
    GraftTableFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectTableFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name,
          usage, ""),
        builder))
    }
  }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** Arity guard — positional args(i) on a short Seq would otherwise throw
    * an IndexOutOfBoundsException with no function name. */
  private def arity(fn: String, n: Int, args: Seq[Expression]): Seq[Expression] = {
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n argument(s), got ${args.length}")
    args
  }

  /** Evaluate a foldable int parameter (k/n/bits/dim) with a real error
    * message — `eval().asInstanceOf[Int]` would throw an opaque CCE on a
    * BIGINT literal and crash on non-foldable arguments. */
  private def intArg(fn: String, pos: Int, e: Expression): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be a literal integer")
    e.eval() match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be a literal integer, got $other")
    }
  }

  /** (name, info, builder) triples for every registered SQL function. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("extract_price",
      info("extract_price",
        "extract_price(str) - last $-delimited token as float, else 0.0"),
      (args: Seq[Expression]) => ExtractPrice(arity("extract_price", 1, args).head)),
    ("cosine_sim",
      info("cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two array<double>"),
      (args: Seq[Expression]) => { arity("cosine_sim", 2, args); CosineSim(args(0), args(1)) }),
    ("dot_product",
      info("dot_product", "dot_product(a, b) - dot product of two array<double>"),
      (args: Seq[Expression]) => { arity("dot_product", 2, args); Dot(args(0), args(1)) }),
    ("h60",
      info("h60", "h60(str) - engine-agnostic 60-bit md5 hash"),
      (args: Seq[Expression]) => H60(arity("h60", 1, args).head)),
    ("minhash_sig",
      info("minhash_sig",
        "minhash_sig(hashed_shingles, k) - k-permutation MinHash signature"),
      (args: Seq[Expression]) => { arity("minhash_sig", 2, args)
        MinHashSig(args(0), intArg("minhash_sig", 1, args(1))) }),
    ("ngram_hashes",
      info("ngram_hashes", "ngram_hashes(tokens, n) - hashed word n-grams"),
      (args: Seq[Expression]) => { arity("ngram_hashes", 2, args)
        NgramHashes(args(0), intArg("ngram_hashes", 1, args(1))) }),
    ("lsh_bucket",
      info("lsh_bucket",
        "lsh_bucket(v, bits, dim) - sign-bit LSH bucket id for array<double>"),
      (args: Seq[Expression]) => { arity("lsh_bucket", 3, args)
        LshBucket(args(0),
          intArg("lsh_bucket", 1, args(1)), intArg("lsh_bucket", 2, args(2))) }),
    ("simhash32",
      info("simhash32",
        "simhash32(token_hashes) - 32-bit SimHash over array<bigint>"),
      (args: Seq[Expression]) => SimHash32(arity("simhash32", 1, args).head)),
    ("jaro_winkler",
      info("jaro_winkler",
        "jaro_winkler(a, b) - Jaro-Winkler similarity (DuckDB-compatible conventions)"),
      (args: Seq[Expression]) => { arity("jaro_winkler", 2, args)
        JaroWinkler(args(0), args(1)) }),
    ("nfc_normalize",
      info("nfc_normalize",
        "nfc_normalize(s) - Unicode NFC canonical composition (DuckDB-compatible)"),
      (args: Seq[Expression]) => NfcNormalize(arity("nfc_normalize", 1, args).head)))

  /** Imperative registration on an existing session (same builders). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, i, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), i, builder)
    }
}
