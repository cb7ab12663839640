package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the dedup / text-analysis
  * operators. Everything here is built from codegen'd Spark SQL functions
  * (no UDFs), and every hash is *engine-agnostic*: `h60(s)` =
  * `int(md5(s)[:15], 16)` computes the identical 60-bit value in Spark
  * (`conv(substring(md5(s),1,15),16,10)`) and DuckDB
  * (`('0x'||substr(md5(s),1,15))::BIGINT`), which is what lets the driver's
  * oracle verify MinHash/SimHash/fingerprint results bit-for-bit.
  */
object TextOps {

  /** 60-bit engine-agnostic hash of a string column (non-negative).
    * Digest-direct codegen'd form; value-identical to
    * `conv(substring(md5(s),1,15),16,10)::long` (see [[graft.functions.H60]]). */
  def h60(c: Column): Column = graft.functions.H60.of(c)

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word 3-gram shingles of a token array (assumes ≥3 tokens). */
  def shingles3(toks: Column): Column =
    transform(
      sequence(lit(0), size(toks) - 3),
      i => concat_ws(" ",
        element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3)))

  /** Hashes of the shingle array. */
  def shingleHashes(sh: Column): Column = transform(sh, s => h60(s))

  /** MinHash signature of k affine permutations over an array of hashed
    * shingles (see [[graft.functions.MinHashSig]] for the closed-form
    * engine-agnostic permutation family). */
  def minhashSignature(hashedShingles: Column, k: Int): Column =
    graft.functions.MinHashSig.of(hashedShingles, k)

  /** LSH band keys for a MinHash signature: bands of `rowsPerBand` rows,
    * keyed by the comma-joined row values. Returns array of band-key strings;
    * band index is the array position. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => concat_ws(",",
        slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)).cast("array<string>")))

  /** 32-bit SimHash over token hashes: bit j is set when the ±1 vote sum of
    * the tokens' j-th hash bits is positive. Implemented as a SQL expression
    * so the shift amounts can be lambda variables (the Scala `shiftleft`
    * helper only takes literal shifts). `tokenHashesCol` must name an
    * array<bigint> column. */
  def simhash32(tokenHashesCol: String): Column =
    expr(
      s"""aggregate(sequence(0, 31), 0L, (acc, j) -> acc + if(
         |  aggregate($tokenHashesCol, 0L,
         |    (a, t) -> a + if(((t >> j) & 1) = 1, 1L, -1L)) > 0L,
         |  shiftleft(1L, j), 0L))""".stripMargin)

  /** Email pattern shared by Spark (java.util.regex) and DuckDB (RE2) —
    * restricted to syntax both engines interpret identically. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-style phone pattern (optional +1, separators - or .). */
  val PhoneRe = "\\+?1?[-. ]?\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}"

  /** PII scrub for training corpora: emails → `[EMAIL]`, phone numbers →
    * `[PHONE]`. Per-row, codegen'd, no UDF; patterns deliberately live in
    * the cross-engine regex subset so redaction is oracle-verifiable. */
  def redactPII(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "[EMAIL]"),
      PhoneRe, "[PHONE]")

  /** Count of pattern matches in a string column (cross-engine:
    * size(regexp_extract_all) ≡ DuckDB len(regexp_extract_all)). */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Exact Jaccard similarity of two array columns (on distinct elements). */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    val inter = size(array_intersect(da, db))
    (inter.cast("double") / (size(da) + size(db) - inter))
  }

  /** Content-defined chunking over `(doc_id, text)` rows: a token starts a
    * new chunk when the rolling `gram`-token hash ≡ 0 (mod `modulus`) —
    * boundaries depend only on local content, so an edit re-chunks O(1)
    * chunks while fixed-stride windows (q51) re-chunk the whole document.
    * Expected chunk length ≈ `modulus` tokens. The gram is sliced from the
    * kept token array at explode time (no lead-window passes); the only
    * window is the per-doc boundary cumsum, keyed by doc_id so chunking
    * parallelizes across documents. Output: one row per (doc_id, chunk_id)
    * with the token count and an order-pinned md5 fingerprint.
    */
  /** CCNet-style boilerplate line removal: drop every line whose exact
    * content recurs in at least `minDocs` DISTINCT documents (nav bars,
    * cookie banners, copyright footers — template residue that survives
    * doc-level dedup because each page's body differs), and reassemble
    * each document from its surviving lines in order.
    *
    * `docs` is `(doc_id, text)`; returns `(doc_id, text)` cleaned. Every
    * input doc_id survives — a document whose every line was boilerplate
    * comes back as the empty string, so downstream length/quality filters
    * see it instead of silently losing the row. Lines shorter than
    * `minLineLen` chars (default 1 = empty lines) are never removed:
    * structural blank lines are formatting, not boilerplate.
    *
    * Scale shape: the frequency pass shuffles only `(h60(line), doc_id)`
    * pairs — 16 bytes per line, never line bodies; the frequent set is
    * data-dependent but small by construction (its size is bounded by
    * total lines / minDocs), so AQE converts the anti-join to a runtime
    * broadcast when it fits. The input is scanned twice (count pass +
    * cut pass) — both scans are line-exploded projections of the same
    * column-pruned parquet read, cheaper at 100 TB than materializing the
    * exploded intermediate. Reassembly is one groupBy(doc_id) whose
    * collect_list order is made deterministic by sorting on the original
    * line position.
    */
  def removeBoilerplateLines(
      docs: org.apache.spark.sql.DataFrame,
      minDocs: Int,
      minLineLen: Int = 1): org.apache.spark.sql.DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = docs.select(col("doc_id"),
      posexplode(split(col("text"), "\n", -1)).as(Seq("pos", "line")))
    val frequent = lines
      .filter(length(col("line")) >= minLineLen)
      .select(h60(col("line")).as("h"), col("doc_id"))
      .groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("h")
    val kept = lines.join(frequent,
      h60(lines("line")) === frequent("h") &&
        length(lines("line")) >= minLineLen,
      "left_anti")
    val clean = kept.groupBy("doc_id").agg(
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")),
        "\n").as("text"))
    docs.select("doc_id").join(clean, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
  }

  /** C4-style line-and-page cleaning (Raffel et al. 2020 §2.2, the public
    * heuristics behind the C4 corpus): line level — keep only lines ending
    * in terminal punctuation (`.` `!` `?` `"`), with at least
    * `minLineWords` words, and not mentioning "javascript"; page level —
    * flag any page containing "lorem ipsum" or a curly brace, or left with
    * fewer than `minKeptLines` surviving lines. Returns
    * (doc_id, n_lines, n_kept, dropped, clean_text).
    *
    * Scale shape: entirely row-local array expressions
    * (`filter`/`array_join` over the line split) — ZERO shuffle, in
    * contrast with [[removeBoilerplateLines]]'s necessary corpus-frequency
    * aggregate; the content pass and the frequency pass compose. */
  def c4Clean(
      docs: org.apache.spark.sql.DataFrame,
      minLineWords: Int = 3,
      minKeptLines: Int = 1): org.apache.spark.sql.DataFrame = {
    val lines = split(col("text"), "\n", -1)
    val keepLine = (l: Column) =>
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
        l.endsWith("\"")) &&
        size(split(l, " ")) >= minLineWords &&
        !contains(lower(l), lit("javascript"))
    docs
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("kept_lines", filter(lines, keepLine))
      .withColumn("n_kept", size(col("kept_lines")).cast("long"))
      .withColumn("dropped",
        contains(lower(col("text")), lit("lorem ipsum")) ||
          contains(col("text"), lit("{")) ||
          col("n_kept") < minKeptLines.toLong)
      .select(col("doc_id"), col("n_lines"), col("n_kept"), col("dropped"),
        array_join(col("kept_lines"), "\n").as("clean_text"))
  }

  def cdcChunks(docs: org.apache.spark.sql.DataFrame, gram: Int = 4,
      modulus: Int = 32): org.apache.spark.sql.DataFrame = {
    require(gram >= 2 && modulus >= 2, "gram/modulus must be >= 2")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("pos")
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(col("toks")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos"), col("tok"),
        (col("pos") > 0 && col("pos") + (gram - 1) < size(col("toks")) &&
          pmod(h60(concat_ws(" ", slice(col("toks"), col("pos") + 1, lit(gram)))),
            lit(modulus)) === 0).as("b"))
      .withColumn("chunk_id", sum(col("b").cast("long")).over(w))
      .groupBy("doc_id", "chunk_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")))).as("chunk_md5"))
  }
}
