package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted term index for conjunctive document lookup — the retrieval
  * side of a corpus store: one posting row per term holding the sorted
  * doc-id list, so "which documents contain ALL of these terms" costs the
  * query terms' postings, never a corpus scan.
  *
  * Scale shape: the build is TWO aggregates — a (term, df) pass first,
  * and postings collected ONLY for terms under the df cap, so no
  * `collect_list` ever materializes a stopword's posting list (uncapped,
  * "the" would collect the whole corpus into one row). Capped terms keep
  * their (term, df) row with NULL docs — the standard index-time stopword
  * policy: a term in more than `maxDf` docs carries ~zero selectivity and
  * a conjunctive query is answered by its other terms, but the row's
  * presence lets lookup distinguish "ubiquitous" from "absent from the
  * corpus". Lookups are a filter + explode over ≤ |terms| posting rows of
  * ≤ maxDf ids each — the driver never sees row data.
  *
  * Reference scope: the reference engine has no retrieval layer; this is
  * part of the §2.10 extension surface (tokenizer shared with
  * [[TextOps.tokens]], so index terms match every other text operator).
  */
object Index {

  /** Build posting lists over `docs`: `(term, df, docs)` with `docs` the
    * sorted ids of documents containing the term at least once
    * (within-doc duplicates collapse — postings are a SET per term), or
    * NULL for terms past the `maxDf` cap. NULL ids/texts contribute
    * nothing. */
  def buildPostings(docs: DataFrame, idCol: String, textCol: String,
      maxDf: Long): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1: $maxDf")
    val termDoc = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc"),
        explode(array_distinct(TextOps.tokens(col(textCol)))).as("term"))
      // global distinct, not just array_distinct: a doc stored as SEVERAL
      // rows (chunked ingest) must still contribute each term once, or df
      // overcounts and duplicate posting entries break the lookup's
      // hit-count gate
      .distinct()
      // lineage-recoverable cache, NOT localCheckpoint: the (term, doc)
      // relation is sized by the corpus' token-doc incidence, and
      // executor-local non-replicated checkpoint blocks would abort the
      // whole build on any executor loss at the 100 TB target — persist
      // spills to disk per executor and recomputes lost partitions from
      // the scan instead
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfs = termDoc.groupBy("term").agg(count(lit(1)).as("df"))
    // the semi-join keeps only capped terms' rows, so the collect_list
    // state is bounded by maxDf per term; AQE picks broadcast vs shuffle
    // for the keep-list by its actual size
    val listed = termDoc
      .join(dfs.filter(col("df") <= maxDf).select("term"), Seq("term"))
      .groupBy("term")
      .agg(sort_array(collect_list(col("doc"))).as("docs"))
    // materialize the INDEX itself (persisted — it exists to be probed
    // repeatedly) and release the corpus-incidence-sized scratch relation:
    // leaving termDoc pinned would leak one corpus-scale cache entry per
    // build for the life of the session. Callers that REBUILD an index
    // should unpersist the previous one.
    val postings = dfs.join(listed, Seq("term"), "left")
      .select("term", "df", "docs")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    postings.count()
    termDoc.unpersist()
    postings
  }

  /** Documents containing ALL `terms` (conjunctive AND), answered from
    * the posting rows alone. Per-term policy: a LISTED term must hit; a
    * CAPPED term (row with NULL docs) matches everything — it carried no
    * selectivity at build time; a term with NO row was never in the
    * corpus, so the result is empty. A query whose EVERY term is capped
    * has no selective anchor and also returns empty — postings alone
    * cannot enumerate "all documents"; answer that query with a scan.
    * Returns one sorted `doc` column. */
  def conjunctiveLookup(postings: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val distinctTerms = terms.distinct
    val hit = postings.filter(col("term").isin(distinctTerms: _*))
      .localCheckpoint() // ≤ |terms| rows; feeds the gate and the explode
    // one broadcast gate row: #terms found in the index (must be all of
    // them) and #listed terms (the hits a qualifying doc needs)
    val gate = hit.agg(
      count(lit(1)).as("__nt"),
      count_if(col("docs").isNotNull).as("__req"))
    hit.filter(col("docs").isNotNull)
      .select(explode(col("docs")).as("doc"))
      .groupBy("doc").agg(count(lit(1)).as("__hits"))
      .crossJoin(broadcast(gate))
      .filter(col("__nt") === distinctTerms.size &&
        col("__hits") === col("__req"))
      .select("doc")
      .orderBy("doc")
  }
}
