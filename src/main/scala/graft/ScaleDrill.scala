package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Graph

/** Scale-up drill: materialize an N× copy of the sf tables and time one
  * representative workload per operator family at 1× and N×, printing one
  * JSON line of `{family: {base_s, scaled_s, ratio}}`.
  *
  * This is the empirical check behind every "would this survive 100×?"
  * claim in COVERAGE.md: a family whose ratio tracks N is shuffle/scan
  * bound and scales out by adding executors; a ratio well above N means a
  * super-linear term (candidate-pair blowup, skew, driver work) that a
  * bigger cluster will NOT fix. The N× corpus is not N identical copies —
  * ids/users are offset per copy so per-key density stays constant (the
  * realistic growth mode: more users, not deeper histories) and document
  * text is salted per copy so near-dup candidate volume grows with corpus
  * size, not quadratically with copy count.
  *
  * Run: `SPARK_GRAFT_SCALE=8 sbt "runMain graft.ScaleDrill"` (env:
  * `SPARK_GRAFT_SF_DIR`, `SPARK_GRAFT_CPUS` as in Bench).
  */
object ScaleDrill {

  /** `mult`× embedding corpus for scale/recall drills: per-copy
    * pseudo-random SIGN scramble — cos(s∘a, s∘b) = cos(a, b) within a copy
    * (s_j² = 1), while cross-copy cosines collapse to ≈ 0 — so near-dup
    * pair volume grows linearly with corpus size instead of quadratically
    * with copy count (mirrors the per-copy doc-text salt). vec_ids are
    * offset per copy. */
  def scrambledEmbeddings(emb: DataFrame, mult: Int): DataFrame =
    (0 until mult).map { i =>
      emb.withColumn("vec_id", col("vec_id") + lit(i.toLong * 1000000000000L))
        .withColumn("embedding", transform(col("embedding"), (x, j) =>
          (x * when((pmod(lit(1103515245L) * (lit(i.toLong * 64L) + j)
              + 12345L, lit(2001L))) >= 1000L, 1.0f).otherwise(-1.0f))
            .cast("float")))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE", "8").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    require(mult >= 2, s"SPARK_GRAFT_SCALE must be >= 2: $mult")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scratch = Files.createTempDirectory("graft-scale").toString
    // an N× corpus is multiple GB — never leave it behind in /tmp
    try runDrill(spark, sfDir, mult, scratch)
    finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(scratch))
      spark.stop()
    }
  }

  private def runDrill(spark: SparkSession, sfDir: String, mult: Int,
      scratch: String): Unit = {
    import spark.implicits._

    // ---- N× corpus, written to parquet so scans are real scans --------
    def copies(base: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until mult).map(i => shift(base, i)).reduce(_ unionByName _)

    val events = Tables.load(spark, sfDir, "events")
    copies(events) { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i.toLong * 1000000000000L))
        .withColumn("user_id", col("user_id") + lit(i.toLong * 1000000000L))
        .withColumn("ts", col("ts") + expr(s"INTERVAL $i DAYS"))
    }.write.mode("overwrite").parquet(s"$scratch/events")

    val docs = Tables.load(spark, sfDir, "documents")
    copies(docs) { (df, i) =>
      df.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000000000L))
        .withColumn("text", concat(lit(s"c$i "), col("text")))
    }.write.mode("overwrite").parquet(s"$scratch/documents")

    val emb = Tables.load(spark, sfDir, "embeddings")
    ScaleDrill.scrambledEmbeddings(emb, mult)
      .write.mode("overwrite").parquet(s"$scratch/embeddings")

    val li = Tables.load(spark, sfDir, "lineitem")
    copies(li) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 1000000000L))
    }.write.mode("overwrite").parquet(s"$scratch/lineitem")

    // ---- one workload per family; every computed column feeds the final
    // aggregate so column pruning can't hollow the measurement out ------
    def evDf(dir: String) = spark.read.parquet(s"$dir/events")
    def docDf(dir: String) = spark.read.parquet(s"$dir/documents")
    def embDf(dir: String) = spark.read.parquet(s"$dir/embeddings")
    def liDf(dir: String) = spark.read.parquet(s"$dir/lineitem")
    val baseAs = {
      // the 1× side reads the SAME layout as the N× side (rewritten
      // parquet under scratch), so the ratio compares data volume only
      val b = s"$scratch/base"
      events.write.mode("overwrite").parquet(s"$b/events")
      docs.write.mode("overwrite").parquet(s"$b/documents")
      emb.write.mode("overwrite").parquet(s"$b/embeddings")
      li.write.mode("overwrite").parquet(s"$b/lineitem")
      b
    }
    // manifest-tracked twin of events on both sides, id-clustered files
    // (range partitioning keeps each file a narrow id band — the layout
    // optimizeZOrder produces — so footer stats can actually prune)
    val nParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    Seq(baseAs, scratch).foreach { d =>
      spark.read.parquet(s"$d/events")
        .repartitionByRange(nParts, col("event_id"))
        .write.mode("overwrite").parquet(s"$d/events_tracked")
      graft.ops.TableManifest.init(spark, s"$d/events_tracked")
      graft.ops.TableManifest.analyze(
        spark, s"$d/events_tracked", Seq("event_id"))
      // HIVE-PARTITIONED twin: 16 partitions on pmod(event_id, 16) — the
      // copy shift (i · 10^12) is divisible by 16, so every copy lands in
      // the SAME 16 partitions and each partition grows with the corpus.
      // Within a partition the range-repartition keeps files id-banded,
      // so committed stats can confine a band-scoped rewrite to ~one file
      // per scale (the partitioned_update flatness claim).
      spark.read.parquet(s"$d/events")
        .withColumn("part", pmod(col("event_id"), lit(16L)))
        .repartitionByRange(nParts, col("event_id"))
        .write.partitionBy("part").mode("overwrite")
        .parquet(s"$d/events_part")
      graft.ops.TableManifest.init(spark, s"$d/events_part")
      graft.ops.TableManifest.analyze(
        spark, s"$d/events_part", Seq("event_id"))
    }
    // manifest_commit fixture: a tracked table whose FILE COUNT scales
    // with the corpus (64 per 1×) — the round-15 drill pins the
    // log-structured commit protocol at N× FILE count, not row count
    Seq((baseAs, 64), (scratch, 64 * mult)).foreach { case (d, nf) =>
      spark.read.parquet(s"$d/events").repartition(nf)
        .write.mode("overwrite").parquet(s"$d/events_files")
      graft.ops.TableManifest.init(spark, s"$d/events_files")
    }

    // canonical (a < b) part-co-purchase edges of the copy-disjoint graph
    // (see the iterated-graph families below for the shape rationale)
    def copartEdges(dir: String): DataFrame = {
      val l = liDf(dir).select(col("l_orderkey").as("k"),
        (col("l_partkey") +
          expr("l_orderkey DIV 1000000000") * lit(10000000L)).as("p"))
      val x = l.select(col("k"), col("p").as("pa"))
      val y = l.select(col("k"), col("p").as("pb"))
      x.join(y, "k").where(col("pa") < col("pb"))
        .select(col("pa").as("a"), col("pb").as("b")).distinct()
    }

    val families: Seq[(String, String => DataFrame)] = Seq(
      "scan_agg" -> { dir: String =>
        evDf(dir).groupBy(to_date(col("ts")).as("d"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum("value").as("sv"))
          .agg(count(lit(1)).as("groups"), sum("n").as("rows"), sum("sv").as("v"))
      },
      "window_fn" -> { dir: String =>
        val w = Window.partitionBy("user_id").orderBy("ts")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        evDf(dir).withColumn("run", sum("value").over(w))
          .agg(sum("run").as("s"), max("run").as("m"))
      },
      "interval_join" -> { dir: String =>
        graft.queries.ExtQueries.intervalPairs(
            evDf(dir).select(col("user_id"), col("event_type"),
              unix_micros(col("ts")).as("us")))
          .agg(count(lit(1)).as("pairs"), min(col("pus") - col("vus")).as("d"))
      },
      "fact_join_agg" -> { dir: String =>
        val l = liDf(dir).select(col("l_orderkey").as("k"),
          col("l_quantity").cast("long").as("q"))
        val r = liDf(dir).select(col("l_orderkey").as("k"),
          col("l_linenumber").cast("long").as("ln"))
        l.join(r, "k").agg(count(lit(1)).as("n"), sum(col("q") * col("ln")).as("s"))
      },
      "minhash_dedup" -> { dir: String =>
        graft.ops.Dedup.minhashPairs(docDf(dir).select("doc_id", "text"))
          .agg(count(lit(1)).as("pairs"))
      },
      "ann_topk" -> { dir: String =>
        val vs = embDf(dir).select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
        val probes = vs.filter(col("vec_id") < 5)
          .withColumnRenamed("vec_id", "query_id").withColumnRenamed("v", "q")
        graft.ops.Similarity.bruteTopK(vs, probes, 5)
          .agg(count(lit(1)).as("n"), sum("sim").as("s"))
      },
      // as-of join family: union + one window pass per key — per-user
      // history is constant across copies (the id offsets), so the ratio
      // must track data volume like window_fn, never blow up on the union
      "asof_join" -> { dir: String =>
        val ev = evDf(dir).select(col("user_id"),
          unix_micros(col("ts")).as("us"), col("event_id"))
        val right = ev.filter(col("event_id") % 5 === 0)
          .select(col("user_id"), col("us"), col("event_id").as("rid"))
        graft.ops.AsOfJoin.latestPreceding(ev, right, "user_id", "us", "rid")
          .agg(count(lit(1)).as("n"), count(col("asof_id")).as("matched"))
      },
      // banded near-dup: the one pair-generator previously without a
      // measured ratio. Adaptive bandBits caps expected bucket occupancy,
      // so candidate volume — and wall time — must track n, not n²; the
      // per-copy sign scramble above keeps true pair volume linear too
      "banded_neardup" -> { dir: String =>
        val vs = embDf(dir).select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
        graft.ops.Similarity.bandedNearDupPairs(vs, 0.9)
          .agg(count(lit(1)).as("pairs"), sum("sim").as("s"))
      },
      "text_quality" -> { dir: String =>
        graft.ops.TextStats.quality(docDf(dir).select("doc_id", "text"))
          .agg(sum("score_ppm").as("s"), count(lit(1)).as("n"))
      },
      // low-cardinality grouped running sum (the budget-selection shape):
      // ~20 sources would cap a naive partitionBy window at 20 tasks
      // forever; the bucketed groupedPrefixSum path must instead track
      // data volume like any scan+bounded-shuffle job
      "token_budget" -> { dir: String =>
        val d = docDf(dir).select(col("source"), col("doc_id"),
          (length(col("text")) -
            length(expr("replace(text, ' ', '')")) + 1)
            .cast("long").as("tok"))
        graft.ops.Sampling.budgetSelect(
            d.withColumn("neg_tok", -col("tok")),
            "source", "neg_tok", "doc_id", "tok", budget = 100000L)
          .agg(count(lit(1)).as("n"), sum("tok").as("s"))
      },
      // n×d → d² moments reduction: corpus size must appear only in the
      // scan — the shipped state is O(d²) per partition regardless of n
      "pca_moments" -> { dir: String =>
        val m = graft.ops.Pca.moments(embDf(dir), "embedding", 16)
        import spark.implicits._
        Seq((m.n, m.sum.sum, m.gram.sum)).toDF("n", "s", "g")
      },
      // privacy-audit family: one map-side-combined groupBy over the QI
      // pair + an O(#classes) one-row profile — must track data volume
      // like any aggregate, never blow up on class count
      "privacy_audit" -> { dir: String =>
        graft.ops.Audit.kAnonymity(
          evDf(dir).select(col("user_id"), col("event_type")),
          Seq("user_id", "event_type"), 10L)
      },
      // inverted-index family: two aggregates (df pass, capped postings)
      // + a conjunctive lookup answered from posting rows. The cap is
      // deliberately set ABOVE every term's df (= the doc count) so the
      // lookup explodes real postings at every scale — a fixed production
      // cap would capped-out both query terms on the N× corpus and the
      // lookup half would measure an empty short-circuit; this family
      // times the worst-case posting growth instead
      "inverted_index" -> { dir: String =>
        val cap = docDf(dir).count()
        val p = graft.ops.Index.buildPostings(
          docDf(dir), "doc_id", "text", maxDf = cap)
        graft.ops.Index.conjunctiveLookup(p, Seq("dup", "key"))
          .agg(count(lit(1)).as("n"), sum("doc").as("s"))
      },
      // iterated-graph families: part-co-purchase edges (parts sharing an
      // order; ≤ 7 lineitems/order bounds the per-order pair fan-out, so
      // |E| is linear in |lineitem|). Partkeys are re-offset per copy
      // (copy index recovered from the orderkey offset) so each copy is a
      // DISJOINT subgraph — degrees stay constant, the realistic growth
      // mode. Cost model being verified: triangles = one oriented 3-way
      // equi-join (O(m^1.5) worst case, far below on this bounded-degree
      // graph); pagerank = iters × (equi-join + map-side-combined sum),
      // so i2/i6 at both scales separate per-iteration cost from the
      // iteration-invariant setup (degree join, node set, edge build)
      "triangle_count" -> { dir: String =>
        // SPARK_GRAFT_STATE_PARTS feeds the oriented-edge repartition knob
        // (for under-partitioned upstreams; measured COUNTERPRODUCTIVE as a
        // single-box memory fix — see Graph.triangleCount scaladoc;
        // 0/unset = the default shape)
        val stateParts = sys.env.getOrElse("SPARK_GRAFT_STATE_PARTS", "0").toInt
        val e = copartEdges(dir)
        Graph.triangleCount(e, Graph.degrees(e), stateParts)
      },
      "pagerank_i2" -> { dir: String =>
        Graph.pageRank(copartEdges(dir)
            .select(col("a").as("src"), col("b").as("dst")),
            iters = 2, redistributeDangling = true)
          .agg(count(lit(1)).as("n"), sum("pr").as("s"))
      },
      "pagerank_i6" -> { dir: String =>
        Graph.pageRank(copartEdges(dir)
            .select(col("a").as("src"), col("b").as("dst")),
            iters = 6, redistributeDangling = true)
          .agg(count(lit(1)).as("n"), sum("pr").as("s"))
      },
      // skewed fact⋈dim equi-join: ~30% of fact rows funneled onto ONE
      // hot key (the hot-user / hot-document shape every real corpus
      // has), dim side unique keys so output stays linear — what's being
      // measured is STRAGGLER behavior: without AQE skew-split one task
      // owns 30% of the shuffle and the ratio diverges from the balanced
      // fact_join_agg family; with it (default-on) the hot partition
      // splits and the ratio must stay in that family's neighborhood
      "skewed_join" -> { dir: String =>
        val ev = evDf(dir).withColumn("uk",
          when(pmod(col("user_id"), lit(10)) < 3, lit(0L))
            .otherwise(col("user_id")))
        val dim = evDf(dir).select(col("user_id").as("uk")).distinct()
          .withColumn("w", pmod(col("uk"), lit(7)))
        ev.join(dim, "uk")
          .agg(count(lit(1)).as("n"), sum("w").as("s"),
            sum("value").as("v"))
      },
      // the counter-example family: a SELECTIVE read through manifest
      // data skipping should hold near-FLAT as the corpus grows — the
      // per-copy event_id offsets make each copy a disjoint id band, so
      // a fixed-band query prunes all but the matching copy's files and
      // scaled_s ≈ base_s is the headline data-skipping claim, measured
      "pruned_read" -> { dir: String =>
        graft.ops.TableManifest.readTableRange(
            spark, s"$dir/events_tracked", "event_id", 1000L, 50000L)
          .agg(count(lit(1)).as("n"), sum("value").as("s"))
      },
      // the WRITE-side data-skipping claim, measured (pruned_read's twin):
      // a fixed-size CDC merge whose keys live in one fixed id band — the
      // per-copy id offsets put the band inside copy 0 — must stay near-
      // FLAT as the corpus grows, because committed stats + the victim
      // join confine the copy-on-write to the files intersecting the band.
      // Each timed run re-merges the CURRENT slice (contents advance,
      // cost profile doesn't), exactly a production CDC cadence.
      "merge_cdc" -> { dir: String =>
        val t = s"$dir/events_tracked"
        val updates = graft.ops.TableManifest.readTableRange(
            spark, t, "event_id", 1000L, 2000L)
          .withColumn("value", col("value") + lit(1.0))
        val v = graft.ops.TableManifest.mergeByKey(
          spark, t, "event_id", updates)
        import spark.implicits._
        Seq(v).toDF("committed_v")
      },
      // the SQL-UPDATE claim, measured (merge_cdc's statement twin): a
      // fixed-band `UPDATE … WHERE id BETWEEN lo AND hi` must stay near-
      // FLAT as the corpus grows — the statement's fold hands
      // updateWhere the band as stat-unit prune ranges, and the exact
      // victim scan confines the copy-on-write to the files holding a
      // match. The band lives inside copy 0's id range (base ids are
      // 0–9999 at drill SFs; later copies shift by 10^12) and is
      // DISJOINT from merge_cdc's 1000–2000 so the two rewrite
      // families never churn each other's slices.
      "update_where" -> { dir: String =>
        val t = s"$dir/events_tracked"
        val v = graft.ops.TableManifest.updateWhere(spark, t,
          Seq("value" -> (col("value") + lit(1.0))),
          Some(col("event_id").between(3000L, 4000L)),
          pruneRanges = Seq(("event_id", 3000L, 4000L)))
        import spark.implicits._
        Seq(v).toDF("committed_v")
      },
      // the PARTITIONED-UPDATE claim, measured (round 14): a rewrite
      // scoped to one partition AND one id band must stay near-FLAT as
      // the corpus grows — the k=v segments prune to partition 3's
      // files, committed event_id stats prune those to the band's ~one
      // file, and the rewrite writes back UNDER the partition via
      // partitionBy with no shuffle. The band (3000–4000) is copy 0's
      // and disjoint from other families' tables (events_part is this
      // family's own fixture).
      "partitioned_update" -> { dir: String =>
        val t = s"$dir/events_part"
        val v = graft.ops.TableManifest.updateWhere(spark, t,
          Seq("value" -> (col("value") + lit(1.0))),
          Some(col("part") === 3L &&
            col("event_id").between(3000L, 4000L)),
          pruneRanges = Seq(("part", 3L, 3L), ("event_id", 3000L, 4000L)))
        import spark.implicits._
        Seq(v).toDF("committed_v")
      },
      // the PARTITIONED-APPEND claim, measured (round 14): landing a
      // FIXED-size micro-batch into a partitioned table costs O(batch)
      // — the re-layout pass reads and rewrites the batch, never the
      // table — so the wall must stay near-FLAT as the table grows.
      // Each timed run appends a fresh batch id (an already-committed
      // id would measure the replay no-op).
      "partitioned_append" -> {
        val next = new java.util.concurrent.atomic.AtomicLong(1L)
        (dir: String) => {
          val t = s"$dir/events_part"
          val i = next.getAndIncrement()
          // a fixed-size batch with the table's exact schema (LIMIT
          // reads ~one file at any corpus size), fresh ids per run
          val batch = spark.read.parquet(s"$dir/events").limit(2000)
            .withColumn("event_id",
              pmod(col("event_id"), lit(2000L)) + lit(7000000000L + i * 2000L))
            .withColumn("part", pmod(col("event_id"), lit(16L)))
          graft.streaming.ManifestAppendSink.applyBatch(batch, i, t)
          import spark.implicits._
          Seq(1L).toDF("committed")
        }
      },
      // the LOG-STRUCTURED COMMIT claim, measured (round 15): appending
      // a FIXED-size micro-batch must cost O(batch + delta record)
      // regardless of how many files the table lists. The pre-round-15
      // protocol re-rendered the complete O(files) body per commit and
      // re-parsed it per fresh head read, so this family's ratio TRACKED
      // file count (the fixture holds 64 files at 1× and 64·N at N×);
      // with delta records + the incremental resolution anchor the wall
      // must stay near-FLAT. Fresh batch ids per run (a committed id
      // would measure the replay no-op).
      "manifest_commit" -> {
        val next = new java.util.concurrent.atomic.AtomicLong(1L)
        (dir: String) => {
          val t = s"$dir/events_files"
          val i = next.getAndIncrement()
          val batch = spark.read.parquet(s"$dir/events").limit(100)
            .withColumn("event_id",
              pmod(col("event_id"), lit(100L)) + lit(8000000000L + i * 100L))
            .coalesce(1)
          graft.streaming.ManifestAppendSink.applyBatch(batch, i, t)
          import spark.implicits._
          Seq(1L).toDF("committed")
        }
      },
      // the retention-DELETE claim, measured (the SQL `DELETE WHERE
      // ts < cutoff` path): expiring a FIXED-size old slice must stay
      // near-FLAT as the corpus grows, because committed range stats
      // confine the rewrite to the files intersecting the band — the
      // erase-side twin of pruned_read/merge_cdc. Each timed run expires
      // a FRESH band (an erase of an already-erased band would measure
      // the no-op short-circuit, not the rewrite); bands live above the
      // other families' id ranges so their workloads stay undisturbed.
      "retention_delete" -> {
        val next = new java.util.concurrent.atomic.AtomicLong(0L)
        (dir: String) => {
          val lo = 60000L + next.getAndIncrement() * 1000L
          val v = graft.ops.TableManifest.eraseWhereRange(
            spark, s"$dir/events_tracked", "event_id", lo, lo + 999L)
          import spark.implicits._
          Seq(v).toDF("committed_v")
        }
      })

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // SPARK_GRAFT_FAMILY_FILTER=pagerank,triangle runs just those families
    // (comma-separated prefixes) — re-drilling one family must not cost a
    // full-suite run. SPARK_GRAFT_DURABLE=1 configures a reliable
    // checkpoint dir first, so the SAME drill measures durable-lineage
    // mode's overhead (the number a cluster operator needs to choose the
    // checkpoint cadence).
    val filter = sys.env.get("SPARK_GRAFT_FAMILY_FILTER")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val picked = filter match {
      case Some(prefixes) =>
        families.filter { case (n, _) => prefixes.exists(n.startsWith) }
      case None => families
    }
    val durable = sys.env.get("SPARK_GRAFT_DURABLE").contains("1")
    if (durable)
      spark.sparkContext.setCheckpointDir(s"$scratch/ckpt")

    // warm-up: JIT + codegen caches on the small side
    picked.foreach { case (_, fn) => fn(baseAs).collect() }

    val rows = picked.map { case (name, fn) =>
      val base = (1 to 2).map(_ => time(fn(baseAs).collect())).min
      val scaled = (1 to 2).map(_ => time(fn(scratch).collect())).min
      (name, base, scaled, scaled / base)
    }
    val json = rows.map { case (n, b, s, r) =>
      f""""$n":{"base_s":$b%.3f,"scaled_s":$s%.3f,"ratio":$r%.2f}"""
    }.mkString(",")
    println(s"""{"metric":"scale_drill","mult":$mult,"durable":$durable,"families":{$json}}""")
  }
}
