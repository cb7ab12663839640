package graft

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` output for named queries to files —
  * the optimization-round plan evidence (`plans/r18/<q>_{before,after}.txt`).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [q1,q2,...]
  *   outDir:  directory for the plan files (created)
  *   suffix:  appended to the file name, e.g. "before" / "after"
  *   queries: comma-separated names (prefix match, like the bench filter);
  *            omitted = every declared query.
  *
  * Session config mirrors Bench (same extensions, shuffle partitions from
  * SPARK_GRAFT_CPUS, UTC) so the captured plans are the plans the bench
  * actually executes. Plans are captured from queryExecution BEFORE
  * execution — AQE re-optimization is not reflected; Exchange counts and
  * join strategies at this stage are what the static planner chose.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [q1,q2,...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(outDir)
    val chosen = if (args.length >= 3) {
      val prefixes = args(2).split(",").map(_.trim).filter(_.nonEmpty)
      SparkEntry.queries.filter { case (n, _) => prefixes.exists(n.startsWith) }
    } else SparkEntry.queries
    chosen.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          outDir.resolve(s"${name}_$suffix.txt"), plan.getBytes("UTF-8"))
        println(s"[plandump] $name ok")
      } catch {
        case e: Exception =>
          println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
