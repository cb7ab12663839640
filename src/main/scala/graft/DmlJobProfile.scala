package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-level profile of one declared query: runs it once warm and prints
  * every Spark job's wall time and description — the measure-first step
  * for composite lifecycle statements whose cost is spread over many
  * small jobs (the Spark UI is disabled in this sandbox; this is the
  * equivalent of its Jobs page for a single query).
  *
  * Usage: runMain graft.DmlJobProfile <queryPrefix> [repeat]
  */
object DmlJobProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DmlJobProfile <queryPrefix> [repeat]")
    val prefix = args(0)
    val repeat = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (name, fn) = SparkEntry.queries.find(_._1.startsWith(prefix))
      .getOrElse(sys.error(s"no query starts with $prefix"))

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description"))
            .orElse(Option(j.properties.getProperty("callSite.short")))
            .getOrElse("?")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, desc) =>
          rows.add((j.jobId, (System.nanoTime() - t0) / 1e9, desc))
        }
      }
    }
    (1 to repeat).foreach { pass =>
      rows.clear()
      if (pass == repeat) spark.sparkContext.addSparkListener(listener)
      // sample the DRIVER thread while the query runs: wall minus job-sum
      // is driver-side work (planning, commit protocol, footer reads) the
      // job listener cannot attribute — the samples can
      val driver = Thread.currentThread()
      val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      @volatile var sampling = pass == repeat
      val sampler = new Thread(() => {
        while (sampling) {
          val st = driver.getStackTrace
          // topmost frame inside graft or spark-sql that is not generic glue
          val frame = st.find { f =>
            val c = f.getClassName
            c.startsWith("graft.") ||
              c.startsWith("org.apache.spark.sql.execution.datasources") ||
              c.startsWith("org.apache.spark.sql.catalyst") ||
              c.startsWith("org.apache.hadoop")
          }.map(f => s"${f.getClassName.split('.').last}.${f.getMethodName}")
            .getOrElse(st.headOption.map(f =>
              s"${f.getClassName.split('.').last}.${f.getMethodName}").getOrElse("?"))
          samples.merge(frame, 1, (a, b) => a + b)
          Thread.sleep(10)
        }
      })
      if (pass == repeat) sampler.start()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      sampling = false
      Thread.sleep(500) // let the listener bus drain
      println(f"[profile] $name pass $pass wall ${wall}%.3f s")
      if (pass == repeat) {
        import scala.jdk.CollectionConverters._
        val all = rows.asScala.toSeq.sortBy(_._1)
        all.foreach { case (id, sec, desc) =>
          println(f"[profile]   job $id%3d ${sec}%7.3f s  ${desc.take(110)}")
        }
        println(f"[profile] jobs ${all.size}, job-sum ${all.map(_._2).sum}%.3f s")
        samples.asScala.toSeq.sortBy(-_._2).take(20).foreach { case (f, n) =>
          println(f"[profile]   driver ${n.toInt * 10}%5d ms  $f")
        }
      }
    }
    spark.stop()
  }
}
