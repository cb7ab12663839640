package graft.ops

import org.apache.spark.sql.SparkSession

/** Second-JVM side of `ManifestCrossProcessSpec`: a real OS process racing
  * add-file commits against the suite's session. args: dir tag n readyFile
  * goFile. Protocol: create `readyFile` once the session is up, spin until
  * `goFile` exists, then run `n` CAS append commits of `$tag-$i.parquet`.
  * Exit 0 iff every commit eventually won. */
object ManifestRaceMain {
  def main(args: Array[String]): Unit = {
    val Array(dir, tag, nStr, readyFile, goFile) = args
    val n = nStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-race-$tag")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      require(new java.io.File(readyFile).createNewFile(), "ready flag exists")
      val deadline = System.currentTimeMillis() + 60000
      while (!new java.io.File(goFile).exists()) {
        require(System.currentTimeMillis() < deadline, "go flag never appeared")
        Thread.sleep(5)
      }
      CasAppendLoop.run(spark, dir, tag, n)
      spark.stop()
    } catch {
      case e: Throwable =>
        System.err.println(s"[race-child] ${e.getMessage}")
        spark.stop()
        sys.exit(1)
    }
  }
}

/** The contended writer loop both processes run: read head, CAS-commit
  * head.files + one new name, retry on loss. Carries the head's hwm
  * through unchanged — a racing writer must never clobber it. */
object CasAppendLoop {
  def run(spark: SparkSession, dir: String, tag: String, n: Int): Unit =
    (1 to n).foreach { i =>
      var won = false
      var attempts = 0
      while (!won) {
        attempts += 1
        require(attempts <= 200, s"$tag-$i lost 200 CAS races; giving up")
        val (v, names, hwm) = TableManifest.readHead(spark, dir)
          .getOrElse(sys.error(s"no manifest head in $dir"))
        won = TableManifest.commitIf(spark, dir,
          names :+ s"$tag-$i.parquet", expectedHead = v, hwm = hwm).isDefined
      }
    }
}
