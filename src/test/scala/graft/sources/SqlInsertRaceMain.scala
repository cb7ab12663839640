package graft.sources

import org.apache.spark.sql.SparkSession

/** Second-JVM side of `SqlInsertCrossProcessSpec`: a real OS process
  * racing provider APPENDS (the same scratch-write → move-in →
  * CAS-append commit path SQL `INSERT INTO` takes through
  * [[ManifestTableProvider]]) against the suite's session. args: dir tag
  * n readyFile goFile [mode]. Protocol: create `readyFile` once the
  * session is up, spin until `goFile` exists, then run `n` single-row
  * appends tagged `($i, $tag)` — with `mode = part` each row also
  * carries `bucket = i % 2`, so the append exercises the partitioned
  * re-layout commit under contention. Exit 0 iff every append
  * committed. */
object SqlInsertRaceMain {
  def main(args: Array[String]): Unit = {
    val (dir, tag, nStr, readyFile, goFile, mode) = args match {
      case Array(d, t, ns, r, g) => (d, t, ns, r, g, "flat")
      case Array(d, t, ns, r, g, m) => (d, t, ns, r, g, m)
      case _ => sys.error(s"bad args: ${args.toSeq}")
    }
    val n = nStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-sql-race-$tag")
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
      import spark.implicits._
      (1 to n).foreach { i =>
        val df =
          if (mode == "part")
            Seq((i.toLong, tag, i.toLong % 2)).toDF("k", "who", "bucket")
          else Seq((i.toLong, tag)).toDF("k", "who")
        df.write.format("graft-manifest").mode("append").save(dir)
      }
      spark.stop()
    } catch {
      case e: Throwable =>
        System.err.println(s"[sql-race-child] ${e.getMessage}")
        spark.stop()
        sys.exit(1)
    }
  }
}
