package graft.ops

import java.nio.file.Files

import graft.SparkSpec

/** CROSS-PROCESS manifest race drill. `ManifestSpec`'s race drills run
  * threads inside one JVM, where the JVM itself serializes much of the
  * filesystem access; the commit protocol's linearization claim is the
  * `O_EXCL` exclusive create, which is exactly the primitive whose
  * semantics differ across processes and filesystems. So this drill races
  * a REAL second JVM (spawned with the test JVM's own classpath and
  * module flags) against the suite's session: both run the same CAS
  * append loop on one manifest dir.
  *
  * Pass = linearizability evidence: every commit from both writers
  * survives in the head (no lost update), the head version advanced by
  * exactly one per successful commit (two processes can never both win
  * the same version), and the streaming high-water mark rode through
  * every contended commit unchanged. */
class ManifestCrossProcessSpec extends SparkSpec {

  private val N = 6

  test("two OS processes racing CAS appends: no lost updates, hwm intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-xproc").toString
    // seed: one real data file, a manifest head, and a committed hwm the
    // racing writers must carry through untouched
    graft.streaming.ManifestAppendSink.applyBatch(Seq(1L).toDF("v"), 7L, dir)
    val (v0, names0, hwm0) = TableManifest.readHead(spark, dir).get
    assert(hwm0.contains(7L))

    val scratch = Files.createTempDirectory("graft-xproc-flags")
    val ready = scratch.resolve("ready").toString
    val go = scratch.resolve("go").toString

    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val moduleFlags = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ moduleFlags ++ Seq(
      "-Xmx2g", "-cp", System.getProperty("java.class.path"),
      "graft.ops.ManifestRaceMain", dir, "procB", N.toString, ready, go)
    val child = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true).start()
    val drain = new Thread(() => {
      val src = scala.io.Source.fromInputStream(child.getInputStream)
      src.getLines().foreach(_ => ()) // keep the pipe from blocking
      src.close()
    })
    drain.setDaemon(true); drain.start()

    try {
      // wait for the child session, then release both writers together
      val deadline = System.currentTimeMillis() + 120000
      while (!new java.io.File(ready).exists()) {
        assert(System.currentTimeMillis() < deadline,
          "child JVM never became ready")
        assert(child.isAlive, "child JVM died during startup")
        Thread.sleep(20)
      }
      assert(new java.io.File(go).createNewFile())
      CasAppendLoop.run(spark, dir, "procA", N)
      assert(child.waitFor() == 0, "child writer failed (see its exit code)")
    } finally {
      if (child.isAlive) child.destroyForcibly()
    }

    val (v1, names1, hwm1) = TableManifest.readHead(spark, dir).get
    val mine = (1 to N).map(i => s"procA-$i.parquet").toSet
    val theirs = (1 to N).map(i => s"procB-$i.parquet").toSet
    val lost = (mine ++ theirs) -- names1.toSet
    assert(lost.isEmpty, s"lost updates across processes: $lost")
    assert(names0.toSet.subsetOf(names1.toSet), "seed files must survive")
    assert(v1 == v0 + 2 * N,
      s"version must advance once per successful commit: $v0 -> $v1")
    assert(hwm1.contains(7L), s"hwm clobbered by contended commits: $hwm1")
  }
}
