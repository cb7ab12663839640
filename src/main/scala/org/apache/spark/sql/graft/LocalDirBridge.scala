package org.apache.spark.sql.graft

import org.apache.spark.SparkEnv
import org.apache.spark.util.Utils

/** Bridge into `private[spark]` [[org.apache.spark.util.Utils.getLocalDir]]:
  * the ONLY resolver that honors the cluster-manager scratch-dir overrides
  * (`SPARK_LOCAL_DIRS`, YARN/K8s `LOCAL_DIRS`) over `spark.local.dir` — on
  * those managers the conf value is ignored by the executors, so reading the
  * conf directly (the obvious portable path) spills to the wrong disk. */
object LocalDirBridge {

  /** One of the executor's configured scratch dirs (Spark picks/rotates),
    * or `java.io.tmpdir` when no SparkEnv exists (bare unit tests). */
  def scratchDir(): String =
    Option(SparkEnv.get) match {
      case Some(env) => Utils.getLocalDir(env.conf)
      case None      => System.getProperty("java.io.tmpdir")
    }
}
