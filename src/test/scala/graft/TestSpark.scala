package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, "graft-test")
  val sfDir = "/root/testdata/sf0.001"
}
