package graft

import org.apache.spark.sql.SparkSession

/** One session for the whole test run — Spark startup dominates suite
  * time otherwise.
  */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.tables.TestTables.nanosAsLongConf._1, graft.tables.TestTables.nanosAsLongConf._2) // NANOS events support; readers never mutate conf
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir", s"/tmp/graft_test_warehouse_${ProcessHandle.current().pid()}")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
