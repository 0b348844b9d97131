package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: collect-compare two registered formulations (registry
  * queries and/or [[SparkEntry.devQueries]] variants) row for row at
  * one or more data dirs — the value-equality gate that precedes any
  * AbBench plan-swap promotion.
  * `sbt "runMain graft.ValueCompare <nameA> <nameB> <dir> [dir ...]"`;
  * exits non-zero on any mismatch. */
object ValueCompare {
  def main(args: Array[String]): Unit = {
    val Array(nameA, nameB, dirs @ _*) = args.toSeq.toArray
    require(dirs.nonEmpty, "pass at least one data dir")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = SparkEntry.queries ++ SparkEntry.devQueries
    var bad = 0
    for (dir <- dirs) {
      val a = all(nameA)(spark, dir)
      val b = all(nameB)(spark, dir)
      val ca = a.columns.toSeq
      val cb = b.columns.toSeq
      if (ca != cb) { println(s"SCHEMA MISMATCH $dir: $ca vs $cb"); bad += 1 }
      else {
        val ra = a.collect().map(_.toSeq).toSeq
        val rb = b.collect().map(_.toSeq).toSeq
        if (ra == rb) println(s"EQUAL $dir: ${ra.size} rows")
        else {
          bad += 1
          println(s"MISMATCH $dir: ${ra.size} vs ${rb.size} rows")
          ra.zipAll(rb, null, null).zipWithIndex
            .filter { case ((x, y), _) => x != y }.take(5)
            .foreach { case ((x, y), i) => println(s"  row $i: $x | $y") }
        }
      }
    }
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
