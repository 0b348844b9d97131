package graft

import graft.sources.MetaSource

/** JDBC-backed catalog resolution (timedb/read.py:73-180 queries a live
  * PostgreSQL engine table): same addressing semantics through
  * `spark.read.jdbc`, exercised against an in-memory Derby database —
  * the embedded JDBC engine Spark already ships. */
class MetaJdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:metaspec;create=true"

  private lazy val seeded: Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE meta (series_id BIGINT, retention VARCHAR(16), " +
        "path VARCHAR(128), node_uuid VARCHAR(64), name VARCHAR(64), data_type VARCHAR(32))")
      st.execute("INSERT INTO meta VALUES " +
        "(1, 'short', '/plant/a', 'u1', 'wind_a', 'double'), " +
        "(2, 'long',  '/plant/a/turbine1', 'u2', 'wind_a_t1', 'double'), " +
        "(3, 'short', '/plant/b', 'u3', 'wind_b', 'int'), " +
        "(4, 'short', '/plant/aa', 'u4', 'wind_aa', 'double')")
      st.close()
    } finally conn.close()
  }

  private def props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("rootPath subtree over JDBC: root + descendants, prefix not fooled by /plant/aa") {
    seeded
    val (ids, rets) = MetaSource.jdbc(spark, url, "meta", props,
      rootPath = Some("/plant/a")).resolve()
    assert(ids.toSet == Set(1L, 2L))
    assert(rets.toSet == Set("short", "long"))
  }

  test("name + dataType addressing over JDBC") {
    seeded
    val (ids, rets) = MetaSource.jdbc(spark, url, "meta", props,
      names = Seq("wind_b", "wind_aa"), dataType = Some("int")).resolve()
    assert(ids == Seq(3L) && rets == Seq("short"))
  }

  test("resolvedCatalog ≡ resolve over JDBC, and the addressing pushes into the JDBC scan") {
    seeded
    val ms = MetaSource.jdbc(spark, url, "meta", props, rootPath = Some("/plant/a"))
    val frame = ms.resolvedCatalog()
    val rows = frame.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val (ids, rets) = ms.resolve()
    assert(rows == ids.map(i => i -> (if (i == 1L) "short" else "long")).toSet)
    assert(rets.toSet == rows.map(_._2))
    // the plan-side twin must keep the single-round-trip property:
    // the addressing predicate must appear as a NON-EMPTY JDBC pushed
    // filter list ("PushedFilters: []" prints for any JDBC scan, so
    // presence of the label alone pins nothing), so a catalog-sized
    // resolve never ships the whole engine table
    val plan = frame.queryExecution.executedPlan.toString
    assert("PushedFilters: \\[.*(EqualTo|StartsWith|Or)".r
      .findFirstIn(plan).isDefined,
      s"addressing predicate was not pushed into the JDBC scan:\n$plan")
  }

  test("addressing validation applies to the JDBC constructor too") {
    seeded
    intercept[IllegalArgumentException] {
      MetaSource.jdbc(spark, url, "meta", props).resolve()
    }
    intercept[IllegalArgumentException] {
      MetaSource.jdbc(spark, url, "meta", props,
        rootPath = Some("/plant"), names = Seq("wind_b")).resolve()
    }
  }
}
