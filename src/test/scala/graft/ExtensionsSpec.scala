package graft

import org.apache.spark.sql.SparkSession

/** End-to-end test of the `spark.sql.extensions` injection path: a
  * session configured ONLY with `graft.GraftExtensions` (no programmatic
  * registration) must resolve the native functions in plain SQL. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions registers native functions via spark.sql.extensions") {
    val base = spark // materialize the shared session first
    // getOrCreate returns the default session unless cleared; a second
    // session on the SAME SparkContext applies builder extensions (the
    // `spark.sql.extensions=graft.GraftExtensions` conf reaches the same
    // class through the same injection hooks at real context creation)
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      assert(s2 ne base)
      val cos = s2.sql(
        """SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |                    array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c
          |""".stripMargin).collect()(0).getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-9)
      val sig = s2.sql("SELECT graft_minhash_sig(array('a', 'b'), 4) AS s")
        .collect()(0).getSeq[String](0)
      assert(sig.length === 4)
      val ramp = s2.sql(
        "SELECT graft_synth_ramp(CAST(65534 AS BIGINT), 4) AS r")
        .collect()(0).getSeq[Int](0)
      assert(ramp === Seq(65534, 65535, 0, 1)) // modulus wrap

      // do NOT stop s2 — it shares the test JVM's SparkContext
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
