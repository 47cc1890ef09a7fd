package graft

import org.scalatest.funsuite.AnyFunSuite

/** The user-facing session facade: every documented knob lands in the
  * session, and the engine's SQL functions are registered — the
  * "switch from the reference" entry point works as one line.
  */
class GraftSessionSpec extends AnyFunSuite {

  test("facade session carries the engine defaults and SQL functions") {
    // the shared test session IS built from the facade (SparkSpec) —
    // asserting on it also pins that the harnesses inherit the knobs
    val s = SparkSpec.session
    assert(s.conf.get("spark.sql.session.timeZone") === "UTC")
    assert(s.conf.get("spark.sql.shuffle.partitions") === "4")
    assert(s.conf.get("spark.sql.codegen.cache.maxEntries") === "20000")
    assert(s.conf.get("spark.sql.legacy.parquet.nanosAsLong") === "true")
    // the extension registered the native cosine for plain-SQL users
    val one = s.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .head.getDouble(0)
    assert(math.abs(one - 1.0) < 1e-12)
  }
}
