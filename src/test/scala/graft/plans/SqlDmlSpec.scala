package graft.plans

import graft.SparkSpec
import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** SQL row-level DML over `USING graft` views: DELETE / UPDATE /
  * MERGE INTO statements must behave exactly like the Scala snapshot
  * API calls they route to, with no Scala API in the loop.
  */
class SqlDmlSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def freshOrders(tag: String): String = {
    val dir = graft.TempDirs.create(tag)
    Snapshots.commit(graft.Tables.orders(spark, sf), dir, "overwrite",
      statsColumns = Seq("o_orderkey"))
    dir
  }

  private def view(name: String, dir: String): Unit =
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $name " +
      s"USING graft OPTIONS (path '$dir')")

  test("DELETE FROM masks rows via deletion vectors, one commit") {
    val dir = freshOrders("sqldml-del")
    view("dml_del", dir)
    val before = spark.table("dml_del").count()
    val f = spark.table("dml_del").filter(col("o_orderstatus") === "F").count()
    spark.sql("DELETE FROM dml_del WHERE o_orderstatus = 'F'")
    view("dml_del", dir) // fresh view resolves the new latest
    assert(spark.table("dml_del").count() === before - f)
    assert(spark.table("dml_del")
      .filter(col("o_orderstatus") === "F").count() === 0L)
    // DV mask, not a rewrite: v1 exists, data files unchanged at v0
    assert(Snapshots.latestVersion(spark, dir).get === 1L)
    assert(spark.read.format("graft").option("versionAsOf", "0").load(dir)
      .count() === before)
  }

  test("UPDATE SET applies expressions, casts literals, honors WHERE") {
    val dir = freshOrders("sqldml-upd")
    view("dml_upd", dir)
    val expected = spark.table("dml_upd")
      .withColumn("o_totalprice",
        when(col("o_orderstatus") === "F", col("o_totalprice") + 100.0)
          .otherwise(col("o_totalprice")))
      .groupBy("o_orderstatus")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("t"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
    spark.sql(
      "UPDATE dml_upd SET o_totalprice = o_totalprice + 100 " +
        "WHERE o_orderstatus = 'F'")
    view("dml_upd", dir)
    val got = spark.table("dml_upd")
      .groupBy("o_orderstatus")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("t"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("MERGE INTO: UPDATE/DELETE/INSERT actions in one atomic commit") {
    val dir = freshOrders("sqldml-merge")
    view("dml_m", dir)
    val base = spark.table("dml_m")
    // source: updates for %10=1 (price +7), deletes for %10=2,
    // inserts re-keyed high
    base.filter(col("o_orderkey") % 10 === 1)
      .select(col("o_orderkey").as("k"), lit("upd").as("what"),
        (col("o_totalprice") + 7).as("newprice"))
      .unionByName(
        base.filter(col("o_orderkey") % 10 === 2)
          .select(col("o_orderkey").as("k"), lit("del").as("what"),
            lit(0.0).as("newprice")))
      .unionByName(
        base.filter(col("o_orderkey") % 10 === 3)
          .select((col("o_orderkey") + 900000000L).as("k"),
            lit("ins").as("what"), col("o_totalprice").as("newprice")))
      .createOrReplaceTempView("dml_src")
    spark.sql(
      """MERGE INTO dml_m t USING dml_src s ON t.o_orderkey = s.k
        |WHEN MATCHED AND s.what = 'del' THEN DELETE
        |WHEN MATCHED AND s.what = 'upd' THEN UPDATE SET o_totalprice = s.newprice
        |WHEN NOT MATCHED AND s.what = 'ins' THEN INSERT
        |  (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |   o_orderpriority)
        |  VALUES (s.k, CAST(1 AS BIGINT), 'N', s.newprice, DATE'2026-01-01',
        |   'MERGED')""".stripMargin)
    view("dml_m", dir)
    val after = spark.table("dml_m")
    val expected = base
      .filter(col("o_orderkey") % 10 =!= 2)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 10 === 1, col("o_totalprice") + 7)
          .otherwise(col("o_totalprice")))
    val nIns = base.filter(col("o_orderkey") % 10 === 3).count()
    assert(after.count() === expected.count() + nIns)
    // updated + untouched rows match exactly
    assert(after.filter(col("o_orderkey") < 900000000L)
      .exceptAll(expected).isEmpty)
    assert(expected.exceptAll(
      after.filter(col("o_orderkey") < 900000000L)).isEmpty)
    // inserts carry the action's literals
    val ins = after.filter(col("o_orderkey") >= 900000000L)
    assert(ins.count() === nIns)
    assert(ins.filter(col("o_orderpriority") =!= "MERGED").count() === 0L)
    // single atomic commit for the whole statement
    assert(Snapshots.latestVersion(spark, dir).get === 1L)
  }

  test("MERGE with UPDATE SET * takes all payload columns from source") {
    val dir = freshOrders("sqldml-star")
    view("dml_star", dir)
    val base = spark.table("dml_star")
    base.filter(col("o_orderkey") % 10 === 4)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .createOrReplaceTempView("dml_star_src")
    spark.sql(
      """MERGE INTO dml_star t USING dml_star_src s
        |ON t.o_orderkey = s.o_orderkey
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    view("dml_star", dir)
    val doubled = spark.table("dml_star")
      .filter(col("o_orderkey") % 10 === 4)
    val want = base.filter(col("o_orderkey") % 10 === 4)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    assert(doubled.exceptAll(want).isEmpty && want.exceptAll(doubled).isEmpty)
  }

  test("MERGE cardinality violation and unsupported shapes are refused") {
    val dir = freshOrders("sqldml-guard")
    view("dml_g", dir)
    // two source rows for one key, both matching the UPDATE action
    spark.sql("SELECT CAST(1 AS BIGINT) AS k UNION ALL SELECT CAST(1 AS BIGINT)")
      .createOrReplaceTempView("dml_g_dup")
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO dml_g t USING dml_g_dup s ON t.o_orderkey = s.k
          |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(e.getMessage.contains("more than one change"))
    // refused cardinality burns no version
    assert(Snapshots.latestVersion(spark, dir).get === 0L)
    // non-equality ON
    val e2 = intercept[Exception] {
      spark.sql(
        """MERGE INTO dml_g t USING dml_g_dup s ON t.o_orderkey > s.k
          |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(e2.getMessage.contains("single same-type equality"))
  }

  test("UPDATE/DELETE with no matches leaves the table version untouched") {
    val dir = freshOrders("sqldml-nomatch")
    view("dml_n", dir)
    spark.sql("DELETE FROM dml_n WHERE o_orderkey < 0")
    spark.sql("UPDATE dml_n SET o_totalprice = 0 WHERE o_orderkey < 0")
    assert(Snapshots.latestVersion(spark, dir).get === 0L)
  }
}
