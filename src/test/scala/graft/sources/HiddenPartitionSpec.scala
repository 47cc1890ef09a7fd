package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hidden (transform) partitioning: the layout clusters on a value
  * DERIVED from a source column (`months(c)`, `years(c)`, `days(c)`,
  * `truncate(n, c)`); the derived column exists only in dir names and
  * per-file stats — never in the data schema — and predicates on the
  * SOURCE column prune via its auto-recorded footer stats.
  */
class HiddenPartitionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("months(date) lays out month dirs, hides the derived column, prunes source ranges") {
    val dir = graft.TempDirs.create("hp-months")
    val orders = graft.Tables.orders(spark, sf)
    Snapshots.commit(orders, dir, "overwrite",
      partitionBy = Seq("months(o_orderdate)"))
    val m = Snapshots.readManifest(spark, dir, 0L)
    assert(m.partitionCols === Seq("months(o_orderdate)"))
    assert(m.files.nonEmpty)
    assert(m.files.forall(_.contains("/o_orderdate_month=")))
    assert(!m.files.exists(_.contains("__p_")))
    // hidden: the derived column is NOT in the schema, not in the data
    val back = Snapshots.readVersion(spark, dir)
    assert(!back.schema.fieldNames.contains("o_orderdate_month"))
    assert(back.count() === orders.count())
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
    // derived min=max stat pinned per file, month string typed
    m.files.foreach { f =>
      val st = m.stats((f, "o_orderdate_month"))
      assert(st.kind === "string" && st.min === st.max)
      assert(st.min.matches("""\d{4}-\d{2}"""))
    }
    // the SOURCE column got footer stats automatically (that is what
    // makes source-range predicates prune without translation)
    m.files.foreach { f =>
      assert(m.stats.contains((f, "o_orderdate")), s"no source stat for $f")
    }
    // a source-column range prunes to the covered months
    val total = m.files.size
    val pruned = Snapshots.readVersionFiltered(spark, dir, None, Seq(
      org.apache.spark.sql.sources.GreaterThanOrEqual(
        "o_orderdate", java.sql.Timestamp.valueOf("1995-01-01 00:00:00")),
      org.apache.spark.sql.sources.LessThan(
        "o_orderdate", java.sql.Timestamp.valueOf("1995-04-01 00:00:00"))))
    val inF = pruned.inputFiles
    assert(inF.nonEmpty && inF.length < total)
    // pruning is boundary-conservative: the boundary-month file's min IS the
    // strict upper bound (midnight timestamps), so it may be kept
    assert(inF.forall(f => Seq("1995-01", "1995-02", "1995-03", "1995-04")
      .exists(mm => f.contains(s"o_orderdate_month=$mm"))))
    val expect = orders.where(
      col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1995-04-01")
    assert(pruned.where(
      col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1995-04-01")
      .count() === expect.count())
  }

  test("years(timestamp) derives calendar years; truncate floors ints and prefixes strings") {
    val dir = graft.TempDirs.create("hp-mixed")
    val df = spark.range(0, 100).toDF("id")
      .withColumn("ts", expr("timestamp_seconds(745804800 + id * 2592000)")) // ~1993-08 + id months
      .withColumn("v", (col("id") * 7 - lit(350)).cast("long"))
      .withColumn("name", concat(lit("grp"), (col("id") % 5).cast("string"), lit("_tail")))
    Snapshots.commit(df, dir, "overwrite",
      partitionBy = Seq("years(ts)", "truncate(100, v)"))
    val m = Snapshots.readManifest(spark, dir, 0L)
    assert(m.files.forall(f =>
      f.contains("/ts_year=") && f.contains("/v_trunc=")))
    // floor semantics: every row's v is within [trunc, trunc+100)
    val back = Snapshots.readVersion(spark, dir)
    assert(back.count() === 100)
    m.files.foreach { f =>
      val y = m.stats((f, "ts_year")); assert(y.kind === "long")
      val t = m.stats((f, "v_trunc")); assert(t.kind === "long")
      assert(t.min.toLong % 100 === 0 ||
        (t.min.toLong < 0 && t.min.toLong % 100 === 0))
    }
    // negative values floor toward -inf: -350 lands in -400, not -300
    assert(m.files.exists(_.contains("v_trunc=-400")))
    // string truncate in its own table: 4-char prefix dirs
    val dir2 = graft.TempDirs.create("hp-struncate")
    Snapshots.commit(df.select("id", "name"), dir2, "overwrite",
      partitionBy = Seq("truncate(4, name)"))
    val m2 = Snapshots.readManifest(spark, dir2, 0L)
    assert(m2.files.forall(_.contains("/name_trunc=grp")))
    val p2 = Snapshots.readVersionFiltered(spark, dir2, None, Seq(
      org.apache.spark.sql.sources.EqualTo("name", "grp2_tail")))
    assert(p2.inputFiles.forall(_.contains("name_trunc=grp2")))
    assert(p2.inputFiles.length < m2.files.size)
  }

  test("hours(timestamp) lays out hour dirs; source ranges prune; date source refused") {
    val dir = graft.TempDirs.create("hp-hours")
    // 48 rows spread over two days, one per half-hour-ish step
    val df = spark.range(0, 48).toDF("id")
      .withColumn("ts", expr("timestamp_seconds(1704412800 + id * 3600)")) // 2024-01-05 00:00 UTC + id hours
      .withColumn("v", col("id") * 10L)
    Snapshots.commit(df, dir, "overwrite", partitionBy = Seq("hours(ts)"))
    val m = Snapshots.readManifest(spark, dir, 0L)
    assert(m.partitionCols === Seq("hours(ts)"))
    assert(m.files.forall(_.contains("/ts_hour=")))
    // derived value is the lexically-ordered hour string, one per file
    m.files.foreach { f =>
      val st = m.stats((f, "ts_hour"))
      assert(st.kind === "string" && st.min === st.max)
      assert(st.min.matches("""\d{4}-\d{2}-\d{2}-\d{2}"""), st.min)
    }
    // hidden: the derived column never enters the schema
    val back = Snapshots.readVersion(spark, dir)
    assert(!back.schema.fieldNames.contains("ts_hour"))
    assert(back.count() === 48)
    // a source-column range prunes to the covered hour dirs
    val p = Snapshots.readVersionFiltered(spark, dir, None, Seq(
      org.apache.spark.sql.sources.GreaterThanOrEqual("ts",
        java.sql.Timestamp.valueOf("2024-01-05 06:00:00")),
      org.apache.spark.sql.sources.LessThan("ts",
        java.sql.Timestamp.valueOf("2024-01-05 09:00:00"))))
    assert(p.inputFiles.nonEmpty && p.inputFiles.length < m.files.size)
    // hour 09 may ride along: its min ts equals the strict upper
    // bound and stat overlap is inclusive (conservative, never wrong)
    assert(p.inputFiles.forall(_.matches(".*ts_hour=2024-01-05-0[6789].*")),
      p.inputFiles.mkString(","))
    assert(p.where(col("ts") >= "2024-01-05 06:00:00" &&
      col("ts") < "2024-01-05 09:00:00").count() === 3L)
    // a DATE source has no hour: refused at validation
    val dir2 = graft.TempDirs.create("hp-hours-bad")
    val bad = df.withColumn("dt", expr("to_date(ts)")).select("id", "dt")
    intercept[IllegalArgumentException] {
      Snapshots.commit(bad, dir2, "overwrite", partitionBy = Seq("hours(dt)"))
    }
  }

  test("hours(ts) dirs are timezone-stable: a writer session in another " +
    "zone lands the same instants in the same UTC hour dirs") {
    // epoch arithmetic + zone-free date rendering (not date_format,
    // which renders the SESSION zone's wall clock) — ADVICE r12: two
    // writers with different session TZs must agree on the layout
    val dir = graft.TempDirs.create("hp-hours-tz")
    val mk = (s: org.apache.spark.sql.SparkSession) =>
      s.range(0, 6).toDF("id")
        .withColumn("ts", expr("timestamp_seconds(1704412800 + id * 3600)"))
    Snapshots.commit(mk(spark), dir, "overwrite",
      partitionBy = Seq("hours(ts)"))
    val utcDirs = Snapshots.readManifest(spark, dir, 0L).files
      .map(_.replaceAll(".*/(ts_hour=[^/]+)/.*", "$1")).sorted
    // an independent session (own SQLConf, shared context) in a zone
    // with a non-zero offset AND a DST rule
    val ny = spark.newSession()
    ny.conf.set("spark.sql.session.timeZone", "America/New_York")
    val dir2 = graft.TempDirs.create("hp-hours-tz-ny")
    Snapshots.commit(mk(ny), dir2, "overwrite",
      partitionBy = Seq("hours(ts)"))
    val nyDirs = Snapshots.readManifest(ny, dir2, 0L).files
      .map(_.replaceAll(".*/(ts_hour=[^/]+)/.*", "$1")).sorted
    assert(nyDirs === utcDirs)
    assert(utcDirs.head === "ts_hour=2024-01-05-00") // UTC wall clock
  }

  test("appends re-derive the carried transform; flat tails stay unpruned but correct") {
    val dir = graft.TempDirs.create("hp-append")
    val orders = graft.Tables.orders(spark, sf)
    Snapshots.commit(orders.where(col("o_orderkey") % 2 === 0), dir,
      "overwrite", partitionBy = Seq("months(o_orderdate)"))
    // partitioned append with the SAME spec: lands in month dirs
    Snapshots.commit(orders.where(col("o_orderkey") % 2 === 1), dir,
      "append", partitionBy = Seq("months(o_orderdate)"))
    val m1 = Snapshots.readManifest(spark, dir, 1L)
    assert(m1.partitionCols === Seq("months(o_orderdate)"))
    assert(m1.files.forall(_.contains("o_orderdate_month=")))
    val back = Snapshots.readVersion(spark, dir)
    assert(back.count() === orders.count())
    // an UNpartitioned tail append keeps the spec; its files are
    // always scanned (no derived stats), never wrong
    Snapshots.commit(orders.limit(5), dir, "append")
    val m2 = Snapshots.readManifest(spark, dir, 2L)
    assert(m2.partitionCols === Seq("months(o_orderdate)"))
    val tail = m2.files.toSet -- m1.files.toSet
    assert(tail.nonEmpty && tail.forall(!_.contains("o_orderdate_month=")))
    val pruned = Snapshots.readVersionFiltered(spark, dir, None, Seq(
      org.apache.spark.sql.sources.GreaterThanOrEqual(
        "o_orderdate", java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))))
    // tail files survive every pruning (conservative)
    assert(tail.subsetOf(pruned.inputFiles.map(f =>
      f.drop(f.indexOf("data/v")) // table-relative
    ).toSet) || tail.forall(t => pruned.inputFiles.exists(_.endsWith(t))))
  }

  test("derived-name collisions are refused: batch columns, appends, ALTER ADD/RENAME") {
    val dir = graft.TempDirs.create("hp-collide")
    val orders = graft.Tables.orders(spark, sf)
    // batch already carries a column named like the derived one
    val bad = orders.withColumn("o_orderdate_month", lit("x"))
    val e1 = intercept[IllegalArgumentException] {
      Snapshots.commit(bad, dir, "overwrite",
        partitionBy = Seq("months(o_orderdate)"))
    }
    assert(e1.getMessage.contains("collides"))
    Snapshots.commit(orders, dir, "overwrite",
      partitionBy = Seq("months(o_orderdate)"))
    // an append ADDING that column is refused too
    val e2 = intercept[IllegalArgumentException] {
      Snapshots.commit(bad, dir, "append")
    }
    assert(e2.getMessage.contains("collides"))
    val e3 = intercept[IllegalArgumentException] {
      Snapshots.addColumns(spark, dir, Seq(
        org.apache.spark.sql.types.StructField("o_orderdate_month",
          org.apache.spark.sql.types.StringType)))
    }
    assert(e3.getMessage.contains("collides"))
    val e4 = intercept[IllegalArgumentException] {
      Snapshots.renameColumn(spark, dir, "o_orderpriority", "o_orderdate_month")
    }
    assert(e4.getMessage.contains("collides"))
    // dropping the SOURCE of a transform is refused
    val e5 = intercept[IllegalArgumentException] {
      Snapshots.dropColumn(spark, dir, "o_orderdate")
    }
    assert(e5.getMessage.contains("partition column"))
  }

  test("renaming the source column carries the transform and keeps pruning") {
    val dir = graft.TempDirs.create("hp-rename")
    val orders = graft.Tables.orders(spark, sf)
    Snapshots.commit(orders, dir, "overwrite",
      partitionBy = Seq("months(o_orderdate)"))
    Snapshots.renameColumn(spark, dir, "o_orderdate", "odate")
    val m = Snapshots.readManifest(spark, dir,
      Snapshots.latestVersion(spark, dir).get)
    assert(m.partitionCols === Seq("months(odate)"))
    // footer stats moved with the rename: source-range pruning works
    // through the NEW name against files written under the old one
    val pruned = Snapshots.readVersionFiltered(spark, dir, None, Seq(
      org.apache.spark.sql.sources.GreaterThanOrEqual(
        "odate", java.sql.Timestamp.valueOf("1995-01-01 00:00:00")),
      org.apache.spark.sql.sources.LessThan(
        "odate", java.sql.Timestamp.valueOf("1995-04-01 00:00:00"))))
    assert(pruned.inputFiles.nonEmpty &&
      pruned.inputFiles.length < m.files.size)
    val n = pruned.where(col("odate") >= "1995-01-01" &&
      col("odate") < "1995-04-01").count()
    val expect = orders.where(col("o_orderdate") >= "1995-01-01" &&
      col("o_orderdate") < "1995-04-01").count()
    assert(n === expect)
  }

  test("SQL DDL: PARTITIONED BY (months(c), truncate(n, c)) creates and reports the layout") {
    val wh = graft.TempDirs.create("hp-sql-wh")
    spark.conf.set("spark.sql.catalog.hp_cat",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.hp_cat.warehouse", wh)
    try {
      graft.Tables.orders(spark, sf).createOrReplaceTempView("hp_src")
      spark.sql("CREATE NAMESPACE IF NOT EXISTS hp_cat.db")
      spark.sql(
        """CREATE TABLE hp_cat.db.hp USING graft
          |PARTITIONED BY (months(o_orderdate))
          |AS SELECT * FROM hp_src""".stripMargin)
      val dir = s"$wh/db/hp"
      val m = Snapshots.readManifest(spark, dir,
        Snapshots.latestVersion(spark, dir).get)
      assert(m.partitionCols === Seq("months(o_orderdate)"))
      assert(m.files.forall(_.contains("o_orderdate_month=")))
      // the derived column is invisible through SQL
      assert(!spark.table("hp_cat.db.hp").schema.fieldNames
        .contains("o_orderdate_month"))
      // partitioning() reports the transform back (SHOW CREATE shape)
      val parts = spark.sessionState.catalogManager.catalog("hp_cat")
        .asInstanceOf[GraftCatalog]
        .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
          Array("db"), "hp")).partitioning()
      assert(parts.map(_.toString).exists(_.toLowerCase.contains("month")))
      // truncate spelled from SQL
      spark.sql(
        """CREATE TABLE hp_cat.db.ht USING graft
          |PARTITIONED BY (truncate(4, o_orderpriority))
          |AS SELECT * FROM hp_src""".stripMargin)
      val dir2 = s"$wh/db/ht"
      val m2 = Snapshots.readManifest(spark, dir2,
        Snapshots.latestVersion(spark, dir2).get)
      assert(m2.partitionCols === Seq("truncate(4, o_orderpriority)"))
      assert(m2.files.forall(_.contains("o_orderpriority_trunc=")))
    } finally {
      spark.sql("DROP TABLE IF EXISTS hp_cat.db.hp")
      spark.sql("DROP TABLE IF EXISTS hp_cat.db.ht")
      spark.conf.unset("spark.sql.catalog.hp_cat")
      spark.conf.unset("spark.sql.catalog.hp_cat.warehouse")
    }
  }

  test("DML payloads re-derive the transform layout; purge keeps it") {
    val dir = graft.TempDirs.create("hp-dml")
    val df = spark.range(0, 120).toDF("id")
      .withColumn("ts", expr("timestamp_seconds(1704067200 + id * 86400)")) // 2024-01-01 + id days
      .withColumn("v", col("id") * 10L)
    Snapshots.commit(df, dir, "overwrite", partitionBy = Seq("months(ts)"))
    val m0 = Snapshots.readManifest(spark, dir, 0L)
    // merge-on-read: the payload must land under its derived month dir
    val s = spark
    import s.implicits._
    val changes = Seq(
      (5L, java.sql.Timestamp.valueOf("2024-01-06 00:00:00"), 555L, "U"),
      (500L, java.sql.Timestamp.valueOf("2024-03-15 00:00:00"), 1L, "I"))
      .toDF("id", "ts", "v", "op")
    Snapshots.mergeOnRead(spark, dir, changes, "id")
    val m1 = Snapshots.readManifest(spark, dir,
      Snapshots.latestVersion(spark, dir).get)
    val pay = m1.files.filterNot(m0.files.contains)
    assert(pay.nonEmpty && pay.forall(_.contains("/ts_month=2024-0")),
      s"merge payloads must re-derive the month layout: $pay")
    // derived min=max month stats pinned on the payloads: they prune
    assert(pay.forall(rel => m1.stats.get((rel, "ts_month"))
      .exists(st => st.min == st.max)))
    // updateWhere payload too
    Snapshots.updateWhere(spark, dir, col("id") === 40L,
      Map("v" -> org.apache.spark.sql.functions.lit(9L)))
    val m2 = Snapshots.readManifest(spark, dir,
      Snapshots.latestVersion(spark, dir).get)
    assert(m2.files.filterNot(m1.files.contains)
      .forall(_.contains("/ts_month=2024-02"))) // id 40 = 2024-02-10
    // partial purge of a masked month keeps every file in month dirs
    Snapshots.deleteWhere(spark, dir,
      col("ts") >= "2024-02-01" && col("ts") < "2024-02-10")
    Snapshots.purgeDeletes(spark, dir)
    val mp = Snapshots.readManifest(spark, dir,
      Snapshots.latestVersion(spark, dir).get)
    assert(mp.dvs.isEmpty)
    assert(mp.partitionCols === Seq("months(ts)"))
    assert(mp.files.forall(_.contains("/ts_month=")),
      s"purge must keep the transform layout: ${mp.files.filterNot(_.contains("/ts_month="))}")
    // content exact after the whole protocol
    val got = Snapshots.readVersion(spark, dir)
      .select("id", "v").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(5L) === 555L && got(500L) === 1L && got(40L) === 9L)
    assert(!got.keySet.exists(id => id >= 31 && id <= 39), "feb 1-9 deleted")
    assert(got.size === 120 + 1 - 9) // base + insert - deleted days
  }

  test("null source values are refused at write, leaving no residue") {
    val dir = graft.TempDirs.create("hp-null")
    val df = spark.range(0, 10).toDF("id")
      .withColumn("d", when(col("id") < 5,
        to_date(lit("2020-01-01"))).otherwise(lit(null).cast("date")))
    val e = intercept[IllegalArgumentException] {
      Snapshots.commit(df, dir, "overwrite", partitionBy = Seq("months(d)"))
    }
    assert(e.getMessage.contains("NULL"))
    assert(Snapshots.latestVersion(spark, dir).isEmpty)
  }
}
